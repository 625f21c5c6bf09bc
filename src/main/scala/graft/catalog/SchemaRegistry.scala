package graft.catalog

import org.apache.spark.sql.types._

import graft.model.{EntityMeta, FieldMeta}
import graft.types.TypeMapper

/** Metadata catalog → Spark `StructType` factory.
  *
  * The reference discovers per-entity schemas from the ERP's OData
  * `$metadata` XML at deploy time and stores them as documents
  * (resources/priorityDataSource.py:336-447); table objects are then built
  * from those documents (resources/sqlDwh.py:300-370). Schemas are runtime
  * values, so the engine works in `DataFrame` space with `StructType`s
  * emitted here (SURVEY.md §1.3).
  *
  * Naming rule reproduced: all identifiers are lowercased before storage
  * (priorityDataSource.py:780,801; sqlDwh.py:218-222).
  */
final class SchemaRegistry(
    mapper: TypeMapper.Mapper = TypeMapper.default,
    persistPath: Option[String] = None) {

  import SchemaRegistry._

  private val entities = scala.collection.concurrent.TrieMap.empty[String, EntityMeta]

  // boot: a persisted catalog is served immediately, no $metadata
  // re-parse needed after a restart (the reference persists its metadata
  // docs the same way, priorityDataSource.py:103-111)
  persistPath.foreach(p => readCatalog(p).foreach(m => entities.put(m.id, m)))

  /** Overwrite-semantics registration (reference deletes + reinserts the
    * whole catalog on refresh, priorityDataSource.py:103,111). */
  def putAll(metas: Seq[EntityMeta]): Unit = {
    entities.clear()
    metas.foreach(m => entities.put(m.id, m))
    persist()
  }

  def put(meta: EntityMeta): Unit = { entities.put(meta.id, meta); persist() }
  def get(id: String): Option[EntityMeta] = entities.get(id)
  def list: Seq[EntityMeta] = entities.values.toSeq.sortBy(_.id)

  /** D4: drop the whole metadata catalog (the reference's
    * `drop_database(metadataDbName)`, mongodbHelper.py:86-94). Returns
    * the number of entities dropped. */
  def drop(): Int = {
    val n = entities.size
    entities.clear()
    persist()
    n
  }

  /** Catalog durability: every mutation rewrites the JSON file via the
    * shared [[graft.config.AtomicJsonFile]] protocol, so a crash
    * mid-update leaves the previous consistent catalog on disk and
    * concurrent writers cannot tear it (unique temp + atomic rename;
    * the write itself is serialized per instance so `list` and the file
    * move stay ordered). No-op without a persistPath (in-memory mode —
    * e.g. Bench's parse microbenchmark). Driver-side control-plane
    * state: KBs per entity, thousands of entities — a file is the right
    * tool. */
  private def persist(): Unit = synchronized {
    persistPath.foreach(p => writeCatalog(p, list))
  }

  /** Spark field for one metadata field: lowercased name, mapped type,
    * PK⇒StringType (sqlDwh.py:346-350). */
  private def toStructField(system: String, f: FieldMeta): StructField =
    StructField(f.fieldName.toLowerCase, mapper.sparkType(system, f), nullable = !f.keyFlag)

  /** Full raw schema of an entity (every catalog field). */
  def schemaOf(meta: EntityMeta): StructType =
    StructType(meta.fields.map(toStructField(meta.sourceSystem, _)))

  /** Parent staging-table schema: entity fields minus subform columns,
    * plus audit columns (sqlDwh.py:360-365). */
  def parentSchema(meta: EntityMeta, subformNames: Seq[String]): StructType = {
    val drop = subformNames.map(s => s"${s.toLowerCase}_subform").toSet
    StructType(
      meta.fields.map(toStructField(meta.sourceSystem, _))
        .filterNot(f => drop.contains(f.name)) ++ auditFields)
  }

  /** Child staging-table schema: subform fields + parent PK columns
    * (propagated, PK⇒String) + audit columns (priorityDataSource.py:792-810). */
  def childSchema(child: EntityMeta, parent: EntityMeta): StructType = {
    val childCols = child.fields.map(toStructField(child.sourceSystem, _))
    val pkCols = parent.entityPk
      .map(_.toLowerCase)
      .filterNot(pk => childCols.exists(_.name == pk))
      .map(pk => StructField(pk, StringType, nullable = false))
    StructType(pkCols ++ childCols ++ auditFields)
  }
}

object SchemaRegistry {

  private implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats

  private[catalog] def readCatalog(path: String): Seq[EntityMeta] =
    graft.config.AtomicJsonFile.readString(path)
      .map(org.json4s.jackson.Serialization.read[Seq[EntityMeta]](_))
      .getOrElse(Nil)

  private[catalog] def writeCatalog(path: String, metas: Seq[EntityMeta]): Unit =
    graft.config.AtomicJsonFile.writeString(path,
      org.json4s.jackson.Serialization.writePretty(metas))

  /** Audit lineage columns stamped on every staged row
    * (reference: priorityDataSource.py:54-55,760-761; sqlDwh.py:360-365). */
  val ExtractionIdCol = "extractionid"
  val ExtractionTsCol = "extractiontimestamputc"

  val auditFields: Seq[StructField] = Seq(
    StructField(ExtractionIdCol, StringType, nullable = false),
    StructField(ExtractionTsCol, TimestampType, nullable = false))

  /** Parse an OData `$metadata` document into entity metadata.
    *
    * Behavioral contract from the reference parser
    * (priorityDataSource.py:336-447):
    *   - one catalog row per `EntityType`;
    *   - keys come from `Key/PropertyRef` — scalar or list (:380-388);
    *     entities with no Key element get an empty PK (:387-388);
    *   - fields come from `Property` elements — scalar or list
    *     (single-field entities are a scalar, not a 1-list, :408-420);
    *   - entity/field descriptions from Annotation elements when present;
    *   - EntityPk is derived from the KeyFlag'd fields (:441-444).
    *
    * This is driver-side catalog bootstrap, not a distributed op
    * (SURVEY.md §2.1 S5) — `scala.xml` is fine at catalog scale
    * (thousands of entities).
    */
  def parseMetadataXml(xml: String, sourceSystem: String): Seq[EntityMeta] = {
    // $metadata comes from an external ERP: parse with DTDs and external
    // entities disabled (XXE hardening — no file reads / SSRF from a
    // compromised source)
    val spf = javax.xml.parsers.SAXParserFactory.newInstance()
    spf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    spf.setFeature("http://xml.org/sax/features/external-general-entities", false)
    spf.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    val root = scala.xml.XML.withSAXParser(spf.newSAXParser()).loadString(xml)
    (root \\ "EntityType").map { et =>
      val name = (et \ "@Name").text
      val keyNames = (et \ "Key" \ "PropertyRef").map(pr => (pr \ "@Name").text).toSet
      val fields = (et \ "Property").map { p =>
        val fname = (p \ "@Name").text
        val desc = (p \ "Annotation")
          .find(a => (a \ "@Term").text.endsWith("Description"))
          .map(a => (a \ "@String").text).getOrElse("")
        FieldMeta(
          fieldName = fname,
          sourceDataType = (p \ "@Type").text,
          desc = desc,
          keyFlag = keyNames.contains(fname))
      }
      val desc = (et \ "Annotation")
        .find(a => (a \ "@Term").text.endsWith("Description"))
        .map(a => (a \ "@String").text).getOrElse("")
      val meta = EntityMeta(name, sourceSystem, desc, fields)
      meta.copy(entityPk = meta.derivedPk)
    }
  }
}
