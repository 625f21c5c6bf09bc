package graft.types

import org.apache.spark.sql.types._

import graft.model.{EntityMeta, FieldMeta, TypeMapping}

/** Total, eval-free source-type → Spark `DataType` resolution.
  *
  * Replaces the reference's two-step scheme — a MongoDB lookup collection
  * (static/datatypesConvert.json:1-50, resources/mongodbHelper.py:14-50)
  * whose resolved names are then `eval()`d into SQLAlchemy types
  * (resources/sqlDwh.py:352,459) — with a total function over an in-memory
  * map. The mapping has 6 rows in the reference, so it is a driver-side
  * broadcastable constant, not a distributed join (SURVEY.md §2.3 J1).
  *
  * Semantic rules reproduced:
  *   - (sourceSystem, sourceDataType) → target type, case-insensitive on
  *     the system name (the reference stores both "priority"/"Priority").
  *   - PK columns are forced to StringType regardless of source type
  *     (resources/sqlDwh.py:346-350,453-466).
  *   - Unmapped types: the reference silently writes null
  *     (priorityDataSource.py:538-542); we fail loudly by default, or fall
  *     back to StringType when `lenient = true` (documented choice,
  *     SURVEY.md §1.2).
  */
object TypeMapper {

  /** Verbatim semantics of static/datatypesConvert.json (FIXTURES.md B.4). */
  val defaultMappings: Seq[TypeMapping] = Seq(
    TypeMapping("priority", "Edm.String", "VARCHAR"),
    TypeMapping("priority", "Edm.Decimal", "NUMERIC"),
    TypeMapping("priority", "Edm.DateTimeOffset", "TIMESTAMP"),
    TypeMapping("priority", "Edm.Int64", "BIGINT"),
    TypeMapping("sbo", "SBO_text", "VARCHAR(255)"),
    TypeMapping("sbo", "SBO_num", "VARCHAR(255)"))

  private def key(system: String, sourceType: String): (String, String) =
    (system.toLowerCase, sourceType)

  private val defaultTable: Map[(String, String), String] =
    defaultMappings.map(m => key(m.sourceSystem, m.sourceDataType) -> m.targetDataType).toMap

  /** Warehouse type name → Spark DataType (SURVEY.md §1.2 table). */
  def sqlNameToSpark(name: String): DataType = name.toUpperCase match {
    case "VARCHAR" | "VARCHAR(255)" | "TEXT" => StringType
    case "NUMERIC" | "DECIMAL"                => DecimalType(38, 18)
    case "TIMESTAMP" | "DATETIME"             => TimestampType
    case "BIGINT"                             => LongType
    case "INTEGER" | "INT"                    => IntegerType
    case "DOUBLE" | "FLOAT8"                  => DoubleType
    case "BOOLEAN"                            => BooleanType
    case other =>
      throw new IllegalArgumentException(s"no Spark type for warehouse type '$other'")
  }

  final class Mapper(table: Map[(String, String), String], lenient: Boolean) {

    /** Resolved warehouse type name for a field, or the documented
      * failure behavior for unmapped types. */
    def targetName(system: String, sourceType: String): String =
      table.get(key(system, sourceType)) match {
        case Some(t)            => t
        case None if lenient    => "VARCHAR"
        case None =>
          throw new IllegalArgumentException(
            s"unmapped source type ($system, $sourceType); " +
              "pass lenient=true to default to VARCHAR")
      }

    /** Spark type for one field. PK fields are always StringType
      * (reference PK→String(255) rule, sqlDwh.py:346-350). */
    def sparkType(system: String, field: FieldMeta): DataType =
      if (field.keyFlag) StringType
      else sqlNameToSpark(targetName(system, field.sourceDataType))

    /** Rewrite an entity's fields with resolved targetDataType — the
      * analog of __adjustMetadataDatatype (priorityDataSource.py:513-553),
      * with PKs resolved to VARCHAR. */
    def resolve(meta: EntityMeta): EntityMeta =
      meta.copy(fields = meta.fields.map { f =>
        val t = if (f.keyFlag) "VARCHAR" else targetName(meta.sourceSystem, f.sourceDataType)
        f.copy(targetDataType = Some(t))
      })
  }

  def apply(mappings: Seq[TypeMapping] = defaultMappings, lenient: Boolean = false): Mapper =
    new Mapper(
      mappings.map(m => key(m.sourceSystem, m.sourceDataType) -> m.targetDataType).toMap,
      lenient)

  /** S8: load a mapping collection from a JSON file in the reference's
    * `datatypesConvert.json` shape — an array of
    * `{sourceSystem, SourceDataType, postgresDatatype}` objects
    * (static/datatypesConvert.json:1-50; seeded into the catalog by
    * mongodbHelper.py:25-41). Driver-side catalog bootstrap: plain
    * Jackson, not a Spark job. */
  def loadMappings(path: String): Seq[TypeMapping] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    require(root.isArray, s"$path: expected a JSON array of mappings")
    import scala.jdk.CollectionConverters._
    root.elements().asScala.map { n =>
      def req(field: String): String = {
        val v = n.get(field)
        require(v != null && v.isTextual, s"$path: mapping entry missing '$field'")
        v.asText
      }
      TypeMapping(req("sourceSystem"), req("SourceDataType"), req("postgresDatatype"))
    }.toSeq
  }

  /** Default strict mapper over the built-in 6-row table. */
  val default: Mapper = new Mapper(defaultTable, lenient = false)
}
