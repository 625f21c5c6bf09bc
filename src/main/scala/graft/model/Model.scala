package graft.model

/** Core domain model of the metadata-driven ELT engine.
  *
  * Mirrors the observable data model of the reference
  * (SURVEY.md §1.1; reference: resources/priorityDataSource.py:361-447,
  * readme.md:158-216) as plain Scala case classes. These are driver-side
  * values; distributed data stays in `DataFrame`s whose schemas are
  * produced from [[EntityMeta]] by `graft.catalog.SchemaRegistry`.
  */

/** One field of an entity's schema, as discovered from the OData
  * `$metadata` catalog (reference: resources/priorityDataSource.py:393-420).
  *
  * @param fieldName      source field name (original casing)
  * @param sourceDataType EDM primitive, e.g. "Edm.String"
  * @param desc           human description annotation
  * @param keyFlag        true when the field is part of the entity PK
  * @param targetDataType resolved warehouse type name, populated by the
  *                       type-mapping pass (None when unmapped — the
  *                       reference silently stores null,
  *                       priorityDataSource.py:538-542; we fail loudly
  *                       unless a lenient fallback is requested)
  */
final case class FieldMeta(
    fieldName: String,
    sourceDataType: String,
    desc: String = "",
    keyFlag: Boolean = false,
    targetDataType: Option[String] = None)

/** Per-entity schema document — the unit of the metadata catalog
  * (reference: resources/priorityDataSource.py:361-447, readme.md:518-551).
  */
final case class EntityMeta(
    id: String,
    sourceSystem: String,
    desc: String = "",
    fields: Seq[FieldMeta] = Nil,
    entityPk: Seq[String] = Nil) {

  /** PK derivation invariant: entityPk == fields.filter(_.keyFlag)
    * (reference: priorityDataSource.py:441-444). */
  def derivedPk: Seq[String] = fields.filter(_.keyFlag).map(_.fieldName)
}

/** One row of the source-type → target-type mapping collection
  * (reference: static/datatypesConvert.json:1-50). */
final case class TypeMapping(
    sourceSystem: String,
    sourceDataType: String,
    targetDataType: String)

/** Per-entity extraction settings (reference: readme.md:158-216,
  * app.py:33-59). `lastRun` is the incremental watermark, advanced
  * after each successful load (priorityDataSource.py:584-626).
  */
final case class EntityConfig(
    entityId: String,
    filterFlag: Boolean = false,
    filterField: String = "",
    expand: Seq[String] = Nil,
    lastRun: Option[String] = None,
    dataStartDate: String = "1970-01-01 00:00:00")

/** Datasource-level extraction config (one per accounting instance). */
final case class ExtractionConfig(
    id: String,
    datasourceName: String,
    accountId: String,
    sourceSystem: String = "Priority",
    systemTimezone: String = "UTC",
    uri: String = "",
    entities: Seq[EntityConfig] = Nil,
    submitTimestampUtc: Option[java.sql.Timestamp] = None)

/** Per-table load outcome, mirroring the reference's run report shape
  * (reference: priorityDataSource.py:209-215, readme.md:473-510). */
final case class TableReport(
    entityName: String,
    tableName: String,
    recordsWritten: Long)

/** Per-entity error captured without aborting the run
  * (reference: priorityDataSource.py:173-184). */
final case class EntityError(entityId: String, message: String)

/** Whole-run report: audit id, per-table counts, isolated errors. */
final case class RunReport(
    extractionId: String,
    tables: Seq[TableReport] = Nil,
    errors: Seq[EntityError] = Nil,
    elapsedSec: Double = 0.0)
