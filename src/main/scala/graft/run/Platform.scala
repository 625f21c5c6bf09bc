package graft.run

import org.apache.spark.sql.SparkSession

import graft.catalog.SchemaRegistry
import graft.model.{ExtractionConfig, RunReport}
import graft.sinks.{Ddl, StagingWriter}
import graft.sources.EntitySource

/** Top-level lifecycle compositions — the engine's `/initialDataLoad` and
  * `/resetDataPlatform` entry points (SURVEY.md §3.1, §3.3).
  */
final class Platform(
    spark: SparkSession,
    source: EntitySource,
    registry: SchemaRegistry,
    writer: StagingWriter) {

  private val ddl = new Ddl(spark, registry)
  private val refresh = new RefreshJob(spark, source, writer)

  /** §3.1 `/initialDataLoad`: (re)register metadata, create the account
    * database + typed tables, then a full refresh. */
  def initialDataLoad(
      config: ExtractionConfig,
      metadataXml: Option[String] = None): (RunReport, ExtractionConfig) = {
    metadataXml.foreach { xml =>
      registry.putAll(SchemaRegistry.parseMetadataXml(xml, config.sourceSystem))
    }
    val db = ddl.createDatabase(config.accountId)
    ddl.deployAll(db, registry.list)
    refresh.run(config, incremental = false)
  }

  /** §3.2 `/refreshData`. */
  def refreshData(config: ExtractionConfig, incremental: Boolean): (RunReport, ExtractionConfig) =
    refresh.run(config, incremental)

  /** §3.3 `/resetDataPlatform`: drop everything, then initial load.
    * Returns (droppedTables, report, updatedConfig). */
  def reset(config: ExtractionConfig, metadataXml: Option[String] = None)
      : (Seq[String], RunReport, ExtractionConfig) = {
    val droppedStg = writer.dropAll()
    val db = ddl.databaseName(config.accountId)
    val droppedCat =
      if (spark.catalog.databaseExists(db)) ddl.dropAll(db)._1 else Nil
    val (report, updated) = initialDataLoad(config, metadataXml)
    (droppedStg ++ droppedCat, report, updated)
  }
}
