package graft.run

import org.apache.spark.sql.SparkSession

import graft.catalog.SchemaRegistry
import graft.config.ConfigStore
import graft.model.{ExtractionConfig, RunReport}
import graft.sinks.{Ddl, StagingWriter}
import graft.sources.{EntitySource, FetchRequest}

/** Top-level lifecycle compositions — the engine's control-plane surface
  * (SURVEY.md §3): `/initialDataLoad`, `/refreshData`,
  * `/resetDataPlatform`, `/testExtractionconfigEntities`, `/pingApi`,
  * `/info`. HTTP binding is a deployment concern; these are the
  * handlers.
  *
  * Run reports are merged, not discarded: initial load returns the
  * deploy report AND the load report (the reference merges
  * metadata-refresh + DDL + load into one response, app.py:181-189).
  * When a [[ConfigStore]] is attached, advanced watermarks are persisted
  * after every successful refresh, so a restart resumes from the stored
  * `lastRun` (priorityDataSource.py:218,584-626).
  */
final class Platform(
    spark: SparkSession,
    source: EntitySource,
    registry: SchemaRegistry,
    writer: StagingWriter,
    store: Option[ConfigStore] = None) {

  import Platform.{LoadResponse, ProbeReport}

  private val ddl = new Ddl(spark, registry)
  private val refresh = new RefreshJob(spark, source, writer, registry = Some(registry))

  /** §3.1 `/initialDataLoad`: (re)register metadata, create the account
    * database + typed parent AND child tables from the config's
    * entity+expand deploy list, then a full refresh. */
  def initialDataLoad(
      config: ExtractionConfig,
      metadataXml: Option[String] = None): LoadResponse = {
    metadataXml.foreach { xml =>
      registry.putAll(SchemaRegistry.parseMetadataXml(xml, config.sourceSystem))
    }
    val db = ddl.createDatabase(config.accountId)
    val deploy = ddl.deployConfig(db, config)
    val (report, updated) = refreshData(config, incremental = false)
    LoadResponse(db, deploy, report, updated)
  }

  /** §3.2 `/refreshData` — persists advanced watermarks when a config
    * store is attached. */
  def refreshData(config: ExtractionConfig, incremental: Boolean): (RunReport, ExtractionConfig) = {
    val (report, updated) = refresh.run(config, incremental)
    store.foreach(_.saveWatermarks(updated))
    (report, updated)
  }

  /** §3.3 `/resetDataPlatform`: drop everything, then initial load.
    * Returns dropped table names plus the full load response. */
  def reset(config: ExtractionConfig, metadataXml: Option[String] = None)
      : (Seq[String], LoadResponse) = {
    val droppedStg = writer.dropAll()
    val db = ddl.databaseName(config.accountId)
    val droppedCat =
      if (spark.catalog.databaseExists(db)) ddl.dropAll(db)._1 else Nil
    (droppedStg ++ droppedCat, initialDataLoad(config, metadataXml))
  }

  /** `/testExtractionconfigEntities`: per-entity `$top=1` probes with the
    * reference's {entity, url, result} report shape
    * (priorityDataSource.py:137-145 — `url` here is the simulated
    * request descriptor). */
  def testEntities(config: ExtractionConfig): Seq[ProbeReport] =
    config.entities.map { e =>
      val url = s"${config.uri}${e.entityId}?$$top=1"
      try {
        val n = source.fetch(FetchRequest(e.entityId, top = Some(1))).count()
        ProbeReport(e.entityId, url, if (n >= 1) "200 OK" else "200 EMPTY")
      } catch {
        case ex: Exception => ProbeReport(e.entityId, url, s"ERROR ${ex.getMessage}")
      }
    }

  /** `/pingApi`: connectivity of the engine's externals (app.py:88-118)
    * — here: the Spark session, the warehouse listing, the config store,
    * and optionally a $top=1 source probe. Every check reports false on
    * failure instead of letting the health endpoint itself throw. */
  def ping(probeEntity: Option[String] = None): Map[String, Boolean] = {
    def ok(f: => Any): Boolean =
      try { f; true } catch { case _: Exception => false }
    Map(
      "spark" -> ok(require(!spark.sparkContext.isStopped)),
      "warehouse" -> ok(writer.tables),
      "configStore" -> store.forall(s => ok(s.loadAll())),
      "source" -> probeEntity.forall(e => ok(source.probe(e))))
  }

  /** `/info`: environment echo (app.py:76-85). */
  def info: Map[String, String] = Map(
    "engine" -> "graft",
    "sparkVersion" -> spark.version,
    "catalogEntities" -> registry.list.size.toString)
}

object Platform {

  /** Full response of an initial load / reset: what the reference merges
    * into one JSON (app.py:181-189). */
  final case class LoadResponse(
      database: String,
      deploy: Ddl.DeployReport,
      report: RunReport,
      config: ExtractionConfig)

  /** Per-entity probe outcome (priorityDataSource.py:137-145). */
  final case class ProbeReport(entity: String, url: String, result: String)
}
