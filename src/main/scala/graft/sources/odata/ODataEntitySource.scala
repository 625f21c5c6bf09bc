package graft.sources.odata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.{EntitySource, FetchRequest}

/** EntitySource over the DSv2 `graft-odata` connector: each entity maps
  * to a page directory under `rootDir/<ENTITY>/` (the offline stand-in
  * for `uri + EntityID`). The refresh pipeline runs UNCHANGED over this
  * source — pushdown happens through the connector's ScanBuilder
  * (filter → `$filter`, top → `$top`, pruning → `$select`) instead of
  * the parquet simulator's Catalyst filters.
  *
  * Expand: OData serves children inline; the page fixtures for expanded
  * entities carry the subform arrays in their JSON rows. Offline we keep
  * the connector scalar (the typed nested-schema path is exercised by
  * ParquetSimSource); a production build would extend inferSchema with
  * array-of-struct support and pass `$expand` the same way.
  */
final class ODataEntitySource(
    spark: SparkSession,
    rootDir: String) extends EntitySource {

  override def fetch(req: FetchRequest): DataFrame = {
    require(req.expand.isEmpty,
      "offline graft-odata fixtures are scalar; use ParquetSimSource for expand")
    var df = spark.read.format("graft-odata")
      .option("path", s"$rootDir/${req.entityId.toUpperCase}")
      .load()
    req.filter.foreach { case (field, ts) =>
      val c = col(field.toLowerCase)
      df = df.filter(if (req.exclusive) c > lit(ts) else c >= lit(ts))
    }
    req.top.foreach(n => df = df.limit(n))
    df
  }
}
