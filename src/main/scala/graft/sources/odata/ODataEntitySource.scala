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
  * Expand: OData serves children inline, and the connector infers
  * array-of-record columns as ArrayType(StructType) — exactly the
  * `<SUB>_SUBFORM` shape Normalizer explodes. A fetch WITHOUT the
  * expand drops the subform columns (the no-`$expand` request), which
  * column pruning turns into a `$select` that never reads them.
  */
final class ODataEntitySource(
    spark: SparkSession,
    rootDir: String) extends EntitySource {

  override def fetch(req: FetchRequest): DataFrame = {
    var df = spark.read.format("graft-odata")
      .option("path", s"$rootDir/${req.entityId.toUpperCase}")
      .load()

    // parity with the request surface: only requested subforms arrive
    val wanted = req.expand.map(s => s"${s.toUpperCase}_SUBFORM").toSet
    val subformCols = df.columns.filter(_.toUpperCase.endsWith("_SUBFORM"))
    val missing = wanted.filterNot(w => subformCols.exists(_.equalsIgnoreCase(w)))
    require(missing.isEmpty,
      s"entity ${req.entityId}: fixture pages carry no subform(s) $missing")
    df = df.drop(subformCols.toIndexedSeq.filterNot(c => wanted.exists(_.equalsIgnoreCase(c))): _*)

    req.filter.foreach { case (field, ts) =>
      val c = col(field.toLowerCase)
      df = df.filter(if (req.exclusive) c > lit(ts) else c >= lit(ts))
    }
    req.top.foreach(n => df = df.limit(n))
    df
  }
}
