package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Scale-adaptive scan widening (optimization guide §2.5 "input skew:
  * one huge unsplittable file").
  *
  * The driver fixtures are single-file, SINGLE-ROW-GROUP parquet: Spark
  * plans byte-range splits, but a parquet split only yields the row
  * groups whose midpoint it contains, so every fixture scan DELIVERS
  * its rows through one task — and any per-row work fused into the
  * scan stage (normalize regexes, shingling, tokenize explodes, hash
  * columns) runs single-threaded regardless of core count (r15
  * measurement: the x62 normalize+shingle stages, the x239 md5+explode
  * stage and every text scan ran tasks=1 at local[32]).
  *
  * [[widen]] redistributes such a scan by a HASH of a caller-named
  * unique key before the heavy projections: deterministic row
  * placement (no round-robin, which pays a full local sort of the
  * payload per SPARK-23207's retry-determinism contract), and a no-op
  * whenever the planned scan parallelism already reaches the session's
  * default parallelism — at production scale a table is many splits
  * wide and this never inserts an exchange. Never keyed on anything a
  * result could depend on: every consumer is either keyed-aggregate or
  * join shaped, so row placement is semantics-free (the --twice
  * determinism gate and the DuckDB oracle pin that).
  */
object Scans {
  def widen(df: DataFrame, key: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else df.repartition(p, col(key))
  }
}
