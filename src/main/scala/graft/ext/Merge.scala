package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CDC apply — the latest-row-wins MERGE that keeps a warehouse
  * dimension current from a change feed. The reference's refresh cycle
  * reaches the same end state by staging + full replace
  * (`sqlDwh.py`'s staging→promote); this is the incremental form: a
  * batch of keyed update/insert rows lands ON TOP of the current
  * snapshot, duplicate keys within the batch resolve to the highest
  * change-sequence, and untouched rows pass through. The SCD2 sibling
  * ([[Sessions.changeHistory]]) keeps every version; this keeps ONE —
  * the "type 1" half of the dimension-maintenance pair.
  */
object Merge {

  /** Apply `updates` over `current`: per key, the surviving row is the
    * one with the highest `seqCol` — current rows rank at sequence 0,
    * so any update beats the snapshot, inserts (keys absent from
    * `current`) survive trivially, and a key the batch never touched
    * keeps its snapshot row. `updates` must carry the same columns as
    * `current` plus `seqCol` with values ≥ 1, unique per key (the CDC
    * feed's change sequence — ties between two updates of one key
    * would make the survivor arbitrary, so the contract requires the
    * feed to disambiguate, exactly as a real CDC log's LSN does).
    *
    * Scale shape: ONE shuffle on `key`; the rank-1 filter rewrites to
    * a partial WindowGroupLimit below the exchange (the x56/x66
    * shape), so each map task forwards at most one candidate row per
    * key it sees — the exchange moves O(keys), not snapshot + feed.
    * The snapshot never joins against itself and the feed is streamed,
    * not collected. */
  def latestWinsMerge(
      current: DataFrame, updates: DataFrame, key: String,
      seqCol: String): DataFrame = {
    val all = current.withColumn(seqCol, lit(0L))
      .unionByName(updates.withColumn(seqCol, col(seqCol).cast("long")))
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
