package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for each left row, attach the single nearest right
  * row with the same key: the most recent at-or-before (`backward`)
  * or the earliest at-or-after (`forward`). Spark has no native as-of
  * operator (SURVEY.md §2.12); the naive formulations are a range
  * theta-join (quadratic per key) or a per-left-row subquery. This is
  * the scalable composition:
  *
  *   1. tag both sides and UNION them on (key, time) — one narrow frame;
  *   2. one window pass per key ordered by (time, side) — ascending
  *      for backward, descending time for forward: `last_value
  *      (ignoreNulls)` of the right-side payload gives every row the
  *      nearest right payload in the scan direction;
  *   3. keep the left rows.
  *
  * Cost: ONE shuffle on the key (the window partition), no join at all —
  * the same plan shape Spark picks for any windowed aggregation, so it
  * survives 100×. Skewed keys hot-spot one window partition exactly as
  * any per-key window does; salt the key upstream if one key dominates.
  *
  * Right-side ties on (key, time): the row with the greatest
  * `rightOrder` tiebreak wins in BOTH directions (stable deterministic
  * order).
  *
  * NULL right times are dropped up front: Spark's NULL ordering would
  * otherwise sort a null-time right row to one end of the scan and
  * attach it as "older/newer than all" — violating the time contract
  * (and DuckDB orders NULLs oppositely, so the result would also be
  * engine-dependent). A left row with a NULL time keeps its row and
  * gets a NULL payload (nothing can be at-or-before/after an unknown
  * time) — explicit in the projection, because the descending forward
  * scan sorts null-time left rows LAST where they would otherwise see
  * every right row.
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightOrder: Seq[String] = Nil): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightOrder, forward = false)

  /** Forward as-of: earliest right row with right.time >= left.time.
    * For a STRICTLY-after join, pass a left time shifted by +1
    * microsecond (the mirror of the backward t−1 idiom). */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightOrder: Seq[String] = Nil): DataFrame =
    asof(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightOrder, forward = true)

  private def asof(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightOrder: Seq[String],
      forward: Boolean): DataFrame = {

    val leftCols = left.columns.toSeq
    // ALL payload columns ride in ONE struct, filled by ONE
    // last(ignoreNulls) pass — per-column windows would see through a
    // NULL payload value to an older right row and stitch values from
    // two different right rows; the struct is atomic, so the attached
    // payload always comes from exactly one right row (whose individual
    // fields may legitimately be null).
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    // side flag orders right (0) before left (1) at equal times in both
    // scan directions, so a right row AT the left row's timestamp is
    // visible to it (<= backward, >= forward)
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__time", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col("__key"), col("__time"), col("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("__r"): _*)
    val r = right
      .filter(col(rightTime).isNotNull)
      .withColumn("__key", col(rightKey))
      .withColumn("__time", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col("__key"), col("__time"), col("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightPayload.map(c => col(c).as(c)): _*).as("__r"): _*)

    // backward scans time ascending (latest right <= t is scanned
    // last); forward scans descending (earliest right >= t is scanned
    // last). Side asc keeps the equal-time right visible; rightOrder
    // asc makes the max-tiebreak right row the one scanned last among
    // (key, time) ties in both directions.
    val timeOrd = if (forward) col("__time").desc else col("__time").asc
    val ordered = Window.partitionBy(col("__key"))
      .orderBy(Seq(timeOrd, col("__side").asc) ++
        rightOrder.map(c => col("__r").getField(c).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(ordered))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c =>
          when(col("__time").isNotNull, col("__r").getField(c)).as(c)): _*)
  }
}
