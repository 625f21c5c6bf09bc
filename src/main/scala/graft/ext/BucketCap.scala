package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucket-size guard for the LSH candidate self-joins (MinHash bands,
  * SimHash bands, sign-LSH tables). A degenerate bucket of B members
  * contributes B²/2 candidate pairs inside ONE join partition, so a
  * single boilerplate-heavy bucket at 100 TB turns the "never all-pairs"
  * candidate join quadratic. The guard counts bucket sizes and DROPS
  * buckets above `maxBucket`, with a report of what was dropped.
  *
  * Dropping (vs salting) is the right semantics for near-dup LSH: an
  * over-full bucket is a near-universal feature (a boilerplate shingle
  * band, a common SimHash byte, a dense LSH cell) with no discriminative
  * signal — true near-dup pairs share MANY independent buckets (16
  * MinHash bands, 24 sign-LSH tables, 4 SimHash bands), so losing one
  * shared bucket almost never loses a pair, while salting would still
  * compute all B²/2 pairs (spread across tasks, but all still paid for).
  * Fully-identical documents are caught by exact dedup regardless.
  *
  * The count is a window over the bucket key — the same hash
  * partitioning the downstream self-join shuffles on, so no extra scan
  * of the banded frame and a reusable exchange.
  */
object BucketCap {

  /** `banded` filtered to buckets with at most `maxBucket` members. */
  def keepSmall(banded: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    withSize(banded, keys)
      .filter(col("__bucket_n") <= maxBucket)
      .drop("__bucket_n")

  /** The dropped buckets: key columns + `bucket_size`, one row each —
    * surface this next to the pair output so capping is never silent. */
  def droppedReport(banded: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame =
    withSize(banded, keys)
      .filter(col("__bucket_n") > maxBucket)
      .select(keys.map(col) :+ col("__bucket_n").as("bucket_size"): _*)
      .distinct()

  private def withSize(banded: DataFrame, keys: Seq[String]): DataFrame =
    banded.withColumn("__bucket_n",
      count(lit(1)).over(Window.partitionBy(keys.map(col): _*)))
}
