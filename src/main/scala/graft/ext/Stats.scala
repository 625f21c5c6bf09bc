package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact order statistics over the corpus — the data-quality report a
  * pipeline publishes per ingest (length distribution per language is
  * the canonical one). Built from rank selection, not an engine
  * quantile function, because the two engines' `percentile`
  * implementations interpolate differently: `PERCENTILE_DISC(p)` is
  * re-derived as "the row whose rank is ⌈p·n/100⌉ under a fully
  * tiebroken ordering", all in integer arithmetic, so Spark and the
  * DuckDB oracle pick the identical row by construction.
  *
  * Scale shape: one row_number window per group (a sort WITHIN each
  * language partition — never a global sort), group counts broadcast
  * back (languages × percentiles is dozens of rows), and the selection
  * filter is a per-row comparison. Exact per-group order statistics
  * cost that per-group sort by nature; at 100 TB the routine
  * monitoring path is `percentile_approx` (one pass, mergeable
  * sketches, no sort) and THIS exact form is for the audited report —
  * it is the one that can be oracle-checked bit-for-bit.
  */
object Stats {

  /** Per-language exact character-length percentiles (PERCENTILE_DISC
    * semantics): for each lang and each p in `ps`, the `n_chars` value
    * at rank ⌈p·n/100⌉ of the (n_chars, doc_id)-ordered group. Output:
    * (lang, p, n_docs, n_chars_at_p), one row per lang × p. */
  def lengthQuantiles(docs: DataFrame, ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles $ps must be in [1, 100]")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    val ranked = docs
      .select(col("lang"), col("doc_id"), length(col("text")).as("n_chars"))
      .withColumn("rn", row_number().over(w))
    val targets = ranked.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .select(col("lang"), col("n"), explode(typedLit(ps)).as("p"))
      .withColumn("target_rn", expr("(p * n + 99) DIV 100"))
    ranked
      .join(broadcast(targets), Seq("lang"))
      .filter(col("rn") === col("target_rn"))
      .select(col("lang"), col("p"), col("n").as("n_docs"),
        col("n_chars").as("n_chars_at_p"))
  }
}
