package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the step that consumes the
  * corpus vocabulary ([[TextStats.vocabulary]] is its input shape) and
  * produces the merge table a tokenizer ships with.
  *
  * Algorithm (classic BPE, Sennrich et al. 2016): start from
  * single-character symbols; each round, count adjacent symbol pairs
  * across the corpus (weighted by word frequency), merge the most
  * frequent pair everywhere (leftmost, non-overlapping), repeat.
  *
  * Scale shape — the part that matters at 100 TB: the ONLY stage that
  * touches the corpus is the initial (word, count) aggregation, a
  * map-side-combinable groupBy identical to the vocabulary operator.
  * Every merge round runs over that word list, whose size is bounded
  * by the language's vocabulary, not the corpus (the standard
  * tokenizer-training structure — HuggingFace trains from word counts
  * the same way). Per round: one pair-count aggregate over the word
  * list, one driver-side top-1 (a single small row — NOT a data-sized
  * collect), one per-word merge rewrite, and a localCheckpoint so the
  * plan does not deepen with the merge count. The interpreted HOF fold
  * in the rewrite runs over vocab-sized data, so CodegenFallback cost
  * is bounded by the vocabulary too.
  *
  * Determinism: the winning pair each round breaks ties on
  * (count desc, left, right) — a total order — so the merge table is a
  * function of the corpus alone. No DuckDB oracle: per-round argmax
  * rewriting is not expressible as one SQL query (same rows-only
  * declaration as IVF); exactness is pinned by a hand-worked spec
  * instead. */
object BpeTrain {

  /** One merge round applied to a symbol array: every leftmost,
    * non-overlapping adjacent (a, b) becomes the single symbol a+b.
    * Fold state = (emitted prefix, pending symbol): merging leaves the
    * merged symbol PENDING so it can never re-merge with the next
    * element in the same round. */
  private[graft] def applyMerge(syms: Column, a: String, b: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("prev"))
    val step = (acc: Column, s: Column) =>
      when(acc.getField("prev").isNull,
        struct(acc.getField("out").as("out"), s.as("prev")))
        .when(acc.getField("prev") === lit(a) && s === lit(b),
          struct(acc.getField("out").as("out"), lit(a + b).as("prev")))
        .otherwise(struct(
          concat(acc.getField("out"), array(acc.getField("prev"))).as("out"),
          s.as("prev")))
    val fin = (acc: Column) =>
      when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev"))))
    aggregate(syms, init, step, fin)
  }

  /** Adjacent symbol pairs of a word, each weighted by the word's
    * corpus frequency downstream. */
  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Train `numMerges` BPE merges over whitespace words. Returns the
    * merge table (rank, left, right, pair_count) in merge order —
    * stops early if the corpus runs out of repeated pairs. */
  def train(docs: DataFrame, numMerges: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, numMerges).toDF("rank", "left", "right", "pair_count")
  }

  /** [[train]]'s merge table as the driver-side value it already is
    * (each rank is a driver top-1; the table is numMerges small rows,
    * never data-sized) — the form the ENCODE side consumes as two
    * parallel literals ([[graft.functions.BpePieces]]). */
  def trainMerges(docs: DataFrame, numMerges: Int): Seq[(Int, String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numMerges > 0, s"numMerges $numMerges must be positive")

    // the one corpus-scale stage: word frequencies
    var words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(split(col("word"), "").as("syms"), col("n"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val top = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some((l, r, cnt)) =>
          merges += ((rank, l, r, cnt))
          words = words
            .select(applyMerge(col("syms"), l, r).as("syms"), col("n"))
            .localCheckpoint(true)
          rank += 1
      }
    }
    merges.result()
  }
}
