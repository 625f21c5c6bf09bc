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
  * list, one driver-side top-(B+1) (B+1 small rows — NOT a data-sized
  * collect), one per-word merge rewrite, and a localCheckpoint so the
  * plan does not deepen with the merge count. The interpreted HOF fold
  * in the rewrite runs over vocab-sized data, so CodegenFallback cost
  * is bounded by the vocabulary too.
  *
  * Rounds are BATCHED (standard batched-BPE): each round applies up to
  * `batch` merges whose application order provably cannot matter, so a
  * production merge count (32k) costs ~32k/B Spark job rounds instead
  * of 32k. The batch is the longest prefix of the (count desc, left,
  * right)-sorted pair list that is pairwise symbol-DISJOINT and whose
  * members each create a FRESH symbol string, cut at the first
  * conflicting pair, and trimmed to counts STRICTLY above that
  * conflict's count. Exactly sequential, because:
  *   - a candidate whose concatenation l+r matches ANY recorded
  *     merge's concatenation (any round, or earlier in this batch) is
  *     treated as a conflict: every multi-character symbol in the
  *     corpus is some recorded merge's concatenation, so a kept
  *     member's created symbol string provably does not yet exist —
  *     without this, a merge could mint MORE copies of an existing
  *     symbol via a different split composition ("ab"+"c" and "a"+"bc"
  *     both make "abc") and silently inflate a pre-existing pair's
  *     count between the batch's sequential rounds;
  *   - disjoint merges cannot change each other's pair counts (a merge
  *     only rewrites adjacencies touching its own two symbols, and
  *     freshness means no OTHER pair's symbols can be minted);
  *   - any pair sharing a symbol with the batch sorts at/after the
  *     first conflict, so its count ≤ the conflict's count (= bound);
  *   - a merge only CREATES pairs involving its fresh symbol — each
  *     new pair's occurrences map to old adjacencies touching the
  *     merged symbols, so created-pair counts are ≤ bound, and (by
  *     induction over the batch) stay ≤ bound through the
  *     intermediate sequential states;
  *   - a SELF-pair (l == r) terminates its batch: merging (ab,ab) over
  *     an [ab,ab,ab] run creates (abab,ab) with a count bounded by the
  *     self-pair's OWN count rather than by the conflict bound, so
  *     nothing may sequentially follow it within the round (found by
  *     the aliasing-corpora spec, not by inspection — see the test);
  *   - batch members' counts are strictly > bound, so each would have
  *     won its own sequential round against every conflicting, later,
  *     and created pair; equal-count batch members resolve by the same
  *     (left, right) tiebreak that ordered the batch.
  *
  * Determinism: the winning pair each round breaks ties on
  * (count desc, left, right) — a total order — so the merge table is a
  * function of the corpus alone (batched ≡ sequential is additionally
  * pinned by spec on the hand-worked fixture). No DuckDB oracle:
  * per-round argmax rewriting is not expressible as one SQL query
  * (same rows-only declaration as IVF); exactness is pinned by a
  * hand-worked spec instead. */
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
    * stops early if the corpus runs out of repeated pairs. `batch` is
    * the per-round merge cap (see the object doc: any batch size
    * yields the identical table; it only divides the job count). */
  def train(docs: DataFrame, numMerges: Int = 10, batch: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, numMerges, batch).toDF("rank", "left", "right", "pair_count")
  }

  /** [[train]]'s merge table as the driver-side value it already is
    * (each round collects ≤ batch+1 small rows; the table is numMerges
    * small rows, never data-sized) — the form the ENCODE side consumes
    * as two parallel literals ([[graft.functions.BpePieces]]). */
  def trainMerges(
      docs: DataFrame,
      numMerges: Int,
      batch: Int = 8): Seq[(Int, String, String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numMerges > 0, s"numMerges $numMerges must be positive")
    require(batch > 0, s"batch $batch must be positive")

    // the one corpus-scale stage: word frequencies
    var words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(split(col("word"), "").as("syms"), col("n"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(Int, String, String, Long)]
    // every concatenation ever minted: multi-char symbols in the corpus
    // are a subset of this, so "candidate's l+r not in here" proves the
    // created symbol is fresh (see the freshness bullet in the doc)
    val mintedConcats = scala.collection.mutable.Set.empty[String]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      val want = math.min(batch, numMerges - rank + 1)
      // want+1 rows: the extra row is the safety bound — either the
      // first symbol-conflicting pair or the best pair left out, both
      // of which cap every count the intermediate sequential states
      // could present against the kept batch
      val top = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("n"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(want + 1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        // longest disjoint prefix, cut at the first conflict
        val kept = Seq.newBuilder[(String, String, Long)]
        val used = scala.collection.mutable.Set.empty[String]
        var nKept = 0
        var bound = Option.empty[Long]
        var i = 0
        // same-round freshness: two candidates can mint one string via
        // different splits — tracked separately so a TRIMMED candidate
        // (kept in the scan, dropped below the bound) does not
        // permanently poison the minted set it never actually joined
        val scanMinted = scala.collection.mutable.Set.empty[String]
        // the global argmax is ALWAYS applied — sequential does exactly
        // that — but if ITS concat re-mints an existing symbol (a prior
        // concat via a different split, e.g. prior "ab"+"c" then
        // "a"+"bc"), its merge can inflate other pairs' counts and the
        // batch must stay singleton
        var headFresh = true
        var selfStop = false
        while (i < top.length && bound.isEmpty && !selfStop && nKept < want) {
          val (l, r, c) = top(i)
          if (nKept == 0) {
            headFresh = !mintedConcats(l + r)
            kept += ((l, r, c)); nKept += 1
            used += l; used += r; scanMinted += (l + r)
            i += 1
            // a SELF-pair (l == r) creates pairs bounded by its OWN
            // count, not by the conflict bound — e.g. merging (ab,ab)
            // over [ab,ab,ab] creates (abab,ab), which can tie a later
            // member and win the tiebreak. It must be the batch's LAST
            // member (nothing sequential runs after it this round).
            // For l != r merges, every created pair maps onto a pair
            // sharing one of the merged symbols, which is either
            // conflict-bounded or nonexistent.
            selfStop = l == r
          } else if (!headFresh ||
            used(l) || used(r) || mintedConcats(l + r) || scanMinted(l + r)) {
            // conflict = non-fresh head, shares a symbol with the
            // batch, or would re-mint an existing/just-minted string
            bound = Some(c)
          } else {
            kept += ((l, r, c)); nKept += 1
            used += l; used += r; scanMinted += (l + r)
            i += 1
            selfStop = l == r
          }
        }
        // a terminating self-pair still needs the bound for the TRIM of
        // the members kept before it
        if (selfStop && bound.isEmpty && i < top.length) bound = Some(top(i)._3)
        // no conflict but a row beyond `want` was fetched: ITS count
        // is the bound. No conflict and nothing beyond: the fetch was
        // every pair that exists — no bound needed.
        if (bound.isEmpty && top.length > want) bound = Some(top(want)._3)
        val keptSeq = kept.result()
        // kept[0] is the global argmax — always sequential-correct;
        // the tail only survives strictly above the bound
        val safe = keptSeq.head +: (bound match {
          case None => keptSeq.tail
          case Some(b) => keptSeq.tail.takeWhile(_._3 > b)
        })
        safe.foreach { case (l, r, cnt) =>
          merges += ((rank, l, r, cnt)); rank += 1
          mintedConcats += (l + r) // only APPLIED merges mint symbols
        }
        // one rewrite pass applies the whole batch (disjoint, so the
        // in-word composition order is immaterial — rank order kept
        // for readability); one checkpoint per ROUND, not per merge
        words = words
          .select(safe.foldLeft(col("syms")) { case (syms, (l, r, _)) =>
            applyMerge(syms, l, r)
          }.as("syms"), col("n"))
          .localCheckpoint(true)
      }
    }
    merges.result()
  }
}
