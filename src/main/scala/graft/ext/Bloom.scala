package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered decontamination — the scale path for
  * benchmark scrubbing when the eval n-gram set outgrows a broadcast.
  *
  * [[Dedup.decontaminate]] broadcasts the distinct eval n-gram hashes
  * and streams the corpus through a broadcast hash join: the right call
  * while the eval side fits an executor. A decontamination sweep against
  * a large benchmark battery (hundreds of eval sets × up to millions of
  * n-grams each) can exceed that, and the fallback — a shuffle join —
  * would shuffle EVERY corpus n-gram: at 100 TB that is the single
  * largest shuffle in the pipeline, moved for rows of which only a tiny
  * fraction match.
  *
  * The Bloom plan (the same shape Spark's own runtime row-level filtering
  * uses, and Broder/Mitzenmacher 2004's classic distributed-join trick):
  *
  *   1. build a Bloom bitset over the eval hashes DISTRIBUTED — each
  *      hash explodes into its k bit positions, positions aggregate into
  *      64-bit words by `bit_or` (map-side combinable), and only the
  *      finished words (bits/64 rows, e.g. 16 Ki longs for 2²⁰ bits)
  *      are collected: driver state is sketch-sized by construction,
  *      never proportional to the eval set;
  *   2. pre-filter the corpus n-gram stream with the bitset — a NARROW
  *      per-row test (no shuffle, no join, proven shuffle-free in the
  *      spec), composed purely from codegen'd built-ins: seeded
  *      `xxhash64(h, i)` positions, `shiftright`/`pmod` bit addressing,
  *      and `element_at` over two single-literal arrays (the bitset and
  *      a 64-entry mask table — indexed masks instead of a variable
  *      shift, which the functions API only offers with literal shift
  *      amounts);
  *   3. exact-confirm the survivors against the true eval set. Bloom
  *      filters have NO false negatives, so survivors ⊇ true matches
  *      and the confirm join restores exactness: the result is
  *      bit-identical to [[Dedup.decontaminate]] (spec-pinned). Only
  *      survivors — true hits plus the ~(1−e^(−kn/m))^k false-positive
  *      sliver — ever reach the shuffle.
  *
  * The confirm join carries no broadcast hint: at fixture scale AQE
  * broadcasts it anyway, at 100 TB it degrades to a shuffle join whose
  * corpus side is the post-filter sliver, not the corpus.
  */
object Bloom {

  /** Default geometry: 2²⁰ bits (128 KiB bitset) / 5 hashes — false
    * positive rate ≈ 0.6% at 10⁵ members, ≈ 2.2% at 2×10⁵. Size `bits`
    * to ~10× the expected member count for sub-percent FPR. */
  val DefaultBits: Int = 1 << 20
  val DefaultK: Int = 5

  /** The k bit positions of hash column `h` — seeded `xxhash64(h, i)`
    * folded into [0, bits). MUST be the same expression on the build and
    * probe sides; both call this. */
  private def positions(h: Column, bits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(h, lit(i)), lit(bits.toLong)))

  /** Single-bit masks indexed by bit-in-word — `element_at(masks, b+1)`
    * stands in for `1L << b` (no column-amount shift in the API). */
  private val maskTable: Column =
    typedLit((0 until 64).map(b => 1L << b).toIndexedSeq)

  /** Build the bitset over a frame of `h: long` hash rows, distributed:
    * explode each hash's k positions, OR partial words map-side, collect
    * only the bits/64 finished words. */
  def buildBitset(hashes: DataFrame, bits: Int = DefaultBits, k: Int = DefaultK): Array[Long] = {
    require(bits > 0 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")
    require(k > 0, s"k must be positive, got $k")
    val words = hashes
      .select(explode(array(positions(col("h"), bits, k): _*)).as("pos"))
      .select(
        shiftright(col("pos"), 6).cast("int").as("w"),
        element_at(maskTable, (pmod(col("pos"), lit(64L)) + 1).cast("int")).as("m"))
      .groupBy(col("w"))
      .agg(expr("bit_or(m)").as("m"))
      .collect()
    val arr = new Array[Long](bits / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test of hash column `h` against a built bitset: true iff
    * all k addressed bits are set. May return true for non-members
    * (false positives); NEVER false for members. Pure codegen'd
    * built-ins over two literal arrays — one expression node each, the
    * SignLshBuckets lesson. */
  def mightContain(words: Array[Long], h: Column, k: Int = DefaultK): Column = {
    require(words.nonEmpty, "empty bitset")
    val bits = words.length * 64
    val ws = typedLit(words.toIndexedSeq)
    positions(h, bits, k)
      .map { pos =>
        val word = element_at(ws, (shiftright(pos, 6) + 1).cast("int"))
        val mask = element_at(maskTable, (pmod(pos, lit(64L)) + 1).cast("int"))
        word.bitwiseAND(mask) =!= 0L
      }
      .reduce(_ && _)
  }

  /** Benchmark decontamination, Bloom-pre-filtered: same contract and
    * BIT-IDENTICAL output as [[Dedup.decontaminate]] (one row per
    * training doc: doc_id, n_eval_ngrams, contaminated), different
    * scale shape — the corpus n-gram stream is pre-filtered by the
    * bitset (narrow, shuffle-free) and only survivors reach the exact
    * confirm join, so the eval set never needs to broadcast and the
    * corpus never shuffles in full. */
  def decontaminateBloom(
      train: DataFrame,
      evalDocs: DataFrame,
      n: Int = 13,
      bits: Int = DefaultBits,
      k: Int = DefaultK): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    // consumed twice (bitset build action + confirm join) — pay the
    // eval-side scan once; released below once the report is eager
    val evalHashes = evalDocs
      .select(explode(transform(Dedup.shingles(col("text"), n), s => xxhash64(s))).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val words = buildBitset(evalHashes, bits, k)
      val survivors = Dedup.shingleHashes(train, n)
        .filter(mightContain(words, col("h"), k))
      // the exact confirm + report tail is Dedup's own — bit-identity
      // with decontaminate is structural, not a parallel copy
      Dedup.evalHitReport(train, survivors.join(evalHashes, "h"))
        // eager result so the cached eval hashes can be released here —
        // the sourceDrift ownership convention (Stats.scala)
        .localCheckpoint(true)
    } finally evalHashes.unpersist(blocking = false)
  }
}
