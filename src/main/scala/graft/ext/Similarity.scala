package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (`array<float>`
  * vectors).
  *
  * Two paths, mirroring how a 100 TB deployment is actually built:
  *
  *   - [[cosTopK]] — the exact baseline: broadcast the (small) query
  *     set, stream the corpus once, keep top-k per query. Linear in the
  *     corpus, no shuffle of the corpus itself; the only exchange is the
  *     final top-k-per-query window over `corpus × |queries|` scored
  *     rows. This is the right plan whenever |queries| ≪ corpus.
  *   - [[ivfTopK]] — the scale path: IVF-style bucketing. Vectors are
  *     pre-assigned to coarse clusters (here: the `label` column plays
  *     the quantizer cell, as a trained k-means would); a query probes
  *     only the `nprobe` nearest cluster centroids and scores vectors in
  *     those cells. Corpus scanned ≈ nprobe/k of the data; the centroid
  *     table is tiny and broadcast. Recall vs the exact baseline is
  *     asserted in tests (it is approximate by design, so its harness
  *     check is rows-only, not hash-equality).
  *
  * All arithmetic is double (floats widened first), computed with
  * higher-order functions inside codegen — no UDFs, no driver collect.
  */
object Similarity {

  /** Widen array<float> → array<double> once, so all downstream
    * arithmetic is double-precision. */
  private def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product via higher-order functions — the
    * built-in baseline. Kept for reference/testing; the hot paths use
    * the codegen'd [[graft.functions.VectorDot]] (bit-identical result,
    * same left-to-right summation, no interpreted lambda dispatch). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normHof(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Native codegen'd vector ops (graft.functions.GraftFunctions). */
  def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.vecDot(a, b)
  def norm(a: Column): Column = graft.functions.GraftFunctions.vecNorm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine for every query vector (`vec_id % queryMod =
    * 0` picks the query set). Output is rank-based — (query_id,
    * neighbor_id, rank) — with a deterministic vec_id tiebreak, so the
    * result is stable under float round-off and safe to hash-compare.
    * Self-matches are excluded. */
  def cosTopK(emb: DataFrame, k: Int = 5, queryMod: Int = 50): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    // norms precomputed once per vector — never recompute them per PAIR
    val queries = emb
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("q"))
      .withColumn("nq", norm(col("q")))
    val corpus = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("q"), col("v")) / (col("nq") * col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ `threshold`, found via
    * random-hyperplane LSH bucketing — vectors are bucketed by the sign
    * pattern of `planes` pseudo-random projections (deterministic:
    * hyperplane components derive from xxhash64(plane, dim)), candidate
    * pairs share a bucket, then exact cosine verifies. The bucket join
    * replaces all-pairs; identical/near-identical vectors always share a
    * bucket, while recall for borderline pairs is tunable (single-table
    * sign-LSH recall at cos θ is (1−θ/π)^planes — production raises it
    * with multiple hash tables or multi-probe; the exact-cosine check
    * keeps PRECISION independent of LSH luck either way). */
  def embedNeardup(emb: DataFrame, threshold: Double = 0.9, planes: Int = 8): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val v = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
    // projection p of vector x: Σ_d h(p,d)·x_d with h a deterministic
    // pseudo-random ±1 from the bit parity of xxhash64(p, d)
    val sign = (p: Int) => {
      val proj = aggregate(
        zip_with(col("v"),
          transform(sequence(lit(0), lit(63)),
            d => when(xxhash64(lit(p), d).bitwiseAND(1) === 1, 1.0).otherwise(-1.0)),
          (x, h) => x * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    }
    val bucketed = v.withColumn("bucket",
      concat_ws("", (0 until planes).map(sign): _*))
    val l = bucketed.select(col("bucket"), col("vec_id").as("a_id"),
      col("v").as("va"), col("nv").as("na"))
    val r = bucketed.select(col("bucket"), col("vec_id").as("b_id"),
      col("v").as("vb"), col("nv").as("nb"))
    l.join(r, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Centroid of each quantizer cell (avg per dimension). Returned as
    * (label, centroid array<double>). */
  def centroids(emb: DataFrame): DataFrame = {
    val dim = 64
    val sums = (0 until dim).map(d =>
      sum(element_at(col("embedding"), d + 1).cast("double")).as(s"s$d"))
    emb.groupBy(col("label"))
      .agg(count(lit(1)).as("cnt"), sums: _*)
      .select(col("label"),
        array((0 until dim).map(d => col(s"s$d") / col("cnt")): _*).as("centroid"))
  }

  /** IVF approximate top-k: probe the `nprobe` nearest centroids, score
    * only vectors in the probed cells. Same output shape as [[cosTopK]]
    * plus the probed flag-free rank; approximate by design. */
  def ivfTopK(emb: DataFrame, k: Int = 5, queryMod: Int = 50, nprobe: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val cents = centroids(emb)
    val queries = emb
      .filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("query_id"), asDouble(col("embedding")).as("q"))

    // probe list: nprobe nearest centroids per query (centroid table is
    // tiny — k cells — so this is a broadcast nested loop + window)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("c_cos").desc, col("label"))
    val probes = queries
      .join(broadcast(cents), lit(true))
      .withColumn("c_cos", cosine(col("q"), col("centroid")))
      .withColumn("p", row_number().over(wProbe))
      .filter(col("p") <= nprobe)
      .select(col("query_id"), col("q"), col("label"))

    // score only the probed cells: corpus join on the cell id
    val corpus = emb.select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    corpus
      .join(broadcast(probes.withColumn("nq", norm(col("q")))), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("q"), col("v")) / (col("nq") * col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }
}
