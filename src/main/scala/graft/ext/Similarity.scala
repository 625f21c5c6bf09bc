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
