package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over operator-derived edge sets — the
  * family beyond [[Dedup.dupComponents]]' connected components. The
  * first member is PageRank over the near-dup pair graph: inside a
  * duplication cluster the highest-rank node is the "hub" copy that
  * everything else points at (mirror roots, template sources), a
  * centrality signal the [[Dedup.canonicalPick]] quality policy can't
  * see. (Page et al. 1999; damping 0.85 is the published default.)
  *
  * All arithmetic is EXACT INTEGER in ppm rank mass: ranks start at
  * 1,000,000 per node; a node's out-contribution is `rank div deg`
  * (integral division — deterministically lossy, identically lossy in
  * DuckDB's `//`), and the update is
  * `150000 + damping·Σcontrib div 1000`. Both engines running this
  * recurrence agree bit-for-bit, so a fixed-iteration PageRank is
  * hash-comparable — no float fixpoint, no tolerance.
  */
object Graph {

  /** Fixed-iteration integer PageRank over an UNDIRECTED edge list
    * (`a_id`, `b_id`). Nodes = edge endpoints (an isolated doc has no
    * rank to receive — callers union it back at the base mass if they
    * need full coverage). Self-loops and duplicate edges are the
    * caller's contract; the near-dup pair sets are already `a < b`
    * distinct.
    *
    * Scale shape: per iteration, ONE shuffle — the contribution
    * groupBy on the destination node (map-side combinable); the
    * edges⋈ranks join keys both sides on `src`, so the directed edge
    * frame's HashPartitioning(src) is established once and REUSED by
    * every iteration's join (edges and degrees are persisted across
    * iterations — at cluster scale these are the big frames, scanned
    * `iters` times). Each iteration materializes its rank frame and
    * releases the previous one, so lineage stays one-iteration deep —
    * the recompute-from-scratch O(iters²) trap of naive loop-built
    * plans. Rank-mass sums stay far inside BIGINT: Σ over a node's
    * in-neighbors of (≤ base·n div deg) is bounded by total mass
    * n·10⁶ — overflow needs ~10¹² nodes on one destination. */
  def pagerank(
      edges: DataFrame, iters: Int = 5, dampingPpt: Int = 850): DataFrame = {
    require(iters >= 1, s"iteration count $iters must be positive")
    require(dampingPpt >= 0 && dampingPpt <= 1000,
      s"dampingPpt $dampingPpt must be in [0, 1000]")
    val directed = edges
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = directed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var ranks = deg.select(col("src").as("node"), lit(1000000L).as("rank_ppm"))
      var prev: Option[DataFrame] = None
      for (_ <- 1 to iters) {
        val next = directed
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .join(deg, Seq("src"))
          .select(col("dst").as("node"), expr("rank_ppm DIV deg").as("c"))
          .groupBy(col("node"))
          .agg(sum(col("c")).as("s"))
          .select(col("node"),
            (lit(150000L) + expr(s"$dampingPpt * s DIV 1000")).as("rank_ppm"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count() // materialize before releasing the input lineage
        prev.foreach(_.unpersist(blocking = false))
        prev = Some(next)
        ranks = next
      }
      // detach the result from the per-iteration cache so the finally
      // below can release everything the loop pinned
      val out = ranks.join(deg.withColumnRenamed("src", "node"), Seq("node"))
        .select(col("node"), col("deg"), col("rank_ppm"))
        .localCheckpoint(true)
      prev.foreach(_.unpersist(blocking = false))
      out
    } finally {
      directed.unpersist(blocking = false)
      deg.unpersist(blocking = false)
    }
  }
}
