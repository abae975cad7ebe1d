package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics for corpus curation. Host-level PageRank is the
 * classic crawl-quality signal (the Common Crawl host ranking lineage):
 * a domain linked by many well-linked domains earns rank, and rank-poor
 * hosts are crawl/keep deprioritized. Runs on any (src, dst) edge frame
 * — e.g. TextMetrics.extractUrls output joined source-domain → linked
 * domain.
 *
 * The iteration is the standard damped power method with dangling-mass
 * redistribution:
 *
 *   r_{t+1}(v) = (1-d)/N + d * ( sum_{u->v} r_t(u)/outdeg(u) + D_t/N )
 *
 * where D_t is the total rank of dangling nodes (no out-edges) and
 * multi-edges count multiplicity. Each iteration ROUNDS ranks to 10
 * decimals: per-iteration float wobble from parallel sum order is
 * ~1e-13, so rounding pins every engine and partitioning to identical
 * ranks while leaving 6+ meaningful digits — the same
 * determinism-by-rounding contract as Similarity.kmeansAssign.
 *
 * Scale shape: one edges⋈ranks join (shuffle on src) + one dst
 * aggregation per iteration — the canonical distributed PageRank; N and
 * the dangling mass enter as 1-row aggregate subtrees (no count()
 * actions, nothing driver-side); lineage truncates via localCheckpoint
 * every few rounds (the connectedComponents contract) so plan depth
 * stays bounded at any iteration count.
 */
object Graph {

  /**
   * PageRank over `edges` (srcCol, dstCol node ids of any orderable
   * type): returns (node, rank) for every node appearing as a source or
   * destination, after exactly `iters` power iterations at damping `d`.
   * Rank mass sums to ~1; results are deterministic across engines and
   * partitionings (10-decimal per-iteration rounding).
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      checkpointEvery: Int = 8): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nTot = nodes.select(count(lit(1)).cast("double").as("n"))
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("double").as("deg"))
    var ranks = nodes.crossJoin(nTot)
      .select(col("node"), round(lit(1.0) / col("n"), 10).as("rank"))
    for (t <- 0 until iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("deg")).as("s"))
      val dangling = ranks
        .join(outdeg, Seq("node"), "left_anti")
        .select(coalesce(sum(col("rank")), lit(0.0)).as("m"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(nTot).crossJoin(dangling)
        .select(col("node"),
          round(lit(1.0 - damping) / col("n")
            + lit(damping) * (coalesce(col("s"), lit(0.0)) + col("m") / col("n")),
            10).as("rank"))
      // bound plan depth: each round otherwise stacks 3 joins of lineage
      if ((t + 1) % checkpointEvery == 0 && t + 1 < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
