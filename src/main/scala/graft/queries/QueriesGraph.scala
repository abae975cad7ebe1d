package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}
import graft.QShared._

/** link-graph gates (PageRank, HITS, k-core, LPA, triangles, ...) — one `queries` entry per gate with its DuckDB oracle in
 * `oracles` (same names, same column aliases, same rounding; the
 * SparkEntry contract). Split out of the SparkEntry monolith so an
 * edit to one family can never touch another family's oracle text. */
private[graft] object QueriesGraph {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_hops" -> ((s, dir) => {
      // crawl-frontier depth: BFS hop distance from seed nodes 0..9
      // along edge direction on the shared 997-node orders graph,
      // 6 relaxation rounds, unrolled-MATERIALIZED oracle
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"), (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.hopDistance(e, "src", "dst",
          s.range(10).select(col("id").as("seed")), "seed", maxHops = 6)
        .orderBy("node")
    }),
    "graph_pagerank" -> ((s, dir) => {
      // host-level PageRank shape on a deterministic 997-node multigraph
      // derived from orders keys; 5 damped power iterations with
      // dangling-mass redistribution, exactly replayed by unrolled CTEs
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"), (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.pageRank(e, "src", "dst", iters = 5)
        .orderBy("node")
    }),
    "graph_triangles" -> ((s, dir) => {
      // triangle counts + clustering coefficient on the same 997-node
      // multigraph as graph_pagerank; engine runs the degree-ordered
      // orientation, the oracle the independent a<b<c triple join
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"), (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.triangleCounts(e, "src", "dst")
        .orderBy("node")
    }),
    "graph_kcore" -> ((s, dir) => {
      // k-core peel on the 997-node orders multigraph (k=21 → 908
      // survivors after a real multi-round cascade); the oracle unrolls
      // the peel to a fixed-round CTE chain (idempotent past fixpoint,
      // so the unroll count only needs to be an upper bound)
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"),
        (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.kCore(e, "src", "dst", k = 21)
        .orderBy("node")
    }),
    "graph_assort" -> ((s, dir) => {
      // degree assortativity of the orders graph: hubs-to-hubs or
      // hubs-to-leaves? guarded-moment Pearson over edge-end degrees
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"),
        (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.assortativity(e, "src", "dst")
    }),
    "graph_link_pred" -> ((s, dir) => {
      // link prediction on a 1/3-density slice of the 997-node orders
      // graph (the full sf0.1 graph has deg ~250 — wedge cost tracks
      // Σ deg², the documented envelope, and the gate models the
      // realistic-density regime); deterministic top-100 by the
      // classic trio (cn / Jaccard / Adamic-Adar)
      val e = t(s, dir, "orders")
        .filter(col("o_orderkey") % 3 === 0)
        .select((col("o_custkey") % 997).as("src"),
          (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.linkPrediction(e, "src", "dst")
        .orderBy(desc("common_neighbors"), col("id_a"), col("id_b"))
        .limit(100)
    }),
    "graph_lpa" -> ((s, dir) => {
      // label-propagation communities on the 997-node orders graph:
      // 4 synchronous rounds, ties to the smallest label — the whole
      // run is a pure function of the edge set, and the oracle unrolls
      // the identical rounds as CTEs (the pagerank/hits construction)
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"),
        (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.labelProp(e, "src", "dst", iters = 4)
        .orderBy("node")
    }),
    "graph_hits" -> ((s, dir) => {
      // HITS hubs/authorities on the directed orders graph (8 rounds,
      // L2-normalized, 10dp per-round rounding); the oracle unrolls the
      // mutual recursion to 8 CTE rounds with the identical norm order
      // and rounding (the pageRankOracle construction)
      val e = t(s, dir, "orders").select(
        (col("o_custkey") % 997).as("src"),
        (col("o_orderkey") % 997).as("dst"))
      graft.ops.Graph.hits(e, "src", "dst", iters = 8)
        .orderBy("node")
    }),
  )

  val oracles: Map[String, String] = Map(
    "graph_hops" -> hopDistanceOracle(6, 10),
    "graph_pagerank" -> pageRankOracle(5),
    "graph_hits" -> hitsOracle(8),
    "graph_kcore" -> kcoreOracle(21, 14),
    "graph_lpa" -> lpaOracle(4),
    "graph_assort" ->
      """WITH e0 AS (SELECT DISTINCT
        |    least(o_custkey % 997, o_orderkey % 997) AS a,
        |    greatest(o_custkey % 997, o_orderkey % 997) AS b
        |  FROM orders WHERE o_custkey % 997 <> o_orderkey % 997),
        |nb AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT a AS node, count(*)::BIGINT AS deg FROM nb
        |  GROUP BY 1),
        |en AS (SELECT da.deg::DOUBLE AS x, db.deg::DOUBLE AS y
        |  FROM nb JOIN deg da ON da.node = nb.a
        |  JOIN deg db ON db.node = nb.b)
        |SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
        |  (count(*) // 2)::BIGINT AS n_edges,
        |  round(corr(x, y), 4) AS assortativity
        |FROM en""".stripMargin,
    "graph_link_pred" ->
      """WITH e0 AS MATERIALIZED (SELECT DISTINCT
        |    least(o_custkey % 997, o_orderkey % 997) AS a,
        |    greatest(o_custkey % 997, o_orderkey % 997) AS b
        |  FROM orders WHERE o_custkey % 997 <> o_orderkey % 997
        |    AND o_orderkey % 3 = 0),
        |nb AS (SELECT a AS ctr, b AS n FROM e0
        |  UNION ALL SELECT b, a FROM e0),
        |deg AS (SELECT ctr AS node, count(*)::BIGINT AS deg FROM nb
        |  GROUP BY 1),
        |c AS (SELECT nb.ctr, nb.n, deg.deg FROM nb
        |  JOIN deg ON deg.node = nb.ctr WHERE deg.deg <= 10000),
        |p AS (SELECT x.n AS a, y.n AS b, count(*)::BIGINT AS cn,
        |    sum(1.0 / ln(x.deg)) AS aa
        |  FROM c x JOIN c y ON x.ctr = y.ctr AND x.n < y.n
        |  GROUP BY 1, 2),
        |ne AS (SELECT p.* FROM p LEFT JOIN e0
        |    ON e0.a = p.a AND e0.b = p.b
        |  WHERE e0.a IS NULL)
        |SELECT ne.a AS id_a, ne.b AS id_b, cn AS common_neighbors,
        |  round(cn / (da.deg + db.deg - cn)::DOUBLE, 4) AS jaccard,
        |  round(aa, 4) AS adamic_adar
        |FROM ne JOIN deg da ON da.node = ne.a
        |JOIN deg db ON db.node = ne.b
        |ORDER BY common_neighbors DESC, id_a, id_b
        |LIMIT 100""".stripMargin,
    "graph_triangles" ->
      """WITH raw AS (SELECT o_custkey % 997 AS u, o_orderkey % 997 AS v
        |  FROM orders),
        |e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        |  FROM raw WHERE u <> v),
        |deg AS (SELECT node, count(*)::BIGINT AS deg FROM (
        |    SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        |  GROUP BY 1),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |pn AS (SELECT node, count(*)::BIGINT AS n_tri FROM (
        |    SELECT x AS node FROM tri
        |    UNION ALL SELECT y FROM tri
        |    UNION ALL SELECT z FROM tri)
        |  GROUP BY 1)
        |SELECT d.node, d.deg,
        |  coalesce(pn.n_tri, 0)::BIGINT AS n_triangles,
        |  CASE WHEN d.deg >= 2 THEN
        |    round(2.0 * coalesce(pn.n_tri, 0) / (d.deg * (d.deg - 1)), 4)
        |  END AS clustering
        |FROM deg d LEFT JOIN pn ON d.node = pn.node
        |ORDER BY d.node""".stripMargin,
  )
}
