package graft.ebw

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Iterative proportional fitting (raking; Deming & Stephan 1940) — the
 * classical survey calibration the entropy-balance solver generalizes:
 * scale weights so BOTH categorical margins match target shares by
 * alternately rescaling rows and columns. On a two-margin problem the
 * IPF fixed point IS the entropy-balance solution (both minimize the
 * same KL divergence from the initial weights subject to the margin
 * constraints; the solution has the product form w = w0·a_r·b_c) — the
 * equivalence is spec-pinned against [[EntropyBalance]] as a
 * cross-solver correctness check, and IPF remains the cheaper tool
 * when ONLY margins matter (no general moments, no bounds).
 *
 * Architecture (why this is NOT an iterative Spark job): the IPF state
 * is the (row-level, col-level) factor vectors over the CELL table —
 * card(rows)·card(cols) entries, a k-sized object like the EBW dual —
 * so the data-scale work is ONE weighted contingency aggregation
 * (map-side combined), the iteration runs on the collected cells
 * driver-side (pure arithmetic, `iters` alternating margin scalings),
 * and the result ships back as a broadcast factor join: one narrow
 * projection computes every output weight. Zero shuffles beyond the
 * cell aggregation; no per-iteration jobs (contrast the reference-
 * shaped solvers, where the dual is k-dim but the GRADIENT needs a
 * data pass per step — IPF's margins close over the cell table).
 *
 * Targets are SHARES (each map must cover every observed level and sum
 * to ~1); absent-from-target levels are an error, not a silent 0. The
 * raked total equals the initial weighted total by construction.
 * Output: input columns + `outputCol` (= w0 · factor(r, c)).
 */
object Raking {

  /** Driver-side cell IPF: returns factor per (r, c) cell. All margin
   * sums fold in SORTED (r, c) cell order — collect() order varies
   * with partitioning, and an order-varying double fold would make the
   * "same" solve drift in the last ulp across runs (the acf
   * determinism rule, applied to driver state). */
  private[ebw] def ipfFactors(
      cells: Seq[(String, String, Double)],
      rowTargets: Map[String, Double],
      colTargets: Map[String, Double],
      iters: Int, tol: Double): (Map[(String, String), Double], Int, Double) = {
    val keys = cells.map { case (r, c, _) => (r, c) }.sorted
    val w0 = cells.map { case (r, c, x) => (r, c) -> x }.toMap
    def marginBy(w: Map[(String, String), Double],
        part: ((String, String)) => String): Map[String, Double] =
      keys.foldLeft(Map.empty[String, Double]) { (acc, k) =>
        val g = part(k)
        acc.updated(g, acc.getOrElse(g, 0.0) + w(k))
      }
    val total = keys.foldLeft(0.0)((s, k) => s + w0(k))
    require(total > 0, "total initial weight must be positive")
    val tRow = rowTargets.map { case (k, v) => k -> v * total }
    val tCol = colTargets.map { case (k, v) => k -> v * total }
    var w = w0
    var it = 0
    var err = Double.MaxValue
    while (it < iters && err > tol) {
      val mRow = marginBy(w, _._1)
      w = w.map { case ((r, c), x) => (r, c) -> x * (tRow(r) / mRow(r)) }
      val mCol = marginBy(w, _._2)
      w = w.map { case ((r, c), x) => (r, c) -> x * (tCol(c) / mCol(c)) }
      val mRow2 = marginBy(w, _._1)
      err = mRow2.map { case (r, m) => math.abs(m - tRow(r)) }.max / total
      it += 1
    }
    (w.map { case (k, x) => k -> x / w0(k) }, it, err)
  }

  def ipf(df: DataFrame, rowCol: String, colCol: String, weightCol: String,
      rowTargets: Map[String, Double], colTargets: Map[String, Double],
      iters: Int = 50, tol: Double = 1e-10,
      outputCol: String = "weight_raked"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(math.abs(rowTargets.values.sum - 1.0) < 1e-6,
      s"row target shares must sum to 1: ${rowTargets.values.sum}")
    require(math.abs(colTargets.values.sum - 1.0) < 1e-6,
      s"col target shares must sum to 1: ${colTargets.values.sum}")
    val cells = df.groupBy(
        col(rowCol).cast("string").as("_r"),
        col(colCol).cast("string").as("_c"))
      .agg(sum(col(weightCol).cast("double")).as("_w0"))
      .collect()
      .map { case Row(r: String, c: String, w0: Double) => (r, c, w0) }
      .toSeq
    cells.foreach { case (r, c, _) =>
      require(rowTargets.contains(r), s"no row target for level '$r'")
      require(colTargets.contains(c), s"no col target for level '$c'")
    }
    val (factors, _, _) =
      ipfFactors(cells, rowTargets, colTargets, iters, tol)
    val spark = df.sparkSession
    import spark.implicits._
    val ft = factors.toSeq.map { case ((r, c), f) => (r, c, f) }
      .toDF("_r", "_c", "_f")
    df
      .join(broadcast(ft),
        col(rowCol).cast("string") === col("_r") &&
        col(colCol).cast("string") === col("_c"), "left")
      .withColumn(outputCol,
        col(weightCol).cast("double") * coalesce(col("_f"), lit(1.0)))
      .drop("_r", "_c", "_f")
  }
}
