package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout for scan pruning — the Z-order
 * (Morton-curve) clustering Delta/Iceberg expose as `OPTIMIZE ZORDER BY`,
 * expressed on plain parquet. Sorting a table by ONE column makes
 * min/max stats prune scans filtered on that column but leaves every
 * other predicate touching all files; interleaving the bits of k columns
 * into one sort key gives every interleaved dimension locality
 * ~n^(1-1/k), so a selective filter on ANY of them skips most files
 * (Morton 1966; the same layout step a 100 TB curation pipeline runs
 * before handing a corpus to selective downstream readers).
 *
 * Everything here is closed-form bit arithmetic on longs —
 * shiftright/shiftleft/&/| chains, fully codegen'd, engine-portable
 * (the oracle replays the interleave in SQL integer ops).
 */
object Layout {

  /** Quantize a numeric column into [0, 2^bits) against a fixed domain —
   * the per-dimension prep for [[zValue]]. Values outside [lo, hi] clamp
   * to the edge cells (out-of-domain data degrades locality, never
   * correctness). */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits > 0 && bits <= 20, "bits must be in [1, 20]")
    require(hi > lo, "quantize domain must be non-empty")
    val cells = (1L << bits) - 1L
    val scaled = floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(cells + 1L))
    greatest(lit(0L), least(lit(cells), scaled.cast("long")))
  }

  /**
   * Morton interleave of k quantized dimensions (each in [0, 2^bits)):
   * bit i of dimension j lands at position i*k + (k-1-j), so `cols.head`
   * carries the most significant bit at every level. Built as an O(k·bits)
   * OR-chain of shift/mask terms — one codegen'd expression, no UDF.
   */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && cols.size * bits <= 62,
      s"${cols.size} dims * $bits bits must fit a long")
    val k = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * k + (k - 1 - j))
    terms.reduce(_ bitwiseOR _)
  }

  /**
   * Z-order cluster a frame for writing: range-partition into `numFiles`
   * output partitions by the interleaved key, sort within each — the
   * standard layout pass before a partitioned/bucketed parquet write.
   * Each `(col, lo, hi)` is quantized to `bits` cells. One range
   * Exchange (sampled range bounds handle key skew); the sort is
   * per-partition, never global. The helper key column is dropped, so
   * the result writes with the input schema.
   */
  def clusterByZ(
      df: DataFrame, dims: Seq[(String, Double, Double)], bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    require(!df.columns.contains("_zv"),
      "input column _zv collides with clusterByZ's sort key; rename it first")
    val z = zValue(dims.map { case (c, lo, hi) => quantize(col(c), lo, hi, bits) },
      bits)
    df.withColumn("_zv", z)
      .repartitionByRange(numFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_zv")
  }

  /**
   * Hilbert-curve sort key over two quantized dimensions — the
   * locality upgrade of [[zValue]] (Delta OPTIMIZE grew the same
   * option): consecutive Hilbert positions are ALWAYS adjacent cells,
   * so every contiguous file of a Hilbert-sorted table covers one
   * connected rectangle-ish region, where the Morton curve's quadrant
   * jumps hand some files two far-apart strips and cost extra reads on
   * selective 2-D filters. The classic bit-level fold (Warren,
   * Hacker's Delight §16; the public xy2d form): per bit level s from
   * high to low, the quadrant pair (rx, ry) contributes s²·((3·rx)⊕ry)
   * and the lower bits rotate/reflect into the quadrant's frame.
   *
   * The fold is built as one NAMED intermediate column per level —
   * never nested Column expressions: each level references (x, y) of
   * the previous level TWICE, so inline nesting would grow the
   * expression tree ~4^bits (the same exponential the unrolled-CTE
   * oracles dodge with AS MATERIALIZED); named projections keep plan
   * and codegen linear in `bits` (CollapseProject declines to inline
   * non-cheap doubly-referenced expressions). All helper columns are
   * dropped; output adds only `out`.
   */
  def withHilbert(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
      out: String = "hval"): DataFrame = {
    require(bits > 0 && 2 * bits <= 62, s"2 * $bits bits must fit a long")
    val clash = (0 to bits).flatMap(i => Seq(s"_hx$i", s"_hy$i", s"_hd$i"))
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with withHilbert internals; rename them first")
    var cur = df.withColumn("_hx0", xCol.cast("long"))
      .withColumn("_hy0", yCol.cast("long"))
      .withColumn("_hd0", lit(0L))
    for ((i, r) <- ((bits - 1) to 0 by -1).zipWithIndex) {
      val s = 1L << i
      val x = col(s"_hx$r"); val y = col(s"_hy$r")
      val rx = when(x.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      val ry = when(y.bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L))
      cur = cur
        .withColumn(s"_hd${r + 1}",
          col(s"_hd$r") + lit(s * s) * (lit(3L) * rx).bitwiseXOR(ry))
        .withColumn(s"_hx${r + 1}",
          when(ry === 0, when(rx === 1, lit(s - 1) - y).otherwise(y))
            .otherwise(x))
        .withColumn(s"_hy${r + 1}",
          when(ry === 0, when(rx === 1, lit(s - 1) - x).otherwise(x))
            .otherwise(y))
    }
    cur.withColumn(out, col(s"_hd$bits"))
      .drop((0 to bits).flatMap(i => Seq(s"_hx$i", s"_hy$i", s"_hd$i")): _*)
  }

  /**
   * Hilbert-cluster a frame for writing — [[clusterByZ]] with the
   * better curve: quantize both dims, range-partition by the Hilbert
   * key, sort within partitions. Same single range Exchange.
   */
  def clusterByHilbert(
      df: DataFrame, dimX: (String, Double, Double),
      dimY: (String, Double, Double), bits: Int, numFiles: Int): DataFrame = {
    require(numFiles > 0, "numFiles must be positive")
    require(!df.columns.contains("_hv"),
      "input column _hv collides with clusterByHilbert's sort key; rename it first")
    val (cx, lox, hix) = dimX
    val (cy, loy, hiy) = dimY
    withHilbert(df, quantize(col(cx), lox, hix, bits),
        quantize(col(cy), loy, hiy, bits), bits, "_hv")
      .repartitionByRange(numFiles, col("_hv"))
      .sortWithinPartitions("_hv")
      .drop("_hv")
  }

  /**
   * Small-file compaction plan — the OPTIMIZE/bin-packing step every
   * 100 TB table eventually needs: a crawl lands thousands of small
   * parquet files per partition, and scan cost is dominated by file
   * count, not bytes. Given a file inventory (partition key, file name,
   * size in bytes), group each partition's files into consecutive
   * output bins of ~`targetBytes`: files are laid end-to-end in
   * (partition, name) order and a bin boundary falls every time the
   * running total crosses the target — bin = floor(cumulative-before /
   * target) — so every bin except a partition's last holds >= target
   * bytes once its crossing file lands, no bin splits a file, and the
   * assignment is a pure deterministic function of the inventory
   * (re-running the planner mid-compaction re-derives the same plan —
   * idempotent retries). Files >= targetBytes land alone in their own
   * bin by the same rule. Output: partition, file, size, bin,
   * bin_offset (bytes before this file within its bin).
   *
   * This is sequence packing (TextMetrics.packBins) re-aimed at file
   * inventories: per-PARTITION running sums — one keyed window, ONE
   * Exchange, never a global cumulative sum through a single task. The
   * inventory is metadata (one row per FILE), so even a million-file
   * table is a trivial frame; the expensive part — the rewrite itself —
   * is the caller's `read.where(partition).write`, embarrassingly
   * parallel per bin.
   */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.partitionBy(col(partCol))
      .orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("_before", coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("_before") / lit(targetBytes)))
      .withColumn("bin_offset",
        col("_before") - col("bin") * lit(targetBytes))
      .drop("_before")
  }

  /**
   * Zone-map pruning report — the measurement that says whether a
   * layout actually earns its keep (clusterByZ/clusterByHilbert claim
   * a selective filter skips most files; this computes the skip, per
   * file, from the same min/max stats a parquet reader prunes on):
   * rows are binned into `numFiles` equal-width Z-VALUE ranges (the
   * deterministic, SQL-replayable model of what repartitionByRange
   * approximates by sampling), each file reports its row count and the
   * audited column's min/max zone, and `skipped` says whether a reader
   * filtering `predLo <= auditCol <= predHi` would skip the file
   * entirely (zone disjoint from the predicate). Σ n_rows over skipped
   * files / total is the layout's measured pruning rate for that
   * predicate.
   *
   * Shape at scale: one projection computes the interleave (codegen'd
   * bit ops), the z-span enters as a 1-row aggregate subtree (AQE
   * broadcasts), file binning is pure long arithmetic (exact integer
   * division — no float boundary wobble between engines), and the
   * report is ONE numFiles-row aggregation. No windows, no actions.
   * Output: file_id, n_rows, cmin (4dp), cmax (4dp), skipped.
   */
  def zoneMapReport(df: DataFrame, dims: Seq[(String, Double, Double)],
      bits: Int, numFiles: Int, auditCol: String,
      predLo: Double, predHi: Double): DataFrame = {
    require(dims.nonEmpty, "zoneMapReport needs at least one z dimension")
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    require(dims.size * bits <= 31,
      s"dims*bits must fit 31 bits for exact long binning: ${dims.size}*$bits")
    require(predLo <= predHi, s"need predLo <= predHi: ($predLo, $predHi)")
    val z = zValue(dims.map { case (c, lo, hi) =>
      quantize(col(c), lo, hi, bits) }, bits)
    val base = df.select(z.as("_zv"),
      col(auditCol).cast("double").as("_a"))
    val span = base.agg(min("_zv").as("_zmin"), max("_zv").as("_zmax"))
    base.crossJoin(span)
      .select(expr(s"((_zv - _zmin) * $numFiles) div (_zmax - _zmin + 1)")
        .as("file_id"), col("_a"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        round(min("_a"), 4).as("cmin"),
        round(max("_a"), 4).as("cmax"),
        (max("_a") < lit(predLo) || min("_a") > lit(predHi)).as("skipped"))
  }
}
