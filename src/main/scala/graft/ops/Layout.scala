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
}
