package graft.ebw

/**
 * Pre-flight sizing for the large-k sparse-Gram path — turns the two
 * documented N=1e7 operational cliffs (driver OOM merging per-partition
 * sparse-Gram partials; `spark.driver.maxResultSize` trip — SURVEY §6)
 * into solver BEHAVIOR, decided before the first aggregation pass from
 * numbers the validation scan already produced:
 *
 *  - `partitions`: sized so one partition's LongMap partial stays near
 *    `TargetPartialBytes` (a partial holds at most
 *    min(realized-Gram, rows/partition · nnz(nnz+1)/2) entries).
 *  - `depth`: treeAggregate depth minimizing the bytes the driver
 *    collects (deeper trees merge more partials executor-side; the win
 *    saturates once merged partials approach the realized Gram size).
 *  - `mode`: when even the best depth cannot land the merged Gram within
 *    the driver's `maxResultSize`/heap budget, the solve switches to the
 *    DISTRIBUTED-Gram mode (EbwAggregator.gramRdd +
 *    DriverLinalg.cgSolveRdd): the Gram lives as an RDD merged by
 *    reduceByKey across executors, CG matvecs run distributed, and driver
 *    traffic per CG iteration is O(k) — no driver-size ceiling at any N.
 *
 * All estimates are upper bounds (sumPairs counts every contribution as a
 * distinct entry), so the driver path is only chosen when it is safe and
 * the distributed path engages conservatively early — costing extra
 * passes, never an OOM.
 */
private[ebw] object EbwSizing {

  /** Per-partition serialized-partial target (java-serialized LongMap:
   * two primitive arrays at ~2x load-factor headroom ≈ 32 B/entry). */
  val TargetPartialBytes: Long = 64L << 20
  val SerBytesPerEntry: Long = 32L
  /** Driver-resident merged LongMap ≈ 48 B/entry, ×2 merge working set. */
  val HeapBytesPerEntry: Long = 48L
  val MaxPartitions: Int = 4096

  final case class Plan(
      partitions: Int,
      depth: Int,
      gramCapEntries: Long,
      driverCollectBytes: Long,
      driverHeapBytes: Long,
      distributedGram: Boolean,
      why: String)

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b

  /** Final partial count of RDD.treeAggregate at `depth` over `p`
   * partitions (mirrors its scale/while-loop reduction schedule exactly:
   * the loop CONDITION uses ceil(cur/scale) but the loop BODY shrinks
   * with INTEGER division, `numPartitions /= scale` in RDD.treeAggregate —
   * modeling the body as ceil over-counts the final partials, e.g. 7
   * instead of Spark's 6 at (48, depth 2), and the drift can trigger an
   * extra division round that under-estimates driver collect bytes). */
  private[ebw] def finalParts(p: Int, depth: Int): Int = {
    if (p <= 1) return p
    val scale = math.max(math.ceil(math.pow(p.toDouble, 1.0 / depth)).toInt, 2)
    var cur = p
    while (cur > scale + math.ceil(cur / scale.toDouble).toInt) {
      cur = cur / scale
    }
    cur
  }

  private def collectBytes(gramCap: Long, sumPairs: Long, p: Int, depth: Int): Long = {
    val f = math.max(1, finalParts(p, depth))
    f.toLong * math.min(gramCap, ceilDiv(sumPairs, f.toLong)) * SerBytesPerEntry
  }

  /** In-heap bytes per LongMap entry while a partial is BUILDING
   * (open-addressed primitive arrays at up to 2x growth headroom). */
  val BuildBytesPerEntry: Long = 2L * HeapBytesPerEntry

  /** Per-task in-flight partial budget: `cores` partials build AT ONCE
   * in one executor JVM (local mode: the driver JVM itself), so the
   * concurrent set — not one partial — is what must fit. A quarter of
   * the heap across all concurrent tasks, floored at 8 MiB so tiny
   * heaps still make progress. The round-12 OOM this encodes: at
   * N=1e7/k=1e5 the no-collision Gram realizes the sumPairs upper
   * bound, and 32 concurrent 64 MiB-target partials (~200 MiB in-heap
   * each at build headroom) blew an 8 GiB heap that a single partial
   * fit comfortably. */
  def perTaskPartialBytes(maxHeap: Long, cores: Int): Long =
    math.max(8L << 20, (maxHeap / 4) / math.max(1, cores))

  /**
   * @param k            moment dimension
   * @param sumPairs     Σ nnz_i(nnz_i+1)/2 from the validation pass
   * @param currentParts partitions of the prepared row RDD
   * @param maxResultSize `spark.driver.maxResultSize` in bytes (0 = unlimited)
   * @param maxHeap      driver JVM max heap (Runtime.maxMemory)
   * @param cores        concurrent tasks per executor JVM (local mode:
   *                     the session's parallelism); 1 = legacy single-
   *                     partial sizing
   */
  def plan(k: Int, sumPairs: Long, currentParts: Int,
      maxResultSize: Long, maxHeap: Long, cores: Int = 1): Plan = {
    val tri = k.toLong * (k + 1) / 2
    val gramCap = math.max(1L, math.min(tri, sumPairs))
    val pForPartial = ceilDiv(sumPairs * SerBytesPerEntry, TargetPartialBytes)
    val entriesPerPart = math.max(1L,
      perTaskPartialBytes(maxHeap, cores) / BuildBytesPerEntry)
    val pForHeap = ceilDiv(sumPairs, entriesPerPart)
    val partitions = math.max(currentParts,
      math.min(MaxPartitions.toLong,
        math.max(pForPartial, pForHeap)).toInt)
    // Depth: the SMALLEST depth whose driver collect fits the budget.
    // Every extra tree level re-serializes near-Gram-sized partials
    // through another executor-side merge round — measured 1.8x per
    // aggregation pass at N=1e6 when a 64-byte ceil-rounding tie sent
    // minBy-on-collect-bytes to depth 3 — so deeper trees are a rescue
    // lever for driver mode, never a micro-optimization of collect bytes.
    val resultBudget =
      if (maxResultSize > 0) (maxResultSize * 4) / 5 else Long.MaxValue
    val depth = (2 to 4)
      .find(d => collectBytes(gramCap, sumPairs, partitions, d) <= resultBudget)
      .getOrElse((2 to 4).minBy(d => collectBytes(gramCap, sumPairs, partitions, d)))
    val collect = collectBytes(gramCap, sumPairs, partitions, depth)
    val heapNeed = 2L * gramCap * HeapBytesPerEntry
    val overResult = maxResultSize > 0 && collect > (maxResultSize * 4) / 5
    val overHeap = heapNeed > (maxHeap * 3) / 5
    val why =
      if (overResult && overHeap)
        s"collect ~${collect >> 20} MiB > 80% of maxResultSize AND merged Gram ~${heapNeed >> 20} MiB > 60% of driver heap"
      else if (overResult)
        s"collect ~${collect >> 20} MiB exceeds 80% of maxResultSize (${maxResultSize >> 20} MiB)"
      else if (overHeap)
        s"merged Gram ~${heapNeed >> 20} MiB exceeds 60% of driver heap (${maxHeap >> 20} MiB)"
      else
        s"driver Gram fits: collect ~${collect >> 20} MiB, heap ~${heapNeed >> 20} MiB"
    Plan(partitions, depth, gramCap, collect, heapNeed,
      distributedGram = overResult || overHeap, why = why)
  }

  /** Reduce-side partition count for the distributed Gram
   * (EbwAggregator.gramRdd): merged entries spread so one partition's
   * map stays near the partial target AND the concurrent reduce-task
   * set stays inside the same heap budget as the map side. */
  def gramAggParts(plan: Plan, maxHeap: Long = 0L, cores: Int = 1): Int = {
    val pForTarget =
      ceilDiv(plan.gramCapEntries * HeapBytesPerEntry, TargetPartialBytes)
    val pForHeap =
      if (maxHeap <= 0L) 1L
      else ceilDiv(plan.gramCapEntries,
        math.max(1L, perTaskPartialBytes(maxHeap, cores) / BuildBytesPerEntry))
    math.max(8, math.min(MaxPartitions.toLong,
      math.max(pForTarget, pForHeap)).toInt)
  }

  /** For a caller that FORCES the driver path (gramMode = "driver"):
   * fail fast with a sized, actionable message instead of OOMing
   * mid-solve. */
  def requireDriverFits(plan: Plan, maxResultSize: Long, maxHeap: Long): Unit = {
    if (!plan.distributedGram) return
    val needResult = (plan.driverCollectBytes * 5 / 4) >> 20
    val needHeap = (plan.driverHeapBytes * 5 / 3) >> 20
    throw new IllegalStateException(
      s"gramMode=driver cannot hold this problem's sparse Gram on the driver " +
      s"(${plan.why}). Either raise spark.driver.maxResultSize to >= " +
      s"${needResult} MiB and driver memory to >= ${needHeap} MiB " +
      s"(SPARK_DRIVER_MEM under sbt), reduce the moment dimension / row " +
      s"density, or use gramMode=auto|distributed (the no-driver-ceiling " +
      s"path).")
  }
}
