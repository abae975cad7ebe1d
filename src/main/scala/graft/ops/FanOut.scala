package graft.ops

import org.apache.spark.sql.DataFrame

/**
 * Scale-adaptive input parallelism for CPU-heavy per-row operators
 * (fingerprint builders, per-document text scorers, media decoders).
 *
 * The problem it solves: this library's heavy map work (8 md5 calls per
 * shingle, per-character rolling hashes, BPE merge folds, image decode)
 * runs BEFORE the operator's first shuffle, so its parallelism is the
 * SCAN's parallelism. A small input — one parquet file, one row group —
 * scans as a single task, and a 32-core driver watches one core do all
 * the hashing (measured: the simhash fingerprint build is a 2-task
 * stage holding 3 s of an otherwise sub-second query). On a real corpus
 * the scan has thousands of splits and the problem does not exist.
 *
 * The fix is therefore CONDITIONAL: repartition the input up to the
 * session's default parallelism only when the optimizer's size estimate
 * says the scan cannot reach it (input bytes < cores x
 * `spark.sql.files.maxPartitionBytes`). The decision reads plan
 * STATISTICS only — no job, no action. At 100 TB the estimate is far
 * above the threshold and the operator plan is byte-identical to
 * before; locally it inserts one round-robin Exchange of the raw rows
 * (sub-millisecond at the sizes where it fires, guide §2: "derive
 * partitioning from input size rather than a constant tuned for either
 * local mode or the cluster").
 *
 * Row-level results are unchanged by construction: each input ROW (and
 * everything later exploded from it) moves as a unit, so per-document
 * tokenize/hash/aggregate pipelines produce bit-identical output under
 * any assignment. Operators whose CORPUS-level float reductions are
 * partitioning-sensitive must not use this (they are the ones that
 * already do decimal/rounding engineering).
 */
private[graft] object FanOut {
  /** `docs` repartitioned to the session default parallelism when the
    * plan's size estimate (optimized-plan statistics — no job, no
    * action) proves the scan under-parallelizes (estimated bytes <
    * cores × maxPartitionBytes); `docs` unchanged otherwise — and
    * always unchanged at corpus scale. */
  def apply(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target <= 1) return docs
    val maxPartitionBytes =
      spark.sessionState.conf.filesMaxPartitionBytes
    val estBytes =
      try docs.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => return docs }
    if (estBytes < BigInt(maxPartitionBytes) * target)
      docs.repartition(target)
    else docs
  }
}
