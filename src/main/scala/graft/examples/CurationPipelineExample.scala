package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling, TextMetrics}

/**
 * End-to-end training-data curation over the documents table — the
 * operators composed the way a production pipeline chains them:
 *
 *   1. quality + repetition filters (Gopher-style rules)
 *   2. exact dedup (content hash, keep lowest id)
 *   3. near-dedup (minhash banding pairs -> drop the higher id of a pair)
 *   4. deterministic stratified sample per language
 *   5. corpus token accounting
 *
 * Every stage is a narrow map or a single keyed shuffle; nothing collects
 * to the driver except final counts. Run:
 *   sbt "runMain graft.examples.CurationPipelineExample [sfDir]"
 */
object CurationPipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("curation-pipeline-example")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n0 = docs.count()

    // 1. rule filters: minimum length, bounded repetition
    val quality = TextMetrics.quality(docs, "text", "doc_id")
      .filter(col("n_tokens") >= 10)
    val repetition = TextMetrics.repetition(docs, "text", "doc_id")
      .filter(col("dup_3gram_frac") <= 0.5)
    val ruled = docs
      .join(quality.select("doc_id"), "doc_id")
      .join(repetition.select("doc_id"), "doc_id")
    val n1 = ruled.count()

    // 2. exact dedup: keep each content hash's lowest doc_id
    val keep = Dedup.exact(ruled, "text", "doc_id")
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = ruled.join(keep, "doc_id")
    val n2 = exactDeduped.count()

    // 3. near-dedup: minhash banding candidates; drop the higher id
    val losers = Dedup.minhashCandidatePairs(exactDeduped, "text", "doc_id",
        maxBucketSize = 10000)
      .select(col("id_b").as("doc_id")).distinct()
    val nearDeduped = exactDeduped.join(losers, Seq("doc_id"), "left_anti")
    val n3 = nearDeduped.count()

    // 4. reproducible stratified sample: up to 100 docs per language
    val sampled = Sampling.stratifiedExact(nearDeduped, "lang", "doc_id", 100)
    val n4 = sampled.count()

    // 5. token accounting on the final corpus
    val tokens = TextMetrics.tokenCounts(sampled, "text", "doc_id")
      .agg(coalesce(sum("n_ws_tokens"), lit(0L))).collect()(0).getLong(0)

    println(f"[curate] input=$n0 ruled=$n1 exact=$n2 near=$n3 sampled=$n4 tokens=$tokens")
    spark.stop()
  }
}
