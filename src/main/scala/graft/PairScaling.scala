package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/**
 * Scaling evidence for the banding-pair dedup operators (SURVEY §6): wall
 * time vs corpus size at 1x/2x/4x/8x/16x the sf0.1 documents table.
 *
 * Corpus construction: copy c remaps ids into a disjoint range and
 * prefixes every word with a copy marker (`" " -> " c<c>"`, i.e. the
 * vocabulary bijection w -> c<c>w — token COUNT and distinctness are
 * unchanged, no marker tokens are inserted), so shingles and fingerprints
 * are distinct ACROSS copies while the within-copy duplicate structure is
 * identical in every copy. That makes
 * the m-fold corpus m disjoint corpora of equal pair density — the right
 * shape for measuring how banding cost grows with corpus size (a plain
 * m-fold self-union would make every doc a near-duplicate of its m-1
 * copies and inflate the OUTPUT quadratically, measuring result-size
 * growth, not operator scaling).
 *
 * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.PairScaling"
 * Prints one JSON line per (op, multiple) plus a final summary with the
 * fitted log2-slope between successive doublings.
 */
object PairScaling {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val multiples = Seq(1, 2, 4, 8, 16)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def corpus(m: Int): DataFrame =
      (0 until m).map { c =>
        base.select((col("doc_id") + lit(c.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), " ", s" c$c").as("text"))
      }.reduce(_.unionAll(_))

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "minhash_pairs" -> (d => Dedup.minhashCandidatePairs(d, "text", "doc_id")),
      "simhash_pairs" -> (d => Dedup.simhashCandidatePairs(d, "text", "doc_id")),
      "ngram_jaccard" -> (d => Dedup.ngramJaccardPairs(d, "text", "doc_id")),
      // stride-1 span detection: O(tokens) span rows — the vocabulary
      // bijection keeps spans disjoint across copies, so flagged spans
      // (the within-copy natural dups) grow linearly with m by design
      "cross_doc_spans" -> (d => Dedup.crossDocSpans(d, "text", "doc_id")),
      // the full detect+cut chain (row-preserving output: one row per
      // doc); times the interval-merge cut on top of the span join. The
      // filter pins the cut into the count plan — on a bare count()
      // Catalyst eliminates the provably row-preserving join and the
      // "measurement" is an empty shell (the bench gate has the same
      // guard)
      "spans_mask" -> (d => Dedup.maskRepeatedSpans(d, "text", "doc_id")
        .filter(col("n_tokens_removed") >= 0)))

    val results = multiples.flatMap { m =>
      // one corpus + count per multiple — shared by all the ops (the
      // untimed scan would otherwise run once per op for no benefit)
      val d = corpus(m)
      val nDocs = d.count()
      ops.map { case (name, fn) =>
        var pairs = 0L
        val times = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          pairs = fn(d).count()
          val dt = (System.nanoTime() - t0) / 1e9
          Dedup.unpersistAll(spark)
          spark.catalog.clearCache()
          dt
        }
        val med = median(times)
        println(f"""{"op":"$name","multiple":$m,"docs":$nDocs,"pairs":$pairs,"sec":$med%.3f}""")
        (name, m, nDocs, pairs, med)
      }
    }
    // fitted slope of log2(time) per log2(size) across the doubling chain;
    // ~1.0 = linear banding cost, 2.0 would be the all-pairs blow-up
    val summary = ops.map(_._1).map { name =>
      val rs = results.filter(_._1 == name).sortBy(_._2)
      val slopes = rs.sliding(2).map { case Seq(a, b) =>
        math.log(b._5 / a._5) / math.log(b._2.toDouble / a._2)
      }.toSeq
      // -1.0 sentinel when the base corpus has no candidate pairs: a 0/0
      // here would emit NaN, which is not valid JSON and would sink the
      // whole metrics line at the collector
      val linearProjection = rs.head._4.toDouble * rs.last._2 / rs.head._2
      val pairRatio =
        if (linearProjection == 0.0) -1.0 else rs.last._4 / linearProjection
      f""""$name":{"slope":${median(slopes)}%.2f,"slope_last":${slopes.last}%.2f,"pair_ratio_vs_linear":$pairRatio%.3f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"pair_scaling","reps":$reps,"sf":"$sfDir","exponents":$summary}""")
    spark.stop()
  }
}
