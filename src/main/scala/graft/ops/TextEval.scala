package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generation-quality scoring against references — the text half of the
 * eval tier ([[Eval]] aggregates verdicts; this SCORES candidate text
 * against reference text with the published n-gram overlap metrics), plus
 * the corpus-coverage estimators a held-out eval set is sized with.
 * No counterpart in /root/reference (which stops at the solver); extends
 * the engine the way classifierMetrics/retrievalMetrics do.
 *
 * Tokenization is the whitespace family used across TextMetrics: lowercase,
 * split on runs of whitespace, empty tokens dropped. The pairwise scores
 * (ROUGE/BLEU/chrF) run a compiled per-pair kernel — gram multisets never
 * leave their row, so nothing gram-sized ever shuffles; the corpus-level
 * estimators (coverage, distinct-n) are keyed aggregations. Candidate ×
 * reference work is per-PAIR, never cross-corpus.
 */
object TextEval {

  private def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), w => w =!= "")

  /** Spread a narrow-partition input before a CPU-heavy per-row stage:
   * per-pair gram kernels cost far more per row than the rows' bytes, so
   * a tiny single-split file would otherwise serialize the whole scan on
   * one core (measured 8 s → sub-second at sf0.1). No-op when the input
   * is big enough to already split — the 100 TB case, where the extra
   * shuffle would be pure waste. The split decision reads the OPTIMIZED
   * PLAN's size statistics, never the RDD: `df.rdd.getNumPartitions`
   * under AQE finalizes the physical plan, materializing every upstream
   * shuffle stage of a lineage that is then thrown away — the whole
   * subtree would execute twice per score. */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism.toLong
    val maxSplit =
      df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes >= BigInt(maxSplit) * target) df else df.repartition(target.toInt)
  }

  /** All (n, gram) pairs of a token array for n in [nFrom, nTo], each
   * tagged with a side marker — grams joined by single spaces, none when
   * the text has fewer than n tokens. One transform per n concatenated at
   * PLAN time (n and side are literals), which measures ~2× faster per
   * element than a nested runtime transform over sequence(nFrom, nTo). */
  private def taggedGrams(t: Column, nFrom: Int, nTo: Int,
      side: Int): Column = {
    def entry(n: Int, g: Column): Column =
      struct(lit(side).as("s"), lit(n).as("n"), g.as("g"))
    concat((nFrom to nTo).map { n =>
      if (n == 1) transform(t, w => entry(1, w))
      else when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => entry(n, concat_ws(" ", slice(t, i + 1, lit(n))))))
        .otherwise(array().cast("array<struct<s:int,n:int,g:string>>"))
    }: _*)
  }

  /** Per-PAIR clipped n-gram counts for every n in [nFrom, nTo] through
   * the native `graft_clip_counts` expression (ClipCounts.scala) — ONE
   * compiled kernel call per row inside whole-stage codegen. Clipping is
   * a within-pair quantity, so shuffling (id, gram) rows across the
   * cluster to reunite grams that were born in the same row is pure
   * waste. The first design did exactly that (at sf1 the chrF gate
   * shuffled ~45M exploded gram structs — 35 s, the round's one
   * superlinear slope); the round-12 Scala-UDF kernel fixed the shuffle
   * but still paid Row↔JVM conversion per pair outside codegen. NULL
   * text coalesces to empty (an absent candidate scores 0, it never
   * drops its id). The only cross-row traffic is the
   * (nTo−nFrom+1)-row-per-pair narrow count frame. */
  private def clippedCounts(df: DataFrame, idCol: String, candCol: String,
      refCol: String, nFrom: Int, nTo: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // kernel in its own Project (whole-stage codegen'd), THEN the
    // explode of the small per-pair result column: a generator with the
    // kernel inline would run the whole expression tree in GenerateExec's
    // interpreted eval path. Tokenization happens INSIDE the kernel
    // ('tokens' mode) — the HOF form (filter(split(lower(...)))) never
    // supports codegen and would demote the Project to interpreted eval
    spread(df.select(col(idCol).as("id"),
        col(candCol).as("_cand"), col(refCol).as("_ref")))
      .select(col("id"), call_function("graft_clip_counts",
        coalesce(col("_cand"), lit("")),
        coalesce(col("_ref"), lit("")),
        lit(nFrom), lit(nTo), lit("tokens")).as("_counts"))
      .select(col("id"), explode(col("_counts")).as("x"))
      .select(col("id"), col("x.n").as("n"), col("x.cc").as("cc"),
        col("x.rc").as("rc"), col("x.clip").as("clip"))
  }

  /**
   * ROUGE-n (Lin 2004): per (candidate, reference) pair, the clipped
   * n-gram overlap — recall is what ROUGE reports (how much of the
   * reference the candidate covers), precision and F1 complete the
   * summarization-eval readout. Counts are CLIPPED (a gram repeated k×
   * in the candidate credits at most its reference count), the published
   * definition. Pairs shorter than n tokens on a side score 0 on that
   * side's ratio; every input id survives to the output (a candidate
   * that generates nothing is a 0, not a missing row).
   * Output: one row per id — n_cand, n_ref (gram totals), overlap,
   * precision, recall, f1 (4dp).
   */
  def rougeN(df: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    // per-row kernel: every input pair yields its count row directly
    // (an empty candidate is a 0 row, not a missing row), duplicate ids
    // merge by sum — the only shuffle carries maxN narrow long rows per
    // pair, never grams, and no join survives
    val per = clippedCounts(df, idCol, candCol, refCol, n, n)
      .groupBy("id")
      .agg(sum("cc").as("n_cand"), sum("rc").as("n_ref"),
        sum("clip").as("overlap"))
    val prec = when(col("n_cand") > 0,
      col("overlap") / col("n_cand").cast("double")).otherwise(lit(0.0))
    val rec = when(col("n_ref") > 0,
      col("overlap") / col("n_ref").cast("double")).otherwise(lit(0.0))
    per.select(col("id"), col("n_cand"), col("n_ref"), col("overlap"),
      round(prec, 4).as("precision"),
      round(rec, 4).as("recall"),
      round(coalesce(when(prec + rec > 0,
        lit(2.0) * prec * rec / (prec + rec)), lit(0.0)), 4).as("f1"))
  }

  /**
   * ROUGE-L (Lin 2004 §3.1): per (candidate, reference) pair, the
   * longest-common-subsequence overlap — the generation score that
   * rewards in-ORDER coverage without requiring consecutive matches,
   * where [[rougeN]]'s fixed-window grams punish any reordering
   * equally. R_lcs = LCS/ref_len, P_lcs = LCS/cand_len, F1 harmonic
   * (the β = 1 form the standard tooling reports). Same
   * lowercase-whitespace tokens as the other scores, computed INSIDE
   * the compiled `graft_lcs` kernel (LcsLength.scala): the token pair
   * never leaves its row, the DP is O(m·n) time / O(min(m, n)) space
   * per pair, and the only cross-row traffic is one 3-long struct per
   * pair. Duplicate ids merge by summing lengths and LCS (the
   * sentence-pair SUM form; Lin's union-LCS summary variant needs
   * cross-sentence subsequence sets and is deliberately not this).
   * Pairs with an empty side score 0 on that side's ratio; every input
   * id survives to the output.
   * Output: one row per id — cand_len, ref_len (token counts), lcs,
   * precision, recall, f1 (4dp).
   */
  def rougeL(df: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val per = spread(df.select(col(idCol).as("id"),
        col(candCol).as("_cand"), col(refCol).as("_ref")))
      .select(col("id"), call_function("graft_lcs",
        coalesce(col("_cand"), lit("")),
        coalesce(col("_ref"), lit(""))).as("_l"))
      .groupBy("id")
      .agg(sum("_l.cand_len").as("cand_len"),
        sum("_l.ref_len").as("ref_len"), sum("_l.lcs").as("lcs"))
    val prec = when(col("cand_len") > 0,
      col("lcs") / col("cand_len").cast("double")).otherwise(lit(0.0))
    val rec = when(col("ref_len") > 0,
      col("lcs") / col("ref_len").cast("double")).otherwise(lit(0.0))
    per.select(col("id"), col("cand_len"), col("ref_len"), col("lcs"),
      round(prec, 4).as("precision"),
      round(rec, 4).as("recall"),
      round(coalesce(when(prec + rec > 0,
        lit(2.0) * prec * rec / (prec + rec)), lit(0.0)), 4).as("f1"))
  }

  /**
   * Corpus BLEU (Papineni et al. 2002): the machine-translation /
   * generation fidelity score — geometric mean of the clipped n-gram
   * precisions p_1..p_maxN aggregated over the WHOLE corpus (clipping per
   * pair, totals corpus-level — the published corpus form, not a mean of
   * sentence BLEUs), times the brevity penalty BP = min(1, e^(1−r/c)).
   * Any empty precision level zeroes BLEU (the standard convention;
   * smoothed variants exist but this is the reference definition).
   * ONE scan of the pair frame covers every n-level AND the length
   * totals (cand_len/ref_len are the unigram count sums) through the
   * per-pair compiled kernel, so the whole score is a narrow scan plus
   * a 1-row aggregate — zero gram shuffles, no per-n re-read of what is
   * typically an uncached join.
   * Output: 1 row — cand_len, ref_len, p1..p{maxN} (4dp), bp (4dp),
   * bleu (4dp).
   */
  def bleu(df: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN in [1,8]: $maxN")
    val counts = clippedCounts(df, idCol, candCol, refCol, 1, maxN)
    val aggs: Seq[Column] =
      Seq(coalesce(sum(when(col("n") === 1, col("cc"))), lit(0L))
            .cast("long").as("cand_len"),
          coalesce(sum(when(col("n") === 1, col("rc"))), lit(0L))
            .cast("long").as("ref_len")) ++
      (1 to maxN).flatMap(n => Seq(
        coalesce(sum(when(col("n") === n, col("clip"))), lit(0L))
          .cast("double").as(s"_clip$n"),
        coalesce(sum(when(col("n") === n, col("cc"))), lit(0L))
          .cast("double").as(s"_tot$n")))
    val joined = counts.agg(aggs.head, aggs.tail: _*)
    val ps = (1 to maxN).map(n =>
      when(col(s"_tot$n") > 0, col(s"_clip$n") / col(s"_tot$n"))
        .otherwise(lit(0.0)).as(s"_p$n"))
    val withPs = joined.select(col("cand_len") +: col("ref_len") +: ps: _*)
    val bp = when(col("cand_len") >= col("ref_len") || col("cand_len") === 0,
      lit(1.0)).otherwise(
      exp(lit(1.0) - col("ref_len").cast("double") / col("cand_len")))
    val allPos = (1 to maxN).map(n => col(s"_p$n") > 0).reduce(_ && _)
    val logMean = (1 to maxN).map(n => log(col(s"_p$n")))
      .reduce(_ + _) / maxN.toDouble
    withPs.select(
      (col("cand_len") +: col("ref_len") +:
        (1 to maxN).map(n => round(col(s"_p$n"), 4).as(s"p$n"))) ++ Seq(
        round(bp, 4).as("bp"),
        round(when(allPos, bp * exp(logMean)).otherwise(lit(0.0)), 4)
          .as("bleu")): _*)
  }

  /**
   * chrF (Popović 2015) — the character-level generation score that is
   * robust to tokenization and morphology where word-level BLEU/ROUGE
   * are brittle: F_β over character n-gram precision/recall, β = 2
   * (recall-weighted, the published default). Text is lowercased and
   * whitespace is REMOVED (the paper's convention); per n in 1..maxN the
   * clipped char-n-gram counts aggregate corpus-level (clipping per
   * pair, totals corpus-level — the same micro/macro split as [[bleu]]),
   * chrP/chrR macro-average the per-n precisions/recalls, and n-levels
   * where BOTH sides have zero grams (every pair shorter than n chars)
   * are excluded from the average rather than polluting it with 0/0.
   * Same per-pair-kernel shape as [[bleu]], with char-gram substrings
   * instead of token grams.
   * Output: 1 row — cand_chars, ref_chars, levels (n-levels averaged),
   * chrp (4dp), chrr (4dp), chrf2 (4dp).
   */
  def chrF(df: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1 && maxN <= 10, s"maxN in [1,10]: $maxN")
    require(beta > 0, s"beta must be positive: $beta")
    def chars(c: Column): Column =
      regexp_replace(lower(coalesce(c, lit(""))), "\\s+", "")
    // per-pair native kernel (see clippedCounts), char-gram form: the
    // gram multisets never leave their row; the only shuffled frame is
    // maxN rows per pair of narrow longs. The exploded-struct
    // predecessor shuffled ~45M char-gram structs at sf1 (35 s,
    // superlinear).
    graft.functions.GraftFunctions.register(df.sparkSession)
    val counts = spread(df.select(col(idCol).as("id"),
        col(candCol).as("_cand"), col(refCol).as("_ref")))
      .select(call_function("graft_clip_counts",
        chars(col("_cand")), chars(col("_ref")),
        lit(1), lit(maxN)).as("_counts"))
      .select(explode(col("_counts")).as("x"))
      .select(col("x.n").as("n"), col("x.cc").as("cc"),
        col("x.rc").as("rc"), col("x.clip").as("clip"))
    val perN = counts.groupBy("n")
      .agg(sum("clip").cast("double").as("clip"),
        sum("cc").cast("double").as("tot_c"),
        sum("rc").cast("double").as("tot_r"))
      .filter(col("tot_c") + col("tot_r") > 0)
    val pN = when(col("tot_c") > 0, col("clip") / col("tot_c"))
      .otherwise(lit(0.0))
    val rN = when(col("tot_r") > 0, col("clip") / col("tot_r"))
      .otherwise(lit(0.0))
    val agg = perN.agg(
      sum(when(col("n") === 1, col("tot_c"))).cast("long").as("cand_chars"),
      sum(when(col("n") === 1, col("tot_r"))).cast("long").as("ref_chars"),
      count(lit(1)).as("levels"),
      avg(pN).as("_p"), avg(rN).as("_r"))
    val b2 = beta * beta
    val f = when(col("_p") + col("_r") > 0,
      (lit(1.0 + b2) * col("_p") * col("_r")) /
        (lit(b2) * col("_p") + col("_r"))).otherwise(lit(0.0))
    agg.select(
      coalesce(col("cand_chars"), lit(0L)).as("cand_chars"),
      coalesce(col("ref_chars"), lit(0L)).as("ref_chars"),
      col("levels"),
      round(coalesce(col("_p"), lit(0.0)), 4).as("chrp"),
      round(coalesce(col("_r"), lit(0.0)), 4).as("chrr"),
      round(coalesce(f, lit(0.0)), 4).as("chrf2"))
  }

  /**
   * distinct-n generation diversity (Li et al. 2016, "A
   * Diversity-Promoting Objective Function for Neural Conversation
   * Models"): per group, the ratio of DISTINCT n-grams to total n-grams
   * for n in 1..maxN — the standard mode-collapse readout (a sampler
   * that repeats itself scores low distinct-2 long before eyeballing
   * catches it). Same lowercase-whitespace tokens as the other scores;
   * one tagged-gram scan (the [[bleu]] kernel's single-side form), one
   * (group, n, gram) aggregation, one (group, n) rollup. Groups with no
   * grams at a level produce no row for it (nothing to measure), and
   * the ratio of an empty denominator never divides by zero.
   * Output: one row per (group, n) — group, n, total_grams,
   * distinct_grams, distinct_ratio (4dp).
   */
  def distinctN(df: DataFrame, groupCol: String, textCol: String,
      maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN in [1,8]: $maxN")
    spread(df.select(col(groupCol).as("grp"), col(textCol).as("_t")))
      .select(col("grp"),
        explode(taggedGrams(toks(col("_t")), 1, maxN, 0)).as("x"))
      .groupBy(col("grp"), col("x.n").as("n"), col("x.g").as("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy("grp", "n")
      .agg(sum("c").as("total_grams"),
        count(lit(1)).as("distinct_grams"))
      .select(col("grp"), col("n"), col("total_grams"),
        col("distinct_grams"),
        round(col("distinct_grams") / col("total_grams").cast("double"), 4)
          .as("distinct_ratio"))
  }

  /**
   * Vocabulary-coverage estimators — how much of the population
   * vocabulary has this corpus actually seen (the eval-set sizing and
   * crawl-frontier question): Chao1 richness (Chao 1984, bias-corrected
   * form V + F1(F1−1)/(2(F2+1)), defined even at F2 = 0) estimates total
   * species from the singleton/doubleton ratio, and Good–Turing
   * (Good 1953) puts the probability mass of UNSEEN terms at F1/N —
   * coverage = 1 − F1/N is the chance the next token is a known term.
   * One token scan → term counts → three 1-row aggregates.
   * Output: 1 row — n_tokens, vocab, f1, f2, chao1 (1dp),
   * unseen_mass (6dp), coverage (6dp).
   */
  def vocabCoverage(df: DataFrame, textCol: String): DataFrame = {
    val terms = df
      .select(explode(toks(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    terms.agg(
      sum("c").as("n_tokens"),
      count(lit(1)).as("vocab"),
      count(when(col("c") === 1, 1)).as("f1"),
      count(when(col("c") === 2, 1)).as("f2"))
      .select(col("n_tokens"), col("vocab"), col("f1"), col("f2"),
        round(col("vocab") +
          col("f1") * (col("f1") - 1) / ((col("f2") + 1) * 2.0), 1)
          .as("chao1"),
        round(col("f1") / col("n_tokens").cast("double"), 6)
          .as("unseen_mass"),
        round(lit(1.0) - col("f1") / col("n_tokens").cast("double"), 6)
          .as("coverage"))
  }
}
