package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Model-evaluation aggregations over sampled generations and human
 * ratings — the readout tier of a training-data pipeline (the reference's
 * survey-calibration mindset applied to eval tables; no counterpart in
 * /root/reference, which stops at the solver — this extends the engine the
 * way classifierMetrics/rocAuc do).
 *
 * All three operators are single-scan groupBy aggregations with bounded
 * output (one row per problem / per k / one corpus row) — no shuffle
 * beyond the keyed aggregation itself, so they hold at any corpus size.
 */
object Eval {

  /**
   * Unbiased pass@k over sampled completions (Chen et al. 2021, "Evaluating
   * Large Language Models Trained on Code", eq. 1): for a problem with n
   * samples of which c are correct,
   *   pass@k = 1 - C(n-c, k) / C(n, k) = 1 - Π_{i=0..k-1} (n-c-i)/(n-i),
   * computed in the numerically-stable product form (never materializes a
   * binomial), with pass@k = 1 exactly when n-c < k. Problems with fewer
   * than k samples are dropped for that k (the estimator is undefined
   * there), and the count dropped is reported so truncation is visible.
   *
   * One scan groups samples to (problem, n, c); each k row is then a
   * k-sized arithmetic product over that bounded frame — the per-problem
   * product runs through the codegen'd `aggregate` higher-order function,
   * no UDF.
   *
   * @param df         one row per sampled completion
   * @param problemCol problem / task identifier
   * @param correctCol boolean (or 0/1) correctness of the sample
   * @param ks         the k values to report
   * @return one row per k: (k, n_problems, n_dropped, pass_at_k) where
   *         pass_at_k is the mean estimator over qualifying problems,
   *         rounded to 4dp
   */
  def passAtK(df: DataFrame, problemCol: String, correctCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ks must be >= 1: $ks")
    val perProblem = df
      .filter(col(problemCol).isNotNull && col(correctCol).isNotNull)
      .groupBy(col(problemCol).as("problem"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col(correctCol).cast("int")).cast("double").as("c"))
    // ONE pass over the bounded per-problem frame computes every k:
    // est_k is NULL where the problem has < k samples (dropped for that
    // k), 1 exactly when n-c < k, else the stable product form. The per-k
    // rows come from unpivoting the single 1-row aggregate — no repeated
    // scans, no driver-side count action.
    val aggCols = ks.distinct.sorted.flatMap { k =>
      val est = when(col("n") < k, lit(null).cast("double"))
        .when(col("n") - col("c") < k, lit(1.0))
        .otherwise(lit(1.0) - aggregate(
          sequence(lit(0), lit(k - 1)),
          lit(1.0),
          (acc: Column, i: Column) =>
            acc * (col("n") - col("c") - i) / (col("n") - i)))
      Seq(count(est).as(s"np_$k"), round(avg(est), 4).as(s"pk_$k"),
        (count(lit(1)) - count(est)).as(s"nd_$k"))
    }
    val one = perProblem.agg(aggCols.head, aggCols.tail: _*)
    val stacked = ks.distinct.sorted.map(k =>
      s"CAST($k AS BIGINT), np_$k, nd_$k, pk_$k").mkString(", ")
    one.selectExpr(s"stack(${ks.distinct.size}, $stacked) AS " +
      "(k, n_problems, n_dropped, pass_at_k)")
  }

  /**
   * Fleiss' kappa (Fleiss 1971): chance-corrected agreement among a FIXED
   * number of raters per item — the multi-rater generalization of
   * [[Profile.cohenKappa]], the preference/annotation-data QA readout.
   * With n_ij ratings of item i in category j and n raters per item:
   *   P_i = (Σ_j n_ij² − n) / (n(n−1)),   P̄ = mean_i P_i,
   *   p_j = Σ_i n_ij / (N·n),             P̄_e = Σ_j p_j²,
   *   κ = (P̄ − P̄_e) / (1 − P̄_e).
   * Items whose rating count differs from the modal count are dropped
   * (the statistic is undefined there) and reported in `n_dropped`.
   *
   * @param df       one row per (item, rating)
   * @param itemCol  rated item identifier
   * @param categoryCol the assigned category (any type; cast to string)
   * @return one row: (n_items, n_dropped, n_raters, p_bar, p_e, kappa),
   *         ratios rounded to 4dp
   */
  def fleissKappa(df: DataFrame, itemCol: String, categoryCol: String): DataFrame = {
    val cells = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("item"),
        col(categoryCol).cast("string").as("cat"))
      .agg(count(lit(1)).as("n_ij"))
    val perItem = cells.groupBy("item")
      .agg(sum("n_ij").as("n_i"), sum(col("n_ij") * col("n_ij")).as("sq_i"))
    // modal ratings-per-item = the intended rater count; ties broken to
    // the larger n so a corrupt minority can't shrink the panel
    val modal = perItem.groupBy("n_i").agg(count(lit(1)).as("items"))
      .orderBy(col("items").desc, col("n_i").desc)
      .limit(1).select(col("n_i").as("n"))
    val kept = perItem.join(broadcast(modal), col("n_i") === col("n"))
    val total = perItem.agg(count(lit(1)).as("n_rated_items"))
    val stats = kept.agg(
      count(lit(1)).as("n_items"),
      first(col("n")).as("n_raters"),
      avg((col("sq_i") - col("n")) / (col("n") * (col("n") - lit(1.0))))
        .as("p_bar"),
      sum(col("n")).cast("double").as("grand"))
    // NO broadcast hint on the kept-item side: items are data-scale for
    // annotation tables (unlike bradleyTerry's maxItems-bounded systems),
    // so a forced broadcast would collect the full item list onto the
    // driver; AQE picks broadcast itself when the panel is actually small
    val pj = cells.join(kept.select("item", "n"), Seq("item"))
      .groupBy("cat").agg(sum("n_ij").cast("double").as("votes"))
    val pe = pj.crossJoin(broadcast(stats.select(col("grand"))))
      .agg(coalesce(sum((col("votes") / col("grand")) *
        (col("votes") / col("grand"))), lit(0.0)).as("p_e"))
    stats.crossJoin(pe).crossJoin(total)
      .select(
        col("n_items"),
        (col("n_rated_items") - col("n_items")).as("n_dropped"),
        col("n_raters").cast("long").as("n_raters"),
        round(col("p_bar"), 4).as("p_bar"),
        round(col("p_e"), 4).as("p_e"),
        when(col("p_e") < 1.0,
          round((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")), 4))
          .otherwise(lit(1.0)).as("kappa"))
  }

  /**
   * Krippendorff's alpha, nominal data (Krippendorff 2004) — the
   * agreement coefficient for REAL annotation tables, where
   * [[fleissKappa]]'s fixed-panel assumption breaks: raters come and
   * go, items carry 2 ratings here and 5 there, and Fleiss must drop
   * every off-modal item. Alpha pairs ratings WITHIN each unit, so any
   * unit with ≥ 2 ratings contributes:
   *   D_o = Σ_i (n_i² − Σ_c n_ic²)/(n_i − 1) / n,
   *   D_e = (n² − Σ_c n_c²)/(n(n−1)),   α = 1 − D_o/D_e,
   * with n_ic the count of category c in unit i, n_i = Σ_c n_ic,
   * n = Σ n_i over pairable units, n_c the pooled category totals.
   * Single-rating units carry no pairable information and are dropped
   * (reported in `n_dropped`); D_e = 0 (every rating one category)
   * reads α = 1 by convention. α ≥ 0.8 is the customary
   * publishable-annotation bar, 0.667 the tentative one.
   *
   * Shape: one (unit, category) count aggregation, a units-keyed
   * rollup, and the pooled category totals via an UNHINTED join of the
   * cells to the kept units (the fleissKappa rule: units are
   * data-scale for annotation tables, AQE decides broadcast) — all
   * map-side combined, output 1 row.
   * Output: n_items, n_dropped, n_ratings, n_categories, d_o (6dp),
   * d_e (6dp), alpha (4dp).
   */
  def krippendorffAlpha(df: DataFrame, itemCol: String,
      categoryCol: String): DataFrame = {
    val cells = df
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("item"),
        col(categoryCol).cast("string").as("cat"))
      .agg(count(lit(1)).as("n_ic"))
    val perItem = cells.groupBy("item")
      .agg(sum("n_ic").as("n_i"),
        sum(col("n_ic") * col("n_ic")).as("sq_i"))
    val kept = perItem.filter(col("n_i") >= 2)
    val total = perItem.agg(count(lit(1)).as("n_all"))
    val doStats = kept.agg(
      count(lit(1)).as("n_items"),
      sum(col("n_i")).as("n_ratings"),
      sum((col("n_i") * col("n_i") - col("sq_i"))
        / (col("n_i") - lit(1.0))).as("_do_num"))
    val nc = cells.join(kept.select("item"), Seq("item"))
      .groupBy("cat").agg(sum("n_ic").as("n_c"))
    val ncStats = nc.agg(
      count(lit(1)).as("n_categories"),
      coalesce(sum(col("n_c") * col("n_c")), lit(0L)).as("_sq_c"))
    val n = col("n_ratings").cast("double")
    val dO = col("_do_num") / n
    val dE = (n * n - col("_sq_c")) / (n * (n - 1.0))
    doStats.crossJoin(ncStats).crossJoin(total)
      .select(
        col("n_items"),
        (col("n_all") - col("n_items")).as("n_dropped"),
        col("n_ratings"),
        col("n_categories"),
        round(dO, 6).as("d_o"),
        round(dE, 6).as("d_e"),
        when(dE > 0, round(lit(1.0) - dO / dE, 4))
          .otherwise(lit(1.0)).as("alpha"))
  }

  /**
   * McNemar's test with continuity correction (McNemar 1947; Edwards
   * 1948) — the paired-model comparison for "is model B actually
   * better than model A on the SAME eval items": accuracy deltas on a
   * shared set are correlated, so the unpaired tests (chiSquare,
   * welchTTest) overstate significance; McNemar conditions on the
   * DISCORDANT items only. With b = items only A got right and c =
   * items only B got right:
   *   χ² = (max(0, |b − c| − 1))² / (b + c),   1 df,
   * the standard continuity-corrected form (clamped so b ≈ c can't
   * manufacture χ² = 1 from nothing); χ² > 3.8415 is the same
   * documented 95% cut as [[Profile.chiSquare]]. No discordant items
   * (b + c = 0) → NULL chi2, significant = false: the models are
   * indistinguishable on this set by construction.
   * One aggregation over the item frame, output 1 row:
   * n, both_right, both_wrong, only_a, only_b, acc_a (4dp),
   * acc_b (4dp), chi2 (4dp), significant.
   */
  def mcnemar(df: DataFrame, itemCol: String, correctACol: String,
      correctBCol: String): DataFrame = {
    val a = col(correctACol).cast("boolean")
    val b = col(correctBCol).cast("boolean")
    val agged = df
      .filter(col(itemCol).isNotNull && a.isNotNull && b.isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(a && b, 1L).otherwise(0L)), lit(0L))
          .as("both_right"),
        coalesce(sum(when(!a && !b, 1L).otherwise(0L)), lit(0L))
          .as("both_wrong"),
        coalesce(sum(when(a && !b, 1L).otherwise(0L)), lit(0L))
          .as("only_a"),
        coalesce(sum(when(!a && b, 1L).otherwise(0L)), lit(0L))
          .as("only_b"))
    val disc = (col("only_a") + col("only_b")).cast("double")
    val chi2 = pow(greatest(abs(col("only_a") - col("only_b"))
      .cast("double") - 1.0, lit(0.0)), 2) / disc
    agged.select(col("n"), col("both_right"), col("both_wrong"),
      col("only_a"), col("only_b"),
      round(when(col("n") > 0,
        (col("both_right") + col("only_a")) / col("n").cast("double")),
        4).as("acc_a"),
      round(when(col("n") > 0,
        (col("both_right") + col("only_b")) / col("n").cast("double")),
        4).as("acc_b"),
      when(disc > 0, round(chi2, 4)).as("chi2"),
      coalesce(when(disc > 0, chi2 > 3.8415), lit(false))
        .as("significant"))
  }

  /**
   * Self-consistency majority vote (Wang et al. 2022, "Self-Consistency
   * Improves Chain of Thought Reasoning"): per problem, the modal answer
   * across sampled generations, with the margin over the runner-up.
   * Deterministic tie-break: the lexicographically smallest answer —
   * append-stable, so a re-run over the same samples elects the same
   * answer. One keyed aggregation + a per-problem top-2 window (partitioned
   * by problem, never global).
   *
   * @return one row per problem: (problem, answer, votes, total_votes,
   *         vote_share 4dp, margin = votes − runner-up votes; with no
   *         runner-up (unanimous) the runner-up count coalesces to 0, so
   *         margin = votes)
   */
  def majorityVote(df: DataFrame, problemCol: String, answerCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counted = df
      .filter(col(problemCol).isNotNull && col(answerCol).isNotNull)
      .groupBy(col(problemCol).as("problem"),
        col(answerCol).cast("string").as("answer"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("problem")
      .orderBy(col("votes").desc, col("answer").asc)
    counted
      .withColumn("rk", row_number().over(w))
      .withColumn("total_votes", sum("votes").over(Window.partitionBy("problem")))
      .withColumn("runner_up",
        coalesce(lead("votes", 1).over(w), lit(0L)))
      .filter(col("rk") === 1)
      .select(col("problem"), col("answer"), col("votes"),
        col("total_votes"),
        round(col("votes").cast("double") / col("total_votes"), 4)
          .as("vote_share"),
        (col("votes") - col("runner_up")).as("margin"))
  }

  /**
   * Bradley–Terry preference strengths (Bradley & Terry 1952) via
   * Hunter's MM iteration (Hunter 2004) — the preference-data readout
   * that turns pairwise win/loss rows (A beat B) into a per-item strength
   * and ranking: P(i beats j) = π_i/(π_i + π_j), fitted by the fixed-point
   *   π_i ← W_i / Σ_{j≠i} n_ij/(π_i + π_j),  then normalized to Σπ = 1,
   * run a FIXED `iters` rounds from the uniform start (deterministic:
   * same matches → same ratings, replayable in any engine as an unrolled
   * iteration). The match matrix aggregates distributively in one
   * scan; the MM loop runs driver-side on the k×k item matrix — k-sized
   * driver state by design (items are models/systems/policies, bounded by
   * the eval design, never data-scale — the IPF/codebook pattern). That
   * contract is ENFORCED, not assumed: `maxItems` (default 4096, a 128 MB
   * dense matrix) bounds the distinct-item roster, and a violating input
   * (someone passing doc-ids instead of system ids) throws with a sized,
   * actionable message instead of silently OOMing the driver at ~50k
   * items (the Linkage roster-contract pattern).
   * Zero-win items converge to rating 0 exactly. Items are iterated in
   * sorted order so the arithmetic is reproducible.
   * Output: one row per item — item, wins, losses, n_matches,
   * rating (6dp, sums to 1), rank (dense by rating desc, ties by item;
   * BIGINT so the frame replays 1:1 in any SQL engine).
   */
  def bradleyTerry(df: DataFrame, winnerCol: String, loserCol: String,
      iters: Int = 10, maxItems: Int = 4096): DataFrame = {
    require(iters >= 1 && iters <= 1000, s"iters in [1,1000]: $iters")
    require(maxItems >= 2, s"maxItems must be >= 2: $maxItems")
    val spark = df.sparkSession
    import spark.implicits._
    val pairsDf = df
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .groupBy(col(winnerCol).cast("string").as("w"),
        col(loserCol).cast("string").as("l"))
      .agg(count(lit(1)).as("n"))
    // roster guard BEFORE any collect: the item count is one cheap
    // aggregate over the already-grouped frame, and it gates both the
    // k×k matrix and the pair collect (≤ k² rows once k is bounded)
    val nItems = pairsDf
      .select(explode(array(col("w"), col("l"))).as("i"))
      .agg(count_distinct(col("i"))).head().getLong(0)
    require(nItems <= maxItems,
      s"bradleyTerry fits a dense $nItems x $nItems item matrix on the " +
      s"driver (~${nItems * nItems * 8 / (1 << 20)} MB) but maxItems=" +
      s"$maxItems: items must be systems/models (eval-design-bounded), " +
      "not data-scale ids — aggregate to systems first, or raise " +
      "maxItems deliberately if the panel really is this large")
    val pairs = pairsDf
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val items = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val wins = Array.fill(k)(0L)
    val losses = Array.fill(k)(0L)
    val nMat = Array.fill(k, k)(0L)
    pairs.foreach { case (w, l, n) =>
      val (i, j) = (idx(w), idx(l))
      wins(i) += n; losses(j) += n
      nMat(i)(j) += n; nMat(j)(i) += n
    }
    var pi = Array.fill(k)(if (k > 0) 1.0 / k else 1.0)
    for (_ <- 1 to iters) {
      val next = Array.tabulate(k) { i =>
        var denom = 0.0
        var j = 0
        while (j < k) {
          if (j != i && nMat(i)(j) > 0) denom += nMat(i)(j) / (pi(i) + pi(j))
          j += 1
        }
        if (denom > 0) wins(i) / denom else 0.0
      }
      val s = next.sum
      pi = if (s > 0) next.map(_ / s) else next
    }
    // HALF_UP to match SQL round() semantics exactly (rint is banker's)
    val rows = items.indices.map(i => (items(i), wins(i), losses(i),
      wins(i) + losses(i),
      BigDecimal(pi(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble))
    val ranked = rows.toDF("item", "wins", "losses", "n_matches", "rating")
    import org.apache.spark.sql.expressions.Window
    ranked.withColumn("rank", dense_rank().over(
      Window.orderBy(col("rating").desc)).cast("long"))
  }

  /**
   * Pairwise win-rate matrix — the arena-style readout NEXT TO
   * [[bradleyTerry]] (BT fits a latent strength; this reports the raw
   * head-to-head record the fit summarizes, which is what preference-
   * data dashboards actually display): one row per unordered model
   * pair with win/loss/tie counts and the tie-splitting win rate
   * (wins + ties/2) / n — the convention under which BT's
   * P(a beats b) is directly comparable.
   *
   * Battles are canonicalized to (model_a < model_b) so (x,y) and
   * (y,x) rows land in ONE cell; a winner equal to neither side (or
   * null) counts as a tie — arena exports use 'tie'/'both_bad'
   * markers, and any such value means "no winner". Self-battles and
   * null-model rows are dropped. The whole operator is ONE map-side-
   * combined groupBy on the pair key — no window, no join, no driver
   * state; the output is models²-bounded (eval-design-scale), the
   * input data-scale.
   * Output: model_a, model_b, n_battles, wins_a, wins_b, ties,
   * win_rate_a (4dp), win_rate_b (4dp).
   */
  def winRateMatrix(df: DataFrame, modelACol: String, modelBCol: String,
      winnerCol: String): DataFrame = {
    val a = col(modelACol).cast("string")
    val b = col(modelBCol).cast("string")
    val w = col(winnerCol).cast("string")
    val base = df.filter(a.isNotNull && b.isNotNull && a =!= b)
      .select(least(a, b).as("model_a"), greatest(a, b).as("model_b"),
        when(w === least(a, b), "a").when(w === greatest(a, b), "b")
          .otherwise("t").as("_o"))
    base.groupBy("model_a", "model_b")
      .agg(count(lit(1)).as("n_battles"),
        coalesce(sum(when(col("_o") === "a", 1L).otherwise(0L)), lit(0L))
          .as("wins_a"),
        coalesce(sum(when(col("_o") === "b", 1L).otherwise(0L)), lit(0L))
          .as("wins_b"),
        coalesce(sum(when(col("_o") === "t", 1L).otherwise(0L)), lit(0L))
          .as("ties"))
      .select(col("model_a"), col("model_b"), col("n_battles"),
        col("wins_a"), col("wins_b"), col("ties"),
        round((col("wins_a") + col("ties") / 2.0) /
          col("n_battles").cast("double"), 4).as("win_rate_a"),
        round((col("wins_b") + col("ties") / 2.0) /
          col("n_battles").cast("double"), 4).as("win_rate_b"))
  }

  /**
   * Judge-score re-ranking — the cross-encoder / LLM-judge eval readout
   * beside [[winRateMatrix]]'s pairwise battles: each (group,
   * candidate) is scored by several judges (a cross-encoder re-ranker,
   * a judge panel, repeated samples of one judge), the per-candidate
   * scores aggregate to a mean, and candidates re-rank within their
   * group by that mean. Tie handling is explicit and two-layered,
   * because judge panels tie CONSTANTLY on coarse rubrics:
   * `rank` is a standard competition rank over the 4dp-ROUNDED mean
   * (true ties share a rank — rounding first so float noise cannot
   * split a genuine tie, the langIdModel round-before-rank rule), while
   * `is_pick` elects exactly one winner per group deterministically
   * (highest rounded mean, then smallest candidate key — the
   * exact-dedup election convention), which is what a re-rank pipeline
   * that must OUTPUT one candidate actually consumes.
   *
   * Scale shape: one map-side-combined (group, candidate) aggregation +
   * one group-keyed rank window over the CANDIDATE frame (bounded by
   * eval design: candidates/group, not judgments) — no join, no
   * driver state. Output: group, candidate, n_judgments, n_judges,
   * mean_score (4dp), min_score, max_score, rank, is_pick.
   */
  def judgeRerank(df: DataFrame, groupCol: String, candCol: String,
      judgeCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = col(scoreCol).cast("double")
    val perCand = df.filter(s.isNotNull)
      .groupBy(col(groupCol).as("group"), col(candCol).as("candidate"))
      .agg(count(lit(1)).as("n_judgments"),
        countDistinct(col(judgeCol)).as("n_judges"),
        round(avg(s), 4).as("mean_score"),
        round(min(s), 4).as("min_score"),
        round(max(s), 4).as("max_score"))
    val byScore = Window.partitionBy(col("group"))
      .orderBy(col("mean_score").desc)
    val pick = Window.partitionBy(col("group"))
      .orderBy(col("mean_score").desc, col("candidate"))
    perCand
      .withColumn("rank", rank().over(byScore).cast("long"))
      .withColumn("is_pick", (row_number().over(pick) === 1).cast("long"))
  }

  /**
   * Minimum-Bayes-Risk candidate selection (Kumar & Byrne 2004; the
   * modern best-of-n decoding readout, e.g. Bertsch et al. 2023): per
   * group (a prompt / problem), pick the candidate whose EXPECTED
   * similarity to the other sampled candidates is highest — the sample
   * that best represents the consensus, which beats picking by sequence
   * probability when generations disagree. Utility here is token-SET
   * Jaccard (lowercased whitespace tokens, duplicates dropped): cheap,
   * symmetric, and exactly replayable in any engine; two empty token
   * sets count as identical (similarity 1).
   *
   * Work is a group-keyed self-join: per group of k candidates the pair
   * enumeration is k(k−1) — k is the SAMPLES-PER-PROMPT knob (4–64 in
   * practice), set by the eval design, never data-scale, so the plan is
   * linear in groups at any corpus size and the only shuffle is on the
   * group key. A singleton group has no pairs: its candidate is still
   * selected, with NULL mbr_score (avg over nothing), not dropped.
   * Output: one row per group — group, selected id, mbr_score (4dp;
   * NULL for singletons), n_cands. Ties break to the smallest id
   * (deterministic re-runs).
   */
  def mbrSelect(df: DataFrame, groupCol: String, idCol: String,
      textCol: String): DataFrame = {
    val toks = array_distinct(
      filter(split(lower(col(textCol)), "\\s+"), w => w =!= ""))
    // pinned + fanned (r19): cands is read FOUR times below (both
    // self-join sides, the group sizes, the final roster) and the HOF
    // tokenization re-ran per reference — on the scan's own parallelism
    // (profiled: a single 0.72 s scan task). FanOut parallelizes the
    // one tokenization pass that now runs; Ops-scope release.
    val cands = CacheScope.track(FanOut(df)
      .select(col(groupCol).as("grp"), col(idCol).as("id"),
        toks.as("t")))
    val a = cands.select(col("grp"), col("id"), col("t"))
    val b = cands.select(col("grp"), col("id").as("id2"), col("t").as("t2"))
    val inter = size(array_intersect(col("t"), col("t2")))
    val uni = size(array_union(col("t"), col("t2")))
    val sim = when(uni === 0, lit(1.0))
      .otherwise(inter.cast("double") / uni.cast("double"))
    val scored = a.join(b, Seq("grp"))
      .filter(col("id") =!= col("id2"))
      .groupBy("grp", "id")
      .agg(avg(sim).as("mbr"))
    val sizes = cands.groupBy("grp")
      .agg(count(lit(1)).as("n_cands"))
    import org.apache.spark.sql.expressions.Window
    // rank on a 9dp-rounded score: the pairwise similarities are exact
    // rationals but their average is summation-order-dependent in the
    // last bits, and a cross-engine replay must agree on the argmax
    val w = Window.partitionBy("grp")
      .orderBy(round(col("mbr"), 9).desc_nulls_last, col("id").asc)
    cands.select("grp", "id")
      .join(scored, Seq("grp", "id"), "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .join(sizes, Seq("grp"))
      .select(col("grp"), col("id").as("selected"),
        round(col("mbr"), 4).as("mbr_score"), col("n_cands"))
  }

  /**
   * Rank-biased overlap between two top-k rankings (Webber, Moffat &
   * Zobel 2010, "A similarity measure for indefinite rankings") — the
   * ranking-drift readout [[graft.ops.Similarity.rrfFuse]]'s consumers
   * need: did the quantized index, the new scorer, or this week's
   * corpus RE-ORDER what retrieval returns, weighted the way users
   * read lists (top-heavy, persistence p)? This is the exactly-
   * computable truncated form (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d
   * over the two depth-d prefixes — the paper's RBO_min lower bound,
   * no extrapolation silently applied — PREFIX-NORMALIZED by its own
   * maximum 1−p^k so the score reads on [0, 1] exactly: 1 = identical
   * prefixes, 0 = disjoint (the raw truncated form tops out at 1−p^k,
   * a k-dependent ceiling nobody remembers when reading a dashboard).
   *
   * The depth sum never materializes: an item at ranks (ra, rb) is in
   * both prefixes for every d ≥ max(ra, rb), so its total weight is
   * wsum(max(ra, rb)) with wsum(m) = Σ_{d=m..k} p^{d−1}/d — a k-sized
   * literal lookup folded into the plan. One equi-join of the two
   * (bounded, per-group ≤ k rows) shortlists + one groups-sized
   * aggregation; groups present in either input always report (0.0
   * when the prefixes are disjoint). Sums reassociate across
   * partitions at ~1e-17 on |terms| ≤ 1; rbo rounds 6dp.
   * Output: one row per group — group columns, n_common (items shared
   * by the two top-k prefixes), rbo (6dp).
   */
  def rbo(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      idCol: String, rankCol: String, k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(p > 0.0 && p < 1.0, s"persistence p must be in (0,1), got $p")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    // wsum(m) = Σ_{d=m..k} p^{d-1}/d, 1-indexed suffix sums
    val terms = (1 to k).map(d => math.pow(p, d - 1) / d)
    val wsum = terms.scanRight(0.0)(_ + _).init.toArray
    val g = groupCols.map(col)
    def side(df: DataFrame, r: String) = df
      .filter(col(rankCol) >= 1 && col(rankCol) <= k)
      .select(g :+ col(idCol).as("_id") :+
        col(rankCol).cast("int").as(r): _*)
    val joined = side(a, "_ra").join(side(b, "_rb"),
        groupCols :+ "_id")
      .withColumn("_w", element_at(typedlit(wsum),
        greatest(col("_ra"), col("_rb"))))
    val groups = a.select(g: _*).union(b.select(g: _*)).distinct()
    groups.join(
        joined.groupBy(g: _*).agg(count(lit(1)).as("n_common"),
          round(sum(col("_w")) * lit(1.0 - p)
            / lit(1.0 - math.pow(p, k)), 6).as("rbo")),
        groupCols, "left")
      .select(g :+ coalesce(col("n_common"), lit(0L)).as("n_common") :+
        coalesce(col("rbo"), lit(0.0)).as("rbo"): _*)
  }
}
