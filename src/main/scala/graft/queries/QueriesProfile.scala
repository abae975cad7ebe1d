package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}
import graft.QShared._

/** profiling/statistics gates (graft.ops.Profile surface) — one `queries` entry per gate with its DuckDB oracle in
 * `oracles` (same names, same column aliases, same rounding; the
 * SparkEntry contract). Split out of the SparkEntry monolith so an
 * edit to one family can never touch another family's oracle text. */
private[graft] object QueriesProfile {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_describe" -> ((s, dir) =>
      // DESCRIBE-style numeric profile: all three columns' statistics in
      // ONE aggregation over one scan, unpivoted from the 1-row result
      graft.ops.Profile.describeNumeric(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("column")),
    "q_dataset_card" -> ((s, dir) =>
      // one-artifact dataset-card profile: describeNumeric +
      // describeStrings + entropyProfile folded into a single
      // long-format (section, column, metric, value) frame — the
      // multi-operator integration gate the release template renders
      graft.ops.Profile.datasetCard(t(s, dir, "documents"),
          Seq("n_chars"), Seq("lang", "source"))
        .orderBy("section", "column", "metric")),
    "q_key_skew" -> ((s, dir) =>
      // join-key skew diagnosis: heaviest 10 keys with row share and
      // ratio to the mean key load (the salting decision input); totals
      // enter as a 1-row aggregate subtree, top-k is a TakeOrdered
      graft.ops.Profile.keySkew(t(s, dir, "lineitem"), "l_suppkey", 10)),
    "q_group_topk" -> ((s, dir) =>
      // best-n-per-key: top-3 orders per priority by total price, the
      // order key as the unique tiebreak; the rank filter plans as
      // WindowGroupLimit with a partial (pre-shuffle) prune — audited
      graft.ops.Profile.topKPerGroup(
          t(s, dir, "orders")
            .select("o_orderpriority", "o_orderkey", "o_totalprice"),
          Seq("o_orderpriority"),
          Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
        .orderBy("o_orderpriority", "rk")),
    "q_group_quantiles" -> ((s, dir) =>
      graft.ops.Profile.groupQuantiles(t(s, dir, "orders"),
          "o_orderpriority", "o_totalprice", Seq(0.25, 0.5, 0.75, 0.95))
        .orderBy("grp", "q")),
    "q_group_distinct" -> ((s, dir) =>
      graft.ops.Profile.groupDistinct(t(s, dir, "orders"),
          "o_orderpriority", "o_custkey")
        .orderBy("grp")),
    "q_ks_test" -> ((s, dir) => {
      // two-sample KS on the same en-vs-rest split as q_qq_compare:
      // D, where the curves pull apart, and the asymptotic 95% cut
      val d = t(s, dir, "documents")
      graft.ops.Profile.ksTest(
        d.filter(col("lang") === "en"),
        d.filter(col("lang") =!= "en"), "n_chars")
    }),
    "q_emd_drift" -> ((s, dir) => {
      // 1-D Wasserstein on the same en-vs-rest doc-length split as
      // q_ks_test: the integrated CDF gap in CHARACTERS (a location
      // shift of δ chars scores exactly δ), completing the drift
      // family — PSI bins, KS maxes, W1 integrates. n_chars is
      // integral, so scale=0 keeps every term exact
      val d = t(s, dir, "documents")
      graft.ops.Profile.emdDrift(
        d.filter(col("lang") === "en"),
        d.filter(col("lang") =!= "en"), "n_chars", scale = 0)
    }),
    "q_qq_compare" -> ((s, dir) => {
      // Q-Q deciles of doc length: en vs the rest — the drift view
      // that shows WHERE in the distribution a shift lives; two 1-row
      // percentile subtrees, no sample join
      val d = t(s, dir, "documents")
      graft.ops.Profile.qqCompare(
          d.filter(col("lang") === "en"),
          d.filter(col("lang") =!= "en"), "n_chars")
        .orderBy("p")
    }),
    "q_pareto_tail" -> ((s, dir) =>
      // Hill tail exponent of order totals above 300k: can this column
      // be averaged, or does it need medians? one scan aggregation
      graft.ops.Profile.hillTail(t(s, dir, "orders"), "o_totalprice",
        xmin = 300000.0)),
    "q_hazard" -> ((s, dir) => {
      // Nelson-Aalen cumulative hazard on the SAME cohort
      // time-to-first-purchase frame as q_survival: additive hazard
      // mass + Poisson-form se + the Fleming-Harrington exp(-H)
      // cross-check of the KM curve
      val ev = eventsTsUs(s, dir)
      val per = ev.groupBy("user_id").agg(
        min(col("ts_us")).as("_first"),
        max(col("ts_us")).as("_last"),
        min(when(col("event_type") === "purchase", col("ts_us")))
          .as("_fp"))
      val subjects = per.select(
        (col("user_id") % 3).as("cohort"),
        expr("(coalesce(_fp, _last) - _first) div 86400000000")
          .as("duration_days"),
        col("_fp").isNotNull.as("event"))
      graft.ops.Profile.nelsonAalen(subjects, "cohort",
          "duration_days", "event")
        .orderBy("cohort", "t")
    }),
    "q_survival" -> ((s, dir) => {
      // Kaplan-Meier time-to-first-purchase by user cohort: users who
      // never purchase are CENSORED at their last observed event, not
      // dropped — per-cohort cumulative-product windows over the
      // distinct-day frame
      val ev = eventsTsUs(s, dir)
      val per = ev.groupBy("user_id").agg(
        min(col("ts_us")).as("_first"),
        max(col("ts_us")).as("_last"),
        min(when(col("event_type") === "purchase", col("ts_us")))
          .as("_fp"))
      val subjects = per.select(
        (col("user_id") % 3).as("cohort"),
        expr("(coalesce(_fp, _last) - _first) div 86400000000")
          .as("duration_days"),
        col("_fp").isNotNull.as("event"))
      graft.ops.Profile.kaplanMeier(subjects, "cohort", "duration_days",
          "event")
        .orderBy("cohort", "t")
    }),
    "q_chi_square" -> ((s, dir) =>
      // is language independent of source? chi-square + Cramér's V
      // from ONE joint aggregation, empty grid cells folded in via
      // the n - sum(e_observed) identity (the grid never materializes)
      graft.ops.Profile.chiSquare(t(s, dir, "documents"),
        "lang", "source")),
    "q_ab_welch" -> ((s, dir) =>
      // Welch two-sample t-test: does src1's doc length beat src8's
      // beyond sampling noise? one filtered scan aggregation
      graft.ops.Profile.welchTTest(t(s, dir, "documents"), "source",
        "n_chars", "src1", "src8")),
    "q_gains_table" -> ((s, dir) =>
      // decile gains/lift over the shared classifier-eval frame: bins
      // by EXACT percentile cuts (1-row subtree), never a corpus ntile
      graft.ops.Profile.gainsTable(classifierEvalFrame(s, dir),
          "score", "label")
        .orderBy("decile")),
    "q_corr_matrix" -> ((s, dir) =>
      // pairwise Pearson over the lineitem numeric block in ONE scan —
      // guarded moments per pair (the acf rule), k scales expression
      // count, never passes
      graft.ops.Profile.corrMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy("col_a", "col_b")),
    "q_bootstrap_ci" -> ((s, dir) =>
      // per-source mean doc length with Poisson-bootstrap 95% CI —
      // the distributed bootstrap (each row draws its own multiplicity
      // from the md5-uniform ladder; no global-n coordination)
      graft.ops.Profile.bootstrapCI(t(s, dir, "documents"), "source",
          "doc_id", "n_chars", b = 32)
        .orderBy("source")),
    "q_weight_diag" -> ((s, dir) =>
      // survey-weight diagnostics per order priority (weights scaled
      // 1e-5 so 4dp-rounded sums are parallel-sum-proof): Kish ESS,
      // design effect, weight CV, extremes — one keyed aggregation
      graft.ops.Profile.weightDiagnostics(
          t(s, dir, "orders").select(col("o_orderpriority"),
            (col("o_totalprice") / lit(100000.0)).as("w")),
          "o_orderpriority", "w")
        .orderBy("o_orderpriority")),
    "q_stats_drift" -> ((s, dir) => {
      // column-stats drift between corpus versions: the new side drops
      // every 10th doc, nulls lang on 7-multiples, and shifts n_chars
      // by +37 — null_frac, distinct, and mean deltas all genuinely
      // move; one unpivot scan per side, k-row join
      val d = t(s, dir, "documents")
      val oldV = d.select(col("doc_id"), col("lang"), col("n_chars"),
        col("source"))
      val newV = d.filter(col("doc_id") % 10 =!= 0).select(col("doc_id"),
        when(col("doc_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"),
        (col("n_chars") + lit(37L)).as("n_chars"), col("source"))
      graft.ops.Profile.statsDrift(oldV, newV,
          Seq("doc_id", "lang", "n_chars", "source"))
        .orderBy("col_name")
    }),
    "q_impute" -> ((s, dir) => {
      // per-type median imputation of planted gaps, provenance kept;
      // two exact percentile aggs joined back group-keyed
      val ev = t(s, dir, "events").select(col("event_id"),
        col("event_type"),
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")).as("value"))
      graft.ops.Profile.imputeMedian(ev, "event_type", "value")
        .orderBy("event_id")
    }),
    "q_cooccur" -> ((s, dir) => {
      // brands bought together within an order: the association-mining
      // support count; pair forms once by construction (item_a < item_b)
      val bi = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
      graft.ops.Profile.coOccurrence(bi, "l_orderkey", "p_brand",
          minSupport = 40L)
        .orderBy("item_a", "item_b")
    }),
    "q_assoc_rules" -> ((s, dir) => {
      // directed brand rules with confidence and lift over the same
      // baskets; N enters as a 1-row aggregate subtree, never an action
      val bi = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
      graft.ops.Profile.associationRules(bi, "l_orderkey", "p_brand",
          minSupport = 40L)
        .orderBy("antecedent", "consequent")
    }),
    "q_transitions" -> ((s, dir) => {
      // per-user first-order event transition matrix, (ts, type) ordered
      val ev = eventsTsUs(s, dir)
      graft.ops.Profile.transitionMatrix(ev, "user_id", "ts_us", "event_type")
        .orderBy("from_state", "to_state")
    }),
    "q_histogram" -> ((s, dir) => {
      // 20-bin fixed-width price histogram per return flag, empty bins
      // materialized; two keyed aggs + a G·bins grid, nothing global
      graft.ops.Profile.histogram(t(s, dir, "lineitem"), "l_extendedprice",
          20, Seq("l_returnflag"))
        .orderBy("l_returnflag", "bucket")
    }),
    "q_outliers_mad" -> ((s, dir) => {
      // robust median/MAD length outliers per source (Iglewicz–Hoaglin
      // modified z-score 0.6745·|x−med|/MAD > 2.5) — the heavy-tail-
      // immune curation cut; two exact keyed percentile aggs, stats
      // joined back group-keyed
      graft.ops.Profile.robustOutliers(t(s, dir, "documents"), "source",
          "doc_id", "n_chars", k = 2.5)
        .orderBy("source", "doc_id")
    }),
    "q_psi_drift" -> ((s, dir) => {
      // distribution drift: English doc lengths as the reference grid,
      // non-English as the "new" snapshot — per-bin PSI contributions;
      // reference min/max defines the bins, outside values clamp in
      val d = t(s, dir, "documents")
      graft.ops.Profile.psiDrift(d.filter(col("lang") === "en"),
          d.filter(col("lang") =!= "en"), "n_chars", bins = 10)
        .orderBy("bucket")
    }),
    "q_entropy" -> ((s, dir) => {
      // per-column Shannon entropy profile (block-key/partition-key
      // quality signal): all columns in ONE scan via an in-project
      // unpivot, (col, value) counts map-side combined
      graft.ops.Profile.entropyProfile(t(s, dir, "documents"),
          Seq("lang", "source"))
        .orderBy("col_name")
    }),
    "q_theils_u" -> ((s, dir) => {
      // asymmetric categorical association over (lang, source, coarse
      // length bucket): 6 ordered pairs from 3 joint aggregations —
      // the direction-aware redundancy matrix NMI/Cramer's V flatten
      val d = t(s, dir, "documents").select(col("lang"), col("source"),
        expr("cast(n_chars div 300 as string)").as("len_bucket"))
      graft.ops.Profile.theilsU(d, Seq("lang", "len_bucket", "source"))
        .orderBy("col_x", "col_y")
    }),
    "q_mutual_info" -> ((s, dir) => {
      // mutual information between return flag and line status — the
      // feature-redundancy/leakage probe; joint counts once, marginals
      // derived from them, total as a 1-row subtree
      graft.ops.Profile.mutualInfo(t(s, dir, "lineitem"),
        "l_returnflag", "l_linestatus")
    }),
    "q_winsorize" -> ((s, dir) => {
      // per-source doc-length winsorization at the exact [5%, 95%]
      // band — robustOutliers flags the tail, this reins it in
      graft.ops.Profile.winsorize(t(s, dir, "documents"), "source",
          "doc_id", "n_chars", pLo = 0.05, pHi = 0.95)
        .orderBy("source", "doc_id")
    }),
    "q_cusum" -> ((s, dir) => {
      // CUSUM drift alarm over each event type's daily-mean series;
      // daily means 4dp-rounded so the series itself is engine-
      // identical before the sequential fold; oracle replays the
      // recurrence as a recursive CTE
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.cusum(daily, "event_type", "day", "x")
        .orderBy("event_type", "ts")
    }),
    "q_ewma" -> ((s, dir) => {
      // EWMA smoothing of the same daily series cusum alarms on (α=0.3);
      // the oracle replays the recurrence as a recursive CTE — the
      // denoised level a drift dashboard plots
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.ewma(daily, "event_type", "day", "x", alpha = 0.3)
        .orderBy("event_type", "ts")
    }),
    "q_rolling_z" -> ((s, dir) => {
      // rolling z-score spike flags over the daily series: each point
      // scored against its trailing-7 history (never itself); pure
      // window aggregation, one Exchange on the key
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.rollingZ(daily, "event_type", "day", "x",
          window = 7, tau = 2.5, minPts = 3)
        .orderBy("event_type", "ts")
    }),
    "q_describe_strings" -> ((s, dir) =>
      // categorical completeness audit over three orders columns:
      // null/blank shares, exact cardinality, length spread, dominant
      // value — the id-and-category health check describeNumeric
      // cannot give
      graft.ops.Profile.describeStrings(t(s, dir, "orders"),
          Seq("o_orderstatus", "o_orderpriority", "o_orderdate"))
        .orderBy("column")),
    "q_weighted_quantiles" -> ((s, dir) =>
      // weighted CDF inverse per return flag under the same
      // calibration-style weights as q_weighted_stats — reweighting
      // must reach percentile reports, not just means
      graft.ops.Profile.weightedQuantiles(
          t(s, dir, "lineitem").withColumn("w",
            lit(1.0) + (col("l_orderkey") % 5) * 0.5),
          "l_returnflag", "l_quantity", "w", ps = Seq(0.25, 0.5, 0.9))
        .orderBy("l_returnflag", "p")),
    "q_weighted_stats" -> ((s, dir) =>
      // weighted means with Kish-ESS intervals under deterministic
      // calibration-style weights (1 + (orderkey mod 5)/2) — the
      // analysis step that consumes reweighted frames
      graft.ops.Profile.weightedStats(
          t(s, dir, "lineitem").withColumn("w",
            lit(1.0) + (col("l_orderkey") % 5) * 0.5),
          "w", Seq("l_quantity", "l_extendedprice", "l_discount"))
        .orderBy("column")),
    "q_trend_test" -> ((s, dir) => {
      // robust drift trend over the daily series: Mann-Kendall S/tau +
      // exact Theil-Sen median slope per event type (pairwise
      // comparisons — one spike moves one comparison, not the slope)
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.trendTest(daily, "event_type", "day", "x")
        .orderBy("event_type")
    }),
    "q_standardize" -> ((s, dir) =>
      // robust feature scaling ((x − median)/IQR — percentile ==
      // quantile_cont, the exact-quantile convention) over two lineitem
      // measures; deterministic 1% row slice keeps the gate output slim
      // while the params come from the FULL table
      graft.ops.Profile.standardize(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice"), robust = true)
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity_scaled"), col("l_extendedprice_scaled"))
        .orderBy("l_orderkey", "l_linenumber")),
    "q_cms_topk" -> ((s, dir) => {
      // count-min sketch audit: exact top-20 corpus terms vs their CMS
      // estimates (d=4, w=1024 — real collisions at this vocabulary).
      // The one-sided law (n_est >= n_exact, always) is visible in the
      // overcount column; the md5-salted rows replay verbatim in SQL
      val tok = t(s, dir, "documents")
        .select(explode(split(col("text"), " ", -1)).as("term"))
        .filter(col("term") =!= "")
      val top = tok.groupBy("term").agg(count(lit(1)).as("n_exact"))
        .orderBy(desc("n_exact"), col("term")).limit(20)
      val sk = graft.ops.Profile.cmsSketch(tok, "term",
        depth = 4, width = 1024)
      graft.ops.Profile.cmsEstimate(sk, top.select(col("term")), "term",
          depth = 4, width = 1024)
        .withColumnRenamed("value", "term")
        .join(top, "term")
        .select(col("term"), col("n_exact"), col("n_est"),
          (col("n_est") - col("n_exact")).as("overcount"))
        .orderBy(desc("n_exact"), col("term"))
    }),
    "q_histo_depth" -> ((s, dir) =>
      // equi-DEPTH histogram over lineitem prices: exact percentile
      // cuts at i/8 (percentile == quantile_cont), bucket = count of
      // inner cuts strictly below the value — skew shows as uneven
      // counts, the honest signal fixed-width bins flatten
      graft.ops.Profile.histogramEquiDepth(
          t(s, dir, "lineitem"), "l_extendedprice", buckets = 8)
        .orderBy("bucket")),
    "q_seasonal" -> ((s, dir) => {
      // classical additive decomposition of the daily series, weekly
      // period (7 — odd, so the centered window is symmetric): trend =
      // centered 7-day mean (4dp-materialized, the engine-identical
      // family convention), seasonal = recentered per-weekday mean of
      // the detrended series, resid = the exact identity over the
      // rounded outputs
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.seasonalDecompose(daily, "event_type", "day", "x",
          period = 7)
        .orderBy("event_type", "ts")
    }),
    "q_acf" -> ((s, dir) => {
      // autocorrelation of each event type's daily series at lags 1..7:
      // the seasonality probe — ONE keyed window pass builds all lag
      // columns, one aggregation computes every corr; the oracle IS the
      // definition (corr + lag windows)
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.acf(daily, "event_type", "day", "x", maxLag = 7)
        .orderBy("event_type", "lag")
    }),
    "q_holt" -> ((s, dir) => {
      // Holt double-exponential smoothing of the daily series (α=0.3,
      // β=0.2): trend-aware level + one-step forecast; the oracle
      // replays the recurrence as a recursive CTE with identical
      // literal coefficients
      val daily = eventsTsUs(s, dir)
        .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .agg(round(avg("value"), 4).as("x"))
      graft.ops.Profile.holt(daily, "event_type", "day", "x",
          alpha = 0.3, beta = 0.2)
        .orderBy("event_type", "ts")
    }),
    "q_benford" -> ((s, dir) =>
      // Benford first-digit audit of extended prices: arithmetic leading
      // digit (never string rendering), 9-row grid with chi-square terms
      graft.ops.Profile.benford(t(s, dir, "lineitem"), "l_extendedprice")
        .orderBy("digit")),
    "q_concentration" -> ((s, dir) =>
      // revenue-concentration audit: Gini + HHI + top-share of customer
      // order totals — one keyed agg then a KEY-level ranked pass
      graft.ops.Profile.concentration(t(s, dir, "orders"), "o_custkey",
        "o_totalprice")),
    "q_cohen_kappa" -> ((s, dir) => {
      // chance-corrected agreement between two length-derived labelers
      // (char-bucket vs token-bucket) — the annotation-QA scan shape;
      // thresholds deliberately disagree on a real slice of docs
      val d = t(s, dir, "documents")
      val labeled = d.select(
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 800, "mid").otherwise("long").as("by_chars"),
        when(size(filter(split(col("text"), " ", -1), x => x =!= "")) < 40,
            "short")
          .when(size(filter(split(col("text"), " ", -1), x => x =!= "")) < 160,
            "mid")
          .otherwise("long").as("by_tokens"))
      graft.ops.Profile.cohenKappa(labeled, "by_chars", "by_tokens")
    }),
    "q_classifier_metrics" -> ((s, dir) => {
      // confusion metrics at a threshold for a deterministic (and
      // honestly near-random on this synthetic corpus) stopword-density
      // scorer vs the lang=en label; one full-scan aggregation
      graft.ops.Profile.classifierMetrics(classifierEvalFrame(s, dir),
        "score", "label", threshold = 0.03)
    }),
    "q_calibration" -> ((s, dir) => {
      // per-bin calibration decomposition (confidence vs observed
      // positive rate), empty bins materialized
      graft.ops.Profile.calibration(classifierEvalFrame(s, dir),
          "score", "label", bins = 10)
        .orderBy("bucket")
    }),
    "q_brier" -> ((s, dir) =>
      // proper scoring rule + Murphy decomposition on the same
      // classifier frame and bucket convention as q_calibration:
      // which part of the loss is miscalibration vs missing sharpness
      graft.ops.Profile.brierScore(classifierEvalFrame(s, dir),
        "score", "label", bins = 10)),
    "q_isotonic" -> ((s, dir) =>
      // PAV isotonic fit over the same classifier frame and bucket
      // convention as q_calibration: the best monotone P(label|score),
      // pooled rates as exact long rationals — the oracle replays the
      // fit through the minimax identity over integer cumulatives
      graft.ops.Profile.isotonicCalibration(classifierEvalFrame(s, dir),
          "score", "label", bins = 10)
        .orderBy("bucket")),
    "q_roc_auc" -> ((s, dir) => {
      // exact rank-sum AUC with tie half-credit; scores 4dp-rounded so
      // the distinct-score walk is bounded (the documented envelope)
      graft.ops.Profile.rocAuc(classifierEvalFrame(s, dir),
        "score", "label")
    }),
    "q_mbr_select" -> ((s, dir) => {
      // Minimum-Bayes-Risk best-of-n selection: every 10 consecutive
      // docs form a candidate group (the sampled-generations shape);
      // the consensus candidate wins by mean pairwise token-set Jaccard
      val d = t(s, dir, "documents")
        .select(floor(col("doc_id") / 10).cast("long").as("grp"),
          col("doc_id").as("cid"), col("text"))
      graft.ops.Eval.mbrSelect(d, "grp", "cid", "text")
        .orderBy("grp")
    }),
    "q_pass_at_k" -> ((s, dir) => {
      // unbiased pass@k (Chen et al. 2021 eq. 1) over a deterministic
      // sampled-completion table: doc_id % 40 is the problem, an
      // md5-derived 30% coin is per-sample correctness — the code-eval
      // readout. One groupBy to (problem, n, c), one 1-row aggregate for
      // every k, rows via stack
      val d = t(s, dir, "documents")
      val samples = d.select(
        (col("doc_id") % 40).as("problem"),
        (conv(substring(md5(concat(lit("pk|"), col("doc_id"))), 1, 4),
          16, 10).cast("long") % 10 < 3).as("correct"))
      graft.ops.Eval.passAtK(samples, "problem", "correct", Seq(1, 5, 10))
        .orderBy("k")
    }),
    "q_rbo" -> ((s, dir) => {
      // ranking drift read the way users read lists: per event_type,
      // the top-20 users by event count in the even-event_id half vs
      // the odd half; truncated RBO@20 (p=0.9) between the two
      // rankings — shortlists built through the topKPerGroup prune,
      // the RBO join then touches only 2·20 rows per group
      val ev = t(s, dir, "events")
      def ranked(par: Int) = graft.ops.Profile.topKPerGroup(
        ev.filter(col("event_id") % 2 === par)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n")),
        Seq("event_type"), Seq(col("n").desc, col("user_id").asc), 20)
      graft.ops.Eval.rbo(ranked(0), ranked(1), Seq("event_type"),
          "user_id", "rk", k = 20, p = 0.9)
        .orderBy("event_type")
    }),
    "q_fleiss_kappa" -> ((s, dir) => {
      // multi-rater chance-corrected agreement: three deterministic
      // length-derived labelers (char buckets, token buckets, shifted
      // char buckets) rate every document; constant panel of 3 so the
      // modal-count filter keeps everything — the annotation-QA readout
      val d = t(s, dir, "documents")
      val toks = size(filter(split(col("text"), " ", -1), x => x =!= ""))
      val rated = d.select(col("doc_id"), explode(array(
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 800, "mid").otherwise("long"),
        when(toks < 40, "short").when(toks < 160, "mid").otherwise("long"),
        when(col("n_chars") < 300, "short")
          .when(col("n_chars") < 700, "mid").otherwise("long"))).as("cat"))
      graft.ops.Eval.fleissKappa(rated, "doc_id", "cat")
    }),
    "q_krippendorff" -> ((s, dir) => {
      // variable-panel agreement — the regime fleissKappa must drop:
      // two full-panel deterministic labelers plus a third that rates
      // only even doc_ids, so units carry 2 OR 3 ratings and every one
      // still contributes pairable information
      val d = t(s, dir, "documents")
      val toks = size(filter(split(col("text"), " ", -1), x => x =!= ""))
      val full = d.select(col("doc_id"), explode(array(
        when(col("n_chars") < 200, "short")
          .when(col("n_chars") < 800, "mid").otherwise("long"),
        when(toks < 40, "short").when(toks < 160, "mid")
          .otherwise("long"))).as("cat"))
      val third = d.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), when(col("n_chars") < 300, "short")
          .when(col("n_chars") < 700, "mid").otherwise("long").as("cat"))
      graft.ops.Eval.krippendorffAlpha(full.unionAll(third),
        "doc_id", "cat")
    }),
    "q_mcnemar" -> ((s, dir) => {
      // paired model comparison on the SAME docs (unpaired tests
      // overstate significance on shared eval sets): truth = long doc
      // (n_chars > 400); model A thresholds chars at 380, model B
      // thresholds tokens at 80 — correctness flags per item, McNemar
      // conditions on the discordant cells
      val d = t(s, dir, "documents")
      val toks = size(filter(split(col("text"), " ", -1), x => x =!= ""))
      val truth = col("n_chars") > 400
      graft.ops.Eval.mcnemar(
        d.select(col("doc_id"),
          ((col("n_chars") > 380) === truth).as("ca"),
          ((toks > 80) === truth).as("cb")),
        "doc_id", "ca", "cb")
    }),
    "q_majority_vote" -> ((s, dir) => {
      // self-consistency election (Wang et al. 2022): doc_id % 50 is the
      // problem, lang is the sampled answer; modal answer per problem
      // with deterministic lexicographic tie-break and margin over the
      // runner-up. One keyed count + a per-problem top-2 window
      val d = t(s, dir, "documents")
      graft.ops.Eval.majorityVote(
          d.select((col("doc_id") % 50).as("problem"), col("lang")),
          "problem", "lang")
        .orderBy("problem")
    }),
    "q_mann_whitney" -> ((s, dir) =>
      // rank-sum test, open vs filled orders on total price: ranks from
      // the distinct-value walk, exact tie correction, z cut — the
      // skew-proof experiment readout next to q_ab_welch
      graft.ops.Profile.mannWhitney(t(s, dir, "orders"),
        "o_orderstatus", "o_totalprice", "O", "F")),
    "q_spearman" -> ((s, dir) =>
      // monotone association of quantity and extended price (price =
      // qty × unit price, so rank agreement is high but not 1 — unit
      // prices vary); average-tie ranks per DISTINCT value, joined back
      graft.ops.Profile.spearman(t(s, dir, "lineitem"),
        "l_quantity", "l_extendedprice")),
    "q_bh_fdr" -> ((s, dir) => {
      // Benjamini–Hochberg step-up over 25 deterministic per-nation
      // p-values (md5-derived uniform, cubed so a few clear the cut) —
      // the multiple-testing discipline for per-segment test families
      val p = round(pow(
        pmod(conv(substring(md5(concat(lit("bh|"),
          col("n_nationkey").cast("string"))), 1, 6), 16, 10)
          .cast("long"), lit(10000L)) / 10000.0, 3), 6)
      graft.ops.Profile.bhAdjust(
          t(s, dir, "nation").select(col("n_name"), p.as("p")),
          "n_name", "p")
        .orderBy("rank")
    }),
    "q_holm" -> ((s, dir) => {
      // Holm step-down over the SAME 25 md5-derived per-nation p-values
      // as q_bh_fdr — the FWER-control discipline beside BH's FDR; the
      // running max replays as a window in the oracle, a DistScan here
      val p = round(pow(
        pmod(conv(substring(md5(concat(lit("bh|"),
          col("n_nationkey").cast("string"))), 1, 6), 16, 10)
          .cast("long"), lit(10000L)) / 10000.0, 3), 6)
      graft.ops.Profile.holmAdjust(
          t(s, dir, "nation").select(col("n_name"), p.as("p")),
          "n_name", "p")
        .orderBy("rank")
    }),
    "q_bradley_terry" -> ((s, dir) => {
      // preference fit over language "systems": consecutive doc pairs
      // (2i, 2i+1) are matches, the longer doc's language wins; 10 MM
      // iterations on the aggregated win matrix, ratings sum to 1
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val a = d.filter(col("doc_id") % 2 === 0).select(
        col("doc_id").as("ida"), col("lang").as("la"),
        col("n_chars").as("ca"))
      val b = d.select((col("doc_id") - 1).as("ida"),
        col("lang").as("lb"), col("n_chars").as("cb"))
      val m = a.join(b, Seq("ida"))
        .filter(col("ca") =!= col("cb") && col("la") =!= col("lb"))
        .select(
          when(col("ca") > col("cb"), col("la")).otherwise(col("lb"))
            .as("winner"),
          when(col("ca") > col("cb"), col("lb")).otherwise(col("la"))
            .as("loser"))
      graft.ops.Eval.bradleyTerry(m, "winner", "loser", iters = 10)
        .orderBy("rank", "item")
    }),
    "q_winrate_matrix" -> ((s, dir) => {
      // arena-style head-to-head record over the SAME battle pairing as
      // q_bradley_terry, ties kept (equal-length battles get no winner):
      // per unordered language pair, win/loss/tie counts + the
      // tie-splitting win rate — one groupBy, no driver state
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val a = d.filter(col("doc_id") % 2 === 0).select(
        col("doc_id").as("ida"), col("lang").as("la"),
        col("n_chars").as("ca"))
      val b = d.select((col("doc_id") - 1).as("ida"),
        col("lang").as("lb"), col("n_chars").as("cb"))
      val m = a.join(b, Seq("ida"))
        .select(col("la").as("ma"), col("lb").as("mb"),
          when(col("ca") > col("cb"), col("la"))
            .when(col("cb") > col("ca"), col("lb")).as("win"))
      graft.ops.Eval.winRateMatrix(m, "ma", "mb", "win")
        .orderBy("model_a", "model_b")
    }),
    "q_judge_rerank" -> ((s, dir) => {
      // cross-encoder-style judge-score re-ranking: candidates scored
      // by a 3-judge panel on a coarse deterministic rubric —
      // candidates 1..4 score (grp + cand) % 3 (judge-independent, so
      // within-group exact TIES are guaranteed and `rank` must share
      // them), candidate 0 scores judge % 2 (judge-DEPENDENT, so its
      // mean/min/max split); is_pick elects exactly one winner per
      // group by (mean desc, candidate asc)
      val j = t(s, dir, "orders").select(
        (col("o_custkey") % 50).as("grp"),
        (col("o_orderkey") % 5).as("cand"),
        (col("o_orderkey") % 3).as("judge"))
        .withColumn("score",
          when(col("cand") === 0, (col("judge") % 2).cast("double"))
            .otherwise(((col("grp") + col("cand")) % 3).cast("double")))
      graft.ops.Eval.judgeRerank(j, "grp", "cand", "judge", "score")
        .orderBy("group", "candidate")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_describe" ->
      """SELECT 'l_quantity' AS "column", count(l_quantity) AS n,
        |  (count(*) - count(l_quantity)) AS n_nulls,
        |  round(min(l_quantity), 4) AS min_v, round(max(l_quantity), 4) AS max_v,
        |  round(avg(l_quantity), 4) AS mean_v,
        |  round(stddev_samp(l_quantity), 4) AS sd_v
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(l_extendedprice),
        |  count(*) - count(l_extendedprice),
        |  round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
        |  round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_discount', count(l_discount), count(*) - count(l_discount),
        |  round(min(l_discount), 4), round(max(l_discount), 4),
        |  round(avg(l_discount), 4), round(stddev_samp(l_discount), 4)
        |FROM lineitem
        |ORDER BY "column"""".stripMargin,
    // the three component oracles (q_describe / q_describe_strings /
    // q_entropy conventions) reshaped into the card's long format —
    // each statistic cast to DOUBLE exactly as the engine does
    "q_dataset_card" ->
      """WITH nrows AS (SELECT count(*)::BIGINT AS c FROM documents),
        |num AS (SELECT count(n_chars)::BIGINT AS n,
        |    (count(*) - count(n_chars))::BIGINT AS n_nulls,
        |    round(min(n_chars), 4) AS min_v,
        |    round(max(n_chars), 4) AS max_v,
        |    round(avg(n_chars), 4) AS mean_v,
        |    round(stddev_samp(n_chars), 4) AS sd_v
        |  FROM documents),
        |s1 AS (SELECT 'lang' AS col, lang::VARCHAR AS v FROM documents
        |  UNION ALL SELECT 'source', source FROM documents),
        |st AS (SELECT col, count(*)::BIGINT AS n,
        |    sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
        |    sum(CASE WHEN v IS NOT NULL AND trim(v) = '' THEN 1
        |      ELSE 0 END)::BIGINT AS blanks,
        |    count(DISTINCT v)::BIGINT AS n_distinct,
        |    min(length(v))::BIGINT AS len_min,
        |    max(length(v))::BIGINT AS len_max
        |  FROM s1 GROUP BY col),
        |tp AS (SELECT col, c FROM (
        |    SELECT col, v, count(*)::BIGINT AS c, row_number()
        |      OVER (PARTITION BY col ORDER BY count(*) DESC, v) AS rn
        |    FROM s1 WHERE v IS NOT NULL GROUP BY col, v) WHERE rn = 1),
        |sm AS (SELECT st.col, n, nulls, blanks, n_distinct, len_min,
        |    len_max, round(c / (n - nulls), 4) AS top_share
        |  FROM st JOIN tp ON tp.col = st.col),
        |ec AS (SELECT col, v, count(*)::BIGINT AS c FROM s1
        |  GROUP BY 1, 2),
        |ea AS (SELECT col, sum(c)::BIGINT AS n,
        |    coalesce(sum(c) FILTER (WHERE v IS NULL), 0)::BIGINT
        |      AS n_nulls,
        |    count(*) FILTER (WHERE v IS NOT NULL)::BIGINT AS n_distinct,
        |    (sum(c) FILTER (WHERE v IS NOT NULL))::DOUBLE AS nn,
        |    sum(c * ln(c)) FILTER (WHERE v IS NOT NULL) AS clogc
        |  FROM ec GROUP BY 1),
        |em AS (SELECT col, n, n_nulls, n_distinct,
        |    round(CASE WHEN nn > 0 THEN ln(nn) - clogc / nn
        |      ELSE 0.0 END, 4) AS entropy,
        |    round(CASE WHEN n_distinct > 1
        |      THEN (ln(nn) - clogc / nn) / ln(n_distinct::DOUBLE)
        |      ELSE 0.0 END, 4) AS norm_entropy
        |  FROM ea),
        |lng AS (
        |  SELECT 'table' AS section, '*' AS "column",
        |    'n_rows' AS metric, c::DOUBLE AS value FROM nrows
        |  UNION ALL SELECT 'numeric', 'n_chars', 'n', n::DOUBLE FROM num
        |  UNION ALL SELECT 'numeric', 'n_chars', 'n_nulls',
        |    n_nulls::DOUBLE FROM num
        |  UNION ALL SELECT 'numeric', 'n_chars', 'min_v',
        |    min_v::DOUBLE FROM num
        |  UNION ALL SELECT 'numeric', 'n_chars', 'max_v',
        |    max_v::DOUBLE FROM num
        |  UNION ALL SELECT 'numeric', 'n_chars', 'mean_v',
        |    mean_v::DOUBLE FROM num
        |  UNION ALL SELECT 'numeric', 'n_chars', 'sd_v',
        |    sd_v::DOUBLE FROM num
        |  UNION ALL SELECT 'string', col, 'n', n::DOUBLE FROM sm
        |  UNION ALL SELECT 'string', col, 'nulls', nulls::DOUBLE FROM sm
        |  UNION ALL SELECT 'string', col, 'blanks',
        |    blanks::DOUBLE FROM sm
        |  UNION ALL SELECT 'string', col, 'n_distinct',
        |    n_distinct::DOUBLE FROM sm
        |  UNION ALL SELECT 'string', col, 'len_min',
        |    len_min::DOUBLE FROM sm
        |  UNION ALL SELECT 'string', col, 'len_max',
        |    len_max::DOUBLE FROM sm
        |  UNION ALL SELECT 'string', col, 'top_share',
        |    top_share::DOUBLE FROM sm
        |  UNION ALL SELECT 'entropy', col, 'n', n::DOUBLE FROM em
        |  UNION ALL SELECT 'entropy', col, 'n_nulls',
        |    n_nulls::DOUBLE FROM em
        |  UNION ALL SELECT 'entropy', col, 'n_distinct',
        |    n_distinct::DOUBLE FROM em
        |  UNION ALL SELECT 'entropy', col, 'entropy',
        |    entropy::DOUBLE FROM em
        |  UNION ALL SELECT 'entropy', col, 'norm_entropy',
        |    norm_entropy::DOUBLE FROM em)
        |SELECT section, "column", metric, value FROM lng
        |ORDER BY section, "column", metric""".stripMargin,
    "q_group_topk" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rk
        |  FROM orders)
        |SELECT o_orderpriority, o_orderkey, o_totalprice, rk
        |FROM r WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "q_key_skew" ->
      """WITH c AS (SELECT l_suppkey AS key, count(*) AS n
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS total, count(*)::DOUBLE AS n_keys
        |  FROM c)
        |SELECT key, n, round(n / t.total, 6) AS share,
        |  round(n * t.n_keys / t.total, 4) AS ratio_to_avg
        |FROM c, t
        |ORDER BY n DESC, key
        |LIMIT 10""".stripMargin,
    "q_group_distinct" ->
      """SELECT o_orderpriority AS grp,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  count(o_custkey) AS n_values,
        |  count(*) AS n_rows
        |FROM orders GROUP BY o_orderpriority ORDER BY grp""".stripMargin,
    "q_group_quantiles" ->
      """WITH a AS (
        |  SELECT o_orderpriority AS grp,
        |    quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.95]) AS vs,
        |    count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT grp, CAST(([0.25, 0.5, 0.75, 0.95])[i] AS DOUBLE) AS q,
        |  round(vs[i], 4) AS value, n
        |FROM a, unnest(generate_series(1, 4)) AS u(i)
        |ORDER BY grp, q""".stripMargin,
    "q_ks_test" ->
      """WITH a AS (SELECT round(n_chars::DOUBLE, 4) AS v FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL),
        |b AS (SELECT round(n_chars::DOUBLE, 4) AS v FROM documents
        |  WHERE lang <> 'en' AND n_chars IS NOT NULL),
        |ca AS (SELECT v, count(*)::BIGINT AS c FROM a GROUP BY v),
        |cb AS (SELECT v, count(*)::BIGINT AS c FROM b GROUP BY v),
        |m AS (SELECT v, coalesce(ca.c, 0) AS cca,
        |    coalesce(cb.c, 0) AS ccb
        |  FROM ca FULL OUTER JOIN cb USING (v)),
        |t AS (SELECT sum(cca)::BIGINT AS na, sum(ccb)::BIGINT AS nb
        |  FROM m),
        |wlk AS (SELECT v, round(abs(
        |    sum(cca) OVER win / t.na::DOUBLE
        |      - sum(ccb) OVER win / t.nb::DOUBLE), 6) AS d
        |  FROM m, t WINDOW win AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |mx AS (SELECT max(d) AS md FROM wlk)
        |SELECT t.na AS n_a, t.nb AS n_b, round(mx.md, 4) AS d_stat,
        |  round((SELECT min(v) FROM wlk WHERE wlk.d = mx.md), 4)
        |    AS d_at,
        |  round(1.358 * sqrt((t.na + t.nb) / (t.na * t.nb)::DOUBLE), 4)
        |    AS d_crit95,
        |  round(mx.md, 4)
        |    > round(1.358 * sqrt((t.na + t.nb)
        |      / (t.na * t.nb)::DOUBLE), 4) AS significant
        |FROM t, mx""".stripMargin,
    // W1 as the naive single-window replay of the engine's two
    // distributed prefix scans: EXCLUSIVE cumulatives (the CDF on
    // [v_{i-1}, v_i) is everything strictly before row i), integer
    // gap x |cumA·nb - cumB·na| terms summed in HUGEINT (exact,
    // order-free), one double division at the end — scale=0 because
    // n_chars is integral
    "q_emd_drift" ->
      """WITH x AS (SELECT round(n_chars::DOUBLE)::BIGINT AS v,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ia,
        |    CASE WHEN lang <> 'en' THEN 1 ELSE 0 END AS ib
        |  FROM documents WHERE n_chars IS NOT NULL),
        |cells AS (SELECT v, sum(ia)::BIGINT AS ca, sum(ib)::BIGINT AS cb
        |  FROM x GROUP BY 1),
        |t AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
        |  FROM cells),
        |c AS (SELECT v,
        |    coalesce(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cca,
        |    coalesce(sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0)::BIGINT AS ccb,
        |    lag(v) OVER (ORDER BY v) AS pv
        |  FROM cells),
        |s AS (SELECT count(*)::BIGINT AS n_cells,
        |    sum((v - coalesce(pv, v))::HUGEINT
        |      * abs(cca::HUGEINT * t.nb - ccb::HUGEINT * t.na)) AS tt
        |  FROM c, t)
        |SELECT t.na AS n_a, t.nb AS n_b, s.n_cells,
        |  CASE WHEN t.na > 0 AND t.nb > 0
        |    THEN round(tt::DOUBLE
        |      / (t.na::DOUBLE * t.nb::DOUBLE * 1.0), 6) END AS w1
        |FROM s, t""".stripMargin,
    "q_qq_compare" ->
      """WITH a AS (SELECT n_chars::DOUBLE AS x FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL),
        |b AS (SELECT n_chars::DOUBLE AS x FROM documents
        |  WHERE lang <> 'en' AND n_chars IS NOT NULL),
        |qa AS (SELECT [quantile_cont(x, 0.1), quantile_cont(x, 0.2),
        |    quantile_cont(x, 0.3), quantile_cont(x, 0.4),
        |    quantile_cont(x, 0.5), quantile_cont(x, 0.6),
        |    quantile_cont(x, 0.7), quantile_cont(x, 0.8),
        |    quantile_cont(x, 0.9)] AS cs FROM a),
        |qb AS (SELECT [quantile_cont(x, 0.1), quantile_cont(x, 0.2),
        |    quantile_cont(x, 0.3), quantile_cont(x, 0.4),
        |    quantile_cont(x, 0.5), quantile_cont(x, 0.6),
        |    quantile_cont(x, 0.7), quantile_cont(x, 0.8),
        |    quantile_cont(x, 0.9)] AS cs FROM b)
        |SELECT round(p / 10.0, 4) AS p, round(qa.cs[p], 4) AS q_a,
        |  round(qb.cs[p], 4) AS q_b,
        |  round(qb.cs[p] - qa.cs[p], 4) + 0.0 AS gap
        |FROM unnest(generate_series(1, 9)) AS u(p), qa, qb
        |ORDER BY p""".stripMargin,
    "q_pareto_tail" ->
      """SELECT 300000.0 AS xmin,
        |  count(*) FILTER (WHERE o_totalprice >= 300000.0)::BIGINT
        |    AS n_tail,
        |  count(*)::BIGINT AS n_total,
        |  round(count(*) FILTER (WHERE o_totalprice >= 300000.0)
        |    / count(*)::DOUBLE, 4) AS tail_frac,
        |  CASE WHEN count(*) FILTER (WHERE o_totalprice >= 300000.0) >= 2
        |      AND sum(CASE WHEN o_totalprice >= 300000.0
        |        THEN ln(o_totalprice::DOUBLE / 300000.0) END) > 0
        |    THEN round(1.0
        |      + count(*) FILTER (WHERE o_totalprice >= 300000.0)
        |      / sum(CASE WHEN o_totalprice >= 300000.0
        |        THEN ln(o_totalprice::DOUBLE / 300000.0) END), 4)
        |  END AS alpha,
        |  CASE WHEN count(*) FILTER (WHERE o_totalprice >= 300000.0) >= 2
        |      AND sum(CASE WHEN o_totalprice >= 300000.0
        |        THEN ln(o_totalprice::DOUBLE / 300000.0) END) > 0
        |    THEN round(count(*) FILTER (WHERE o_totalprice >= 300000.0)
        |      / sum(CASE WHEN o_totalprice >= 300000.0
        |        THEN ln(o_totalprice::DOUBLE / 300000.0) END)
        |      / sqrt(count(*) FILTER (WHERE o_totalprice >= 300000.0)
        |        ::DOUBLE), 4)
        |  END AS se
        |FROM orders WHERE o_totalprice IS NOT NULL""".stripMargin,
    // the q_survival risk-set CTEs with additive hazard sums instead
    // of the log-product: H = cum d/n, var = cum d/n², exp(-H) —
    // window sums run in the identical per-cohort t-order, so the FP
    // accumulation sequence matches the engine's
    "q_hazard" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_type AS ty FROM events),
        |per AS (SELECT u, min(t) AS f, max(t) AS l,
        |    min(CASE WHEN ty = 'purchase' THEN t END) AS fp
        |  FROM e GROUP BY u),
        |subj AS (SELECT u % 3 AS cohort,
        |    (coalesce(fp, l) - f) // 86400000000 AS t,
        |    fp IS NOT NULL AS ev FROM per),
        |at AS (SELECT cohort, t::DOUBLE AS t,
        |    count(*) FILTER (WHERE ev)::BIGINT AS d,
        |    count(*) FILTER (WHERE NOT ev)::BIGINT AS c
        |  FROM subj GROUP BY 1, 2),
        |tot AS (SELECT cohort, count(*)::BIGINT AS n FROM subj
        |  GROUP BY cohort),
        |risk AS (SELECT at.cohort, at.t, at.d, at.c,
        |    tot.n - coalesce(sum(at.d + at.c) OVER (PARTITION BY at.cohort
        |      ORDER BY at.t ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS n_at_risk
        |  FROM at JOIN tot USING (cohort)),
        |na AS (SELECT cohort, t, n_at_risk, d, c,
        |    sum(d / n_at_risk::DOUBLE) OVER win AS h,
        |    sum(d / (n_at_risk::DOUBLE * n_at_risk)) OVER win AS v
        |  FROM risk WINDOW win AS (PARTITION BY cohort ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT cohort, t, n_at_risk::BIGINT AS n_at_risk,
        |  d AS d_events, c AS c_censored,
        |  round(h, 4) AS hazard, round(sqrt(v), 4) AS se_hazard,
        |  round(exp(-h), 4) AS fh_survival
        |FROM na ORDER BY cohort, t""".stripMargin,
    "q_survival" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_type AS ty FROM events),
        |per AS (SELECT u, min(t) AS f, max(t) AS l,
        |    min(CASE WHEN ty = 'purchase' THEN t END) AS fp
        |  FROM e GROUP BY u),
        |subj AS (SELECT u % 3 AS cohort,
        |    (coalesce(fp, l) - f) // 86400000000 AS t,
        |    fp IS NOT NULL AS ev FROM per),
        |at AS (SELECT cohort, t::DOUBLE AS t,
        |    count(*) FILTER (WHERE ev)::BIGINT AS d,
        |    count(*) FILTER (WHERE NOT ev)::BIGINT AS c
        |  FROM subj GROUP BY 1, 2),
        |tot AS (SELECT cohort, count(*)::BIGINT AS n FROM subj
        |  GROUP BY cohort),
        |risk AS (SELECT at.cohort, at.t, at.d, at.c,
        |    tot.n - coalesce(sum(at.d + at.c) OVER (PARTITION BY at.cohort
        |      ORDER BY at.t ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS n_at_risk
        |  FROM at JOIN tot USING (cohort)),
        |km AS (SELECT cohort, t, n_at_risk, d, c,
        |    max(CASE WHEN d = n_at_risk THEN 1 ELSE 0 END)
        |      OVER win AS dead,
        |    sum(CASE WHEN d > 0 AND d < n_at_risk
        |      THEN ln(1 - d / n_at_risk::DOUBLE)
        |      ELSE 0.0 END) OVER win AS lsum
        |  FROM risk WINDOW win AS (PARTITION BY cohort ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT cohort, t, n_at_risk::BIGINT AS n_at_risk,
        |  d AS d_events, c AS c_censored,
        |  CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lsum), 4) END
        |    AS survival
        |FROM km ORDER BY cohort, t""".stripMargin,
    "q_chi_square" ->
      """WITH j AS (SELECT lang::VARCHAR AS a, source::VARCHAR AS b,
        |    count(*)::BIGINT AS c FROM documents
        |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
        |ma AS (SELECT a, sum(c)::DOUBLE AS ca FROM j GROUP BY a),
        |mb AS (SELECT b, sum(c)::DOUBLE AS cb FROM j GROUP BY b),
        |t AS (SELECT sum(c)::DOUBLE AS n FROM j),
        |agg AS (SELECT max(t.n)::BIGINT AS n,
        |    count(DISTINCT j.a)::BIGINT AS n_a,
        |    count(DISTINCT j.b)::BIGINT AS n_b,
        |    sum(pow(j.c - ma.ca * mb.cb / t.n, 2)
        |      / (ma.ca * mb.cb / t.n) - ma.ca * mb.cb / t.n)
        |      + max(t.n) AS chi2
        |  FROM j JOIN ma USING (a) JOIN mb USING (b), t)
        |SELECT n, n_a, n_b, (n_a - 1) * (n_b - 1) AS dof,
        |  round(CASE WHEN n_a > 1 AND n_b > 1 THEN chi2 ELSE 0.0 END, 4)
        |    AS chi2,
        |  round(CASE WHEN n_a > 1 AND n_b > 1
        |    THEN sqrt(greatest(0.0, chi2)
        |      / (n * least(n_a - 1, n_b - 1)))
        |    ELSE 0.0 END, 4) AS cramers_v
        |FROM agg""".stripMargin,
    "q_ab_welch" ->
      """WITH x AS (SELECT source, n_chars::DOUBLE AS x FROM documents
        |  WHERE source IN ('src1', 'src8') AND n_chars IS NOT NULL),
        |a AS (SELECT count(*)::BIGINT AS n_a, avg(x) AS ma,
        |    var_samp(x) AS va FROM x WHERE source = 'src1'),
        |b AS (SELECT count(*)::BIGINT AS n_b, avg(x) AS mb,
        |    var_samp(x) AS vb FROM x WHERE source = 'src8')
        |SELECT n_a, n_b, round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
        |  round(ma - mb, 4) + 0.0 AS diff,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND (va / n_a + vb / n_b) > 0
        |    THEN round((ma - mb) / sqrt(va / n_a + vb / n_b), 4) + 0.0
        |  END AS t_stat,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND (va / n_a + vb / n_b) > 0
        |    THEN round(pow(va / n_a + vb / n_b, 2)
        |      / (pow(va / n_a, 2) / (n_a - 1)
        |        + pow(vb / n_b, 2) / (n_b - 1)), 2)
        |  END AS df,
        |  coalesce(CASE WHEN n_a >= 2 AND n_b >= 2
        |      AND (va / n_a + vb / n_b) > 0
        |    THEN abs((ma - mb) / sqrt(va / n_a + vb / n_b)) > 1.96
        |  END, false) AS significant
        |FROM a, b""".stripMargin,
    "q_gains_table" -> (classifierEvalCte +
      """base AS (SELECT score AS s, label AS y FROM sc
        |  WHERE score IS NOT NULL),
        |cuts AS (SELECT [quantile_cont(s, 0.1), quantile_cont(s, 0.2),
        |    quantile_cont(s, 0.3), quantile_cont(s, 0.4),
        |    quantile_cont(s, 0.5), quantile_cont(s, 0.6),
        |    quantile_cont(s, 0.7), quantile_cont(s, 0.8),
        |    quantile_cont(s, 0.9)] AS cs FROM base),
        |binned AS (SELECT 1 + len(list_filter(cs, c -> c >= s)) AS decile,
        |    y FROM base, cuts),
        |pb AS (SELECT decile, count(*)::BIGINT AS n,
        |    count(*) FILTER (WHERE y)::BIGINT AS n_pos
        |  FROM binned GROUP BY decile),
        |tt AS (SELECT sum(n)::DOUBLE AS tn, sum(n_pos)::DOUBLE AS tp
        |  FROM pb),
        |cum AS (SELECT decile, n, n_pos,
        |    sum(n) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS cn,
        |    sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        |      AS cp FROM pb)
        |SELECT decile::BIGINT AS decile, n, n_pos,
        |  round(n_pos / n::DOUBLE, 4) AS pos_rate,
        |  round(CASE WHEN tp > 0 THEN cp / tp ELSE 0.0 END, 4) AS cum_gain,
        |  round(CASE WHEN tp > 0 THEN (cp / tp) / (cn / tn)
        |    ELSE 0.0 END, 4) AS lift
        |FROM cum, tt ORDER BY decile""".stripMargin),
    "q_corr_matrix" ->
      """SELECT * FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    count(*)::BIGINT AS n_pairs,
        |    round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr
        |  FROM lineitem UNION ALL
        |  SELECT 'l_quantity', 'l_discount', count(*)::BIGINT,
        |    round(corr(l_quantity, l_discount), 4) + 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity', 'l_tax', count(*)::BIGINT,
        |    round(corr(l_quantity, l_tax), 4) + 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_discount', count(*)::BIGINT,
        |    round(corr(l_extendedprice, l_discount), 4) + 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', 'l_tax', count(*)::BIGINT,
        |    round(corr(l_extendedprice, l_tax), 4) + 0.0 FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', 'l_tax', count(*)::BIGINT,
        |    round(corr(l_discount, l_tax), 4) + 0.0 FROM lineitem)
        |ORDER BY col_a, col_b""".stripMargin,
    "q_bootstrap_ci" ->
      """WITH base AS (SELECT source AS g, doc_id::VARCHAR AS id,
        |    n_chars::DOUBLE AS x FROM documents WHERE n_chars IS NOT NULL),
        |rep AS (SELECT g, id, x, unnest(range(0, 32)) AS r FROM base),
        |uu AS (SELECT g, r, x,
        |    CAST(('0x' || substring(md5(concat('42|', id, '|',
        |      r::VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0 AS u
        |  FROM rep),
        |mm AS (SELECT g, r, x,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3 ELSE 4 END AS m
        |  FROM uu),
        |rm AS (SELECT g, r, CASE WHEN sum(m) > 0
        |    THEN round(sum(m * x) / sum(m), 6) END AS rm
        |  FROM mm GROUP BY g, r),
        |pt AS (SELECT g, round(avg(x), 4) AS mean FROM base GROUP BY g)
        |SELECT pt.g AS source, pt.mean,
        |  round(quantile_cont(rm, 0.025), 4) AS ci_lo,
        |  round(quantile_cont(rm, 0.975), 4) AS ci_hi,
        |  count(rm)::BIGINT AS b_effective
        |FROM rm JOIN pt USING (g) GROUP BY pt.g, pt.mean
        |ORDER BY source""".stripMargin,
    "q_weight_diag" ->
      """WITH w AS (SELECT o_orderpriority AS g,
        |    o_totalprice::DOUBLE / 100000.0 AS w FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_totalprice > 0)
        |SELECT g AS o_orderpriority, count(*)::BIGINT AS n,
        |  round(sum(w), 4) AS sum_w,
        |  round(sum(w) * sum(w) / sum(w * w), 4) AS ess,
        |  round(count(*) * sum(w * w) / (sum(w) * sum(w)), 4)
        |    AS design_effect,
        |  round(sqrt(greatest(0.0, sum(w * w) / count(*)
        |    - pow(sum(w) / count(*), 2))) / (sum(w) / count(*)), 4)
        |    AS cv_w,
        |  min(w) AS min_w, max(w) AS max_w,
        |  round(max(w) / min(w), 4) AS w_ratio
        |FROM w GROUP BY g ORDER BY o_orderpriority""".stripMargin,
    "q_stats_drift" ->
      """WITH o AS (SELECT doc_id, lang, n_chars, source FROM documents),
        |nw AS (SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
        |    n_chars + 37 AS n_chars, source FROM documents
        |  WHERE doc_id % 10 <> 0),
        |po AS (
        |  SELECT 'doc_id' AS col_name, count(*)::BIGINT AS n_old,
        |    round(count(*) FILTER (WHERE doc_id IS NULL)
        |      / count(*)::DOUBLE, 4) AS null_frac_old,
        |    count(DISTINCT doc_id)::BIGINT AS distinct_old,
        |    round(avg(try_cast(doc_id::VARCHAR AS DOUBLE)), 4) AS mean_old
        |  FROM o UNION ALL
        |  SELECT 'lang', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE lang IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT lang)::BIGINT,
        |    round(avg(try_cast(lang AS DOUBLE)), 4) FROM o UNION ALL
        |  SELECT 'n_chars', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE n_chars IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT n_chars)::BIGINT,
        |    round(avg(try_cast(n_chars::VARCHAR AS DOUBLE)), 4) FROM o
        |  UNION ALL
        |  SELECT 'source', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE source IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT source)::BIGINT,
        |    round(avg(try_cast(source AS DOUBLE)), 4) FROM o),
        |pn AS (
        |  SELECT 'doc_id' AS col_name, count(*)::BIGINT AS n_new,
        |    round(count(*) FILTER (WHERE doc_id IS NULL)
        |      / count(*)::DOUBLE, 4) AS null_frac_new,
        |    count(DISTINCT doc_id)::BIGINT AS distinct_new,
        |    round(avg(try_cast(doc_id::VARCHAR AS DOUBLE)), 4) AS mean_new
        |  FROM nw UNION ALL
        |  SELECT 'lang', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE lang IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT lang)::BIGINT,
        |    round(avg(try_cast(lang AS DOUBLE)), 4) FROM nw UNION ALL
        |  SELECT 'n_chars', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE n_chars IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT n_chars)::BIGINT,
        |    round(avg(try_cast(n_chars::VARCHAR AS DOUBLE)), 4) FROM nw
        |  UNION ALL
        |  SELECT 'source', count(*)::BIGINT,
        |    round(count(*) FILTER (WHERE source IS NULL)
        |      / count(*)::DOUBLE, 4),
        |    count(DISTINCT source)::BIGINT,
        |    round(avg(try_cast(source AS DOUBLE)), 4) FROM nw)
        |SELECT po.col_name, n_old, n_new, null_frac_old, null_frac_new,
        |  round(null_frac_new - null_frac_old, 4) + 0.0 AS null_frac_delta,
        |  distinct_old, distinct_new, mean_old, mean_new,
        |  round(mean_new - mean_old, 4) + 0.0 AS mean_delta
        |FROM po JOIN pn USING (col_name) ORDER BY col_name""".stripMargin,
    "q_impute" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
        |  FROM events),
        |gm AS (SELECT event_type, quantile_cont(value, 0.5) AS gmed
        |  FROM e WHERE value IS NOT NULL GROUP BY 1),
        |gg AS (SELECT quantile_cont(value, 0.5) AS gmed_all FROM e
        |  WHERE value IS NOT NULL)
        |SELECT e.event_id, e.event_type, e.value,
        |  round(coalesce(e.value, gm.gmed, gg.gmed_all), 4)
        |    AS value_imputed,
        |  (e.value IS NULL
        |    AND coalesce(e.value, gm.gmed, gg.gmed_all) IS NOT NULL)
        |    AS was_imputed
        |FROM e LEFT JOIN gm USING (event_type), gg
        |ORDER BY event_id""".stripMargin,
    "q_cooccur" ->
      """WITH bi AS (SELECT DISTINCT l.l_orderkey AS basket,
        |    p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT a.item AS item_a, b.item AS item_b,
        |  count(*)::BIGINT AS n_baskets
        |FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
        |GROUP BY 1, 2 HAVING count(*) >= 40
        |ORDER BY 1, 2""".stripMargin,
    "q_assoc_rules" ->
      """WITH bi AS (SELECT DISTINCT l.l_orderkey AS basket,
        |    p.p_brand AS item
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |pairs AS (SELECT a.item AS item_a, b.item AS item_b,
        |    count(*)::BIGINT AS n_baskets
        |  FROM bi a JOIN bi b ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 40),
        |directed AS (
        |  SELECT item_a AS antecedent, item_b AS consequent, n_baskets
        |  FROM pairs
        |  UNION ALL
        |  SELECT item_b, item_a, n_baskets FROM pairs),
        |items AS (SELECT item, count(*)::BIGINT AS n_item FROM bi GROUP BY 1),
        |tot AS (SELECT count(DISTINCT basket)::DOUBLE AS n_tot FROM bi)
        |SELECT d.antecedent, d.consequent, d.n_baskets,
        |  round(d.n_baskets / ia.n_item::DOUBLE, 4) AS confidence,
        |  round(d.n_baskets * t.n_tot / (ia.n_item * ic.n_item), 4) AS lift
        |FROM directed d
        |JOIN items ia ON d.antecedent = ia.item
        |JOIN items ic ON d.consequent = ic.item
        |CROSS JOIN tot t
        |ORDER BY d.antecedent, d.consequent""".stripMargin,
    "q_transitions" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS ts,
        |    event_type AS from_state FROM events),
        |seq AS (SELECT from_state,
        |    lead(from_state) OVER (PARTITION BY u ORDER BY ts, from_state)
        |      AS to_state
        |  FROM e),
        |pairs AS (SELECT from_state, to_state, count(*)::BIGINT AS n
        |  FROM seq WHERE to_state IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_state, sum(n)::BIGINT AS n_from
        |  FROM pairs GROUP BY 1)
        |SELECT p.from_state, p.to_state, p.n,
        |  round(p.n / t.n_from::DOUBLE, 4) AS p
        |FROM pairs p JOIN tot t ON p.from_state = t.from_state
        |ORDER BY p.from_state, p.to_state""".stripMargin,
    "q_histogram" ->
      """WITH k AS (SELECT l_returnflag AS g, l_extendedprice::DOUBLE AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |s AS (SELECT g, min(v) AS lo, max(v) AS hi FROM k GROUP BY g),
        |w AS (SELECT g, lo, hi, CASE WHEN hi > lo THEN (hi - lo) / 20
        |    ELSE 1.0 END AS width FROM s),
        |b AS (SELECT k.g, CASE WHEN w.hi > w.lo
        |    THEN least(floor((k.v - w.lo) / w.width), 19)
        |    ELSE 0 END::BIGINT AS bucket
        |  FROM k JOIN w ON k.g = w.g),
        |c AS (SELECT g, bucket, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
        |grid AS (SELECT g, unnest(range(0, 20))::BIGINT AS bucket, lo, width
        |  FROM w)
        |SELECT grid.g AS l_returnflag, grid.bucket AS bucket,
        |  round(lo + grid.bucket * width, 6) AS lo_edge,
        |  round(lo + (grid.bucket + 1) * width, 6) AS hi_edge,
        |  coalesce(c.n, 0)::BIGINT AS n
        |FROM grid LEFT JOIN c ON grid.g = c.g AND grid.bucket = c.bucket
        |ORDER BY 1, 2""".stripMargin,
    "q_outliers_mad" ->
      """WITH b AS (SELECT source, doc_id, n_chars::DOUBLE AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |m AS (SELECT source, quantile_cont(v, 0.5) AS med FROM b
        |  GROUP BY source),
        |d AS (SELECT b.source, b.doc_id, b.v, m.med, abs(b.v - m.med) AS ad
        |  FROM b JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(ad, 0.5) AS mad FROM d
        |  GROUP BY source),
        |z AS (SELECT d.source, d.doc_id, d.v, d.med, md.mad,
        |    CASE WHEN md.mad > 0 THEN round(0.6745 * d.ad / md.mad, 4)
        |         WHEN d.ad > 0 THEN 'infinity'::DOUBLE ELSE 0.0 END
        |      AS robust_z
        |  FROM d JOIN md USING (source))
        |SELECT source, doc_id, v AS value,
        |  round(med, 4) AS group_median, round(mad, 4) AS group_mad,
        |  robust_z
        |FROM z WHERE robust_z > 2.5
        |ORDER BY source, doc_id""".stripMargin,
    "q_psi_drift" ->
      """WITH r AS (SELECT n_chars::DOUBLE AS v FROM documents
        |  WHERE lang = 'en' AND n_chars IS NOT NULL),
        |c AS (SELECT n_chars::DOUBLE AS v FROM documents
        |  WHERE lang <> 'en' AND n_chars IS NOT NULL),
        |s AS (SELECT min(v) AS lo, max(v) AS hi FROM r),
        |w AS (SELECT lo, hi, CASE WHEN hi > lo THEN (hi - lo) / 10
        |    ELSE 1.0 END AS wd FROM s),
        |br AS (SELECT greatest(least(floor((r.v - w.lo) / w.wd), 9), 0)
        |    ::BIGINT AS bucket, count(*)::BIGINT AS n_ref
        |  FROM r, w GROUP BY 1),
        |bc AS (SELECT greatest(least(floor((c.v - w.lo) / w.wd), 9), 0)
        |    ::BIGINT AS bucket, count(*)::BIGINT AS n_new
        |  FROM c, w GROUP BY 1),
        |grid AS (SELECT unnest(range(0, 10))::BIGINT AS bucket, lo, wd
        |  FROM w),
        |j AS (SELECT grid.bucket, grid.lo, grid.wd,
        |    coalesce(br.n_ref, 0)::BIGINT AS n_ref,
        |    coalesce(bc.n_new, 0)::BIGINT AS n_new
        |  FROM grid LEFT JOIN br ON grid.bucket = br.bucket
        |    LEFT JOIN bc ON grid.bucket = bc.bucket),
        |t AS (SELECT sum(n_ref)::DOUBLE AS tr, sum(n_new)::DOUBLE AS tn
        |  FROM j),
        |p AS (SELECT j.*, greatest(j.n_ref / t.tr, 0.0001) AS p_ref,
        |    greatest(j.n_new / t.tn, 0.0001) AS p_new
        |  FROM j, t)
        |SELECT bucket, round(lo + bucket * wd, 6) AS lo_edge,
        |  round(lo + (bucket + 1) * wd, 6) AS hi_edge, n_ref, n_new,
        |  round(p_ref, 6) AS p_ref, round(p_new, 6) AS p_new,
        |  round((p_new - p_ref) * ln(p_new / p_ref), 6) AS contrib
        |FROM p ORDER BY bucket""".stripMargin,
    "q_entropy" ->
      """WITH pairs AS (
        |  SELECT 'lang' AS col_name, lang::VARCHAR AS v FROM documents
        |  UNION ALL
        |  SELECT 'source', source::VARCHAR FROM documents),
        |c AS (SELECT col_name, v, count(*)::BIGINT AS c FROM pairs
        |  GROUP BY 1, 2),
        |a AS (SELECT col_name, sum(c)::BIGINT AS n,
        |    coalesce(sum(c) FILTER (WHERE v IS NULL), 0)::BIGINT
        |      AS n_nulls,
        |    count(*) FILTER (WHERE v IS NOT NULL)::BIGINT AS n_distinct,
        |    (sum(c) FILTER (WHERE v IS NOT NULL))::DOUBLE AS nn,
        |    sum(c * ln(c)) FILTER (WHERE v IS NOT NULL) AS clogc
        |  FROM c GROUP BY 1)
        |SELECT col_name, n, n_nulls, n_distinct,
        |  round(CASE WHEN nn > 0 THEN ln(nn) - clogc / nn
        |    ELSE 0.0 END, 4) AS entropy,
        |  round(CASE WHEN n_distinct > 1
        |    THEN (ln(nn) - clogc / nn) / ln(n_distinct::DOUBLE)
        |    ELSE 0.0 END, 4) AS norm_entropy
        |FROM a ORDER BY col_name""".stripMargin,
    // the engine's count form replayed per pair: MI = (Σc·ln c terms)/n
    // + ln n, H from the marginal term — identical expression order, so
    // the one division and the ln(n) anchor match bit-for-bit
    "q_theils_u" ->
      """WITH d AS (SELECT lang::VARCHAR AS lang,
        |    source::VARCHAR AS source,
        |    (n_chars // 300)::VARCHAR AS len_bucket FROM documents),
        |p1 AS (SELECT lang AS a, len_bucket AS b, count(*)::BIGINT AS c
        |  FROM d WHERE lang IS NOT NULL AND len_bucket IS NOT NULL
        |  GROUP BY 1, 2),
        |a1 AS (SELECT sum(c)::DOUBLE AS n, sum(c * ln(c)) AS sab,
        |    (SELECT sum(ca * ln(ca)) FROM
        |      (SELECT sum(c) AS ca FROM p1 GROUP BY a) t) AS sa,
        |    (SELECT sum(cb * ln(cb)) FROM
        |      (SELECT sum(c) AS cb FROM p1 GROUP BY b) t) AS sb
        |  FROM p1),
        |r1 AS (SELECT 'lang' AS x, 'len_bucket' AS y, n,
        |    (sab - sa - sb) / n + ln(n) AS mi,
        |    ln(n) - sa / n AS hx, ln(n) - sb / n AS hy FROM a1),
        |p2 AS (SELECT lang AS a, source AS b, count(*)::BIGINT AS c
        |  FROM d WHERE lang IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |a2 AS (SELECT sum(c)::DOUBLE AS n, sum(c * ln(c)) AS sab,
        |    (SELECT sum(ca * ln(ca)) FROM
        |      (SELECT sum(c) AS ca FROM p2 GROUP BY a) t) AS sa,
        |    (SELECT sum(cb * ln(cb)) FROM
        |      (SELECT sum(c) AS cb FROM p2 GROUP BY b) t) AS sb
        |  FROM p2),
        |r2 AS (SELECT 'lang' AS x, 'source' AS y, n,
        |    (sab - sa - sb) / n + ln(n) AS mi,
        |    ln(n) - sa / n AS hx, ln(n) - sb / n AS hy FROM a2),
        |p3 AS (SELECT len_bucket AS a, source AS b, count(*)::BIGINT AS c
        |  FROM d WHERE len_bucket IS NOT NULL AND source IS NOT NULL
        |  GROUP BY 1, 2),
        |a3 AS (SELECT sum(c)::DOUBLE AS n, sum(c * ln(c)) AS sab,
        |    (SELECT sum(ca * ln(ca)) FROM
        |      (SELECT sum(c) AS ca FROM p3 GROUP BY a) t) AS sa,
        |    (SELECT sum(cb * ln(cb)) FROM
        |      (SELECT sum(c) AS cb FROM p3 GROUP BY b) t) AS sb
        |  FROM p3),
        |r3 AS (SELECT 'len_bucket' AS x, 'source' AS y, n,
        |    (sab - sa - sb) / n + ln(n) AS mi,
        |    ln(n) - sa / n AS hx, ln(n) - sb / n AS hy FROM a3),
        |uu AS (
        |  SELECT x AS col_x, y AS col_y, n, mi, hx AS h FROM r1
        |  UNION ALL SELECT y, x, n, mi, hy FROM r1
        |  UNION ALL SELECT x, y, n, mi, hx FROM r2
        |  UNION ALL SELECT y, x, n, mi, hy FROM r2
        |  UNION ALL SELECT x, y, n, mi, hx FROM r3
        |  UNION ALL SELECT y, x, n, mi, hy FROM r3)
        |SELECT col_x, col_y, n::BIGINT AS n,
        |  round(mi, 4) + 0.0 AS mi,
        |  CASE WHEN h > 0 THEN round(mi / h, 4) + 0.0 END AS u
        |FROM uu ORDER BY col_x, col_y""".stripMargin,
    "q_mutual_info" ->
      """WITH j AS (SELECT l_returnflag::VARCHAR AS a,
        |    l_linestatus::VARCHAR AS b, count(*)::BIGINT AS c_ab
        |  FROM lineitem
        |  WHERE l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL
        |  GROUP BY 1, 2),
        |ma AS (SELECT a, sum(c_ab)::BIGINT AS c_a FROM j GROUP BY 1),
        |mb AS (SELECT b, sum(c_ab)::BIGINT AS c_b FROM j GROUP BY 1),
        |t AS (SELECT sum(c_ab)::DOUBLE AS n FROM j)
        |SELECT max(t.n)::BIGINT AS n,
        |  count(DISTINCT j.a)::BIGINT AS n_distinct_a,
        |  count(DISTINCT j.b)::BIGINT AS n_distinct_b,
        |  round(coalesce(sum((j.c_ab / t.n)
        |    * ln(t.n * j.c_ab / (ma.c_a * mb.c_b))), 0.0), 4) AS mi
        |FROM j JOIN ma USING (a) JOIN mb USING (b), t""".stripMargin,
    "q_winsorize" ->
      """WITH b AS (SELECT source, doc_id, n_chars::DOUBLE AS v
        |  FROM documents WHERE n_chars IS NOT NULL),
        |c AS (SELECT source, quantile_cont(v, 0.05) AS lo,
        |    quantile_cont(v, 0.95) AS hi FROM b GROUP BY source)
        |SELECT b.source, b.doc_id, b.v AS value,
        |  round(greatest(least(b.v, c.hi), c.lo), 4) AS clipped,
        |  (b.v > c.hi OR b.v < c.lo) AS was_clipped
        |FROM b JOIN c USING (source) ORDER BY source, doc_id""".stripMargin,
    "q_cusum" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |st AS (SELECT k, avg(x) AS mu, coalesce(stddev_samp(x), 0.0) AS sd
        |  FROM daily GROUP BY 1),
        |seq AS (SELECT daily.k, d, x, mu, sd,
        |    row_number() OVER (PARTITION BY daily.k ORDER BY d) AS rn
        |  FROM daily JOIN st ON daily.k = st.k),
        |r AS (
        |  SELECT k, rn, d, x, mu, sd,
        |    greatest(0.0, x - mu - 0.5 * sd) AS hi,
        |    greatest(0.0, mu - x - 0.5 * sd) AS lo
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.k, s.rn, s.d, s.x, s.mu, s.sd,
        |    greatest(0.0, r.hi + (s.x - s.mu - 0.5 * s.sd)),
        |    greatest(0.0, r.lo + (s.mu - s.x - 0.5 * s.sd))
        |  FROM r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1)
        |SELECT k AS event_type, d AS ts, x, round(hi, 4) AS cusum_hi,
        |  round(lo, 4) AS cusum_lo,
        |  (hi > 4.0 * sd OR lo > 4.0 * sd) AS alarm
        |FROM r ORDER BY event_type, ts""".stripMargin,
    "q_ewma" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |seq AS (SELECT k, d, x,
        |    row_number() OVER (PARTITION BY k ORDER BY d) AS rn
        |  FROM daily),
        |r AS (
        |  SELECT k, rn, d, x, x AS ew FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.k, s.rn, s.d, s.x, 0.3 * s.x + 0.7 * r.ew
        |  FROM r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1)
        |SELECT k AS event_type, d AS ts, x, round(ew, 4) AS ewma
        |FROM r ORDER BY event_type, ts""".stripMargin,
    "q_rolling_z" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |w AS (SELECT k, d, x,
        |    count(x) OVER win AS nh,
        |    avg(x) OVER win AS m,
        |    stddev_samp(x) OVER win AS sd
        |  FROM daily
        |  WINDOW win AS (PARTITION BY k ORDER BY d
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT k, d, x, nh, m,
        |    CASE WHEN nh >= 3 AND sd > 0 THEN round((x - m) / sd, 4)
        |    END AS z
        |  FROM w)
        |SELECT k AS event_type, d AS ts, x, nh::BIGINT AS n_hist,
        |  round(m, 4) AS mean_hist, z,
        |  coalesce(abs(z) > 2.5, false) AS anomaly
        |FROM z ORDER BY event_type, ts""".stripMargin,
    "q_describe_strings" ->
      """WITH s1 AS (
        |  SELECT 'o_orderdate' AS col, o_orderdate::VARCHAR AS v
        |  FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders),
        |st AS (SELECT col, count(*)::BIGINT AS n,
        |    sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
        |    sum(CASE WHEN v IS NOT NULL AND trim(v) = '' THEN 1
        |      ELSE 0 END)::BIGINT AS blanks,
        |    count(DISTINCT v)::BIGINT AS n_distinct,
        |    min(length(v))::BIGINT AS len_min,
        |    max(length(v))::BIGINT AS len_max
        |  FROM s1 GROUP BY col),
        |tp AS (SELECT col, v AS top_value, c FROM (
        |    SELECT col, v, count(*)::BIGINT AS c, row_number()
        |      OVER (PARTITION BY col ORDER BY count(*) DESC, v) AS rn
        |    FROM s1 WHERE v IS NOT NULL GROUP BY col, v) WHERE rn = 1)
        |SELECT st.col AS "column", n, nulls, blanks, n_distinct,
        |  len_min, len_max, top_value,
        |  round(c / (n - nulls), 4) AS top_share
        |FROM st JOIN tp ON tp.col = st.col ORDER BY st.col""".stripMargin,
    "q_weighted_quantiles" ->
      """WITH b AS (SELECT l_returnflag AS g, l_quantity::DOUBLE AS v,
        |    1.0 + (l_orderkey % 5) * 0.5 AS w FROM lineitem
        |  WHERE l_quantity IS NOT NULL),
        |c AS (SELECT g, v,
        |    sum(w) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |    sum(w) OVER (PARTITION BY g) AS tw FROM b),
        |q AS (SELECT g,
        |    min(CASE WHEN cw >= 0.25 * tw THEN v END) AS q1,
        |    min(CASE WHEN cw >= 0.5 * tw THEN v END) AS q2,
        |    min(CASE WHEN cw >= 0.9 * tw THEN v END) AS q3
        |  FROM c GROUP BY g)
        |SELECT l_returnflag, p, value FROM (
        |  SELECT g AS l_returnflag, 0.25::DOUBLE AS p, q1 AS value FROM q
        |  UNION ALL SELECT g, 0.5::DOUBLE, q2 FROM q
        |  UNION ALL SELECT g, 0.9::DOUBLE, q3 FROM q)
        |ORDER BY l_returnflag, p""".stripMargin,
    "q_weighted_stats" ->
      """WITH b AS (SELECT l_quantity::DOUBLE AS q,
        |    l_extendedprice::DOUBLE AS p, l_discount::DOUBLE AS di,
        |    1.0 + (l_orderkey % 5) * 0.5 AS w FROM lineitem),
        |m AS (
        |  SELECT 'l_quantity' AS col, count(*)::BIGINT AS n, sum(w) AS sw,
        |    sum(w * w) AS sw2, sum(w * q) AS swx, sum(w * q * q) AS swx2
        |  FROM b WHERE q IS NOT NULL
        |  UNION ALL
        |  SELECT 'l_extendedprice', count(*)::BIGINT, sum(w), sum(w * w),
        |    sum(w * p), sum(w * p * p) FROM b WHERE p IS NOT NULL
        |  UNION ALL
        |  SELECT 'l_discount', count(*)::BIGINT, sum(w), sum(w * w),
        |    sum(w * di), sum(w * di * di) FROM b WHERE di IS NOT NULL),
        |x AS (SELECT col, n, sw, sw2, swx / sw AS mu,
        |    greatest(swx2 / sw - (swx / sw) * (swx / sw), 0.0) AS v,
        |    sw * sw / sw2 AS ess FROM m)
        |SELECT col AS "column", n, round(sw, 4) AS sum_w,
        |  round(ess, 2) AS ess, round(mu, 4) AS w_mean,
        |  round(sqrt(v), 4) AS w_sd,
        |  round(sqrt(v / ess), 4) AS se,
        |  round(mu - 1.96 * sqrt(v / ess), 4) AS ci_lo,
        |  round(mu + 1.96 * sqrt(v / ess), 4) AS ci_hi
        |FROM x ORDER BY col""".stripMargin,
    "q_trend_test" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |p AS (SELECT a.k, sign(b.x - a.x) AS sgn,
        |    (b.x - a.x) / (b.d - a.d) AS slope
        |  FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d),
        |c AS (SELECT k, count(*)::BIGINT AS n FROM daily GROUP BY k),
        |g AS (SELECT k, count(*)::BIGINT AS n_pairs,
        |    sum(sgn)::BIGINT AS s, quantile_cont(slope, 0.5) AS ts
        |  FROM p GROUP BY k)
        |SELECT g.k AS event_type, c.n, n_pairs, s,
        |  round(s / n_pairs, 4) + 0.0 AS tau,
        |  round(ts, 6) + 0.0 AS slope
        |FROM g JOIN c ON c.k = g.k
        |ORDER BY event_type""".stripMargin,
    "q_standardize" ->
      """WITH s AS (SELECT
        |    quantile_cont(l_quantity, 0.5) AS mq,
        |    quantile_cont(l_quantity, 0.75)
        |      - quantile_cont(l_quantity, 0.25) AS iq,
        |    quantile_cont(l_extendedprice, 0.5) AS mp,
        |    quantile_cont(l_extendedprice, 0.75)
        |      - quantile_cont(l_extendedprice, 0.25) AS ip
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  round(CASE WHEN iq > 0 THEN (l_quantity - mq) / iq END, 6)
        |    AS l_quantity_scaled,
        |  round(CASE WHEN ip > 0 THEN (l_extendedprice - mp) / ip END, 6)
        |    AS l_extendedprice_scaled
        |FROM lineitem, s WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_cms_topk" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tk AS (SELECT term FROM tok WHERE term <> ''),
        |ex AS (SELECT term, count(*)::BIGINT AS n_exact FROM tk
        |  GROUP BY 1),
        |top AS (SELECT term, n_exact FROM ex
        |  ORDER BY n_exact DESC, term LIMIT 20),
        |rws AS (SELECT unnest(range(4)) AS r),
        |pairs AS (SELECT CAST('0x' || substring(md5(r::VARCHAR || '|'
        |      || term), 1, 12) AS BIGINT) % 1024 AS bucket, r
        |  FROM tk, rws),
        |sk AS (SELECT r, bucket, count(*)::BIGINT AS n FROM pairs
        |  GROUP BY 1, 2),
        |qp AS (SELECT term, r, CAST('0x' || substring(md5(r::VARCHAR
        |      || '|' || term), 1, 12) AS BIGINT) % 1024 AS bucket
        |  FROM top, rws),
        |est AS (SELECT qp.term, min(coalesce(sk.n, 0))::BIGINT AS n_est
        |  FROM qp LEFT JOIN sk ON sk.r = qp.r AND sk.bucket = qp.bucket
        |  GROUP BY 1)
        |SELECT t.term, n_exact, n_est,
        |  (n_est - n_exact)::BIGINT AS overcount
        |FROM top t JOIN est ON est.term = t.term
        |ORDER BY n_exact DESC, t.term""".stripMargin,
    "q_histo_depth" ->
      """WITH v AS (SELECT l_extendedprice::DOUBLE AS x FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL),
        |c AS (SELECT quantile_cont(x, [0.0, 0.125, 0.25, 0.375, 0.5,
        |    0.625, 0.75, 0.875, 1.0]) AS cuts FROM v),
        |b AS (SELECT
        |    (CASE WHEN x > cuts[2] THEN 1 ELSE 0 END
        |    + CASE WHEN x > cuts[3] THEN 1 ELSE 0 END
        |    + CASE WHEN x > cuts[4] THEN 1 ELSE 0 END
        |    + CASE WHEN x > cuts[5] THEN 1 ELSE 0 END
        |    + CASE WHEN x > cuts[6] THEN 1 ELSE 0 END
        |    + CASE WHEN x > cuts[7] THEN 1 ELSE 0 END
        |    + CASE WHEN x > cuts[8] THEN 1 ELSE 0 END)::BIGINT AS bucket
        |  FROM v, c),
        |n AS (SELECT bucket, count(*)::BIGINT AS n FROM b GROUP BY 1),
        |g AS (SELECT unnest(range(8)) AS bucket),
        |ge AS (SELECT g.bucket AS bucket,
        |    round(cuts[g.bucket::INT + 1], 6) AS lo_edge,
        |    round(cuts[g.bucket::INT + 2], 6) AS hi_edge
        |  FROM g, c)
        |SELECT ge.bucket AS bucket, lo_edge, hi_edge,
        |  coalesce(n.n, 0)::BIGINT AS n
        |FROM ge LEFT JOIN n ON n.bucket = ge.bucket
        |ORDER BY ge.bucket""".stripMargin,
    "q_seasonal" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |t AS (SELECT k, d, x,
        |    round(CASE WHEN count(x) OVER win = 7
        |      THEN avg(x) OVER win END, 4) AS trend
        |  FROM daily WINDOW win AS (PARTITION BY k ORDER BY d, x
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |det AS (SELECT k, d % 7 AS season, x - trend AS det FROM t
        |  WHERE trend IS NOT NULL),
        |sm AS (SELECT k, season, avg(det) AS smean FROM det
        |  GROUP BY 1, 2),
        |ctr AS (SELECT k, avg(smean) AS scenter FROM sm GROUP BY 1)
        |SELECT t.k AS event_type, t.d AS ts, t.x AS x, trend,
        |  round(CASE WHEN smean IS NOT NULL THEN smean - scenter END, 4)
        |    AS seasonal,
        |  round(x - trend - round(CASE WHEN smean IS NOT NULL
        |    THEN smean - scenter END, 4), 4) AS resid
        |FROM t LEFT JOIN sm ON sm.k = t.k AND sm.season = t.d % 7
        |LEFT JOIN ctr ON ctr.k = t.k
        |ORDER BY event_type, ts""".stripMargin,
    "q_acf" ->
      """WITH e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |lagged AS (SELECT k, x,
        |    lag(x, 1) OVER win AS l1, lag(x, 2) OVER win AS l2,
        |    lag(x, 3) OVER win AS l3, lag(x, 4) OVER win AS l4,
        |    lag(x, 5) OVER win AS l5, lag(x, 6) OVER win AS l6,
        |    lag(x, 7) OVER win AS l7
        |  FROM daily WINDOW win AS (PARTITION BY k ORDER BY d, x)),
        |per AS (SELECT k,
        |    count(l1)::BIGINT AS n1, corr(x, l1) AS r1,
        |    count(l2)::BIGINT AS n2, corr(x, l2) AS r2,
        |    count(l3)::BIGINT AS n3, corr(x, l3) AS r3,
        |    count(l4)::BIGINT AS n4, corr(x, l4) AS r4,
        |    count(l5)::BIGINT AS n5, corr(x, l5) AS r5,
        |    count(l6)::BIGINT AS n6, corr(x, l6) AS r6,
        |    count(l7)::BIGINT AS n7, corr(x, l7) AS r7
        |  FROM lagged GROUP BY k),
        |u AS (
        |  SELECT k, 1 AS lag, n1 AS n_pairs, r1 AS r FROM per UNION ALL
        |  SELECT k, 2, n2, r2 FROM per UNION ALL
        |  SELECT k, 3, n3, r3 FROM per UNION ALL
        |  SELECT k, 4, n4, r4 FROM per UNION ALL
        |  SELECT k, 5, n5, r5 FROM per UNION ALL
        |  SELECT k, 6, n6, r6 FROM per UNION ALL
        |  SELECT k, 7, n7, r7 FROM per)
        |SELECT k AS event_type, lag::INTEGER AS lag, n_pairs,
        |  round(r, 4) AS acf
        |FROM u ORDER BY event_type, lag""".stripMargin,
    "q_holt" ->
      """WITH RECURSIVE e AS (SELECT event_type AS k,
        |    epoch_us(ts)::BIGINT // 86400000000 AS d, value FROM events),
        |daily AS (SELECT k, d, round(avg(value), 4) AS x FROM e
        |  GROUP BY 1, 2),
        |seq AS (SELECT k, d, x,
        |    row_number() OVER (PARTITION BY k ORDER BY d) AS rn
        |  FROM daily),
        |r AS (
        |  SELECT k, rn, d, x, x AS l, 0.0::DOUBLE AS b FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.k, s.rn, s.d, s.x,
        |    0.3 * s.x + 0.7 * (r.l + r.b),
        |    0.2 * ((0.3 * s.x + 0.7 * (r.l + r.b)) - r.l) + 0.8 * r.b
        |  FROM r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1)
        |SELECT k AS event_type, d AS ts, x, round(l, 4) AS level,
        |  round(b, 4) AS trend, round(l + b, 4) AS forecast_next
        |FROM r ORDER BY event_type, ts""".stripMargin,
    "q_benford" ->
      """WITH v AS (SELECT abs(l_extendedprice::DOUBLE) AS a
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL AND abs(l_extendedprice) > 0),
        |c AS (SELECT floor(a / pow(10, floor(log10(a))))::BIGINT AS digit,
        |    count(*)::BIGINT AS n FROM v GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS tot FROM c)
        |SELECT g.digit, coalesce(c.n, 0)::BIGINT AS n,
        |  round(coalesce(c.n, 0) / t.tot, 6) AS p_obs,
        |  round(log10(1 + 1.0 / g.digit), 6) AS p_benford,
        |  round(pow(coalesce(c.n, 0) - t.tot * log10(1 + 1.0 / g.digit), 2)
        |    / (t.tot * log10(1 + 1.0 / g.digit)), 4) AS chi2_term
        |FROM (SELECT unnest(range(1, 10))::BIGINT AS digit) g
        |LEFT JOIN c USING (digit), t ORDER BY g.digit""".stripMargin,
    "q_concentration" ->
      """WITH t AS (SELECT o_custkey AS k, sum(o_totalprice::DOUBLE) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x,
        |    row_number() OVER (ORDER BY x, k)::DOUBLE AS i FROM t)
        |SELECT count(*)::BIGINT AS n_keys, round(sum(x), 4) AS total,
        |  round(2.0 * sum(i * x) / (count(*) * sum(x))
        |    - (count(*) + 1.0) / count(*), 4) AS gini,
        |  round(sum(x * x) / pow(sum(x), 2), 4) AS hhi,
        |  round(max(x) / sum(x), 4) AS top_share
        |FROM r""".stripMargin,
    "q_cohen_kappa" ->
      """WITH lab AS (SELECT
        |    CASE WHEN n_chars < 200 THEN 'short'
        |         WHEN n_chars < 800 THEN 'mid' ELSE 'long' END AS a,
        |    CASE WHEN len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) < 40 THEN 'short'
        |      WHEN len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) < 160 THEN 'mid'
        |      ELSE 'long' END AS b
        |  FROM documents),
        |j AS (SELECT a, b, count(*)::BIGINT AS c FROM lab GROUP BY 1, 2),
        |ma AS (SELECT a, sum(c) AS ca FROM j GROUP BY 1),
        |mb AS (SELECT b, sum(c) AS cb FROM j GROUP BY 1),
        |tt AS (SELECT sum(c)::DOUBLE AS n FROM j),
        |pe AS (SELECT coalesce(sum(ma.ca * mb.cb), 0)::DOUBLE AS pen
        |  FROM ma JOIN mb ON ma.a = mb.b),
        |ag AS (SELECT coalesce(sum(c), 0)::DOUBLE AS agree FROM j
        |  WHERE a = b),
        |p AS (SELECT tt.n, round(ag.agree / tt.n, 4) AS p_o,
        |    round(pe.pen / (tt.n * tt.n), 4) AS p_e FROM tt, pe, ag)
        |SELECT n::BIGINT AS n, p_o, p_e,
        |  CASE WHEN p_e < 1.0
        |    THEN round((p_o - p_e) / (1.0 - p_e), 4) ELSE 1.0 END AS kappa
        |FROM p""".stripMargin,
    "q_classifier_metrics" -> (classifierEvalCte +
      """m AS (SELECT count(*)::BIGINT AS n,
        |    count(*) FILTER (WHERE score >= 0.03 AND label)::BIGINT AS tp,
        |    count(*) FILTER (WHERE score >= 0.03 AND NOT label)::BIGINT
        |      AS fp,
        |    count(*) FILTER (WHERE score < 0.03 AND NOT label)::BIGINT
        |      AS tn,
        |    count(*) FILTER (WHERE score < 0.03 AND label)::BIGINT AS fn
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL)
        |SELECT n, tp, fp, tn, fn,
        |  round(CASE WHEN n > 0 THEN (tp + tn) / n::DOUBLE
        |    ELSE 0.0 END, 4) AS accuracy,
        |  round(CASE WHEN tp + fp > 0 THEN tp / (tp + fp)::DOUBLE
        |    ELSE 0.0 END, 4) AS precision,
        |  round(CASE WHEN tp + fn > 0 THEN tp / (tp + fn)::DOUBLE
        |    ELSE 0.0 END, 4) AS recall,
        |  round(CASE WHEN 2 * tp + fp + fn > 0
        |    THEN 2.0 * tp / (2 * tp + fp + fn)::DOUBLE
        |    ELSE 0.0 END, 4) AS f1
        |FROM m""".stripMargin),
    "q_calibration" -> (classifierEvalCte +
      """b AS (SELECT least(floor(score * 10), 9)::BIGINT AS bucket,
        |    count(*)::BIGINT AS n, avg(score) AS conf,
        |    avg(label::INT::DOUBLE) AS acc
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
        |    AND score >= 0.0 AND score <= 1.0
        |  GROUP BY 1)
        |SELECT g.bucket, coalesce(b.n, 0)::BIGINT AS n,
        |  round(b.conf, 4) AS mean_score, round(b.acc, 4) AS frac_pos,
        |  round(b.acc - b.conf, 4) AS gap
        |FROM (SELECT unnest(range(0, 10))::BIGINT AS bucket) g
        |LEFT JOIN b ON g.bucket = b.bucket
        |ORDER BY g.bucket""".stripMargin),
    // the engine's Murphy decomposition verbatim: bucket frame +
    // 1-row moments, the identity assembled as rel/n - res/n + u in
    // the same expression order
    "q_brier" -> (classifierEvalCte +
      """b AS (SELECT least(floor(score * 10), 9)::BIGINT AS bk,
        |    count(*)::BIGINT AS nb, avg(score) AS ps,
        |    avg(label::INT::DOUBLE) AS ys
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
        |    AND score >= 0.0 AND score <= 1.0
        |  GROUP BY 1),
        |t AS (SELECT count(*)::BIGINT AS n,
        |    avg(label::INT::DOUBLE) AS ybar,
        |    avg((score - label::INT::DOUBLE)
        |      * (score - label::INT::DOUBLE)) AS bs
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
        |    AND score >= 0.0 AND score <= 1.0),
        |m AS (SELECT max(t.n) AS n, max(t.bs) AS bsx,
        |    max(t.ybar) AS yb,
        |    sum(b.nb * (b.ps - b.ys) * (b.ps - b.ys)) AS rel,
        |    sum(b.nb * (b.ys - t.ybar) * (b.ys - t.ybar)) AS res
        |  FROM b, t)
        |SELECT n, round(bsx, 4) AS brier,
        |  round(rel / n, 4) AS reliability,
        |  round(res / n, 4) AS resolution,
        |  round(yb * (1.0 - yb), 4) AS uncertainty,
        |  round(rel / n - res / n + yb * (1.0 - yb), 4)
        |    AS brier_binned
        |FROM m""".stripMargin),
    // PAV replay via the minimax identity iso(i) = max_{j<=i}
    // min_{k>=i} mean(j..k): segment means from integer cumulatives,
    // equal rationals divide to bit-identical doubles, bucket count is
    // config-bounded so the j x k x i grid is statistics-sized
    "q_isotonic" -> (classifierEvalCte +
      """b AS (SELECT least(floor(score * 10), 9)::BIGINT AS bucket,
        |    count(*)::BIGINT AS n,
        |    count(*) FILTER (WHERE label)::BIGINT AS n_pos,
        |    avg(score) AS conf
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
        |    AND score >= 0.0 AND score <= 1.0
        |  GROUP BY 1),
        |c AS (SELECT bucket, n, n_pos,
        |    sum(n) OVER (ORDER BY bucket) AS cn,
        |    sum(n_pos) OVER (ORDER BY bucket) AS cp
        |  FROM b),
        |seg AS (SELECT j.bucket AS bj, k.bucket AS bk,
        |    (k.cp - j.cp + j.n_pos) AS segp,
        |    (k.cn - j.cn + j.n) AS segn
        |  FROM c j JOIN c k ON k.bucket >= j.bucket),
        |tri AS (SELECT i.bucket AS bi, s.bj,
        |    min(s.segp / s.segn::DOUBLE) AS mn
        |  FROM c i JOIN seg s
        |    ON s.bj <= i.bucket AND s.bk >= i.bucket
        |  GROUP BY 1, 2),
        |iso AS (SELECT bi AS bucket, max(mn) AS iso FROM tri GROUP BY 1)
        |SELECT b.bucket, b.n, b.n_pos, round(b.conf, 4) AS mean_score,
        |  round(b.n_pos / b.n::DOUBLE, 6) AS frac_pos,
        |  round(iso.iso, 6) AS iso_frac
        |FROM b JOIN iso USING (bucket) ORDER BY bucket""".stripMargin),
    "q_roc_auc" -> (classifierEvalCte +
      """ps AS (SELECT score,
        |    count(*) FILTER (WHERE label)::BIGINT AS np,
        |    count(*) FILTER (WHERE NOT label)::BIGINT AS nn
        |  FROM sc WHERE score IS NOT NULL AND label IS NOT NULL
        |  GROUP BY score),
        |c AS (SELECT *, coalesce(sum(nn) OVER (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS below FROM ps)
        |SELECT sum(np + nn)::BIGINT AS n, sum(np)::BIGINT AS n_pos,
        |  sum(nn)::BIGINT AS n_neg,
        |  round(CASE WHEN sum(np) > 0 AND sum(nn) > 0
        |    THEN sum(np * (below + nn / 2.0))
        |      / (sum(np) * sum(nn))::DOUBLE
        |    ELSE 0.0 END, 4) AS auc
        |FROM c""".stripMargin),
    "q_mbr_select" ->
      """WITH c AS (SELECT doc_id // 10 AS grp, doc_id AS id,
        |    list_distinct(list_filter(
        |      regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS t
        |  FROM documents),
        |p AS (SELECT a.grp, a.id,
        |    avg(CASE WHEN len(list_distinct(list_concat(a.t, b.t))) = 0
        |      THEN 1.0
        |      ELSE len(list_intersect(a.t, b.t))::DOUBLE /
        |        len(list_distinct(list_concat(a.t, b.t)))::DOUBLE END) AS mbr
        |  FROM c a JOIN c b ON b.grp = a.grp AND b.id <> a.id
        |  GROUP BY 1, 2),
        |nc AS (SELECT grp, count(*)::BIGINT AS n_cands FROM c GROUP BY 1),
        |r AS (SELECT c.grp, c.id, p.mbr,
        |    row_number() OVER (PARTITION BY c.grp
        |      ORDER BY round(p.mbr, 9) DESC NULLS LAST, c.id) AS rn
        |  FROM c LEFT JOIN p ON p.grp = c.grp AND p.id = c.id)
        |SELECT r.grp, r.id AS selected, round(r.mbr, 4) AS mbr_score,
        |  nc.n_cands
        |FROM r JOIN nc ON nc.grp = r.grp WHERE rn = 1
        |ORDER BY r.grp""".stripMargin,
    "q_pass_at_k" ->
      """WITH samples AS (SELECT doc_id % 40 AS problem,
        |    (CAST(('0x' || substring(md5('pk|' || doc_id::VARCHAR), 1, 4))
        |      AS BIGINT) % 10 < 3) AS correct
        |  FROM documents),
        |per AS (SELECT problem, count(*)::DOUBLE AS n,
        |    sum(CASE WHEN correct THEN 1 ELSE 0 END)::DOUBLE AS c
        |  FROM samples GROUP BY 1),
        |est AS (SELECT k,
        |    CASE WHEN n < k THEN NULL
        |      WHEN n - c < k THEN 1.0
        |      ELSE 1.0 - list_aggregate(list_transform(
        |        generate_series(0, k - 1), i -> (n - c - i) / (n - i)),
        |        'product') END AS e
        |  FROM per CROSS JOIN (SELECT unnest([1, 5, 10]) AS k))
        |SELECT k::BIGINT AS k, count(e)::BIGINT AS n_problems,
        |  (count(*) - count(e))::BIGINT AS n_dropped,
        |  round(avg(e), 4) AS pass_at_k
        |FROM est GROUP BY k ORDER BY k""".stripMargin,
    // RBO replay: both half-rankings, the k-sized weight lookup
    // wsum(m) = Σ_{d=m..k} p^(d-1)/d built by a descending running sum
    // (the same association order as the operator's scanRight), groups
    // from either side always report — 0.0 when the prefixes are
    // disjoint. (1.0 - 0.9) spelled as the subtraction so both engines
    // multiply by the identical binary double.
    "q_rbo" ->
      """WITH a AS (SELECT event_type, user_id, count(*) AS n
        |  FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2),
        |ra AS (SELECT event_type, user_id, row_number()
        |    OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS r
        |  FROM a),
        |b AS (SELECT event_type, user_id, count(*) AS n
        |  FROM events WHERE event_id % 2 = 1 GROUP BY 1, 2),
        |rb AS (SELECT event_type, user_id, row_number()
        |    OVER (PARTITION BY event_type ORDER BY n DESC, user_id) AS r
        |  FROM b),
        |w AS (SELECT d, pow(0.9, d - 1) / d AS t
        |  FROM generate_series(1, 20) g(d)),
        |ws AS (SELECT d, sum(t) OVER (ORDER BY d DESC) AS wsum FROM w),
        |j AS (SELECT ra.event_type, greatest(ra.r, rb.r) AS m
        |  FROM ra JOIN rb ON ra.event_type = rb.event_type
        |    AND ra.user_id = rb.user_id
        |  WHERE ra.r <= 20 AND rb.r <= 20),
        |agg AS (SELECT j.event_type, count(*)::BIGINT AS n_common,
        |    round(sum(ws.wsum) * (1.0 - 0.9)
        |      / (1.0 - pow(0.9, 20)), 6) AS rbo
        |  FROM j JOIN ws ON ws.d = j.m GROUP BY 1),
        |g AS (SELECT DISTINCT event_type FROM events)
        |SELECT g.event_type,
        |  coalesce(n_common, 0)::BIGINT AS n_common,
        |  coalesce(rbo, 0.0) AS rbo
        |FROM g LEFT JOIN agg USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q_fleiss_kappa" ->
      """WITH lab AS (SELECT doc_id, unnest([
        |    CASE WHEN n_chars < 200 THEN 'short'
        |      WHEN n_chars < 800 THEN 'mid' ELSE 'long' END,
        |    CASE WHEN len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) < 40 THEN 'short'
        |      WHEN len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) < 160 THEN 'mid' ELSE 'long' END,
        |    CASE WHEN n_chars < 300 THEN 'short'
        |      WHEN n_chars < 700 THEN 'mid' ELSE 'long' END]) AS cat
        |  FROM documents),
        |cells AS (SELECT doc_id, cat, count(*)::BIGINT AS n_ij
        |  FROM lab GROUP BY 1, 2),
        |per AS (SELECT doc_id, sum(n_ij) AS n_i,
        |    sum(n_ij * n_ij) AS sq_i FROM cells GROUP BY 1),
        |modal AS (SELECT n_i AS n FROM (
        |  SELECT n_i, count(*) AS items FROM per GROUP BY 1
        |  ORDER BY items DESC, n_i DESC LIMIT 1)),
        |kept AS (SELECT per.doc_id, per.sq_i, modal.n
        |  FROM per, modal WHERE per.n_i = modal.n),
        |stats AS (SELECT count(*)::BIGINT AS n_items,
        |    any_value(n) AS nr,
        |    avg((sq_i - n) / (n * (n - 1.0))) AS p_bar,
        |    sum(n)::DOUBLE AS grand FROM kept),
        |pj AS (SELECT cat, sum(n_ij)::DOUBLE AS votes
        |  FROM cells JOIN kept USING (doc_id) GROUP BY 1),
        |pe AS (SELECT coalesce(sum((votes / grand) * (votes / grand)), 0.0)
        |    AS p_e FROM pj, stats),
        |tot AS (SELECT count(*)::BIGINT AS t FROM per)
        |SELECT n_items, (t - n_items)::BIGINT AS n_dropped,
        |  nr::BIGINT AS n_raters, round(p_bar, 4) AS p_bar,
        |  round(p_e, 4) AS p_e,
        |  CASE WHEN p_e < 1.0
        |    THEN round((p_bar - p_e) / (1.0 - p_e), 4)
        |    ELSE 1.0 END AS kappa
        |FROM stats, pe, tot""".stripMargin,
    "q_majority_vote" ->
      """WITH v AS (SELECT doc_id % 50 AS problem, lang AS answer
        |  FROM documents),
        |c AS (SELECT problem, answer, count(*)::BIGINT AS votes
        |  FROM v GROUP BY 1, 2),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY problem
        |      ORDER BY votes DESC, answer ASC) AS rk,
        |    sum(votes) OVER (PARTITION BY problem) AS total_votes,
        |    lead(votes, 1) OVER (PARTITION BY problem
        |      ORDER BY votes DESC, answer ASC) AS ru
        |  FROM c)
        |SELECT problem, answer, votes, total_votes::BIGINT AS total_votes,
        |  round(votes::DOUBLE / total_votes, 4) AS vote_share,
        |  (votes - coalesce(ru, 0))::BIGINT AS margin
        |FROM r WHERE rk = 1 ORDER BY problem""".stripMargin,
    // ranks from the distinct-value walk (exact per-cell avg ranks) are
    // integer-or-half doubles, so R_a and the tie term are EXACT on both
    // engines — the z replay is deterministic, not merely close
    "q_mann_whitney" ->
      """WITH cells AS (
        |  SELECT o_totalprice::DOUBLE AS v,
        |    count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS ca,
        |    count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS cb
        |  FROM orders
        |  WHERE o_orderstatus IN ('O', 'F') AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |r AS (
        |  SELECT ca, cb, ca + cb AS tk,
        |    coalesce(sum(ca + cb) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (ca + cb + 1) / 2.0 AS avg_rank
        |  FROM cells),
        |a AS (
        |  SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b,
        |    sum(ca * avg_rank)::DOUBLE AS ra,
        |    sum(tk * tk * tk - tk)::DOUBLE AS t3
        |  FROM r),
        |s AS (
        |  SELECT n_a, n_b,
        |    ra - n_a * (n_a + 1) / 2.0 AS ua,
        |    sqrt(n_a * n_b / 12.0 * ((n_a + n_b + 1)
        |      - t3 / ((n_a + n_b) * (n_a + n_b - 1.0)))) AS sigma
        |  FROM a)
        |SELECT n_a, n_b, round(ua, 1) AS u_a,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    THEN round(ua / (n_a::DOUBLE * n_b), 4) END AS auc,
        |  CASE WHEN n_a > 0 AND n_b > 0 AND sigma > 0
        |    THEN round((ua - n_a::DOUBLE * n_b / 2.0) / sigma, 4) + 0.0
        |    END AS z,
        |  coalesce(CASE WHEN n_a > 0 AND n_b > 0 AND sigma > 0
        |    THEN abs((ua - n_a::DOUBLE * n_b / 2.0) / sigma) > 1.96 END,
        |    false) AS significant
        |FROM s""".stripMargin,
    // two distinct-value rank walks joined back; rho = Pearson of the
    // (integer-or-half, hence exact) average ranks
    "q_spearman" ->
      """WITH d AS (
        |  SELECT l_quantity::DOUBLE AS x, l_extendedprice::DOUBLE AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |cx AS (SELECT x AS v, count(*)::BIGINT AS k FROM d GROUP BY 1),
        |rx AS (SELECT v,
        |    coalesce(sum(k) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (k + 1) / 2.0 AS r
        |  FROM cx),
        |cy AS (SELECT y AS v, count(*)::BIGINT AS k FROM d GROUP BY 1),
        |ry AS (SELECT v,
        |    coalesce(sum(k) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + (k + 1) / 2.0 AS r
        |  FROM cy),
        |j AS (SELECT rx.r AS rkx, ry.r AS rky
        |  FROM d JOIN rx ON d.x = rx.v JOIN ry ON d.y = ry.v)
        |SELECT count(*)::BIGINT AS n, round(corr(rkx, rky), 4) AS rho
        |FROM j""".stripMargin,
    // the same md5-cubed p derivation, then the BH step-up as a
    // running min over descending p — the window replay of the engine
    "q_bh_fdr" ->
      """WITH d AS (
        |  SELECT n_name AS id,
        |    round(pow((CAST(('0x' || substring(md5('bh|' ||
        |        n_nationkey::VARCHAR), 1, 6)) AS BIGINT) % 10000)
        |      / 10000.0, 3), 6) AS p
        |  FROM nation),
        |f AS (SELECT id, p FROM d
        |  WHERE p IS NOT NULL AND p >= 0 AND p <= 1),
        |r AS (SELECT id, p,
        |    row_number() OVER (ORDER BY p, id)::BIGINT AS rank,
        |    (SELECT count(*)::BIGINT FROM f) AS m
        |  FROM f),
        |adj AS (SELECT id, p, rank,
        |    round(least(1.0, min(m * p / rank) OVER (
        |      ORDER BY p DESC, id DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |      AS p_adj
        |  FROM r)
        |SELECT id, p, rank, p_adj, p_adj <= 0.05 AS significant
        |FROM adj ORDER BY rank""".stripMargin,
    // the q_bh_fdr p derivation, then Holm's step-down as a running max
    // over ascending p — the window replay of the engine's prefix scan
    "q_holm" ->
      """WITH d AS (
        |  SELECT n_name AS id,
        |    round(pow((CAST(('0x' || substring(md5('bh|' ||
        |        n_nationkey::VARCHAR), 1, 6)) AS BIGINT) % 10000)
        |      / 10000.0, 3), 6) AS p
        |  FROM nation),
        |f AS (SELECT id, p FROM d
        |  WHERE p IS NOT NULL AND p >= 0 AND p <= 1),
        |r AS (SELECT id, p,
        |    row_number() OVER (ORDER BY p, id)::BIGINT AS rank,
        |    (SELECT count(*)::BIGINT FROM f) AS m
        |  FROM f),
        |adj AS (SELECT id, p, rank,
        |    round(least(1.0, max((m - rank + 1) * p) OVER (
        |      ORDER BY p, id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |      AS p_adj
        |  FROM r)
        |SELECT id, p, rank, p_adj, p_adj <= 0.05 AS significant
        |FROM adj ORDER BY rank""".stripMargin,
    "q_bradley_terry" -> bradleyTerryOracle(10),
    // the same three deterministic labelers (third on even ids only);
    // every per-unit disagreement term is an integer over 1 or 2, so
    // the D_o sum is exact in FP and order-independent on any engine
    "q_krippendorff" ->
      """WITH lab AS (
        |  SELECT doc_id, unnest([
        |    CASE WHEN n_chars < 200 THEN 'short'
        |      WHEN n_chars < 800 THEN 'mid' ELSE 'long' END,
        |    CASE WHEN len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) < 40 THEN 'short'
        |      WHEN len(list_filter(string_split(text, ' '),
        |        x -> x <> '')) < 160 THEN 'mid' ELSE 'long' END]) AS cat
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |    CASE WHEN n_chars < 300 THEN 'short'
        |      WHEN n_chars < 700 THEN 'mid' ELSE 'long' END AS cat
        |  FROM documents WHERE doc_id % 2 = 0),
        |cells AS (SELECT doc_id, cat, count(*)::BIGINT AS n_ic
        |  FROM lab GROUP BY 1, 2),
        |per AS (SELECT doc_id, sum(n_ic) AS n_i,
        |    sum(n_ic * n_ic) AS sq_i FROM cells GROUP BY 1),
        |kept AS (SELECT * FROM per WHERE n_i >= 2),
        |tot AS (SELECT count(*)::BIGINT AS n_all FROM per),
        |dos AS (SELECT count(*)::BIGINT AS n_items,
        |    sum(n_i)::BIGINT AS n_ratings,
        |    sum((n_i * n_i - sq_i) / (n_i - 1.0)) AS do_num FROM kept),
        |nc AS (SELECT cat, sum(n_ic) AS n_c
        |  FROM cells JOIN kept USING (doc_id) GROUP BY 1),
        |ncs AS (SELECT count(*)::BIGINT AS n_categories,
        |    coalesce(sum(n_c * n_c), 0) AS sq_c FROM nc)
        |SELECT n_items, (n_all - n_items)::BIGINT AS n_dropped,
        |  n_ratings, n_categories,
        |  round(do_num / n_ratings, 6) AS d_o,
        |  round((n_ratings::DOUBLE * n_ratings - sq_c)
        |    / (n_ratings::DOUBLE * (n_ratings - 1)), 6) AS d_e,
        |  CASE WHEN (n_ratings::DOUBLE * n_ratings - sq_c) > 0
        |    THEN round(1.0 - (do_num / n_ratings)
        |      / ((n_ratings::DOUBLE * n_ratings - sq_c)
        |        / (n_ratings::DOUBLE * (n_ratings - 1))), 4)
        |    ELSE 1.0 END AS alpha
        |FROM dos, ncs, tot""".stripMargin,
    // same truth/model predicates; the continuity-corrected statistic
    // is integer-derived so the replay is exact. The f CTE mirrors the
    // engine's null-flag filter (Eval.mcnemar drops rows whose
    // correctness flags are NULL from n) so the two sides stay aligned
    // if the fixture ever grows null text/n_chars
    "q_mcnemar" ->
      """WITH d AS (SELECT doc_id,
        |    ((n_chars > 380) = (n_chars > 400)) AS ca,
        |    ((len(list_filter(string_split(text, ' '),
        |      x -> x <> '')) > 80) = (n_chars > 400)) AS cb
        |  FROM documents),
        |f AS (SELECT * FROM d
        |  WHERE doc_id IS NOT NULL AND ca IS NOT NULL AND cb IS NOT NULL),
        |g AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN ca AND cb THEN 1 ELSE 0 END)::BIGINT
        |      AS both_right,
        |    sum(CASE WHEN NOT ca AND NOT cb THEN 1 ELSE 0 END)::BIGINT
        |      AS both_wrong,
        |    sum(CASE WHEN ca AND NOT cb THEN 1 ELSE 0 END)::BIGINT
        |      AS only_a,
        |    sum(CASE WHEN NOT ca AND cb THEN 1 ELSE 0 END)::BIGINT
        |      AS only_b
        |  FROM f)
        |SELECT n, both_right, both_wrong, only_a, only_b,
        |  round((both_right + only_a) / n::DOUBLE, 4) AS acc_a,
        |  round((both_right + only_b) / n::DOUBLE, 4) AS acc_b,
        |  CASE WHEN only_a + only_b > 0
        |    THEN round(pow(greatest(abs(only_a - only_b) - 1.0, 0.0), 2)
        |      / (only_a + only_b), 4) END AS chi2,
        |  coalesce(CASE WHEN only_a + only_b > 0
        |    THEN pow(greatest(abs(only_a - only_b) - 1.0, 0.0), 2)
        |      / (only_a + only_b) > 3.8415 END, false) AS significant
        |FROM g""".stripMargin,
    // the same consecutive-doc battle pairing, ties kept; canonicalize
    // to (least, greatest) and split ties in the rate — the engine's
    // winRateMatrix contract replayed in one GROUP BY
    "q_winrate_matrix" ->
      """WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
        |b AS (SELECT a.lang AS la, bb.lang AS lb,
        |    CASE WHEN a.n_chars > bb.n_chars THEN a.lang
        |      WHEN bb.n_chars > a.n_chars THEN bb.lang END AS win
        |  FROM d a JOIN d bb ON bb.doc_id = a.doc_id + 1
        |  WHERE a.doc_id % 2 = 0),
        |c AS (SELECT least(la, lb) AS model_a, greatest(la, lb) AS model_b,
        |    CASE WHEN win = least(la, lb) THEN 'a'
        |      WHEN win = greatest(la, lb) THEN 'b' ELSE 't' END AS o
        |  FROM b WHERE la IS NOT NULL AND lb IS NOT NULL AND la <> lb),
        |g AS (SELECT model_a, model_b, count(*)::BIGINT AS n_battles,
        |    sum(CASE WHEN o = 'a' THEN 1 ELSE 0 END)::BIGINT AS wins_a,
        |    sum(CASE WHEN o = 'b' THEN 1 ELSE 0 END)::BIGINT AS wins_b,
        |    sum(CASE WHEN o = 't' THEN 1 ELSE 0 END)::BIGINT AS ties
        |  FROM c GROUP BY 1, 2)
        |SELECT model_a, model_b, n_battles, wins_a, wins_b, ties,
        |  round((wins_a + ties / 2.0) / n_battles, 4) AS win_rate_a,
        |  round((wins_b + ties / 2.0) / n_battles, 4) AS win_rate_b
        |FROM g ORDER BY model_a, model_b""".stripMargin,
    "q_judge_rerank" ->
      """WITH j AS (SELECT o_custkey % 50 AS grp, o_orderkey % 5 AS cand,
        |    o_orderkey % 3 AS judge,
        |    CASE WHEN o_orderkey % 5 = 0
        |      THEN ((o_orderkey % 3) % 2)::DOUBLE
        |      ELSE ((o_custkey % 50 + o_orderkey % 5) % 3)::DOUBLE
        |    END AS score
        |  FROM orders),
        |pc AS (SELECT grp, cand, count(*)::BIGINT AS n_judgments,
        |    count(DISTINCT judge)::BIGINT AS n_judges,
        |    round(avg(score), 4) AS mean_score,
        |    round(min(score), 4) AS min_score,
        |    round(max(score), 4) AS max_score
        |  FROM j GROUP BY 1, 2)
        |SELECT grp AS "group", cand AS candidate, n_judgments, n_judges,
        |  mean_score, min_score, max_score,
        |  rank() OVER (PARTITION BY grp ORDER BY mean_score DESC)
        |    ::BIGINT AS rank,
        |  (CASE WHEN row_number() OVER (PARTITION BY grp
        |      ORDER BY mean_score DESC, cand) = 1 THEN 1 ELSE 0 END)
        |    ::BIGINT AS is_pick
        |FROM pc ORDER BY "group", candidate""".stripMargin,
  )
}
