package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus / table profiling operators — the "describe my 100 TB of data"
 * surface a curation pipeline needs before filtering decisions.
 */
object Profile {

  /** Release any DistScan input pins still alive from LAZY scan-backed
   * results (bhAdjust; the terminal 1-row statistics self-release at
   * construction and never need this). Pins are optimization-only —
   * releasing mid-flight recomputes identical results. */
  def unpersistAll(spark: org.apache.spark.sql.SparkSession): Unit =
    CacheScope.unpersistAll(spark, CacheScope.Scan)

  /**
   * Per-group EXACT quantiles (linear interpolation, the percentile/
   * quantile_cont definition shared by Spark and DuckDB) plus group
   * counts, one output row per (group, q). Exact percentile buffers each
   * group's values on the aggregator — fine into the millions of rows per
   * group; for web-scale groups use `groupQuantilesApprox`, which holds
   * only a fixed-size sketch per group.
   */
  def groupQuantiles(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val qLits = array(qs.map(lit): _*)
    // DSL function, not an expr() string: valueCol stays an arbitrary
    // column NAME (never parsed as SQL), like every other operator
    df.groupBy(col(groupCol).as("grp"))
      .agg(percentile(col(valueCol), qLits).as("vs"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("n"), posexplode(col("vs")).as(Seq("qi", "v")))
      .select(col("grp"),
        element_at(qLits, col("qi") + 1).as("q"),
        round(col("v"), 4).as("value"),
        col("n"))
  }

  /**
   * Per-group cardinality profile: EXACT distinct count plus basic value
   * stats. Exact distinct is a two-level hash aggregate (Spark expands to
   * a partial-distinct pre-aggregation, so the shuffle carries (group,
   * value) partials, not raw rows) — correct at any scale but the shuffle
   * width grows with the true cardinality; for web-scale cardinalities
   * use `groupDistinctApprox`.
   */
  def groupDistinct(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(countDistinct(col(valueCol)).as("n_distinct"),
        count(col(valueCol)).as("n_values"),
        count(lit(1)).as("n_rows"))

  /** Approximate per-group distinct count via HyperLogLog++
   * (`approx_count_distinct`) — the 100 TB path: the aggregation state is
   * one fixed-size HLL register set per group regardless of cardinality,
   * the shuffle carries merged sketches, and relative error is bounded by
   * `rsd` (default 5%). Mergeable sketch state also makes this the
   * STREAMING cardinality profile (Complete mode), like
   * `groupQuantilesApprox`. */
  def groupDistinctApprox(
      df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.05): DataFrame = {
    require(rsd > 0.0 && rsd < 1.0, s"rsd must be in (0,1), got $rsd")
    df.groupBy(col(groupCol).as("grp"))
      .agg(approx_count_distinct(col(valueCol), rsd).as("n_distinct_approx"),
        count(col(valueCol)).as("n_values"),
        count(lit(1)).as("n_rows"))
  }

  /**
   * Per-source corpus health report — the CCNet-style "which crawl sources
   * are garbage" table a curation pipeline consults before choosing
   * filters. One row per source: doc count, approximate distinct-language
   * count (HLL++), mean/median quality, and token-count deciles.
   *
   * Exactly one narrow projection (the quality metrics) followed by ONE
   * groupBy-source aggregation whose per-group state is fixed-size (HLL
   * registers + KLL sketches + scalar sums) — no source's rows are ever
   * buffered, so the report costs one shuffle of sketch partials at any
   * corpus size.
   */
  def sourceReport(
      docs: DataFrame, sourceCol: String, langCol: String,
      textCol: String, idCol: String): DataFrame = {
    val q = TextMetrics.quality(docs, textCol, idCol,
      keep = Seq(sourceCol, langCol))
    q.groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col(langCol)).as("n_langs_approx"),
        round(avg(col("quality")), 4).as("avg_quality"),
        round(avg(col("n_tokens")), 2).as("avg_tokens"),
        percentile_approx(col("n_tokens"),
          array(lit(0.1), lit(0.5), lit(0.9)), lit(10000)).as("tok_q"),
        round(percentile_approx(col("quality"), lit(0.5), lit(10000))
          .cast("double"), 4).as("quality_p50"))
      .select(col("source"), col("n_docs"), col("n_langs_approx"),
        col("avg_quality"), col("avg_tokens"),
        col("tok_q")(0).cast("long").as("tokens_p10"),
        col("tok_q")(1).cast("long").as("tokens_p50"),
        col("tok_q")(2).cast("long").as("tokens_p90"),
        col("quality_p50"))
  }

  /**
   * Corpus-level heavy hitters — the EXACT top-k most frequent values of a
   * column (vocabulary terms, domains, user ids, …), with deterministic
   * rank ties broken by the value itself. One map-side-combined groupBy
   * then a `TakeOrdered` top-k on (count desc, value): the full frequency
   * table is never sorted or collected, so the cost beyond the groupBy is
   * a k-row per-partition heap — the same zero-global-sort shape as the
   * brute-force ANN top-k.
   */
  def topValues(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("value"))
      .limit(k)
  }

  /** The (row, bucket) pair columns of a count-min sketch: row i hashes
   * a value by `pmod(md5("i|" ++ v) prefix, width)` — d INDEPENDENT
   * md5-salted hash rows, the DSIR bucket chain widened, so the whole
   * sketch replays verbatim in SQL. Shared by [[cmsSketch]] and
   * [[cmsEstimate]]: the two sides MUST agree digit-for-digit or every
   * estimate silently reads a stranger's bucket. */
  private def cmsPairs(v: Column, depth: Int, width: Int): Column =
    explode(array((0 until depth).map(i =>
      struct(lit(i).as("row"),
        pmod(conv(substring(md5(concat(lit(s"$i|"), v)), 1, 12), 16, 10)
          .cast("long"), lit(width.toLong)).as("bucket"))): _*))

  /**
   * Count-min sketch construction (Cormode & Muthukrishnan 2005) — the
   * BOUNDED-STATE frequency summary for value spaces too large to
   * count exactly: d·w counters regardless of cardinality, mergeable
   * (counts add), so it runs UNCHANGED on a streaming frame in
   * Complete mode (the psiBucketCounts pattern — this is what the
   * honest-envelope table means by "the CMS upgrade" for corpus-global
   * frequencies on streams). Guarantee: estimates are ONE-SIDED —
   * never under the true count, over by at most ~2n/w with probability
   * 1 − (1/2)^d at the default shape. Output: row, bucket, n (≤ d·w
   * rows — the persistable sketch).
   */
  def cmsSketch(df: DataFrame, valueCol: String, depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 1, s"width must be >= 1: $width")
    val v = col(valueCol).cast("string")
    df.filter(v.isNotNull)
      .select(cmsPairs(v, depth, width).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Point estimates from a [[cmsSketch]]: for each queried value, the
   * MIN over the d rows of its bucket count (an absent bucket reads 0
   * — a value the sketch never saw estimates 0, not NULL). The query
   * side is a candidate list (top-k suspects, a watchlist, a join key
   * sample) — k·d rows against the ≤ d·w sketch, broadcast-sized both
   * sides; never corpus-scale. Output: value, n_est.
   */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, valueCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16]: $depth")
    require(width >= 1, s"width must be >= 1: $width")
    val v = col(valueCol).cast("string")
    queries.filter(v.isNotNull).select(v.as("value")).distinct()
      .select(col("value"), cmsPairs(col("value"), depth, width).as("rb"))
      .select(col("value"), col("rb.row").as("row"),
        col("rb.bucket").as("bucket"))
      .join(sketch.select(col("row"), col("bucket"), col("n")),
        Seq("row", "bucket"), "left")
      .groupBy("value")
      .agg(min(coalesce(col("n"), lit(0L))).as("n_est"))
  }

  /**
   * Top-k rows PER GROUP (the "best n per key" staple: top orders per
   * segment, top documents per domain, top chunks per query): row_number
   * over a (group, ordering) window, kept while rank <= k. The ordering
   * exprs must totally order rows within a group (include a unique
   * tiebreak) for a deterministic result.
   *
   * Scale shape: Spark's optimizer rewrites the rank-filter into
   * WindowGroupLimit with a PARTIAL pass — every map task prunes to at
   * most k rows per group BEFORE the shuffle (plan-audited), so the
   * exchange moves O(groups·k) rows, not the input. That is what makes
   * this safe on a 100 TB fact table: the full table is never sorted,
   * and no group's whole history crosses the wire.
   */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
      ordering: Seq[org.apache.spark.sql.Column], k: Int): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    require(ordering.nonEmpty, "topKPerGroup needs an ordering")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  /**
   * Market-basket co-occurrence: for every unordered item pair, the
   * number of baskets containing both, kept at `minSupport` — the
   * support-counting pass of association mining, and the pair statistic
   * behind "frequently bought/linked/cited together" reports.
   *
   * Shape: distinct (basket, item) — one keyed shuffle — then a
   * basket-keyed self-join under an EXPLICIT repartition on the basket
   * key (the Linkage kernel-parallelism lesson: both sides share the
   * partitioning, so the join adds no exchange), `item_a < item_b` so
   * each pair forms exactly once BY CONSTRUCTION (no distinct pass),
   * then one pair-keyed count. Blowup per basket is C(width, 2) —
   * quadratic in basket WIDTH, never corpus size; pathologically wide
   * baskets are the documented envelope (cap upstream with
   * [[topKPerGroup]] when a basket can hold thousands of items).
   */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, nPart: Int = 0): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val bi = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val parts =
      if (nPart > 0) bi.repartition(nPart, col("basket"))
      else bi.repartition(col("basket"))
    parts.select(col("basket"), col("item").as("item_a"))
      .join(parts.select(col("basket"), col("item").as("item_b")), Seq("basket"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_baskets"))
      .where(col("n_baskets") >= minSupport)
  }

  /**
   * Association rules from [[coOccurrence]] pairs: each supported pair
   * emits BOTH directed rules a→b and b→a with
   * confidence = n_both / n_antecedent and
   * lift = n_both · N / (n_antecedent · n_consequent), 4dp — the
   * classic "bought X also bought Y" strength measures (lift > 1 means
   * positive association beyond item popularity).
   *
   * Shape: the coOccurrence pass + one item-count aggregation joined
   * twice on the item key; the basket total N enters as a 1-row
   * aggregate subtree (crossJoin, the pageRank pattern — no count()
   * action, no driver state).
   */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, nPart: Int = 0): DataFrame = {
    val bi = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val itemN = bi.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val nTot = bi.select(countDistinct("basket").cast("double").as("n_tot"))
    val pairs = coOccurrence(df, basketCol, itemCol, minSupport, nPart)
    val directed = pairs
      .select(col("item_a").as("antecedent"), col("item_b").as("consequent"),
        col("n_baskets"))
      .unionByName(pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("n_baskets")))
    directed
      .join(itemN.select(col("item").as("antecedent"), col("n_item").as("n_ante")),
        Seq("antecedent"))
      .join(itemN.select(col("item").as("consequent"), col("n_item").as("n_cons")),
        Seq("consequent"))
      .crossJoin(nTot)
      .select(col("antecedent"), col("consequent"), col("n_baskets"),
        round(col("n_baskets") / col("n_ante"), 4).as("confidence"),
        round(col("n_baskets") * col("n_tot") / (col("n_ante") * col("n_cons")), 4)
          .as("lift"))
  }

  /**
   * First-order (Markov) transition matrix over per-key event sequences:
   * each key's events ordered by (time, type — the deterministic
   * tiebreak), consecutive pairs counted, and each from-state row
   * normalized to a 4dp transition probability. The session-modeling
   * staple: "after a view, what happens next, how often".
   *
   * Shape: one keyed window (lead) + one pair aggregation + a from-state
   * total joined back on the from key — every shuffle keyed, the state
   * alphabet (not the corpus) sizes the output.
   */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col("from_state"))
    val pairs = df
      .select(col(keyCol), col(tsCol), col(typeCol).as("from_state"))
      .withColumn("to_state", lead(col("from_state"), 1).over(w))
      .where(col("to_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(totals, Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"),
        round(col("n") / col("n_from"), 4).as("p"))
  }

  /**
   * Sketch path for heavy hitters: a Count-Min Sketch over the column,
   * returning the CMS frequency ESTIMATE for each requested candidate
   * value. The sketch is a fixed-size (depth x width) counter grid built
   * in one distributed pass (`DataFrameStatFunctions.countMinSketch`,
   * mergeable per-partition state) — at 100 TB the sketch, not an exact
   * frequency table, is what fits beside the scan; estimates are
   * one-sided: estimate >= true count, and <= true + eps*N with
   * probability 1-delta (spec-asserted against exact counts).
   */
  def cmsEstimates(
      df: DataFrame, valueCol: String, candidates: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Seq[(String, Long)] = {
    val cms = df.stat.countMinSketch(col(valueCol).cast("string"),
      eps, confidence, seed)
    candidates.map(v => (v, cms.estimateCount(v)))
  }

  /**
   * Numeric column profile (the `DESCRIBE`-style summary, long format):
   * one row per column with count / null count / min / max / mean /
   * sample stddev. Computed as a SINGLE aggregation over one scan — all
   * columns' statistics are partial-aggregated together, then unpivoted
   * with a per-row struct explode on the 1-row result (driver-side cost
   * is k structs, never data rows). At 100 TB this is one pass and one
   * k·6-value shuffle, regardless of how many columns are profiled.
   */
  /**
   * String-column completeness profile — the categorical sibling of
   * [[describeNumeric]] (min/max/mean say nothing about an id or
   * category column; what matters there is null share, BLANK share —
   * the '' that count(col) silently treats as present — distinct
   * cardinality, length spread, and how dominated the column is by its
   * top value): per column — n, nulls, blanks (empty or
   * whitespace-only), n_distinct (exact; swap approx_count_distinct at
   * the sketch contract), len_min/len_max, top_value, top_share (4dp).
   * top_value ties break lexicographically. One aggregation computes
   * every column's counters; each column's top value is one extra
   * value-keyed aggregation + 1-row argmax (k columns scale pass count
   * by k here — the honest cost of exact mode; cap with a sampled or
   * sketched top-k when k is large).
   * Output: column, n, nulls, blanks, n_distinct, len_min, len_max,
   * top_value, top_share.
   */
  def describeStrings(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describeStrings needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val frames = cols.map { c =>
      val v = col(c).cast("string")
      val base = df.select(v.as("_v"))
      val stats = base.agg(
        count(lit(1)).as("n"),
        sum(when(col("_v").isNull, 1L).otherwise(0L)).as("nulls"),
        sum(when(col("_v").isNotNull && trim(col("_v")) === "", 1L)
          .otherwise(0L)).as("blanks"),
        countDistinct(col("_v")).as("n_distinct"),
        min(length(col("_v"))).cast("long").as("len_min"),
        max(length(col("_v"))).cast("long").as("len_max"))
      val top = base.filter(col("_v").isNotNull)
        .groupBy("_v").agg(count(lit(1)).as("_c"))
        .orderBy(desc("_c"), col("_v")).limit(1)
        .select(col("_v").as("top_value"), col("_c").as("_topc"))
      Seq(c).toDF("column").crossJoin(stats).crossJoin(top)
        .select(col("column"), col("n"), col("nulls"), col("blanks"),
          col("n_distinct"), col("len_min"), col("len_max"),
          col("top_value"),
          round(col("_topc") / (col("n") - col("nulls")), 4)
            .as("top_share"))
    }
    frames.reduce(_.unionByName(_))
  }

  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describeNumeric needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        round(min(col(c)).cast("double"), 4).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 4).as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__mean"),
        round(stddev_samp(col(c)), 4).as(s"${c}__sd"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column"), col(s"${c}__n").as("n"),
        coalesce(col(s"${c}__nulls"), lit(0L)).as("n_nulls"),
        col(s"${c}__min").as("min_v"), col(s"${c}__max").as("max_v"),
        col(s"${c}__mean").as("mean_v"), col(s"${c}__sd").as("sd_v"))
    }
    one.select(explode(array(structs: _*)).as("s")).select(col("s.*"))
  }

  /**
   * Dataset-card summary — the one-artifact profile a dataset release
   * ships with (the "dataset card" of Gebru et al. 2021's datasheets):
   * [[describeNumeric]], [[describeStrings]] and [[entropyProfile]]
   * folded into ONE long-format frame a report template can render
   * directly, instead of three wide frames with three schemas. Sections:
   * `table` (n_rows), `numeric` (n/n_nulls/min/max/mean/sd per numeric
   * column), `string` (n/nulls/blanks/n_distinct/len_min/len_max/
   * top_share per string column), `entropy` (n/n_nulls/n_distinct/
   * entropy/norm_entropy per STRING column — entropy is a categorical
   * readout; a continuous column's entropy is an artifact of its
   * cardinality). Values are the underlying operators' numbers cast to
   * double (long counts cast exactly; the string top VALUE is the one
   * non-numeric stat and is deliberately not carried — [[describeStrings]]
   * reports it). Cost = the component operators' scans, nothing new:
   * one aggregation for the numeric section, per-string-column
   * completeness aggs, one unpivoted count pass for entropy.
   * Output: (section, column, metric, value), one row per statistic.
   */
  def datasetCard(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    require(numericCols.nonEmpty || stringCols.nonEmpty,
      "datasetCard needs at least one column")
    def melt(src: DataFrame, section: String, colCol: String,
        metrics: Seq[String]): DataFrame =
      src.select(lit(section).as("section"),
          col(colCol).cast("string").as("column"),
          explode(array(metrics.map(m => struct(lit(m).as("metric"),
            col(m).cast("double").as("value"))): _*)).as("kv"))
        .select(col("section"), col("column"),
          col("kv.metric").as("metric"), col("kv.value").as("value"))
    val table = df.agg(count(lit(1)).as("n_rows"))
      .select(lit("table").as("section"), lit("*").as("column"),
        lit("n_rows").as("metric"), col("n_rows").cast("double").as("value"))
    val parts = Seq(table) ++
      (if (numericCols.isEmpty) Nil
       else Seq(melt(describeNumeric(df, numericCols), "numeric",
         "column",
         Seq("n", "n_nulls", "min_v", "max_v", "mean_v", "sd_v")))) ++
      (if (stringCols.isEmpty) Nil
       else Seq(
         melt(describeStrings(df, stringCols), "string", "column",
           Seq("n", "nulls", "blanks", "n_distinct", "len_min",
             "len_max", "top_share")),
         melt(entropyProfile(df, stringCols), "entropy", "col_name",
           Seq("n", "n_nulls", "n_distinct", "entropy",
             "norm_entropy"))))
    parts.reduce(_.unionAll(_))
  }

  /**
   * Join-key skew report — the diagnosis a salting/AQE decision is based
   * on: the k heaviest keys with their row share and their ratio to the
   * MEAN key load (ratio >> 1 on a key that carries a meaningful share is
   * exactly the single-hot-partition signature). One groupBy on the key;
   * the global totals enter as a 1-row aggregate subtree joined in (no
   * separate count() action), and the top-k is a TakeOrdered, never a
   * global sort.
   */
  def keySkew(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.select(sum("n").as("total"),
      count(lit(1)).cast("double").as("n_keys"))
    counts.crossJoin(totals)
      .select(col("key"), col("n"),
        round(col("n") / col("total"), 6).as("share"),
        round(col("n") * col("n_keys") / col("total"), 4).as("ratio_to_avg"))
      .orderBy(desc("n"), col("key"))
      .limit(k)
  }

  /** Approximate per-group quantiles via approx_percentile (KLL-style
   * fixed-size sketch per group — the 100 TB path: no group's values are
   * ever buffered whole). Same output shape as `groupQuantiles`.
   *
   * Also the STREAMING profile: pass a streaming DataFrame and write the
   * result in Complete output mode — the sketch is a mergeable aggregation
   * buffer, so Structured Streaming keeps one fixed-size sketch per group
   * as state and re-emits refreshed quantiles every micro-batch (state is
   * bounded by #groups x sketch size, never by the stream length; rank
   * error <= n/accuracy). One code path serves batch and live profiling. */
  def groupQuantilesApprox(
      df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))
    val qLits = array(qs.map(lit): _*)
    df.groupBy(col(groupCol).as("grp"))
      .agg(percentile_approx(col(valueCol), qLits, lit(accuracy)).as("vs"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("n"), posexplode(col("vs")).as(Seq("qi", "v")))
      .select(col("grp"),
        element_at(qLits, col("qi") + 1).as("q"),
        round(col("v").cast("double"), 4).as("value"),
        col("n"))
  }

  /**
   * Fixed-width histogram, optionally per group — the distribution
   * profile behind threshold tuning (where do I cut quality scores?
   * how skewed are document lengths per source?). Bins span each
   * group's [min, max] split into `bins` equal widths; EVERY bin is
   * materialized (an empty bin is data — a gap in the distribution —
   * not absence of a row, the resampleFill convention). NULL values are
   * excluded; a degenerate group (min == max) lands wholly in bin 0.
   * Output: groupCols…, bucket, lo_edge, hi_edge (6dp), n.
   *
   * Shape at scale: one keyed min/max aggregation, one keyed
   * (group, bucket) count aggregation, the stats frame joined back to
   * the scan (group-keyed — AQE broadcasts it when the group count is
   * small) and a bins-per-group grid exploded from the STATS frame
   * (G·bins rows, never data-sized). No window, no global sort, no
   * action; parallelism follows the data partitioning.
   */
  def histogram(df: DataFrame, valueCol: String, bins: Int,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(bins > 0, "bins must be positive")
    val v = col(valueCol).cast("double")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ v.as("_v"): _*)
    val stats = (if (groupCols.isEmpty) vals.groupBy()
      else vals.groupBy(groupCols.map(col): _*))
      .agg(min(col("_v")).as("_lo"), max(col("_v")).as("_hi"))
      .withColumn("_w", when(col("_hi") > col("_lo"),
        (col("_hi") - col("_lo")) / bins).otherwise(lit(1.0)))
    val joined = if (groupCols.isEmpty) vals.crossJoin(stats)
      else vals.join(stats, groupCols)
    val counts = joined
      .withColumn("bucket", when(col("_hi") > col("_lo"),
        least(floor((col("_v") - col("_lo")) / col("_w")),
          lit((bins - 1).toLong))).otherwise(lit(0L)))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("_n"))
    val grid = stats.select(groupCols.map(col) ++ Seq(
      explode(sequence(lit(0L), lit((bins - 1).toLong))).as("bucket"),
      col("_lo"), col("_w")): _*)
    grid.join(counts, groupCols :+ "bucket", "left")
      .select(groupCols.map(col) ++ Seq(col("bucket"),
        round(col("_lo") + col("bucket") * col("_w"), 6).as("lo_edge"),
        round(col("_lo") + (col("bucket") + 1) * col("_w"), 6).as("hi_edge"),
        coalesce(col("_n"), lit(0L)).as("n")): _*)
  }

  /**
   * Weighted quantiles per group — the distributional half of the
   * weighted-analysis pair ([[weightedStats]] gives moments; medians
   * and tails of a CALIBRATED frame need the weights too, or the
   * reweighting silently vanishes from every percentile report):
   * quantile_p = min x with F(x) ≥ p where F is the weighted CDF
   * Σ_{xᵢ≤x} wᵢ / W — the left-continuous inverse (equal-weight case
   * reduces to the lower-value convention, NOT quantile_cont's
   * interpolation; stated so nobody expects interpolated values).
   * NULL values and NULL/≤0 weights are excluded.
   *
   * Shape: ONE group-keyed value-ordered window builds the running
   * weight (the exact-ntile/ccnet per-group sort envelope — a group's
   * rows sort within their partitions; pre-bucket a group that is
   * most of the corpus or use the sketch path), then one aggregation
   * per group takes every requested p — p count widens expressions,
   * never passes. Output: group, p (4dp), value.
   */
  def weightedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"probabilities must be in (0,1]: $ps")
    val v = col(valueCol).cast("double")
    val w0 = col(weightCol).cast("double")
    val base = df.filter(v.isNotNull && w0.isNotNull && (w0 > 0))
      .select(col(groupCol).as("_g"), v.as("_v"), w0.as("_w"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_g")).orderBy(col("_v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("_g"))
    val cum = base
      .withColumn("_cw", sum(col("_w")).over(win))
      .withColumn("_tw", sum(col("_w")).over(tot))
    val aggs = ps.map(p =>
      min(when(col("_cw") >= lit(p) * col("_tw"), col("_v"))).as(f"_q$p%s"))
    val stackArgs = ps.map(p => s"${p}D, `_q$p`").mkString(", ")
    cum.groupBy(col("_g"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("_g").as(groupCol),
        expr(s"stack(${ps.size}, $stackArgs) AS (_p, value)"))
      .select(col(groupCol), round(col("_p"), 4).as("p"), col("value"))
  }

  /**
   * Weighted summary statistics with Kish-effective-sample inference —
   * the analysis step that CONSUMES calibrated weights (an
   * entropy-balanced / raked frame is only useful if downstream
   * estimates use the weights AND report uncertainty that honors
   * them): per column, the weighted mean μ_w = Σwx/Σw, the weighted
   * variance Σw(x−μ)²/Σw (POPULATION convention — stated, because the
   * n−1 analogue for weights is ambiguous), the Kish effective sample
   * size ESS = (Σw)²/Σw², and SE(μ_w) ≈ σ_w/√ESS with its normal 95%
   * interval — the Kish approximation (exact under equal weights,
   * conservative-ish under calibration weights; a design-based
   * linearization would need strata/PSU structure this frame doesn't
   * carry, and the doc says so instead of pretending). Rows with NULL
   * value or NULL/≤0 weight are excluded per column.
   *
   * ONE aggregation computes every column's moments (map-side
   * combined, 1-row result), an in-project stack unpivots — k columns
   * widen expressions, never passes. Output: column, n, sum_w, ess
   * (2dp), w_mean, w_sd, se, ci_lo, ci_hi (4dp — the rounding step
   * must dominate both engines' sum-order ulp drift at realistic
   * column magnitudes, which 6dp would not at means ~1e4 over 1e5
   * rows).
   */
  def weightedStats(df: DataFrame, weightCol: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    val w0 = col(weightCol).cast("double")
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      val ok = v.isNotNull && w0.isNotNull && (w0 > 0)
      val w = when(ok, w0)
      Seq(count(when(ok, 1)).as(s"_n_$c"),
        sum(w).as(s"_sw_$c"),
        sum(w * w).as(s"_sw2_$c"),
        sum(w * v).as(s"_swx_$c"),
        sum(w * v * v).as(s"_swx2_$c"))
    }
    val m = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', _n_$c, _sw_$c, _sw2_$c, _swx_$c, _swx2_$c"
    }.mkString(", ")
    m.select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column, n, _sw, _sw2, _swx, _swx2)"))
      .withColumn("_mu", col("_swx") / col("_sw"))
      .withColumn("_var",
        greatest(col("_swx2") / col("_sw") - col("_mu") * col("_mu"),
          lit(0.0)))
      .withColumn("_ess", col("_sw") * col("_sw") / col("_sw2"))
      .withColumn("_se", sqrt(col("_var") / col("_ess")))
      .select(col("column"), col("n"),
        round(col("_sw"), 4).as("sum_w"),
        round(col("_ess"), 2).as("ess"),
        round(col("_mu"), 4).as("w_mean"),
        round(sqrt(col("_var")), 4).as("w_sd"),
        round(col("_se"), 4).as("se"),
        round(col("_mu") - lit(1.96) * col("_se"), 4).as("ci_lo"),
        round(col("_mu") + lit(1.96) * col("_se"), 4).as("ci_hi"))
  }

  /**
   * Robust monotone-trend test per key series — Mann–Kendall S and
   * Kendall's τ plus the Theil–Sen slope estimate, the
   * outlier-immune answer to "is this metric drifting, and how fast"
   * that a least-squares slope gets wrong on the exact spiky series
   * drift monitoring cares about (one spike swings OLS; it moves ONE
   * pairwise comparison here): over all time-ordered point pairs
   * i < j, S = Σ sign(v_j − v_i), τ = S / (n(n−1)/2) ∈ [−1, 1], and
   * slope = the exact MEDIAN of pairwise slopes (dv/dt over distinct
   * instants — `percentile`, the quantile_cont convention).
   * Significance: under H₀, S is ~normal with var n(n−1)(2n+5)/18
   * (no-ties form) — the z-test is left to the caller because the
   * tie-corrected variance needs the tie spectrum; the no-ties formula
   * is stated here so the caller knows exactly what they'd be
   * computing. Keys with < 2 points report no row (no pairs, no
   * trend evidence).
   *
   * Shape: a per-key SELF-JOIN on time order — Θ(n_k²) pairs per key,
   * the documented envelope of the drift family's per-key series (a
   * daily series is hundreds of points → tens of thousands of pairs;
   * pre-bucket coarser series past that), then one keyed aggregation.
   * Output: key, n, n_pairs, s, tau (4dp), slope (6dp).
   */
  def trendTest(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol).cast("long").as("_t"),
        col(valueCol).cast("double").as("_x"))
    val a = base.select(col(keyCol), col("_t").as("_ta"),
      col("_x").as("_xa"))
    val b = base.select(col(keyCol), col("_t").as("_tb"),
      col("_x").as("_xb"))
    val pairs = a.join(b, Seq(keyCol))
      .filter(col("_ta") < col("_tb"))
      .withColumn("_sgn", signum(col("_xb") - col("_xa")))
      .withColumn("_slope",
        (col("_xb") - col("_xa")) / (col("_tb") - col("_ta")))
    val counts = base.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    pairs.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_sgn")).cast("long").as("s"),
        percentile(col("_slope"), lit(0.5)).as("_ts"))
      .join(counts, Seq(keyCol))
      .select(col(keyCol), col("n"), col("n_pairs"), col("s"),
        (round(col("s") / col("n_pairs"), 4) + lit(0.0)).as("tau"),
        (round(col("_ts"), 6) + lit(0.0)).as("slope"))
  }

  /**
   * Feature standardization for training export — each listed numeric
   * column gains a scaled sibling: CLASSIC mode (x − mean)/stddev, or
   * ROBUST mode (x − median)/IQR (Q3 − Q1) — the outlier-immune pair
   * the winsorize/MAD family prefers on heavy-tailed features, where a
   * single spike inflates the stddev that classic scaling divides by.
   * Zero-spread columns (constant, or IQR 0 from >50% duplicates)
   * scale to NULL, never a divide-by-zero or a fake 0 — no spread
   * means no scale, the family's no-evidence convention. NULLs pass
   * through as NULL. Scaling params come from ONE aggregation over all
   * columns (a 1-row subtree entering as a broadcast crossJoin), the
   * transform is one narrow codegen'd projection — k columns scale
   * expression width, never pass count.
   * Output: input columns + `<col>_scaled` (6dp) per listed column.
   */
  def standardize(df: DataFrame, cols: Seq[String],
      robust: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column to standardize")
    val clash = cols.map(_ + "_scaled").filter(df.columns.contains)
    require(clash.isEmpty,
      s"output columns ${clash.mkString(", ")} already exist; rename first")
    val aggs = cols.flatMap { c =>
      val v = col(c).cast("double")
      if (robust)
        Seq(percentile(v, lit(0.5)).as(s"_med_$c"),
          (percentile(v, lit(0.75)) - percentile(v, lit(0.25)))
            .as(s"_iqr_$c"))
      else
        Seq(avg(v).as(s"_mu_$c"),
          coalesce(stddev_samp(v), lit(0.0)).as(s"_sd_$c"))
    }
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val out = cols.foldLeft(df.crossJoin(stats)) { (acc, c) =>
      val v = col(c).cast("double")
      val (center, spread) =
        if (robust) (col(s"_med_$c"), col(s"_iqr_$c"))
        else (col(s"_mu_$c"), col(s"_sd_$c"))
      acc.withColumn(s"${c}_scaled",
        round(when(spread > 0, (v - center) / spread), 6))
    }
    val drop = cols.flatMap(c =>
      if (robust) Seq(s"_med_$c", s"_iqr_$c") else Seq(s"_mu_$c", s"_sd_$c"))
    out.drop(drop: _*)
  }

  /**
   * Equi-DEPTH histogram — the quantile-cut companion to [[histogram]]'s
   * equi-width bins (equi-width shows WHERE mass sits on the value
   * axis; equi-depth shows where the VALUE AXIS must be cut so each
   * bin holds ~n/k rows — the zone-map/partition-boundary question,
   * and the one skewed data answers badly with fixed-width bins: one
   * hot bin and k−1 empties). Cut points are EXACT percentiles at
   * p = i/k (the [[winsorize]]/[[groupQuantiles]] convention —
   * `percentile` matches DuckDB `quantile_cont`); a row lands in
   * bucket Σ_i 1[v > cut_i] (ties at a cut stay in the LOWER bucket,
   * so duplicate-heavy data shows its skew as uneven counts — the
   * honest signal, not a forced n/k). Bin 0's lo edge is the min; the
   * top edge the max.
   *
   * One exact percentile aggregation (1 row, k+1-wide array), the
   * 1-row frame crossJoin'd back (broadcast subtree), bucket
   * assignment as a codegen'd literal fold over the cut array, one
   * bucket-keyed count. Swap percentile → approx_percentile at sketch
   * precision for the fixed-state path (the winsorize contract).
   * Output: bucket, lo_edge, hi_edge (6dp), n.
   */
  def histogramEquiDepth(df: DataFrame, valueCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val v = col(valueCol).cast("double")
    val vals = df.filter(col(valueCol).isNotNull).select(v.as("_v"))
    val ps = (0 to buckets).map(i => i.toDouble / buckets)
    val cuts = vals.agg(
      percentile(col("_v"), typedlit(ps)).as("_cuts"))
    val inner = (1 until buckets)
    val bucket = inner.map(i =>
      when(col("_v") > element_at(col("_cuts"), i + 1), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val counts = vals.crossJoin(cuts)
      .withColumn("bucket", bucket)
      .groupBy("bucket").agg(count(lit(1)).as("_n"))
    cuts
      .select(explode(sequence(lit(0L), lit((buckets - 1).toLong)))
        .as("bucket"), col("_cuts"))
      .join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        round(element_at(col("_cuts"),
          col("bucket").cast("int") + 1), 6).as("lo_edge"),
        round(element_at(col("_cuts"),
          col("bucket").cast("int") + 2), 6).as("hi_edge"),
        coalesce(col("_n"), lit(0L)).as("n"))
  }

  /**
   * Classical additive seasonal decomposition per key series —
   * x_t = trend + seasonal + residual, the drift-triage step between
   * [[acf]] (detects that a cycle exists) and alarms ([[cusum]],
   * [[rollingZ]]) that false-fire on every weekend unless the seasonal
   * component is removed first: trend is the centered `period`-point
   * moving average (NULL until the window is complete — edges are
   * censored, not zero-filled), seasonal is the per-season mean of the
   * detrended series RE-CENTERED to sum ~0 over a cycle (season =
   * ts mod period), residual is what alarms should watch.
   *
   * One keyed window pass for the trend (single Exchange), one
   * (key, season) aggregation + one key-level mean for the seasonal
   * indices, broadcast-sized joins back. All window/aggregation
   * algebra — no fold, so unlike ewma/holt this one has NO
   * per-key-series memory envelope. The oracle replays the identical
   * windows. Output: key, ts, x, trend, seasonal, resid (4dp each;
   * trend/resid NULL at censored edges).
   */
  def seasonalDecompose(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, period: Int): DataFrame = {
    require(period >= 2 && period % 2 == 1,
      s"period must be an odd integer >= 3 for a centered window: $period")
    val half = period / 2
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol).cast("long").as("_t"),
        col(valueCol).cast("double").as("_x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"), col("_x"))
      .rowsBetween(-half, half)
    // the trend is 4dp-materialized BEFORE detrending (the family's
    // engine-identical convention: downstream aggregates then work on
    // values both engines agree on digit-for-digit), and the residual
    // is the exact identity over the ROUNDED outputs — so
    // x = trend + seasonal + resid holds on what the caller sees
    val trended = base
      .withColumn("_trend", round(
        when(count(col("_x")).over(w) === period, avg(col("_x")).over(w)),
        4))
      .withColumn("_season", pmod(col("_t"), lit(period.toLong)))
      .withColumn("_det", col("_x") - col("_trend"))
    val seasonal = trended.filter(col("_det").isNotNull)
      .groupBy(col(keyCol), col("_season"))
      .agg(avg(col("_det")).as("_smean"))
    val center = seasonal.groupBy(col(keyCol))
      .agg(avg(col("_smean")).as("_scenter"))
    trended
      .join(seasonal, Seq(keyCol, "_season"), "left")
      .join(center, Seq(keyCol), "left")
      // a season with no detrended evidence (short series, censored
      // edges only) reports NULL seasonal — no evidence is not 0, the
      // acf convention
      .withColumn("_seas",
        round(when(col("_smean").isNotNull,
          col("_smean") - col("_scenter")), 4))
      .select(col(keyCol), col("_t").as("ts"), col("_x").as("x"),
        col("_trend").as("trend"),
        col("_seas").as("seasonal"),
        round(col("_x") - col("_trend") - col("_seas"), 4).as("resid"))
  }

  /**
   * Robust per-group outlier flagging (median/MAD, the Iglewicz–Hoaglin
   * modified z-score): M = 0.6745·|x − median| / MAD > k flags values a
   * heavy-tailed distribution's mean/stddev would hide (each outlier
   * inflates the stddev that is supposed to catch it; the median and
   * MAD are 50%-breakdown estimators, immune to the tail they measure).
   * The 0.6745 factor (Φ⁻¹(0.75)) rescales MAD to a stddev-consistent
   * unit so the published k = 3.5 cutoff means what the rule says. The
   * quality-score and length-distribution curation cut.
   * Output: flagged rows only — groupCol, idCol, value, group median,
   * MAD, robust_z (4dp).
   *
   * Two exact keyed percentile aggregations (value, then |x − med|)
   * with the group stats joined back group-keyed (AQE broadcasts small
   * group counts) — the exact form; at sketch precision swap
   * percentile for approx_percentile (groupQuantilesApprox) for the
   * fixed-state 100 TB/streaming path. Groups with MAD = 0 (over half
   * the mass on one value) flag every deviating row with robust_z = ∞ —
   * the rule's documented degenerate case; callers wanting a floor can
   * pre-clamp.
   */
  /**
   * Binary-classifier confusion metrics at a threshold — the offline
   * eval for the learned quality/safety filters (QualityClassifier &
   * co.): one row of tp/fp/tn/fn plus accuracy, precision, recall, F1
   * (4dp; 0 where the denominator is empty, not NULL). ONE full-scan
   * aggregation; rows with NULL score or label are excluded (count
   * them with Validate.rowRules if absence matters).
   */
  def classifierMetrics(df: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double): DataFrame = {
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val pred = s >= threshold
    df.filter(s.isNotNull && y.isNotNull)
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(pred && y, 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(pred && !y, 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(!pred && !y, 1L).otherwise(0L)), lit(0L)).as("tn"),
        coalesce(sum(when(!pred && y, 1L).otherwise(0L)), lit(0L)).as("fn"))
      .select(col("n"), col("tp"), col("fp"), col("tn"), col("fn"),
        round(when(col("n") > 0,
          (col("tp") + col("tn")) / col("n").cast("double"))
          .otherwise(lit(0.0)), 4).as("accuracy"),
        round(when(col("tp") + col("fp") > 0,
          col("tp") / (col("tp") + col("fp")).cast("double"))
          .otherwise(lit(0.0)), 4).as("precision"),
        round(when(col("tp") + col("fn") > 0,
          col("tp") / (col("tp") + col("fn")).cast("double"))
          .otherwise(lit(0.0)), 4).as("recall"),
        round(when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          lit(2.0) * col("tp") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
          .otherwise(lit(0.0)), 4).as("f1"))
  }

  /**
   * Calibration report over probability scores in [0, 1] — does "0.9"
   * mean 90%? Scores bucket into `bins` equal widths (score 1.0 lands
   * in the last bin), each bin reports its count, mean predicted score
   * (confidence), observed positive rate, and the signed gap — the
   * per-bin decomposition of expected calibration error (weight
   * `abs(gap)` by `n` for the scalar ECE). Empty bins are materialized
   * (resampleFill convention: a bin nothing lands in is information).
   * One bucket aggregation + a bins-sized grid; scores outside [0, 1]
   * are rejected rows, excluded like NULLs.
   */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val counts = df
      .filter(s.isNotNull && y.isNotNull && s >= 0.0 && s <= 1.0)
      .withColumn("bucket",
        least(floor(s * bins), lit((bins - 1).toLong)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), avg(s).as("_conf"),
        avg(y.cast("double")).as("_acc"))
    val grid = df.sparkSession.range(0, bins).select(col("id").as("bucket"))
    grid.join(counts, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n"),
        round(col("_conf"), 4).as("mean_score"),
        round(col("_acc"), 4).as("frac_pos"),
        round(col("_acc") - col("_conf"), 4).as("gap"))
  }

  /**
   * Isotonic calibration by pool-adjacent-violators (PAV; Ayer et al.
   * 1955, Zadrozny & Elkan 2002) — the calibration map modern eval
   * stacks fit where [[calibration]]'s fixed-bin readout
   * under-resolves: the best MONOTONE fit of P(label | score), so a
   * higher calibrated score always means a higher observed positive
   * rate. Scores bucket exactly like [[calibration]] (floor(s·bins),
   * top-inclusive); the per-bucket (positives, count) pairs then pool
   * under the classic PAV stack: walk buckets ascending, merge a new
   * bucket backwards while its pooled rate is BELOW its predecessor's.
   * Pool rates are exact rationals (long positives / long count;
   * violation tests cross-multiply in BigInt), so the fit is
   * engine-replayable: the pooled value equals the minimax form
   * max_{j≤i} min_{k≥i} mean(j..k), which a SQL replay computes from
   * the same integer cumulatives — equal rationals divide to
   * bit-identical doubles.
   *
   * Scale shape: ONE map-side-combined groupBy on the bucket id is the
   * only data-scale pass; the PAV stack runs on the driver over the
   * ≤ `bins` bucket rows (bins capped at 4096 — the bounded-collect
   * contract silhouette/bradleyTerry use; the pooling recursion is
   * inherently sequential and the frame is config-sized, never data).
   * Output: one row per NON-EMPTY bucket — bucket, n, n_pos,
   * mean_score (4dp), frac_pos (6dp), iso_frac (6dp; non-decreasing in
   * bucket, the PAV fit).
   */
  def isotonicCalibration(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0 && bins <= 4096,
      s"bins must be in [1, 4096] (the bucket frame collects to the " +
        s"driver for the sequential PAV fold): $bins")
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val counts = df
      .filter(s.isNotNull && y.isNotNull && s >= 0.0 && s <= 1.0)
      .withColumn("bucket",
        least(floor(s * bins), lit((bins - 1).toLong)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(y, 1L).otherwise(0L)), lit(0L)).as("n_pos"),
        avg(s).as("_conf"))
      .orderBy("bucket")
    // <= bins rows by construction (bucket ids live in [0, bins))
    val rows = counts.collect()
    // PAV stack: (pooled positives, pooled n, buckets in pool)
    val pools = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Int)]
    rows.foreach { r =>
      var pos = r.getLong(2)
      var n = r.getLong(1)
      var span = 1
      // violation iff prevRate > curRate, tested exactly:
      // prevPos·curN > curPos·prevN in BigInt (immune to count overflow)
      while (pools.nonEmpty && {
        val (pp, pn, _) = pools.last
        BigInt(pp) * n > BigInt(pos) * pn
      }) {
        val (pp, pn, ps) = pools.remove(pools.length - 1)
        pos += pp; n += pn; span += ps
      }
      pools += ((pos, n, span))
    }
    val isoByIdx = pools.iterator.flatMap { case (pp, pn, ps) =>
      Iterator.fill(ps)(pp.toDouble / pn.toDouble)
    }.toArray
    val spark = df.sparkSession
    val out = rows.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(2).toDouble / r.getLong(1),
        isoByIdx(i))
    }
    spark.createDataFrame(
        java.util.Arrays.asList(out: _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_pos",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("_conf",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("_frac",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("_iso",
            org.apache.spark.sql.types.DoubleType))))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(col("_conf"), 4).as("mean_score"),
        round(col("_frac"), 6).as("frac_pos"),
        round(col("_iso"), 6).as("iso_frac"))
  }

  /**
   * Brier score with the Murphy (1973) decomposition — the PROPER
   * scoring rule beside [[calibration]]'s table and [[rocAuc]]'s
   * ranking: BS = mean (p − y)² punishes both miscalibration and
   * unsharp forecasts, and the decomposition says WHICH —
   * reliability = Σ n_k(p̄_k − ȳ_k)²/n (calibration error mass; 0 is
   * perfect), resolution = Σ n_k(ȳ_k − ȳ)²/n (how much the forecast
   * separates outcomes; bigger is better), uncertainty = ȳ(1 − ȳ)
   * (the data's own difficulty — the score of always forecasting ȳ).
   * brier_binned = reliability − resolution + uncertainty is the
   * identity's exact value at bucket-mean forecasts; its gap to raw
   * `brier` is the within-bin variance the binning absorbs.
   * Buckets follow [[calibration]] (floor(s·bins), top-inclusive).
   * One pass for the bucket frame + one 1-row moment aggregate; the
   * decomposition folds over the ≤ bins bucket rows — no window, no
   * collect. Output: 1 row — n, brier (4dp), reliability (4dp),
   * resolution (4dp), uncertainty (4dp), brier_binned (4dp); an input
   * with NO valid rows (all scores null/out-of-range) returns an EMPTY
   * frame, the [[calibration]]/[[isotonicCalibration]] convention.
   */
  def brierScore(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, "bins must be positive")
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val base = df
      .filter(s.isNotNull && y.isNotNull && s >= 0.0 && s <= 1.0)
      .select(s.as("_s"), y.cast("double").as("_y"),
        least(floor(s * bins), lit((bins - 1).toLong)).as("_b"))
    val perB = base.groupBy("_b")
      .agg(count(lit(1)).as("_nb"), avg("_s").as("_ps"),
        avg("_y").as("_ys"))
    val tot = base.agg(count(lit(1)).as("n"), avg("_y").as("_ybar"),
      avg((col("_s") - col("_y")) * (col("_s") - col("_y")))
        .as("_bs"))
    perB.crossJoin(tot)
      .agg(max(col("n")).as("n"),
        max(col("_bs")).as("_bsx"), max(col("_ybar")).as("_yb"),
        sum(col("_nb") * (col("_ps") - col("_ys")) *
          (col("_ps") - col("_ys"))).as("_rel"),
        sum(col("_nb") * (col("_ys") - col("_ybar")) *
          (col("_ys") - col("_ybar"))).as("_res"))
      // no valid rows -> the empty crossJoin aggregates to one all-NULL
      // row; drop it so the degenerate case returns an EMPTY frame like
      // calibration/isotonicCalibration, not a row whose n reads null
      .filter(col("n").isNotNull)
      .select(col("n"),
        round(col("_bsx"), 4).as("brier"),
        round(col("_rel") / col("n"), 4).as("reliability"),
        round(col("_res") / col("n"), 4).as("resolution"),
        round(col("_yb") * (lit(1.0) - col("_yb")), 4)
          .as("uncertainty"),
        round(col("_rel") / col("n") - col("_res") / col("n") +
          col("_yb") * (lit(1.0) - col("_yb")), 4).as("brier_binned"))
  }

  /**
   * Exact ROC-AUC by the rank-sum (Mann–Whitney) identity with the
   * standard half-credit for score ties — the threshold-free companion
   * of [[classifierMetrics]]. Computed from the per-DISTINCT-SCORE
   * (n_pos, n_neg) aggregation: walking scores ascending,
   * AUC = Σ_s n_pos(s) · (cumNeg(<s) + n_neg(s)/2) / (P·N).
   * Output: 1 row — n, n_pos, n_neg, auc (4dp; degenerate single-class
   * inputs score 0).
   *
   * Scale shape: the data-sized pass is ONE map-side-combined groupBy
   * on the score; the cumulative walk runs as a [[DistScan]] distributed
   * prefix sum over the distinct-score frame — with CONTINUOUS
   * classifier scores that frame IS the data, so the older
   * single-partition window (tolerable only under upstream score
   * rounding) was the quantized-tie latent hot partition in reverse.
   * Long-count sums are order-insensitive: bit-identical to the naive
   * walk at any partitioning.
   */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val perScore = df.filter(s.isNotNull && y.isNotNull)
      .groupBy(s.as("score"))
      .agg(coalesce(sum(when(y, 1L).otherwise(0L)), lit(0L)).as("np"),
        coalesce(sum(when(!y, 1L).otherwise(0L)), lit(0L)).as("nn"))
    // terminal 1-row statistic: materialize + release the scan pin
    // (DistScan.sealTerminal) so the readout leaves no cached state
    DistScan.sealTerminal(
      DistScan.prefixSums(perScore, Seq(col("score")),
          Seq((col("nn"), "_cumNegBelow")), inclusive = false)
        .agg(sum(col("np") + col("nn")).as("n"),
          sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
          sum(col("np") * (col("_cumNegBelow") + col("nn") / lit(2.0)))
            .as("_u"))
        .select(col("n"), col("n_pos"), col("n_neg"),
          round(when(col("n_pos") > 0 && col("n_neg") > 0,
            col("_u") / (col("n_pos") * col("n_neg")).cast("double"))
            .otherwise(lit(0.0)), 4).as("auc")))
  }

  /**
   * Per-group winsorization — clip values into their group's
   * [pLo, pHi] exact-percentile band, the standard outlier-taming
   * transform before averaging quality scores or fitting anything
   * moment-based (robustOutliers FLAGS the tail; this REINS IT IN
   * without dropping rows). Output: original columns intent —
   * groupCol, idCol, value, clipped (4dp), was_clipped.
   *
   * One exact keyed percentile aggregation joined back group-keyed
   * (AQE broadcasts small group counts); swap approx_percentile for
   * the fixed-state sketch path at 100 TB.
   */
  def winsorize(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val v = col(valueCol).cast("double")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(idCol), v.as("_v"))
    val cuts = base.groupBy(col(groupCol))
      .agg(percentile(col("_v"), lit(pLo)).as("_lo"),
        percentile(col("_v"), lit(pHi)).as("_hi"))
    base.join(cuts, Seq(groupCol))
      .select(col(groupCol), col(idCol), col("_v").as("value"),
        round(greatest(least(col("_v"), col("_hi")), col("_lo")), 4)
          .as("clipped"),
        (col("_v") > col("_hi") || col("_v") < col("_lo"))
          .as("was_clipped"))
  }

  /**
   * CUSUM change-point flagging per key (Page 1954): the metric-drift
   * alarm for per-source/per-day pipeline health series. Against a
   * reference mean μ and slack s·σ, the one-sided cumulative sums
   *   hi_t = max(0, hi_{t−1} + (x_t − μ − slack))
   *   lo_t = max(0, lo_{t−1} + (μ − x_t − slack))
   * flag when either exceeds h·σ — small persistent shifts accumulate
   * where a fixed threshold only sees single spikes. μ and σ come from
   * the series itself (each key self-baselines; pass a pre-joined μ/σ
   * frame upstream when an external baseline exists).
   *
   * The recurrence is inherently sequential PER KEY: it runs as one
   * key-partitioned window collecting the ordered (ts, x) pairs and ONE
   * per-row `aggregate` fold over them (the funnel/maskRepeatedSpans
   * pattern — k passes never multiply, no UDF). State per key is its
   * own series — the per-key-series-fits-in-memory envelope every
   * per-key sequential statistic shares (transitionMatrix, funnel);
   * beyond it, pre-bucket the series to coarser periods first
   * (resampleFill is the materializing primitive).
   * Output: key, ts, x, cusum_hi, cusum_lo (4dp), alarm.
   */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      slack: Double = 0.5, h: Double = 4.0): DataFrame = {
    require(slack >= 0 && h > 0, s"need slack >= 0, h > 0; got ($slack, $h)")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol).cast("long").as("_t"),
        col(valueCol).cast("double").as("_x"))
    // mu/sd ride the SAME keyed aggregation that collects the series —
    // one scan, one Exchange, no stats join (the two-pass join form
    // this replaces read the input twice and was the family's one
    // idle-bench outlier: same rows, half the plan)
    val series = base.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("_t"), col("_x"))))
          .as("_pts"),
        avg(col("_x")).as("_mu"),
        coalesce(stddev_samp(col("_x")), lit(0.0)).as("_sd"))
    // one left-to-right fold carrying (hi, lo); emits a row per point
    val folded = series.withColumn("_steps", expr(
      s"""aggregate(
        |  _pts,
        |  struct(
        |    cast(0.0 as double) AS hi, cast(0.0 as double) AS lo,
        |    cast(array() as array<struct<t:bigint,x:double,hi:double,lo:double>>) AS out),
        |  (acc, p) -> struct(
        |    greatest(cast(0.0 as double), acc.hi + (p._x - _mu - $slack * _sd)) AS hi,
        |    greatest(cast(0.0 as double), acc.lo + (_mu - p._x - $slack * _sd)) AS lo,
        |    concat(acc.out, array(struct(p._t AS t, p._x AS x,
        |      greatest(cast(0.0 as double), acc.hi + (p._x - _mu - $slack * _sd)) AS hi,
        |      greatest(cast(0.0 as double), acc.lo + (_mu - p._x - $slack * _sd)) AS lo))) AS out),
        |  acc -> acc.out)""".stripMargin))
    folded
      .select(col(keyCol), col("_sd"), explode(col("_steps")).as("s"))
      .select(col(keyCol), col("s.t").as("ts"), col("s.x").as("x"),
        round(col("s.hi"), 4).as("cusum_hi"),
        round(col("s.lo"), 4).as("cusum_lo"),
        (col("s.hi") > lit(h) * col("_sd") ||
          col("s.lo") > lit(h) * col("_sd")).as("alarm"))
  }

  /**
   * Per-group median imputation — the principled gap-fill before
   * training-feature export: NULLs take their GROUP's exact median
   * (robust to the tail, unlike mean imputation), a group with no
   * signal falls back to the global median, and a frame with no signal
   * at all leaves NULL (nothing to impute from). `was_imputed` keeps
   * the provenance — downstream must be able to tell measured from
   * filled. Two percentile aggregations (group + 1-row global) joined
   * back group-keyed; swap percentile for approx_percentile at sketch
   * precision (the winsorize/outliers contract).
   * Output: input columns + value_imputed (4dp) + was_imputed.
   */
  def imputeMedian(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val gm = df.filter(v.isNotNull).groupBy(col(groupCol))
      .agg(percentile(v, lit(0.5)).as("_gmed"))
    val gg = df.filter(v.isNotNull)
      .agg(percentile(v, lit(0.5)).as("_global"))
    df.join(gm, Seq(groupCol), "left")
      .crossJoin(gg)
      .withColumn("value_imputed",
        round(coalesce(v, col("_gmed"), col("_global")), 4))
      .withColumn("was_imputed", v.isNull && col("value_imputed").isNotNull)
      .drop("_gmed", "_global")
  }

  /**
   * Exponentially weighted moving average per key series — the smoothing
   * companion to [[cusum]] (drift monitoring wants both: CUSUM alarms on
   * sustained shifts, EWMA is the denoised level a dashboard plots and a
   * forecast baselines against): e_1 = x_1, e_t = α·x_t + (1−α)·e_{t−1}.
   * Same shape contract as cusum — one keyed aggregation collecting the
   * (ts, x) series, one left-to-right `aggregate` fold per key, a row
   * per point; the per-key-series-fits-in-memory envelope, pre-bucket
   * past it. Output: key, ts, x, ewma (4dp).
   */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol).cast("long").as("_t"),
        col(valueCol).cast("double").as("_x"))
    val series = base.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("_t"), col("_x"))))
        .as("_pts"))
    val folded = series.withColumn("_steps", expr(
      s"""aggregate(
        |  _pts,
        |  struct(
        |    cast(null as double) AS e,
        |    cast(array() as array<struct<t:bigint,x:double,e:double>>) AS out),
        |  (acc, p) -> struct(
        |    CASE WHEN acc.e IS NULL THEN p._x
        |         ELSE $alpha * p._x + ${1.0 - alpha} * acc.e END AS e,
        |    concat(acc.out, array(struct(p._t AS t, p._x AS x,
        |      CASE WHEN acc.e IS NULL THEN p._x
        |           ELSE $alpha * p._x + ${1.0 - alpha} * acc.e END AS e)))
        |      AS out),
        |  acc -> acc.out)""".stripMargin))
    folded
      .select(col(keyCol), explode(col("_steps")).as("s"))
      .select(col(keyCol), col("s.t").as("ts"), col("s.x").as("x"),
        round(col("s.e"), 4).as("ewma"))
  }

  /**
   * Rolling z-score anomaly flags per key series — the pointwise spike
   * detector next to [[cusum]]'s sustained-shift alarm: each point is
   * scored against the mean/stddev of its TRAILING `window` points
   * (never itself — no self-contamination), z = (x − μ_hist)/σ_hist,
   * flagged when |z| > tau. Points with under `minPts` history or a
   * degenerate σ = 0 get NULL z and are never flagged (insufficient
   * evidence is not an anomaly). Pure window aggregation — one Exchange
   * on the key, codegen'd frame scan, no fold, no action; the exact
   * shape that runs unchanged on a billion-key corpus.
   * Output: key, ts, x, n_hist, mean_hist (4dp), z (4dp), anomaly.
   */
  def rollingZ(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, window: Int = 7, tau: Double = 3.0,
      minPts: Int = 3): DataFrame = {
    require(window >= 2, s"window must be >= 2: $window")
    require(minPts >= 2 && minPts <= window,
      s"need 2 <= minPts <= window: ($minPts, $window)")
    require(tau > 0, s"tau must be positive: $tau")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"))
      .rowsBetween(-window, -1)
    val x = col(valueCol).cast("double")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol).cast("long").as("_t"), x.as("_x"))
    base
      .withColumn("_n", count(col("_x")).over(w))
      .withColumn("_m", avg(col("_x")).over(w))
      .withColumn("_sd", stddev_samp(col("_x")).over(w))
      .select(col(keyCol), col("_t").as("ts"), col("_x").as("x"),
        col("_n").as("n_hist"),
        round(col("_m"), 4).as("mean_hist"),
        when(col("_n") >= minPts && col("_sd") > 0,
          round((col("_x") - col("_m")) / col("_sd"), 4)).as("z"))
      .withColumn("anomaly",
        coalesce(abs(col("z")) > tau, lit(false)))
  }

  /**
   * Autocorrelation function per key series — the seasonality /
   * memory probe next to [[rollingZ]]'s spike flags (a daily series
   * with a weekly cycle shows r_7 spiking; a white-noise feed shows
   * every lag near 0 — the difference decides whether a drift alarm
   * needs seasonal adjustment): for each lag 1..maxLag, the sample
   * Pearson correlation between the series and its lag-shifted self
   * over the pairs where both exist (the cross-correlation form;
   * identical to what `corr` + a lag window computes in any engine —
   * deliberately, that IS the oracle). Degenerate lags (< 2 pairs or
   * zero variance) report NULL acf, never 0 — no evidence is not
   * independence. ONE keyed window pass materializes all maxLag
   * shifted columns (a single Exchange + sort, lags never multiply
   * passes), one aggregation computes every corr map-side-combined,
   * and an in-project stack unpivots to (key, lag) rows — maxLag
   * scales the projection width, not the pass count.
   * Output: key, lag, n_pairs, acf (4dp).
   */
  def acf(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, s"need 1 <= maxLag <= 64: $maxLag")
    // (_t, _x) ordering, not _t alone: duplicate (key, ts) rows must
    // resolve the lag pairing identically across runs/partitionings —
    // the same determinism contract timeWeightedAvg/dwellTimes keep.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("_t"), col("_x"))
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol).cast("long").as("_t"),
        col(valueCol).cast("double").as("_x"))
    val lagged = (1 to maxLag).foldLeft(base) { (acc, l) =>
      acc.withColumn(s"_l$l", lag(col("_x"), l).over(w))
    }
    // Pearson from guarded moments over the PAIRED subset (x masked to
    // rows where the lag exists — covar/stddev ignore NULLs, so these
    // are exactly corr's pairwise statistics) instead of corr() itself:
    // a zero-variance series must report NULL, not an ANSI
    // divide-by-zero (corr's internal ck/sqrt(mk) division).
    val aggs = (1 to maxLag).flatMap { l =>
      val xm = when(col(s"_l$l").isNotNull, col("_x"))
      Seq(count(when(col(s"_l$l").isNotNull, 1)).as(s"_n$l"),
        covar_samp(xm, col(s"_l$l")).as(s"_c$l"),
        stddev_samp(xm).as(s"_sx$l"),
        stddev_samp(col(s"_l$l")).as(s"_sy$l"))
    }
    val perKey = lagged.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = (1 to maxLag)
      .map(l => s"$l, _n$l, " +
        s"CASE WHEN _sx$l > 0 AND _sy$l > 0 THEN _c$l / (_sx$l * _sy$l) END")
      .mkString(", ")
    perKey
      .select(col(keyCol),
        expr(s"stack($maxLag, $stackArgs) AS (lag, n_pairs, _r)"))
      .select(col(keyCol), col("lag"), col("n_pairs"),
        round(col("_r"), 4).as("acf"))
  }

  /**
   * Holt double-exponential smoothing per key series — the
   * trend-aware upgrade of [[ewma]] (a simple EWMA lags a trending
   * series forever; Holt carries an explicit trend term so the level
   * tracks and the one-step forecast leads): l_1 = x_1, b_1 = 0,
   * then l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1}) and
   * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}; each row also emits
   * forecast_next = l_t + b_t, the value the model expects at the
   * next tick — the baseline a drift monitor compares the next
   * observation against. Same shape contract as ewma/cusum: one keyed
   * aggregation collecting the sorted (ts, x) series, ONE
   * left-to-right `aggregate` fold per key (sequential recurrences
   * never become windows), a row per point; per-key-series envelope,
   * pre-bucket past it. The recurrence is replayed by the oracle as a
   * recursive CTE with the identical literal coefficients — both
   * engines run the same double arithmetic left to right.
   * Output: key, ts, x, level (4dp), trend (4dp), forecast_next (4dp).
   */
  def holt(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol), col(tsCol).cast("long").as("_t"),
        col(valueCol).cast("double").as("_x"))
    val series = base.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("_t"), col("_x"))))
        .as("_pts"))
    val folded = series.withColumn("_steps", expr(
      s"""aggregate(
        |  _pts,
        |  struct(
        |    cast(null as double) AS l, cast(null as double) AS b,
        |    cast(array() as array<struct<t:bigint,x:double,l:double,b:double>>) AS out),
        |  (acc, p) -> CASE WHEN acc.l IS NULL THEN struct(
        |      p._x AS l, cast(0.0 as double) AS b,
        |      concat(acc.out, array(struct(p._t AS t, p._x AS x,
        |        p._x AS l, cast(0.0 as double) AS b))) AS out)
        |    ELSE struct(
        |      $alpha * p._x + ${1.0 - alpha} * (acc.l + acc.b) AS l,
        |      $beta * (($alpha * p._x + ${1.0 - alpha} * (acc.l + acc.b)) - acc.l)
        |        + ${1.0 - beta} * acc.b AS b,
        |      concat(acc.out, array(struct(p._t AS t, p._x AS x,
        |        $alpha * p._x + ${1.0 - alpha} * (acc.l + acc.b) AS l,
        |        $beta * (($alpha * p._x + ${1.0 - alpha} * (acc.l + acc.b)) - acc.l)
        |          + ${1.0 - beta} * acc.b AS b))) AS out) END,
        |  acc -> acc.out)""".stripMargin))
    folded
      .select(col(keyCol), explode(col("_steps")).as("s"))
      .select(col(keyCol), col("s.t").as("ts"), col("s.x").as("x"),
        round(col("s.l"), 4).as("level"),
        round(col("s.b"), 4).as("trend"),
        round(col("s.l") + col("s.b"), 4).as("forecast_next"))
  }

  /**
   * Survey-weight diagnostics — the health check every calibration
   * (EBW included: run it on `new_weights`) should publish next to its
   * estimates: per group, Kish's effective sample size
   * ESS = (Σw)²/Σw² (the n an unweighted sample would need for the
   * same variance), the design effect n·Σw²/(Σw)² (variance inflation
   * from unequal weights; 1 = no cost), the weight coefficient of
   * variation (deff = 1 + cv² identity, population σ), and the
   * min/max/ratio extremes a bounds check reads directly. A
   * calibration that nails its moments while ESS collapses has traded
   * bias for variance — this is the number that says so (Kish 1965).
   *
   * Rows with NULL or non-positive weight are excluded (they carry no
   * estimation mass; a validator should flag them upstream). ONE
   * keyed aggregation — every statistic derives from the Σw/Σw²
   * moments in a single pass, no window, no action.
   * Output: group, n, sum_w (4dp), ess (4dp), design_effect (4dp),
   * cv_w (4dp), min_w, max_w, w_ratio (4dp).
   */
  def weightDiagnostics(df: DataFrame, groupCol: String,
      weightCol: String): DataFrame = {
    val w = col(weightCol).cast("double")
    df.filter(w.isNotNull && w > 0)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(w).as("_s1"), sum(w * w).as("_s2"),
        min(w).as("min_w"), max(w).as("max_w"))
      .select(col(groupCol), col("n"),
        round(col("_s1"), 4).as("sum_w"),
        round(col("_s1") * col("_s1") / col("_s2"), 4).as("ess"),
        round(col("n") * col("_s2") / (col("_s1") * col("_s1")), 4)
          .as("design_effect"),
        // greatest(0, ·): constant weights can land the variance a float
        // ulp below zero, which must read cv = 0, never NaN
        round(sqrt(greatest(lit(0.0), col("_s2") / col("n")
          - pow(col("_s1") / col("n"), 2))) / (col("_s1") / col("n")), 4)
          .as("cv_w"),
        col("min_w"), col("max_w"),
        round(col("max_w") / col("min_w"), 4).as("w_ratio"))
  }

  /**
   * Two-sample Kolmogorov–Smirnov test — the drift family's TEST
   * statistic ([[qqCompare]] shows where distributions differ; KS says
   * whether the whole-curve gap clears noise): D = max |F_a − F_b|
   * over the pooled values, with the classic large-sample 95% critical
   * value 1.358·√((n_a+n_b)/(n_a·n_b)) (Smirnov; the two-sided
   * asymptotic form — exact small-n tables are out of scope and at
   * drift-monitoring n the asymptotic IS the test). `d_at` reports the
   * SMALLEST value achieving the max — where the curves pull apart.
   *
   * Determinism/envelope: values round to 4dp before the CDFs (ties
   * then group identically on any engine) and the pooled CDF walk runs
   * as a [[DistScan]] distributed prefix sum over the distinct-value
   * frame — 4dp rounding bounds nothing on an unbounded metric
   * (latencies, lengths), so the older single-partition window was the
   * continuous-value latent hot partition; both sides' counts cumulate
   * in ONE scan. One aggregation per side + the scan.
   * Output: 1 row — n_a, n_b, d_stat (4dp), d_at (4dp),
   * d_crit95 (4dp), significant.
   */
  def ksTest(dfA: DataFrame, dfB: DataFrame, valueCol: String): DataFrame = {
    val x = round(col(valueCol).cast("double"), 4)
    def side(df: DataFrame, nm: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .groupBy(x.as("v")).agg(count(lit(1)).as(nm))
    val merged = side(dfA, "_ca").join(side(dfB, "_cb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    val tot = merged.agg(sum("_ca").as("_na"), sum("_cb").as("_nb"))
    // both CDFs cumulate in ONE distributed prefix scan (long counts:
    // bit-identical to the naive global window at any partitioning);
    // terminal 1-row statistic: seal releases the scan pin on return
    DistScan.sealTerminal(
      DistScan.prefixSums(merged, Seq(col("v")),
          Seq((col("_ca"), "_cca"), (col("_cb"), "_ccb")), inclusive = true)
        .crossJoin(tot)
        .withColumn("_d", round(abs(
          col("_cca") / col("_na") - col("_ccb") / col("_nb")), 6))
        .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
          round(max(col("_d")), 4).as("d_stat"),
          round(max_by(col("v"), struct(col("_d"), negate(col("v")))), 4)
            .as("d_at"),
          round(lit(1.358) * sqrt((max(col("_na")) + max(col("_nb")))
            / (max(col("_na")) * max(col("_nb"))).cast("double")), 4)
            .as("d_crit95"))
        .withColumn("significant", col("d_stat") > col("d_crit95")))
  }

  /**
   * 1-D Wasserstein (earth-mover) distance between two numeric samples
   * — the drift readout that INTEGRATES the CDF gap where [[ksTest]]
   * takes only its max and [[psiDrift]] needs bins:
   * W₁ = ∫ |F_a(x) − F_b(x)| dx = Σ_i (v_{i+1} − v_i) · |F_a(v_i) −
   * F_b(v_i)| over the merged distinct values, in the VALUE's own
   * units (a pure location shift of δ scores exactly δ — the number a
   * drift dashboard can threshold, which no p-value gives).
   *
   * Exactness across engines: values quantize to `scale` decimals as
   * LONGS (v·10^scale, half-up — so gaps are integers), the per-cell
   * term (gap · |cumA·n_b − cumB·n_a|) is an integer computed in
   * DECIMAL(38,0), and the distributed sum of integers is
   * order-insensitive — the one double division happens once at the
   * end, so the result is bit-identical to a naive single-window
   * replay at any partitioning. Envelope: |v|·10^scale must fit a
   * long, and gap·cum·count must fit 38 digits (~1e38 — beyond any
   * real frame). The envelope boundary is LOUD on both engines: under
   * ANSI (the Spark 4 default) arithmetic past the boundary raises on
   * its own; under non-ANSI a per-cell overflow would land NULL and be
   * silently dropped by sum(), so the plan counts non-null terms and
   * `raise_error`s when any cell overflowed (matching the DuckDB
   * replay's own HUGEINT error) instead of understating w1.
   *
   * Scale shape: one map-side-combined groupBy per side on the
   * quantized value, then the cumulative walk as ONE [[DistScan]]
   * prefix sum over the merged cell frame (continuous metrics make
   * that frame the data itself — never a single sorted task) plus one
   * prefix-max pass for the neighbor gap; terminal 1-row statistic —
   * the seal releases both scan pins on return.
   * Output: 1 row — n_a, n_b, n_cells, w1 (6dp; NULL when either
   * sample is empty).
   */
  def emdDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      scale: Int = 6): DataFrame = {
    require(scale >= 0 && scale <= 9, s"scale in [0, 9]: $scale")
    val factor = math.pow(10.0, scale)
    val x = col(valueCol).cast("double")
    def side(df: DataFrame, nm: String): DataFrame =
      df.filter(x.isNotNull)
        .groupBy(round(x * factor).cast("long").as("v"))
        .agg(count(lit(1)).as(nm))
    val merged = side(dfA, "_ca")
      .join(side(dfB, "_cb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("_ca"), lit(0L)).as("_ca"),
        coalesce(col("_cb"), lit(0L)).as("_cb"))
    val tot = merged.agg(
      coalesce(sum("_ca"), lit(0L)).as("_na"),
      coalesce(sum("_cb"), lit(0L)).as("_nb"))
    val dec = "decimal(20,0)"
    DistScan.sealTerminal({
      // EXCLUSIVE cumulatives: the interval [v_{i-1}, v_i) carries the
      // CDF evaluated at v_{i-1} = everything strictly before row i
      val cum = DistScan.prefixSums(merged, Seq(col("v")),
        Seq((col("_ca"), "_cca"), (col("_cb"), "_ccb")),
        inclusive = false)
      val withPrev = DistScan.prefixMax(cum, Seq(col("v")), col("v"),
        "_pv", inclusive = false)
      val gap = (col("v") - coalesce(col("_pv"), col("v")))
        .cast("decimal(19,0)")
      val diff = abs(col("_cca").cast(dec) * col("_nb").cast(dec) -
        col("_ccb").cast(dec) * col("_na").cast(dec))
      withPrev.crossJoin(tot)
        .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
          count(lit(1)).as("n_cells"),
          // count(expr) counts NON-NULL terms: in non-ANSI Spark an
          // overflowing gap·diff product lands NULL and sum() would
          // silently drop it (an understated w1, where the DuckDB
          // HUGEINT replay errors loudly) — _tn < n_cells is the exact
          // per-term overflow detector, turned into a loud error below
          count(gap * diff).as("_tn"),
          sum(gap * diff).as("_t"))
        .select(col("n_a"), col("n_b"), col("n_cells"),
          when(col("_tn") < col("n_cells"), raise_error(concat(
            lit("graft.emdDrift: gap*diff overflowed DECIMAL(38,0) on "),
            (col("n_cells") - col("_tn")).cast("string"),
            lit(" cells - values exceed the documented envelope " +
              "(gap*cum*count beyond ~1e38); reduce `scale`"))))
            .otherwise(when(col("n_a") > 0 && col("n_b") > 0,
              round(col("_t").cast("double") /
                (col("n_a").cast("double") * col("n_b").cast("double") *
                  lit(factor)), 6))).as("w1"))
    })
  }

  /**
   * Quantile–quantile comparison — the third leg of the drift family
   * ([[statsDrift]] says which MOMENTS moved, [[psiDrift]] tests
   * binned mass, this compares the DISTRIBUTIONS point for point):
   * exact quantiles of two samples side by side at k probability
   * points, with per-point gaps — where in the distribution the shift
   * lives (a tail-only drift is invisible to means and smeared by wide
   * bins; the q90 row shows it directly). Two 1-row exact-percentile
   * subtrees (one scan each, the winsorize approx swap applies) +
   * a k-row grid stack — no join of the samples, no window.
   * Output: p (4dp), q_a (4dp), q_b (4dp), gap (4dp).
   */
  def qqCompare(dfA: DataFrame, dfB: DataFrame, valueCol: String,
      points: Int = 9): DataFrame = {
    require(points >= 1 && points <= 99, s"points in [1, 99]: $points")
    val x = col(valueCol).cast("double")
    val ps = (1 to points).map(_ / (points + 1.0))
    def side(df: DataFrame, nm: String): DataFrame =
      df.filter(x.isNotNull)
        .agg(percentile(x, typedLit(ps)).as(nm))
    // CAST: a bare 0.1 literal parses as DECIMAL(1,1) in Spark SQL —
    // the Holt-anchor lesson, this time on the engine side
    val stackArgs = (1 to points).map(i =>
      s"cast(${ps(i - 1)} as double), " +
        s"element_at(_qa, $i), element_at(_qb, $i)")
      .mkString(", ")
    side(dfA, "_qa").crossJoin(side(dfB, "_qb"))
      .select(expr(s"stack($points, $stackArgs) AS (p, qa, qb)"))
      .select(round(col("p"), 4).as("p"),
        round(col("qa"), 4).as("q_a"), round(col("qb"), 4).as("q_b"),
        (round(col("qb") - col("qa"), 4) + lit(0.0)).as("gap"))
  }

  /**
   * Hill tail-index estimator — the heavy-tail diagnostic next to
   * [[benford]]'s digit screen and the Zipf fit (does this value
   * distribution have a power-law tail, and how heavy?): for the
   * observations above `xmin`, the continuous-MLE tail exponent
   * α = 1 + n / Σ ln(x/xmin) (Hill 1975; Clauset et al. 2009 form)
   * with its asymptotic standard error (α−1)/√n. α ≤ 2 means infinite
   * variance — means and CIs on that column are lies; α ≤ 1 means
   * infinite MEAN. The one-number answer to "can I average this, or
   * do I need medians/winsorization" — which is exactly what
   * [[winsorize]]/[[robustOutliers]] are for when the answer is no.
   * ONE filtered scan aggregation; a thin tail (n < 2) reports NULL α.
   * Output: 1 row — xmin, n_tail, n_total, tail_frac (4dp),
   * alpha (4dp), se (4dp).
   */
  def hillTail(df: DataFrame, valueCol: String, xmin: Double): DataFrame = {
    require(xmin > 0, s"xmin must be positive: $xmin")
    val x = col(valueCol).cast("double")
    df.filter(x.isNotNull)
      .agg(count(lit(1)).as("n_total"),
        count(when(x >= xmin, 1)).as("n_tail"),
        sum(when(x >= xmin, log(x / lit(xmin)))).as("_lsum"))
      .select(lit(xmin).as("xmin"), col("n_tail"), col("n_total"),
        round(col("n_tail") / col("n_total"), 4).as("tail_frac"),
        when(col("n_tail") >= 2 && col("_lsum") > 0,
          round(lit(1.0) + col("n_tail") / col("_lsum"), 4)).as("alpha"),
        when(col("n_tail") >= 2 && col("_lsum") > 0,
          round(col("n_tail") / col("_lsum") /
            sqrt(col("n_tail").cast("double")), 4)).as("se"))
  }

  /**
   * Kaplan–Meier survival curves per group — the statistically honest
   * time-to-event readout (naive "average days to purchase" silently
   * drops everyone who hasn't purchased YET; KM keeps them at risk
   * until their observation ends — censoring is information, not
   * missing data): subjects arrive as (group, duration, event) with
   * event=false meaning censored at `duration`; at each distinct
   * duration, n_at_risk = subjects not yet departed,
   * S(t) = Π_{t' ≤ t} (1 − d_{t'}/n_{t'}) over the event times.
   * The product is computed as exp(Σ ln(1 − d/n)) under a cumulative
   * window, with the d = n terminal point short-circuited to exactly 0
   * by a flag — Spark's `log` yields NULL at 0 (never −∞), so the
   * naive form would silently NULL the whole tail.
   *
   * Shape at scale: one (group, duration) aggregation, then per-GROUP
   * cumulative windows over the distinct-duration frame (n_durations
   * rows per group, never subjects — the concentration contract;
   * coarsen durations to days/weeks to bound it, which is also the
   * right statistics). Output: group, t, n_at_risk, d_events,
   * c_censored, survival (4dp).
   */
  def kaplanMeier(df: DataFrame, groupCol: String, durationCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(durationCol).isNotNull && col(durationCol) >= 0)
      .select(col(groupCol).as("g"),
        col(durationCol).cast("double").as("t"),
        col(eventCol).cast("boolean").as("e"))
    val at = base.groupBy("g", "t")
      .agg(count(when(col("e"), 1)).as("d_events"),
        count(when(!col("e"), 1)).as("c_censored"))
    val tot = base.groupBy("g").agg(count(lit(1)).as("_n"))
    val wPrev = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    at.join(tot, "g")
      .withColumn("n_at_risk",
        col("_n") - coalesce(
          sum(col("d_events") + col("c_censored")).over(wPrev), lit(0L)))
      .withColumn("_dead",
        max(when(col("d_events") === col("n_at_risk"), 1).otherwise(0))
          .over(wCum))
      .withColumn("survival",
        when(col("_dead") === 1, lit(0.0)).otherwise(
          round(exp(sum(
            // d = n is the terminal point: its factor is 0, the _dead
            // flag pins survival there — the log term must be SKIPPED
            // explicitly (Spark log(0) is NULL, DuckDB ln(0) errors;
            // neither is the -inf the algebra wants)
            when(col("d_events") > 0 &&
                col("d_events") < col("n_at_risk"),
              log(lit(1.0) - col("d_events") / col("n_at_risk")))
              .otherwise(lit(0.0))).over(wCum)), 4)))
      .select(col("g").as(groupCol), col("t"), col("n_at_risk"),
        col("d_events"), col("c_censored"), col("survival"))
  }

  /**
   * Nelson–Aalen cumulative hazard per group (Nelson 1972, Aalen 1978)
   * — [[kaplanMeier]]'s ADDITIVE sibling, the estimator survival
   * tooling reports beside S(t): H(t) = Σ_{t' ≤ t} d_{t'}/n_{t'} over
   * the event times, with the Poisson-form variance Σ d/n² (se =
   * its square root). Where KM multiplies survival factors, NA sums
   * hazard mass — H is the curve whose SLOPE is the instantaneous
   * event rate (a flattening H reads "the remaining population has
   * stopped converting" directly, which S(t) shows only as an
   * asymptote), and exp(−H) is the Fleming–Harrington survival
   * estimate (reported as `fh_survival`; ≥ KM's S by construction,
   * close on dense data — the pair is the standard cross-check).
   * Censoring semantics, the (group, duration) aggregation, and the
   * per-group cumulative windows over the DISTINCT-duration frame are
   * exactly [[kaplanMeier]]'s (n_durations rows per group, never
   * subjects). The d = n terminal point needs no special casing here:
   * its hazard increment is exactly 1.
   * Output: group, t, n_at_risk, d_events, c_censored, hazard (4dp),
   * se_hazard (4dp), fh_survival (4dp).
   */
  def nelsonAalen(df: DataFrame, groupCol: String, durationCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(durationCol).isNotNull && col(durationCol) >= 0)
      .select(col(groupCol).as("g"),
        col(durationCol).cast("double").as("t"),
        col(eventCol).cast("boolean").as("e"))
    val at = base.groupBy("g", "t")
      .agg(count(when(col("e"), 1)).as("d_events"),
        count(when(!col("e"), 1)).as("c_censored"))
    val tot = base.groupBy("g").agg(count(lit(1)).as("_n"))
    val wPrev = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy("g").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, 0)
    val dOverN = col("d_events") / col("n_at_risk")
    at.join(tot, "g")
      .withColumn("n_at_risk",
        col("_n") - coalesce(
          sum(col("d_events") + col("c_censored")).over(wPrev), lit(0L)))
      .withColumn("_h", sum(dOverN).over(wCum))
      .withColumn("_v",
        sum(col("d_events") / (col("n_at_risk") * col("n_at_risk")))
          .over(wCum))
      .select(col("g").as(groupCol), col("t"), col("n_at_risk"),
        col("d_events"), col("c_censored"),
        round(col("_h"), 4).as("hazard"),
        round(sqrt(col("_v")), 4).as("se_hazard"),
        round(exp(-col("_h")), 4).as("fh_survival"))
  }

  /**
   * Chi-square test of independence + Cramér's V — the categorical
   * dual of [[welchTTest]] (is lang independent of source? is the
   * label leaking through a metadata column?) from the SAME single
   * joint aggregation [[mutualInfo]] runs: χ² = Σ (o−e)²/e over ALL
   * grid cells, computed WITHOUT materializing the grid via the
   * identity Σ_unobserved e = n − Σ_observed e, so
   * χ² = Σ_obs[(o−e)²/e − e] + n — empty cells contribute exactly
   * their expectation, and the plan never explodes |A|×|B| rows.
   * Cramér's V = √(χ²/(n·min(r−1, c−1))) is the [0,1] effect size the
   * raw statistic (which grows with n) can't give you; read χ²
   * against the χ²(dof) table for significance — no SQL engine ships
   * the inverse CDF (the welchTTest convention).
   * Output: 1 row — n, n_a, n_b, dof, chi2 (4dp), cramers_v (4dp).
   */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val joint = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .agg(count(lit(1)).as("c_ab"))
    val ma = joint.groupBy("a").agg(sum("c_ab").as("c_a"))
    val mb = joint.groupBy("b").agg(sum("c_ab").as("c_b"))
    val tot = joint.agg(sum("c_ab").cast("double").as("n"))
    val e = col("c_a") * col("c_b") / col("n")
    joint.join(ma, "a").join(mb, "b").crossJoin(tot)
      .agg(
        max(col("n")).cast("long").as("n"),
        countDistinct(col("a")).as("n_a"),
        countDistinct(col("b")).as("n_b"),
        (sum(pow(col("c_ab") - e, 2) / e - e) + max(col("n")))
          .as("_chi2"))
      .select(col("n"), col("n_a"), col("n_b"),
        ((col("n_a") - 1) * (col("n_b") - 1)).as("dof"),
        round(when(col("n_a") > 1 && col("n_b") > 1, col("_chi2"))
          .otherwise(lit(0.0)), 4).as("chi2"),
        round(when(col("n_a") > 1 && col("n_b") > 1,
          sqrt(greatest(lit(0.0), col("_chi2")) / (col("n") *
            least(col("n_a") - 1, col("n_b") - 1))))
          .otherwise(lit(0.0)), 4).as("cramers_v"))
  }

  /**
   * Welch two-sample t-test — the experiment readout (did treatment
   * move the metric?) and the drift significance check ([[statsDrift]]
   * reports THAT a mean moved; this says whether the move clears
   * sampling noise): t = (x̄_a − x̄_b)/√(s²_a/n_a + s²_b/n_b) with the
   * Welch–Satterthwaite degrees of freedom — the unequal-variance form,
   * because equal-variance pooling is never safe on observational
   * group splits. `significant` applies the z-approximation cut
   * |t| > 1.96 (95%, two-sided) — the exact t quantile needs an
   * inverse CDF no SQL engine ships, and at the n where Welch matters
   * the z cut is what every dashboard uses (documented approximation;
   * at n < ~30 read t_stat against a table instead).
   * ONE filtered scan aggregation; groups with n < 2 or zero variance
   * on both sides yield NULL t (no evidence is not significance).
   * Output: 1 row — n_a, n_b, mean_a, mean_b, diff (4dp), t_stat
   * (4dp), df (2dp), significant.
   */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "the two samples must be distinct groups")
    val x = col(valueCol).cast("double")
    val inA = col(groupCol) === groupA
    val inB = col(groupCol) === groupB
    val agged = df.filter((inA || inB) && x.isNotNull)
      .agg(count(when(inA, 1)).as("n_a"), count(when(inB, 1)).as("n_b"),
        avg(when(inA, x)).as("_ma"), avg(when(inB, x)).as("_mb"),
        variance(when(inA, x)).as("_va"), variance(when(inB, x)).as("_vb"))
    val sa = col("_va") / col("n_a")
    val sb = col("_vb") / col("n_b")
    val t = (col("_ma") - col("_mb")) / sqrt(sa + sb)
    val dfree = pow(sa + sb, 2) /
      (pow(sa, 2) / (col("n_a") - 1) + pow(sb, 2) / (col("n_b") - 1))
    agged.select(col("n_a"), col("n_b"),
      round(col("_ma"), 4).as("mean_a"), round(col("_mb"), 4).as("mean_b"),
      (round(col("_ma") - col("_mb"), 4) + lit(0.0)).as("diff"),
      when(col("n_a") >= 2 && col("n_b") >= 2 && (sa + sb) > 0,
        round(t, 4) + lit(0.0)).as("t_stat"),
      when(col("n_a") >= 2 && col("n_b") >= 2 && (sa + sb) > 0,
        round(dfree, 2)).as("df"),
      coalesce(
        when(col("n_a") >= 2 && col("n_b") >= 2 && (sa + sb) > 0,
          abs(t) > 1.96), lit(false)).as("significant"))
  }

  /**
   * Decile gains table — the model-eval staple next to [[rocAuc]]'s
   * one-number summary (AUC says the ranking is good; the gains table
   * says WHERE: "the top decile captures 34% of positives, lift 3.4" is
   * the sentence a triage budget is set with): rows bin into 10
   * score-deciles by comparing against the EXACT decile cuts — a
   * 1-row percentile subtree, NOT a global ntile window (an ntile over
   * the corpus is a SinglePartition sort; cut-comparison is one narrow
   * scan, and tied scores landing together in a bin is standard
   * score-binned-gains behavior, deciles then being unequal-sized by
   * exactly the tie mass). Per decile: size, positives, positive rate,
   * cumulative gain (share of ALL positives captured so far) and
   * cumulative lift (gain / share of rows examined). The cumulative
   * window runs over the 10-row decile frame, never the corpus.
   * Output: decile (1 = highest scores), n, n_pos, pos_rate (4dp),
   * cum_gain (4dp), lift (4dp).
   */
  def gainsTable(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val sc = col(scoreCol).cast("double")
    val base = df.filter(sc.isNotNull)
      .select(sc.as("_s"), col(labelCol).cast("boolean").as("_y"))
    val cuts = base.agg(
      percentile(col("_s"),
        typedLit((1 to 9).map(_ / 10.0))).as("_cuts"))
    val binned = base.crossJoin(cuts)
      .select((lit(1) + expr(
        "size(filter(_cuts, c -> c >= _s))")).as("decile"), col("_y"))
    val perBin = binned.groupBy("decile")
      .agg(count(lit(1)).as("n"),
        count(when(col("_y"), 1)).as("n_pos"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("decile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = perBin.agg(sum("n").as("_tn"), sum("n_pos").as("_tp"))
    perBin.crossJoin(tot)
      .withColumn("_cn", sum(col("n")).over(w))
      .withColumn("_cp", sum(col("n_pos")).over(w))
      .select(col("decile").cast("long").as("decile"), col("n"),
        col("n_pos"),
        round(col("n_pos") / col("n"), 4).as("pos_rate"),
        round(when(col("_tp") > 0, col("_cp") / col("_tp"))
          .otherwise(lit(0.0)), 4).as("cum_gain"),
        round(when(col("_tp") > 0,
          (col("_cp") / col("_tp")) / (col("_cn") / col("_tn")))
          .otherwise(lit(0.0)), 4).as("lift"))
  }

  /**
   * Pairwise correlation matrix — the feature-redundancy screen over k
   * numeric columns ([[mutualInfo]] covers two categoricals; this
   * covers the numeric block) in ONE scan: every unordered pair
   * reports its pairwise-complete-observation Pearson r, computed from
   * guarded moments over the paired subset (the [[acf]] rule: each
   * side masked to rows where the other is present — exactly what
   * `corr`'s pairwise deletion computes, without corr's ANSI
   * divide-by-zero on a constant column; degenerate pairs report NULL,
   * never an error). k scales the aggregation's expression count
   * (k(k−1)/2 moment sets), never the pass count.
   * Output: col_a, col_b, n_pairs, corr (4dp) — one row per unordered
   * pair, ordered by the caller's column-list positions.
   */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"corrMatrix needs >= 2 columns: $cols")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), ix) =>
      val xa = col(a).cast("double"); val xb = col(b).cast("double")
      val am = when(xb.isNotNull, xa); val bm = when(xa.isNotNull, xb)
      Seq(count(when(xa.isNotNull && xb.isNotNull, 1)).as(s"_n$ix"),
        covar_samp(am, bm).as(s"_c$ix"),
        stddev_samp(am).as(s"_sa$ix"),
        stddev_samp(bm).as(s"_sb$ix"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.zipWithIndex.map { case ((a, b), ix) =>
      s"'$a', '$b', _n$ix, " +
        s"CASE WHEN _sa$ix > 0 AND _sb$ix > 0 THEN _c$ix / (_sa$ix * _sb$ix) END"
    }.mkString(", ")
    agged
      .select(expr(
        s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, n_pairs, _r)"))
      .select(col("col_a"), col("col_b"), col("n_pairs"),
        (round(col("_r"), 4) + lit(0.0)).as("corr"))
  }

  /**
   * Poisson-bootstrap confidence intervals per group — the error bar
   * for any per-group mean a curation report publishes, computed the
   * way bootstrap actually distributes (Chamandy et al., "Estimating
   * Uncertainty for Massive Data Streams"): classic bootstrap draws n
   * rows WITH replacement per resample — undistributable, the sampler
   * needs global n — but each row's multiplicity in a size-n resample
   * is asymptotically Poisson(1), so every row independently draws its
   * own multiplicity and a resample never needs coordination. Each of
   * the `b` resamples uses m ~ inverse-Poisson(1) CDF of the md5
   * uniform of (seed, id, rep) — the sampling family's
   * determinism-by-hash contract, replayable in any engine — with the
   * ladder capped at 4 (cumulative mass 0.9963; the residual tail
   * lands on 4, documented, identical on both engines). CI bounds are
   * exact percentiles of the 6dp-rounded resample means (rounding pins
   * the order statistics across engines); degenerate resamples (all
   * multiplicities 0) drop out and `b_effective` reports how many
   * survived.
   *
   * Shape at scale: one b-way explode (the documented b× row envelope
   * — b is 32-ish, never data-sized), one (group, rep) aggregation
   * (map-side combined), one groups×b percentile rollup. No windows,
   * no actions, no driver-side randomness.
   * Output: group, mean (4dp), ci_lo (4dp), ci_hi (4dp), b_effective.
   */
  def bootstrapCI(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, b: Int = 32, level: Double = 0.95,
      seed: Long = 42L): DataFrame = {
    require(b >= 2 && b <= 1024, s"b must be in [2, 1024]: $b")
    require(level > 0 && level < 1, s"level must be in (0,1): $level")
    val x = col(valueCol).cast("double")
    val base = df.filter(x.isNotNull)
      .select(col(groupCol), col(idCol).cast("string").as("_id"),
        x.as("_x"))
    val point = base.groupBy(col(groupCol))
      .agg(round(avg(col("_x")), 4).as("mean"))
    val u = conv(substring(md5(concat(lit(s"$seed|"), col("_id"),
      lit("|"), col("_rep").cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    // inverse Poisson(1) CDF ladder, capped at 4 (cum mass .9963)
    val m = when(col("_u") < 0.36787944117144233, 0)
      .when(col("_u") < 0.7357588823428847, 1)
      .when(col("_u") < 0.9196986029286058, 2)
      .when(col("_u") < 0.9810118431238462, 3)
      .otherwise(4)
    val rmeans = base
      .withColumn("_rep", explode(array((0 until b).map(lit): _*)))
      .withColumn("_u", u)
      .withColumn("_m", m.cast("long"))
      .groupBy(col(groupCol), col("_rep"))
      .agg(sum(col("_m")).as("_n"), sum(col("_m") * col("_x")).as("_s"))
      .select(col(groupCol),
        when(col("_n") > 0, round(col("_s") / col("_n"), 6)).as("_rm"))
    val lo = (1.0 - level) / 2.0
    rmeans.groupBy(col(groupCol))
      .agg(round(percentile(col("_rm"), lit(lo)), 4).as("ci_lo"),
        round(percentile(col("_rm"), lit(1.0 - lo)), 4).as("ci_hi"),
        count(col("_rm")).as("b_effective"))
      .join(point, Seq(groupCol))
      .select(col(groupCol), col("mean"), col("ci_lo"), col("ci_hi"),
        col("b_effective"))
  }

  /**
   * Benford first-digit audit — the fabricated-numbers screen for
   * ingested numeric feeds (naturally occurring multi-magnitude
   * quantities follow P(d) = log10(1 + 1/d); invented or truncated ones
   * usually don't): per digit 1–9, observed count and share vs the
   * Benford expectation, with the per-digit χ² contribution
   * (O−E)²/E — Σ it against the χ²(8) critical value of your chosen
   * confidence. First significant digit is computed ARITHMETICALLY
   * (floor(|x| / 10^floor(log10|x|))) — never via string rendering,
   * whose scientific-notation cutoffs differ across engines. Zero/NULL
   * values carry no leading digit and are excluded. ONE scan + a 9-row
   * grid (empty digits materialize with n = 0, the histogram rule).
   * Output: digit, n, p_obs (6dp), p_benford (6dp), chi2_term (4dp).
   */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val v = abs(col(valueCol).cast("double"))
    val counts = df
      .filter(col(valueCol).isNotNull && v > 0)
      .select(floor(v / pow(lit(10.0), floor(log10(v)))).cast("long")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val grid = df.sparkSession.range(1, 10).select(col("id").as("digit"))
    val tot = counts.agg(sum("n").cast("double").as("_tot"))
    grid.join(counts, Seq("digit"), "left").crossJoin(tot)
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("_pb", log(10.0, lit(1.0) + lit(1.0) / col("digit")))
      .select(col("digit"), col("n"),
        round(col("n") / col("_tot"), 6).as("p_obs"),
        round(col("_pb"), 6).as("p_benford"),
        round(pow(col("n") - col("_tot") * col("_pb"), 2)
          / (col("_tot") * col("_pb")), 4).as("chi2_term"))
  }

  /**
   * Concentration profile of a key's mass — the "is this corpus one
   * giant domain" audit (domain mix, revenue concentration, shard
   * balance): Gini coefficient over per-key totals (0 = perfectly even,
   * →1 = one key holds everything) plus the Herfindahl–Hirschman index
   * Σ share² and the top-1 share. Gini by the rank identity
   * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over ascending-sorted totals
   * (tie-safe: Σ i·xᵢ over a block of EQUAL x spanning consecutive
   * ranks is invariant to their order). One keyed aggregation, then a
   * KEY-level (not row-level) global rank — the single ordered pass is
   * over n_keys rows (domains, customers), orders of magnitude below
   * row count; for key cardinalities that themselves need a cluster,
   * bucket keys first. Output: 1 row — n_keys, total, gini (4dp),
   * hhi (4dp), top_share (4dp).
   */
  def concentration(df: DataFrame, keyCol: String,
      weightCol: String = null): DataFrame = {
    val wexpr =
      if (weightCol == null) count(lit(1)).cast("double")
      else sum(col(weightCol).cast("double"))
    val totals = df.groupBy(col(keyCol).as("_k")).agg(wexpr.as("_x"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("_x").asc, col("_k").asc)
    totals
      .withColumn("_i", row_number().over(w).cast("double"))
      .agg(count(lit(1)).as("n_keys"),
        round(sum(col("_x")), 4).as("total"),
        round(lit(2.0) * sum(col("_i") * col("_x"))
            / (count(lit(1)) * sum(col("_x")))
          - (count(lit(1)) + lit(1.0)) / count(lit(1)), 4).as("gini"),
        round(sum(col("_x") * col("_x")) / pow(sum(col("_x")), 2), 4)
          .as("hhi"),
        round(max(col("_x")) / sum(col("_x")), 4).as("top_share"))
  }

  /**
   * Cohen's kappa between two categorical columns over the same rows —
   * the chance-corrected agreement score for annotation pipelines (two
   * labelers, or a model vs the shipped metadata): κ = (p_o − p_e) /
   * (1 − p_e) with p_o the observed agreement rate and p_e the expected
   * rate under independent marginals. κ = 1 when p_e = 1 (both raters
   * constant and equal — perfect if degenerate agreement); rows where
   * either side is NULL are excluded. ONE joint (a, b) aggregation
   * (map-side combined), marginals derived from it, a 1-row result —
   * the mutualInfo scan shape.
   * Output: 1 row — n, p_o (4dp), p_e (4dp), kappa (4dp).
   */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val joint = df
      .filter(col(raterA).isNotNull && col(raterB).isNotNull)
      .groupBy(col(raterA).cast("string").as("a"),
        col(raterB).cast("string").as("b"))
      .agg(count(lit(1)).as("c_ab"))
    val ma = joint.groupBy("a").agg(sum("c_ab").as("c_a"))
    val mb = joint.groupBy("b").agg(sum("c_ab").as("c_b"))
    val tot = joint.agg(sum("c_ab").cast("double").as("n"))
    val cells = ma.join(mb, col("a") === col("b"))
      .agg(coalesce(sum(col("c_a") * col("c_b")), lit(0.0)).as("_pe_num"))
    val agree = joint.filter(col("a") === col("b"))
      .agg(coalesce(sum("c_ab"), lit(0L)).cast("double").as("_agree"))
    tot.crossJoin(agree).crossJoin(cells)
      .select(col("n").cast("long").as("n"),
        round(col("_agree") / col("n"), 4).as("p_o"),
        round(col("_pe_num") / (col("n") * col("n")), 4).as("p_e"))
      .withColumn("kappa",
        when(col("p_e") < 1.0,
          round((col("p_o") - col("p_e")) / (lit(1.0) - col("p_e")), 4))
          .otherwise(lit(1.0)))
  }

  /**
   * Per-column Shannon entropy profile — the "is this column worth
   * grouping/blocking/salting on" signal: near-zero entropy means the
   * column is basically constant (useless block key, harmless to prune);
   * entropy near ln(n_distinct) means uniform spread (a good partition
   * key, a bad compression target). All k columns profile in ONE scan:
   * values unpivot to (column, value-as-string) pairs inside the
   * project, aggregate map-side to (column, value) counts, then one
   * tiny per-column rollup computes H = −Σ p·ln p over NON-NULL values
   * (nulls reported separately, never a probability mass). Output:
   * col_name, n, n_nulls, n_distinct, entropy (4dp), norm_entropy
   * (H / ln(n_distinct), 4dp; 0 when n_distinct <= 1).
   *
   * The explode is a k× row blowup in CPU only — the shuffle carries
   * the (column, value) partial counts, already combined per map task.
   */
  def entropyProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "entropyProfile needs at least one column")
    val pairs = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
      .as("p")).select(col("p.col_name").as("col_name"), col("p.v").as("v"))
    val counts = pairs.groupBy("col_name", "v")
      .agg(count(lit(1)).as("c"))
    counts.groupBy("col_name").agg(
      sum(col("c")).as("n"),
      coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_nulls"),
      count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
      sum(when(col("v").isNotNull, col("c"))).as("_nn"),
      sum(when(col("v").isNotNull,
        col("c") * log(col("c")))).as("_clogc"))
      .select(col("col_name"), col("n"), col("n_nulls"), col("n_distinct"),
        round(when(col("_nn") > 0,
          log(col("_nn")) - col("_clogc") / col("_nn"))
          .otherwise(lit(0.0)), 4).as("entropy"),
        round(when(col("n_distinct") > 1,
          (log(col("_nn")) - col("_clogc") / col("_nn")) /
            log(col("n_distinct").cast("double")))
          .otherwise(lit(0.0)), 4).as("norm_entropy"))
  }

  /**
   * Column-stats drift between two corpus versions — the schema-level
   * companion to [[psiDrift]]'s distribution test (PSI needs a bin
   * grid per column; this is the cheap first pass that says WHICH
   * columns moved): for each audited column, both sides report row
   * count, null fraction, distinct count, and mean (of the
   * numeric-parseable values — try_cast, never an ANSI error), plus
   * the deltas a drift monitor alarms on. A column whose null_frac
   * jumps or whose distinct count collapses between crawls is the
   * first sign of an upstream extraction break.
   *
   * Shape at scale: ONE scan per side via the [[entropyProfile]]
   * in-project unpivot → (column, value) counts (map-side combined) →
   * k-row rollup; the two k-row profiles join on column name. Distinct
   * counts and means are computed over the stringified values — the
   * string render of numerics round-trips, so cardinality and mean
   * match the typed column exactly.
   * Output: col_name, n_old, n_new, null_frac_old/new/delta (4dp),
   * distinct_old/new, mean_old/new/delta (4dp).
   */
  def statsDrift(oldDf: DataFrame, newDf: DataFrame,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "statsDrift needs at least one column")
    def side(df: DataFrame, tag: String): DataFrame = {
      val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
        .as("p"))
        .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      pairs.groupBy("col_name", "v").agg(count(lit(1)).as("c"))
        .withColumn("_d", expr("try_cast(v as double)"))
        .groupBy("col_name")
        .agg(sum("c").as(s"n_$tag"),
          round(coalesce(sum(when(col("v").isNull, col("c"))), lit(0L))
            / sum("c"), 4).as(s"null_frac_$tag"),
          count(when(col("v").isNotNull, lit(1))).as(s"distinct_$tag"),
          round(sum(col("_d") * col("c"))
            / sum(when(col("_d").isNotNull, col("c"))), 4)
            .as(s"mean_$tag"))
    }
    side(oldDf, "old").join(side(newDf, "new"), Seq("col_name"))
      .withColumn("null_frac_delta",
        round(col("null_frac_new") - col("null_frac_old"), 4) + lit(0.0))
      .withColumn("mean_delta",
        round(col("mean_new") - col("mean_old"), 4) + lit(0.0))
  }

  /**
   * Mutual information between two categorical columns — the feature-
   * redundancy / leakage probe (MI ≈ 0: independent; MI ≈ min(H_a, H_b):
   * one determines the other; a label-leaking feature shows high MI
   * with the target). Computed over rows where BOTH sides are non-NULL:
   * MI = Σ_ab p_ab · ln(p_ab / (p_a · p_b)), with the numerically
   * stable count form Σ c_ab/n · ln(n·c_ab/(c_a·c_b)). One joint
   * (a, b) aggregation (map-side combined) + two marginal rollups
   * DERIVED from it + a 1-row total — no second scan, no action.
   * Output: 1 row — n, n_distinct_a, n_distinct_b, mi (4dp).
   */
  def mutualInfo(df: DataFrame, colA: String, colB: String): DataFrame = {
    val joint = df
      .filter(col(colA).isNotNull && col(colB).isNotNull)
      .groupBy(col(colA).cast("string").as("a"),
        col(colB).cast("string").as("b"))
      .agg(count(lit(1)).as("c_ab"))
    val ma = joint.groupBy("a").agg(sum("c_ab").as("c_a"))
    val mb = joint.groupBy("b").agg(sum("c_ab").as("c_b"))
    val tot = joint.agg(sum("c_ab").cast("double").as("n"),
      count(lit(1)).as("_cells"))
    joint.join(ma, "a").join(mb, "b").crossJoin(tot)
      .agg(
        max(col("n")).cast("long").as("n"),
        countDistinct(col("a")).as("n_distinct_a"),
        countDistinct(col("b")).as("n_distinct_b"),
        round(coalesce(sum((col("c_ab") / col("n")) *
          log(col("n") * col("c_ab") / (col("c_a") * col("c_b")))),
          lit(0.0)), 4).as("mi"))
  }

  /**
   * Theil's uncertainty coefficient matrix (Theil 1970) — the
   * ASYMMETRIC categorical-association matrix: [[corrMatrix]]'s
   * categorical dual, [[mutualInfo]] normalized per DIRECTION.
   * U(x|y) = (H(x) − H(x|y)) / H(x) = MI / H(x) ∈ [0, 1] reads "how
   * much of x does knowing y explain" — which is not symmetric (a
   * city column nearly determines its state, U(state|city) ≈ 1, while
   * state barely narrows city), the property Cramér's V and NMI both
   * erase and exactly what the leakage/redundancy audit wants to see
   * per direction. Computed in the count form from ONE joint
   * (map-side-combined) aggregation per UNORDERED pair — marginals
   * derived, both directions emitted from the same cell frame:
   * MI = (Σc_ab·ln c_ab − Σc_a·ln c_a − Σc_b·ln c_b)/n + ln n,
   * H(x) = ln n − Σc_a·ln c_a / n. Rows where either side is NULL
   * drop (the mutualInfo convention); a constant column (H = 0)
   * reports NULL u, never a division error. C(|cols|, 2) bounded
   * pair subtrees, every 1-row frame a crossJoin aggregate.
   * Output: one row per ORDERED pair — col_x, col_y, n, mi (4dp),
   * u (4dp; U(col_x | col_y)).
   */
  def theilsU(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 8,
      s"cols must have 2..8 columns (C(n,2) pair subtrees): ${cols.size}")
    require(cols.distinct.size == cols.size, "cols must be distinct")
    val parts = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield {
      val (cx, cy) = (cols(i), cols(j))
      val joint = df
        .filter(col(cx).isNotNull && col(cy).isNotNull)
        .groupBy(col(cx).cast("string").as("a"),
          col(cy).cast("string").as("b"))
        .agg(count(lit(1)).as("c"))
      val agg = joint
        .agg(sum("c").cast("double").as("n"),
          sum(col("c") * log(col("c"))).as("sab"))
        .crossJoin(joint.groupBy("a").agg(sum("c").as("ca"))
          .agg(sum(col("ca") * log(col("ca"))).as("sa")))
        .crossJoin(joint.groupBy("b").agg(sum("c").as("cb"))
          .agg(sum(col("cb") * log(col("cb"))).as("sb")))
      val mi = (col("sab") - col("sa") - col("sb")) / col("n") +
        log(col("n"))
      val base = agg.select(col("n"), mi.as("mi"),
        (log(col("n")) - col("sa") / col("n")).as("hx"),
        (log(col("n")) - col("sb") / col("n")).as("hy"))
      def dir(x: String, y: String, h: String) =
        base.select(lit(x).as("col_x"), lit(y).as("col_y"),
          col("n").cast("long").as("n"),
          (round(col("mi"), 4) + lit(0.0)).as("mi"),
          (when(col(h) > 0, round(col("mi") / col(h), 4)) + lit(0.0))
            .as("u"))
      dir(cx, cy, "hx").unionAll(dir(cy, cx, "hy"))
    }
    parts.reduce(_.unionAll(_))
  }

  /**
   * Distribution-drift report between two corpus versions — the
   * Population Stability Index over a fixed binning, the retraining/
   * alerting trigger every production data pipeline ends up needing
   * (did document lengths / quality scores / language mix shift since
   * the reference snapshot?). Bin edges come from the REFERENCE side's
   * [min, max] (the convention: the baseline defines the grid; new
   * values outside it clamp into the edge bins), each side's bin shares
   * are Laplace-floored at eps to keep empty bins finite, and
   *   PSI = Σ_b (p_new_b − p_ref_b) · ln(p_new_b / p_ref_b).
   * Rule of thumb: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major.
   * Output: one row per bin (bucket, lo/hi edge 6dp, n_ref, n_new,
   * p_ref, p_new, contrib 6dp) — sum `contrib` for the index, keep the
   * rows for WHERE the shift lives.
   *
   * Shape at scale: one min/max/count aggregation on the reference, one
   * bucket-count aggregation per side (map-side combined, bins-sized
   * shuffles), the 1-row stats frame entering as a crossJoin subtree —
   * no action, no window, no data-sized join.
   */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      bins: Int, eps: Double = 1e-4): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(eps > 0, "eps must be positive")
    val v = col(valueCol).cast("double")
    val stats = ref.filter(col(valueCol).isNotNull)
      .agg(min(v).as("_lo"), max(v).as("_hi"))
      .withColumn("_w", when(col("_hi") > col("_lo"),
        (col("_hi") - col("_lo")) / bins).otherwise(lit(1.0)))
    def sideCounts(df: DataFrame, as: String) =
      df.filter(col(valueCol).isNotNull).crossJoin(stats)
        .withColumn("bucket",
          greatest(least(floor((v - col("_lo")) / col("_w")),
            lit((bins - 1).toLong)), lit(0L)))
        .groupBy("bucket").agg(count(lit(1)).as(as))
    val grid = stats.select(
      explode(sequence(lit(0L), lit((bins - 1).toLong))).as("bucket"),
      col("_lo"), col("_w"))
    val joined = grid
      .join(sideCounts(ref, "n_ref"), Seq("bucket"), "left")
      .join(sideCounts(cur, "n_new"), Seq("bucket"), "left")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    val tot = joined.groupBy().agg(
      sum("n_ref").cast("double").as("_tr"),
      sum("n_new").cast("double").as("_tn"))
    joined.crossJoin(tot)
      .withColumn("p_ref", greatest(col("n_ref") / col("_tr"), lit(eps)))
      .withColumn("p_new", greatest(col("n_new") / col("_tn"), lit(eps)))
      .select(col("bucket"),
        round(col("_lo") + col("bucket") * col("_w"), 6).as("lo_edge"),
        round(col("_lo") + (col("bucket") + 1) * col("_w"), 6).as("hi_edge"),
        col("n_ref"), col("n_new"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_new"), 6).as("p_new"),
        round((col("p_new") - col("p_ref")) *
          log(col("p_new") / col("p_ref")), 6).as("contrib"))
  }

  /**
   * Per-bin value counts against a FIXED literal bin grid — the
   * streaming-mergeable half of [[psiDrift]]. PSI's state is bounded
   * the moment the grid is frozen: each row maps to one of `bins`
   * buckets by pure arithmetic (narrow — no reference scan, the edges
   * are literals), and the per-bucket counts are classic mergeable
   * aggregation state, so this runs UNCHANGED on a streaming frame in
   * Complete mode (the domainProfile pattern). The production loop:
   * freeze (lo, hi) from the reference snapshot once, stream current
   * data through this, and assemble the O(bins) index per trigger with
   * [[psiFromCounts]] — the assembly is bins-sized driver work, not
   * stream state. (The two-sample KS test has NO such split: D needs
   * every distinct value's CDF position, unbounded state on an
   * unbounded stream — [[ksTest]] is batch-only by design, not by
   * omission.) Values outside [lo, hi) clamp into the edge bins, the
   * psiDrift convention. Output: bucket, n.
   */
  def psiBucketCounts(df: DataFrame, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val w = if (hi > lo) (hi - lo) / bins else 1.0
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull)
      .withColumn("bucket",
        greatest(least(floor((v - lit(lo)) / lit(w)),
          lit((bins - 1).toLong)), lit(0L)))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
  }

  /**
   * Assemble the [[psiDrift]] report from two [[psiBucketCounts]]
   * frames and the same frozen grid — bins-sized arithmetic, the
   * per-trigger tail of the streaming loop. With (lo, hi) taken from
   * the reference's min/max, `psiFromCounts(counts(ref), counts(cur))`
   * is row-identical to `psiDrift(ref, cur)` (the law the spec pins).
   * Output: the psiDrift schema (bucket, lo/hi edge, n_ref, n_new,
   * p_ref, p_new, contrib).
   */
  def psiFromCounts(refCounts: DataFrame, curCounts: DataFrame,
      lo: Double, hi: Double, bins: Int, eps: Double = 1e-4): DataFrame = {
    require(bins > 0, "bins must be positive")
    require(eps > 0, "eps must be positive")
    val w = if (hi > lo) (hi - lo) / bins else 1.0
    val spark = refCounts.sparkSession
    val grid = spark.range(bins).select(col("id").as("bucket"))
    val joined = grid
      .join(refCounts.select(col("bucket"), col("n").as("n_ref")),
        Seq("bucket"), "left")
      .join(curCounts.select(col("bucket"), col("n").as("n_new")),
        Seq("bucket"), "left")
      .withColumn("n_ref", coalesce(col("n_ref"), lit(0L)))
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    val tot = joined.groupBy().agg(
      sum("n_ref").cast("double").as("_tr"),
      sum("n_new").cast("double").as("_tn"))
    joined.crossJoin(tot)
      .withColumn("p_ref", greatest(col("n_ref") / col("_tr"), lit(eps)))
      .withColumn("p_new", greatest(col("n_new") / col("_tn"), lit(eps)))
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * lit(w), 6).as("lo_edge"),
        round(lit(lo) + (col("bucket") + 1) * lit(w), 6).as("hi_edge"),
        col("n_ref"), col("n_new"),
        round(col("p_ref"), 6).as("p_ref"),
        round(col("p_new"), 6).as("p_new"),
        round((col("p_new") - col("p_ref")) *
          log(col("p_new") / col("p_ref")), 6).as("contrib"))
  }

  def robustOutliers(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, k: Double = 3.5): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(idCol), v.as("_v"))
    val med = base.groupBy(col(groupCol))
      .agg(percentile(col("_v"), lit(0.5)).as("_med"))
    val dev = base.join(med, Seq(groupCol))
      .withColumn("_ad", abs(col("_v") - col("_med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(percentile(col("_ad"), lit(0.5)).as("_mad"))
    dev.join(mad, Seq(groupCol))
      .withColumn("robust_z",
        when(col("_mad") > 0,
          round(lit(0.6745) * col("_ad") / col("_mad"), 4))
          .otherwise(when(col("_ad") > 0, lit(Double.PositiveInfinity))
            .otherwise(lit(0.0))))
      .filter(col("robust_z") > k)
      .select(col(groupCol), col(idCol), col("_v").as("value"),
        round(col("_med"), 4).as("group_median"),
        round(col("_mad"), 4).as("group_mad"), col("robust_z"))
  }

  /**
   * Mann–Whitney U rank-sum test (Mann & Whitney 1947) — the
   * distribution-free sibling of [[welchTTest]] for the experiment
   * readout when the metric is skewed or ordinal (latency, scores,
   * counts): U_a counts pairs where an A value exceeds a B value (ties
   * half), so U_a/(n_a·n_b) IS the common-language effect size — the
   * probability a random A beats a random B, the same quantity
   * [[rocAuc]] reports for a classifier. Ranks come from ONE
   * [[DistScan]] distributed prefix sum over the distinct value cells
   * (continuous metrics make that frame the data itself — never a
   * single sorted task): average rank
   * of a tie group = rows-before + (t+1)/2, R_a = Σ c_a·avgrank,
   * U_a = R_a − n_a(n_a+1)/2. The normal approximation carries the
   * exact tie correction σ² = n_a·n_b/12·((n+1) − Σ(t³−t)/(n(n−1)));
   * |z| > 1.96 is the same documented 95% z-cut as [[welchTTest]].
   * Degenerate samples (either side empty, or every value tied so
   * σ = 0) yield NULL z and significant = false.
   * Output: 1 row — n_a, n_b, u_a (1dp; .5 on tie mass), auc (4dp),
   * z (4dp), significant.
   */
  def mannWhitney(df: DataFrame, groupCol: String, valueCol: String,
      groupA: String, groupB: String): DataFrame = {
    require(groupA != groupB, "the two samples must be distinct groups")
    val x = col(valueCol).cast("double")
    val inA = col(groupCol) === groupA
    val inB = col(groupCol) === groupB
    val cells = df.filter((inA || inB) && x.isNotNull)
      .groupBy(x.as("v"))
      .agg(count(when(inA, 1)).as("ca"), count(when(inB, 1)).as("cb"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    val ua = col("_ra") - na * (na + 1) / 2.0
    val sigma = sqrt(na * nb / 12.0 *
      ((n + 1) - col("_t3") / (n * (n - 1))))
    val z = (ua - na * nb / 2.0) / sigma
    // terminal 1-row statistic: the scan is CONSTRUCTED inside the seal
    // (by-name) so the seal releases exactly this statistic's pin on
    // return. Rows-before each tie group via the distributed prefix
    // scan (long counts: bit-identical to the naive global window).
    DistScan.sealTerminal({
      val ranked = DistScan.prefixSums(
          cells.withColumn("tk", col("ca") + col("cb")),
          Seq(col("v")), Seq((col("tk"), "_below")), inclusive = false)
        .withColumn("avg_rank", col("_below") + (col("tk") + 1) / 2.0)
      val agged = ranked.agg(
        sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum(col("ca") * col("avg_rank")).as("_ra"),
        sum(col("tk") * col("tk") * col("tk") - col("tk")).as("_t3"))
      agged.select(col("n_a"), col("n_b"),
      round(ua, 1).as("u_a"),
      when(col("n_a") > 0 && col("n_b") > 0,
        round(ua / (na * nb), 4)).as("auc"),
      when(col("n_a") > 0 && col("n_b") > 0 && sigma > 0,
        round(z, 4) + lit(0.0)).as("z"),
      coalesce(when(col("n_a") > 0 && col("n_b") > 0 && sigma > 0,
        abs(z) > 1.96), lit(false)).as("significant"))
    })
  }

  /**
   * Spearman rank correlation — monotone association between two
   * numeric columns (does the learned quality score AGREE with
   * readability? does doc length track token count?) where [[corrMatrix]]'s
   * Pearson r would be dragged by outliers or bent by nonlinearity:
   * ρ = Pearson correlation of the average-tie ranks. Ranks are computed
   * per DISTINCT value (two [[DistScan]] distributed prefix sums — with
   * continuous columns the distinct frame is the data, so the older
   * single-partition walks were latent hot partitions) and joined back;
   * the join is the only data-scale shuffle.
   * Output: 1 row — n, rho (4dp; NULL when either column is constant).
   */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val fx = col(xCol).cast("double")
    val fy = col(yCol).cast("double")
    val d = df.filter(fx.isNotNull && fy.isNotNull)
      .select(fx.as("x"), fy.as("y"))
    def avgRanks(c: String): DataFrame =
      DistScan.prefixSums(
          d.groupBy(col(c).as("v")).agg(count(lit(1)).as("k")),
          Seq(col("v")), Seq((col("k"), "_below")), inclusive = false)
        .withColumn(s"r$c", col("_below") + (col("k") + 1) / 2.0)
        .select(col("v").as(c), col(s"r$c"))
    // terminal 1-row statistic: seal releases BOTH rank-scan pins
    DistScan.sealTerminal(
      d.join(avgRanks("x"), Seq("x"))
        .join(avgRanks("y"), Seq("y"))
        .agg(count(lit(1)).as("n"),
          round(corr(col("rx"), col("ry")), 4).as("rho")))
  }

  /**
   * Benjamini–Hochberg FDR correction (Benjamini & Hochberg 1995) — the
   * multiple-testing step-up every per-group test family here feeds
   * (run [[welchTTest]]/[[chiSquare]]/[[mannWhitney]] per segment and
   * 5% of segments are false positives by construction; BH caps the
   * FALSE DISCOVERY RATE instead): sort the m p-values ascending,
   * adjusted p(i) = min_{j ≥ i} (m·p(j)/j) clamped to 1 — the running
   * min from the largest p downward, monotone by construction. Ranks
   * and the suffix minimum both run as [[DistScan]] distributed scans,
   * so even a test table of millions of hypotheses (per-segment ×
   * per-metric families) never funnels through one sorted task.
   * Determinism: ties in p order by id.
   * Output: one row per test — id, p, rank (BIGINT so the frame replays
   * 1:1 in any SQL engine), p_adj (6dp), significant (p_adj ≤ alpha).
   */
  def bhAdjust(df: DataFrame, idCol: String, pCol: String,
      alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    val p = col(pCol).cast("double")
    val d = df.filter(p.isNotNull && p >= 0 && p <= 1)
      .select(col(idCol).as("id"), p.as("p"))
    val tot = d.agg(count(lit(1)).as("m"))
    val ranked = DistScan.prefixRank(d.crossJoin(tot),
      Seq(col("p").asc, col("id").asc), "rank")
    DistScan.prefixMin(ranked,
        Seq(col("p").desc, col("id").desc),
        col("m") * col("p") / col("rank"), "_sufmin")
      .withColumn("p_adj", round(least(lit(1.0), col("_sufmin")), 6))
      .select(col("id"), col("p"), col("rank"), col("p_adj"),
        (col("p_adj") <= alpha).as("significant"))
  }

  /**
   * Holm–Bonferroni step-down (Holm 1979) — the FAMILY-WISE error
   * control next to [[bhAdjust]]'s FDR: when even ONE false discovery
   * is unacceptable (a release gate, a safety filter change), Holm
   * dominates plain Bonferroni uniformly with the same guarantee.
   * Walking p ascending, adjusted p(i) = max_{j ≤ i} min(1, (m−j+1)·p_j)
   * — a running MAX over the ascending order, monotone by construction,
   * and `p_adj ≤ alpha` reproduces the sequential step-down rejection
   * set exactly (the running max stops rejections at the first
   * failure). Rank and the prefix max both run as [[DistScan]]
   * distributed scans — million-hypothesis families never funnel
   * through one sorted task. Determinism: ties in p order by id.
   * Output: one row per test — id, p, rank (BIGINT for 1:1 SQL
   * replay), p_adj (6dp), significant (p_adj ≤ alpha).
   */
  def holmAdjust(df: DataFrame, idCol: String, pCol: String,
      alpha: Double = 0.05): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1): $alpha")
    val p = col(pCol).cast("double")
    val d = df.filter(p.isNotNull && p >= 0 && p <= 1)
      .select(col(idCol).as("id"), p.as("p"))
    val tot = d.agg(count(lit(1)).as("m"))
    val ranked = DistScan.prefixRank(d.crossJoin(tot),
      Seq(col("p").asc, col("id").asc), "rank")
    DistScan.prefixMax(ranked,
        Seq(col("p").asc, col("id").asc),
        (col("m") - col("rank") + 1) * col("p"), "_premax")
      .withColumn("p_adj", round(least(lit(1.0), col("_premax")), 6))
      .select(col("id"), col("p"), col("rank"), col("p_adj"),
        (col("p_adj") <= alpha).as("significant"))
  }
}
