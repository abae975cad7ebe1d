package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling operators for training-data curation. Unlike
 * `DataFrame.sample`/`sampleBy` (Bernoulli draws: non-exact counts,
 * partitioning-dependent), these rank rows by a cryptographic hash of
 * (seed, id) — the sample is EXACT-size per stratum, reproducible across
 * runs/cluster layouts, stable under appends of other strata, and
 * replayable in any engine with md5 (the DuckDB oracle gates it).
 */
object Sampling {

  /** Release any DistScan input pins still alive from lazy scan-backed
   * sampling results (negativeSample, quotaAllocate, paretoFront,
   * selectBudget chains) — the Profile.unpersistAll twin. */
  def unpersistAll(spark: org.apache.spark.sql.SparkSession): Unit =
    CacheScope.unpersistAll(spark, CacheScope.Scan)

  /**
   * Exact-size stratified sample: up to `n` rows per stratum, chosen as
   * the lowest md5(seed || '|' || id) within each stratum (ties broken by
   * id). Two window stages / two exchanges: a partial top-n per
   * (stratum, input partition) spreads hot strata across tasks, then the
   * global per-stratum rank sees at most n * numPartitions rows per
   * stratum — skew-proof AND provably identical to a single global
   * window.
   */
  def stratifiedExact(
      df: DataFrame, stratumCol: String, idCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0, "sample size must be positive")
    val internal = Seq("_hrank", "_part", "_lr", "_sample_rank")
    val clash = internal.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with stratifiedExact internals; rename them first")
    val rank = md5(concat(lit(s"$seed|"), col(idCol).cast("string")))
    // two-stage exact top-n (the batchTopK pattern): a hot stratum would
    // otherwise funnel through ONE window task. Stage 1 takes the partial
    // top-n per (stratum, input partition) — any grouping is valid, the
    // union of partial top-ns contains the global top-n — so the global
    // stage ranks at most n * numPartitions rows per stratum.
    val wLocal = Window.partitionBy(col(stratumCol), col("_part"))
      .orderBy(col("_hrank"), col(idCol))
    val pruned = df
      .withColumn("_hrank", rank)
      .withColumn("_part", spark_partition_id())
      .withColumn("_lr", row_number().over(wLocal))
      .filter(col("_lr") <= n)
      .drop("_lr", "_part")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col("_hrank"), col(idCol))
    pruned.withColumn("_sample_rank", row_number().over(w))
      .filter(col("_sample_rank") <= n)
      .drop("_sample_rank", "_hrank")
  }

  /** Deterministic fraction-based downsample: keep a row iff the md5 hash
   * of (seed, id) falls below the fraction threshold (hex-prefix
   * comparison — uniform over ids, independent of partitioning, exact in
   * expectation and reproducible). */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0, 1]")
    // first 12 hex chars as an integer in [0, 16^12): compare against
    // fraction * 16^12 — plenty of resolution, no float-parse ambiguity
    val space = math.pow(16.0, 12).toLong
    val cut = (fraction * space).toLong
    val h = conv(substring(md5(concat(lit(s"$seed|"), col(idCol).cast("string"))), 1, 12),
      16, 10).cast("long")
    df.filter(h < cut)
  }

  /**
   * Domain-mixture sample: realize a target domain mixture (DoReMi /
   * data-recipe style static reweighting) at the MAXIMUM total size the
   * corpus supports. Given raw weights w_d over domains, the largest
   * total T with share_d * T <= available_d for every weighted domain is
   * T = min_d available_d / share_d; the per-domain quota reduces to
   * floor(w_d * min_e(n_e / w_e)) — the normalizer cancels, so both
   * engines evaluate the identical double expression (the oracle replays
   * it). Within each domain the quota rows are the md5(seed|id)-lowest —
   * exact-size, reproducible, append-stable per domain, same election as
   * [[stratifiedExact]].
   *
   * Domains absent from `weights` are dropped (weight 0); weighted
   * domains absent from the data simply don't constrain the mixture.
   * Plan shape: one partial-aggregated count per domain, quota derivation
   * on a #domains-row frame (broadcast back), then the two-stage skew-
   * proof window election — a hot domain never funnels through one task.
   */
  def mixtureSample(
      df: DataFrame, domainCol: String, idCol: String,
      weights: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0.0), "weights must be positive")
    val internal = Seq("_w", "_n", "_r", "_quota", "_hrank", "_part", "_lr", "_rank")
    val clash = internal.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with mixtureSample internals; rename them first")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).toDF(domainCol, "_w")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("_n"))
    // quota_d = floor(w_d * min_e(n_e / w_e)) on the #domains-row frame;
    // the 1-row min enters as a cross-joined aggregate subtree (the
    // TF-IDF N pattern — no count() action, no driver round-trip)
    val perDomain = counts.join(broadcast(wdf), domainCol)
      .withColumn("_r", col("_n") / col("_w"))
    val rmin = perDomain.agg(min(col("_r")).as("_rmin"))
    // +1e-9 before floor: the temperatureSample epsilon — the argmin
    // domain's w·(n/w) is exactly n in algebra but not in floats, and
    // an ulp-under floor would drop that domain's last row
    val quotas = perDomain.crossJoin(rmin)
      .select(col(domainCol),
        floor(col("_w") * col("_rmin") + lit(1e-9)).cast("long")
          .as("_quota"))
    val rank = md5(concat(lit(s"$seed|"), col(idCol).cast("string")))
    // same two-stage exact top-n as stratifiedExact, with the per-domain
    // quota joined on (broadcast — #domains rows): stage 1 prunes each
    // (domain, input partition) to its local quota, stage 2 ranks at most
    // quota * numPartitions rows per domain
    val wLocal = Window.partitionBy(col(domainCol), col("_part"))
      .orderBy(col("_hrank"), col(idCol))
    val pruned = df.join(broadcast(quotas), domainCol)
      .withColumn("_hrank", rank)
      .withColumn("_part", spark_partition_id())
      .withColumn("_lr", row_number().over(wLocal))
      .filter(col("_lr") <= col("_quota"))
      .drop("_lr", "_part")
    val w = Window.partitionBy(col(domainCol)).orderBy(col("_hrank"), col(idCol))
    pruned.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= col("_quota"))
      .drop("_rank", "_hrank", "_quota")
  }

  /**
   * Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006,
   * the A-Res scheme): per stratum keep the `n` rows with the highest
   * key u^(1/w) — equivalently ln(u)/w, the form both engines evaluate —
   * where u is a uniform derived from md5(seed|id). Inclusion
   * probability scales with the weight (a quality score, a length, an
   * importance weight: the DSIR/CCNet selection step made exact-size and
   * deterministic), and because u is a hash, not an RNG draw, the sample
   * is reproducible across runs, partitionings, and engines, and stable
   * under appends of other strata.
   *
   * Keys are rounded to 10dp BEFORE ranking (the pageRank determinism
   * contract) so libm last-ulp differences between engines cannot flip a
   * near-tie; exact ties then break by id. Rows with NULL or
   * non-positive weight are excluded (the published scheme requires
   * w > 0).
   *
   * Scale shape: the same two-stage skew-proof election as
   * [[stratifiedExact]] — a hot stratum prunes per (stratum, input
   * partition) before the global per-stratum rank.
   */
  def weightedSample(
      df: DataFrame, stratumCol: String, idCol: String, weightCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0, "sample size must be positive")
    val internal = Seq("_wkey", "_part", "_lr", "_sample_rank")
    val clash = internal.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with weightedSample internals; rename them first")
    // u = (v + 1) / (16^12 + 1) in (0, 1]: v is the first 12 md5 hex
    // chars — exact in a double (< 2^53), identical arithmetic in DuckDB
    val v = conv(substring(md5(concat(lit(s"$seed|"),
      col(idCol).cast("string"))), 1, 12), 16, 10).cast("double")
    val key = round(log((v + 1.0d) / 281474976710657.0d)
      / col(weightCol).cast("double"), 10)
    val wLocal = Window.partitionBy(col(stratumCol), col("_part"))
      .orderBy(col("_wkey").desc, col(idCol))
    val pruned = df
      .filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_wkey", key)
      .withColumn("_part", spark_partition_id())
      .withColumn("_lr", row_number().over(wLocal))
      .filter(col("_lr") <= n)
      .drop("_lr", "_part")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("_wkey").desc, col(idCol))
    pruned.withColumn("_sample_rank", row_number().over(w))
      .filter(col("_sample_rank") <= n)
      .drop("_sample_rank", "_wkey")
  }

  /**
   * Deterministic training-order shuffle: assign every row a shard and a
   * position within it, both pure functions of (seed, id) — the global
   * read order (shard asc, shard_pos asc) is a reproducible pseudo-random
   * permutation of the corpus, independent of partitioning and cluster
   * layout. This is the shard-writer step of a training pipeline: examples
   * must be well-shuffled so consecutive records are near-iid, yet the
   * order must be replayable for checkpoint-resume.
   *
   * shard = first 6 md5 hex chars mod nShards (uniform, so shards are
   * balanced to ~±3·sqrt(n/nShards)); shard_pos ranks the full hash within
   * the shard. ONE Exchange (the per-shard window) at any corpus size —
   * a global total-order sort would also work but pays a range-exchange
   * plus skew sensitivity; per-shard ranking is the same permutation
   * read shard-major. Downstream: `df.repartitionByRange($"shard")`
   * + `sortWithinPartitions("shard_pos")` + partitioned write.
   */
  def assignShards(
      df: DataFrame, idCol: String, nShards: Int, seed: Long = 42L): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val internal = Seq("_hrank", "shard", "shard_pos")
    val clash = internal.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with assignShards outputs; rename them first")
    val h = md5(concat(lit(s"$seed|"), col(idCol).cast("string")))
    val shard = pmod(conv(substring(h, 1, 6), 16, 10).cast("long"), lit(nShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("_hrank"), col(idCol))
    df.withColumn("_hrank", h)
      .withColumn("shard", shard)
      .withColumn("shard_pos", row_number().over(w).cast("long"))
      .drop("_hrank")
  }

  /**
   * Deterministic train/validation/test split — the holdout assignment
   * that must NEVER move when the corpus is re-read, appended to, or
   * re-partitioned (a drifting split leaks eval rows into training):
   * u = first-8-hex-chars of md5(seed || '|' || id) / 2³², a uniform
   * [0, 1) draw that is a pure function of the id, and the row lands in
   * the first split whose cumulative fraction exceeds u. Appending new
   * rows re-draws nothing; changing `fractions` only reassigns rows
   * whose u crosses a moved boundary (the standard hash-split stability
   * property). Fractions must sum to ~1 (±1e-9). Pure narrow projection
   * — no shuffle, no state; the split of 100 TB costs one scan.
   * Output: input columns + u (6dp) + split.
   */
  def splitAssign(df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed: Long = 42L): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val clash = Seq("u", "split").filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with splitAssign outputs; rename them first")
    val h = md5(concat(lit(s"$seed|"), col(idCol).cast("string")))
    val u = conv(substring(h, 1, 8), 16, 10).cast("double") / lit(4294967296.0)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    // the last branch is an unconditional otherwise: cumulative float
    // rounding must not leave u = 0.999999... unassigned
    val split = fractions.init.zip(cum.init)
      .foldRight(lit(fractions.last._1): org.apache.spark.sql.Column) {
        case (((name, _), bound), rest) => when(col("u") < bound, name).otherwise(rest)
      }
    df.withColumn("u", round(u, 6))
      .withColumn("split", split)
  }

  /**
   * Temperature-scaled domain sampling — the Pile/mT5 mixing rule
   * between [[mixtureSample]]'s explicit targets and
   * [[balancedSample]]'s full equalization: keep domain d in
   * proportion to n_d^(1/T). T = 1 reproduces the natural mix, T → ∞
   * approaches balanced, T ∈ (1, 5] is the published range that stops
   * a dominant crawl from drowning minority languages without
   * flattening real frequency signal. Quotas are derived FROM the
   * data (quota_d = floor(w_d · min_e(n_e / w_e)) with
   * w_d = n_d^(1/T) — the mixtureSample feasibility rule, so the
   * largest-quota domain is taken in full and nothing needs
   * replacement), rows elected by the family's md5(seed|id) rank.
   * Same shapes throughout: #domains-row quota frame broadcast,
   * 1-row min subtree, two-stage skew-proof take.
   * Output: input columns, quota_d rows per domain.
   */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
      temperature: Double, seed: Long = 42L): DataFrame = {
    require(temperature >= 1.0 && temperature <= 100.0,
      s"temperature must be in [1, 100]: $temperature")
    val internal = Seq("_w", "_n", "_r", "_quota", "_hrank", "_part",
      "_lr", "_rank")
    val clash = internal.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with temperatureSample internals; rename them first")
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("_n"))
    val perDomain = counts
      .withColumn("_w", pow(col("_n"), lit(1.0 / temperature)))
      .withColumn("_r", col("_n") / col("_w"))
    val rmin = perDomain.agg(min(col("_r")).as("_rmin"))
    // +1e-9 before floor: the argmin domain's quota is w·(n/w) = n
    // EXACTLY in algebra, but float division can land it a few ulps
    // under the integer and floor would silently drop that domain's
    // last row (found by the kept-whole invariant; sqrt(7)·(7/sqrt(7))
    // computes to 6.999...). The epsilon restores exact-integer
    // products; genuinely fractional quotas move only within 1e-9.
    val quotas = perDomain.crossJoin(rmin)
      .select(col(domainCol),
        floor(col("_w") * col("_rmin") + lit(1e-9)).cast("long")
          .as("_quota"))
    val rank = md5(concat(lit(s"$seed|"), col(idCol).cast("string")))
    val wLocal = Window.partitionBy(col(domainCol), col("_part"))
      .orderBy(col("_hrank"), col(idCol))
    val pruned = df.join(broadcast(quotas), domainCol)
      .withColumn("_hrank", rank)
      .withColumn("_part", spark_partition_id())
      .withColumn("_lr", row_number().over(wLocal))
      .filter(col("_lr") <= col("_quota"))
      .drop("_lr", "_part")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("_hrank"), col(idCol))
    pruned.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= col("_quota"))
      .select(df.columns.map(col): _*) // restore the caller's column order
  }

  /**
   * Class-balanced downsample — the imbalance fix before training a
   * classifier on skewed labels (a 10:1 language mix trains a model
   * that answers "en" to everything; [[mixtureSample]] hits TARGET
   * shares, this one equalizes): every class keeps exactly
   * min(smallest class size, cap) rows, chosen as the lowest
   * md5(seed || '|' || id) within the class with id tiebreak — the
   * deterministic-rank contract of the whole sampling family
   * (reproducible across runs/layouts, stable under reordering,
   * replayable in any engine with md5).
   *
   * The target size is DATA-dependent (the min class count) and stays
   * distributed: a 1-row aggregate subtree joined in (AQE broadcasts),
   * never a driver collect. Same two-stage skew-proof take as
   * [[stratifiedExact]] — the local prune uses `cap` (a static upper
   * bound on the final target), so a hot class never funnels through
   * one window task.
   * Output: input columns, up to target rows per class.
   */
  def balancedSample(df: DataFrame, classCol: String, idCol: String,
      cap: Int = Int.MaxValue, seed: Long = 42L): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val internal = Seq("_hrank", "_part", "_lr", "_rank", "_target")
    val clash = internal.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with balancedSample internals; rename them first")
    val target = df.groupBy(col(classCol)).agg(count(lit(1)).as("_n"))
      .agg(least(min("_n"), lit(cap.toLong)).as("_target"))
    val rank = md5(concat(lit(s"$seed|"), col(idCol).cast("string")))
    val wLocal = Window.partitionBy(col(classCol), col("_part"))
      .orderBy(col("_hrank"), col(idCol))
    val pruned =
      (if (cap == Int.MaxValue) df.withColumn("_hrank", rank)
       else df.withColumn("_hrank", rank)
         .withColumn("_part", spark_partition_id())
         .withColumn("_lr", row_number().over(wLocal))
         .filter(col("_lr") <= cap)
         .drop("_lr", "_part"))
    val w = Window.partitionBy(col(classCol))
      .orderBy(col("_hrank"), col(idCol))
    pruned
      .withColumn("_rank", row_number().over(w))
      .crossJoin(target)
      .filter(col("_rank") <= col("_target"))
      .drop("_rank", "_hrank", "_target")
  }

  /**
   * Leakage-safe train/val/test split — [[splitAssign]] keyed by a
   * LEAK KEY instead of the row id: every row sharing the key (a
   * content hash, a near-dup cluster id, a user id) lands in the SAME
   * split, closing the evaluation leak an id-keyed split silently
   * opens (a test document whose duplicate sits in train is a
   * memorized answer, not a held-out one — the cross-split
   * contamination the decontamination tier checks for is PREVENTED
   * here at split time). Same md5(seed|key) hash family, so the split
   * is reproducible, append-stable, and SQL-replayable; fractions then
   * hold over KEYS, not rows (a giant duplicate cluster pulls its
   * whole mass to one side — that is the point, and the caller reads
   * actual row shares from the output). Output: input columns + u
   * (the key's uniform draw, 6dp) + split.
   */
  def leakageSafeSplit(df: DataFrame, leakKey: org.apache.spark.sql.Column,
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed: Long = 42L): DataFrame = {
    require(!df.columns.contains("_leak_key"),
      "input column _leak_key collides; rename it first")
    splitAssign(df.withColumn("_leak_key", leakKey.cast("string")),
        "_leak_key", fractions, seed)
      .drop("_leak_key")
  }

  /**
   * Leakage-safe k-fold cross-validation assignment — the CV sibling of
   * [[leakageSafeSplit]]: every row sharing `leakKey` (a content hash,
   * a near-dup cluster id, a user id) lands in the SAME fold, so no
   * fold's held-out set ever contains a duplicate of another fold's
   * training data (duplicates straddling folds inflate every CV score
   * the same way a leaky train/test split does). fold =
   * least(⌊u·k⌋, k−1) over the same md5(seed|key) uniform the split
   * family uses — a pure narrow function of the row: reproducible,
   * append-stable (new rows never move old rows between folds), and
   * SQL-replayable. The ⌊u·k⌋ clamp puts u = 0.999999… (u is the
   * family's 6dp-rounded draw, so exactly 1.0 after rounding is
   * possible) in the last fold instead of a phantom fold k. Folds are
   * hash-balanced, not exact-count (exact-count would need a global
   * rank — unbounded state, and append-instability — for a balance
   * gain CV never needs). Output: input columns + u (6dp) + fold.
   */
  def kfoldAssign(df: DataFrame, leakKey: org.apache.spark.sql.Column,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k >= 2, s"k must be >= 2 folds, got $k")
    val clash = Seq("u", "fold", "_leak_key").filter(df.columns.contains)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with kfoldAssign " +
        "internals; rename them first")
    val h = md5(concat(lit(s"$seed|"), leakKey.cast("string")))
    val u = round(
      conv(substring(h, 1, 8), 16, 10).cast("double") / lit(4294967296.0),
      6)
    df.withColumn("u", u)
      .withColumn("fold",
        least(floor(col("u") * k), lit(k - 1)).cast("int"))
  }

  /**
   * Crawl-budget quota allocation — largest-remainder apportionment
   * (Hamilton's method) of a global `budget` across domains in
   * proportion to their row counts: base_d = ⌊budget·n_d/N⌋, then the
   * leftover units go one each to the largest fractional remainders
   * (ties to the lexicographically first domain — deterministic), so
   * **Σ quota_d == budget EXACTLY** — the invariant a proportional
   * float-rounding allocation silently breaks and a crawl scheduler
   * (or a mixture-sampling budget) cannot tolerate breaking. A quota
   * may exceed n_d when budget > N (apportionment allocates BUDGET,
   * not rows; cap downstream if fetching less than quota is
   * meaningless). Shape: one domain count aggregation, 1-row total
   * subtrees, and a [[DistScan]] rank over the remainders (web-crawl
   * domain tables run to the millions — a partition-less row_number
   * would sort them in one task). Output: domain, n, quota.
   */
  def allocateQuota(df: DataFrame, domainCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val counts = df.groupBy(col(domainCol).cast("string").as("domain"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.groupBy().agg(sum("n").cast("double").as("_tot"))
    val based = counts.crossJoin(tot)
      .withColumn("_raw", lit(budget.toDouble) * col("n") / col("_tot"))
      .withColumn("_base", floor(col("_raw")))
      .withColumn("_rem", col("_raw") - col("_base"))
    val leftover = based.groupBy()
      .agg((lit(budget) - sum("_base")).as("_left"))
    DistScan.prefixRank(based.crossJoin(leftover),
        Seq(col("_rem").desc, col("domain").asc), "_rk")
      .select(col("domain"), col("n"),
        (col("_base") + when(col("_rk") <= col("_left"), 1L)
          .otherwise(0L)).cast("long").as("quota"))
  }

  /**
   * Deterministic negative sampling — the contrastive-training prep
   * step (retrieval / embedding training wants k "random" corpus items
   * per (query, positive) pair that are NOT the positive): negatives
   * are drawn by the family's md5 hash — slot j of query q picks the
   * corpus item at dense rank md5(seed|q|j) mod N — so the draw is
   * uniform over the corpus, reproducible across runs and cluster
   * layouts, and replayable in SQL. A draw that lands ON the positive
   * advances one rank (mod N) — deterministic rejection, never a
   * dropped slot; duplicate negatives ACROSS slots are kept (uniform
   * sampling with replacement — the standard in-batch-negatives
   * regime; dedup downstream if a without-replacement set is wanted).
   *
   * Shape at scale: the corpus gets a dense rank by ONE distributed
   * sort (`row_number` bounded inside range partitions via
   * repartitionByRange — Spark plans a global Window here; the sort is
   * the honest cost and runs ONCE, cacheable across epochs), pairs
   * explode k slots (narrow), one join against the rank table on the
   * drawn rank + one on the positive's id — both plain equi-joins.
   * Output: query, positive, slot, negative.
   */
  def negativeSample(pairs: DataFrame, queryCol: String, posCol: String,
      corpus: DataFrame, corpusIdCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    require(k >= 1 && k <= 1024, s"k must be in [1,1024]: $k")
    // contiguous 0-based index over the DISTINCT corpus: a DistScan rank
    // (the corpus is data-scale — a partition-less row_number would sort
    // it in one task)
    // pinned (r19): the ranked frame is read THREE times below (the _n
    // count, the positive-rank join, the negative lookup join) and each
    // unpinned reference re-ran the whole rank scan (profiled: six ~5 s
    // task-time stages re-reading the same shuffle). (_cid, _rank) is
    // 2 narrow columns per distinct corpus id; Ops-scope release.
    val ranked = CacheScope.track(DistScan.prefixRank(
        corpus.select(col(corpusIdCol).cast("string").as("_cid")).distinct(),
        Seq(col("_cid")), "_rank")
      .withColumn("_rank", col("_rank") - 1))
    val n = ranked.groupBy().agg(count(lit(1)).as("_n"))
    val slots = pairs.select(col(queryCol).cast("string").as("query"),
        col(posCol).cast("string").as("positive"))
      .crossJoin(n)
      .select(col("query"), col("positive"), col("_n"),
        explode(array((0 until k).map(j => lit(j)): _*)).as("slot"))
      .withColumn("_draw",
        pmod(conv(substring(md5(concat(lit(s"$seed|"), col("query"),
          lit("|"), col("slot").cast("string"))), 1, 12), 16, 10)
          .cast("long"), col("_n")))
    // the positive's own rank, to reject collisions deterministically
    val withPos = slots.join(
      ranked.select(col("_cid").as("positive"), col("_rank").as("_prank")),
      Seq("positive"), "left")
    val adjusted = withPos.withColumn("_pick",
      when(col("_draw") === col("_prank"),
        pmod(col("_draw") + 1, col("_n"))).otherwise(col("_draw")))
    adjusted.join(ranked.select(col("_rank").as("_pick"),
        col("_cid").as("negative")), Seq("_pick"))
      .select(col("query"), col("positive"), col("slot").cast("long")
        .as("slot"), col("negative"))
  }

  /**
   * 2-D Pareto front (skyline, Börzsönyi et al. 2001) — the
   * multi-criteria data-selection cut (keep documents no other document
   * beats on BOTH quality and brevity; pick the price/quantity frontier):
   * a row survives iff no other row is ≥ on both columns and > on at
   * least one (both maximized; negate a column to minimize it). Duplicate
   * frontier points all survive (neither dominates the other).
   * Shape: only the per-x maximum can be on the front, so ONE groupBy to
   * the distinct-x frame, a [[DistScan]] distributed prefix max over it
   * (running max of y over strictly-greater x — with continuous x the
   * distinct frame is the data, so the older single-partition walk was
   * the latent hot partition), and a semi-join back on (x, y). Output:
   * the surviving input rows, unchanged schema.
   */
  def paretoFront(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val fx = col(xCol).cast("double")
    val fy = col(yCol).cast("double")
    val perX = df.filter(fx.isNotNull && fy.isNotNull)
      .groupBy(fx.as("_x")).agg(max(fy).as("_my"))
    // running max over STRICTLY greater x: one row per distinct x
    val front = DistScan.prefixMax(perX, Seq(col("_x").desc),
        col("_my"), "_gm", inclusive = false)
      .filter(col("_gm").isNull || col("_my") > col("_gm"))
      .select(col("_x"), col("_my"))
    df.join(front, fx === col("_x") && fy === col("_my"), "left_semi")
  }

  /**
   * Token-budget greedy corpus selection — the data-recipe cut "keep the
   * best documents until the token budget is spent" (quality-classifier
   * scores feed it; FineWeb-Edu's threshold sweep is this with a fixed
   * budget): documents rank by (score DESC, id ASC) and are kept while
   * the running cost total stays within `budget` — exact greedy, the
   * LP-relaxation optimum of the knapsack when items are small relative
   * to the budget.
   *
   * Distributed shape — the naive form is ONE global cumulative-sum
   * window (a single-partition sort, the anti-pattern), and the earlier
   * two-phase form (distinct-score walk + per-score tie window) was
   * skew-proof only when scores were continuous AND ties were small:
   * with the QUANTIZED scores real recipes use (FineWeb-Edu int 0–5)
   * one score group IS the corpus — a single-task tie window — while
   * continuous classifier scores make the distinct-score frame itself
   * data-scale. This form has neither mode: the classic distributed
   * prefix scan, shared as [[DistScan.prefixSums]] with the whole
   * running-total family (ROC AUC, KS, Mann-Whitney, Spearman, BH-FDR,
   * RFM). Rows bucket by a deterministic range function of the greedy
   * order's leading key (bucket index monotone in `(score DESC, id)`),
   * each bucket cumulates independently (balanced ~n/P rows, never a
   * whole score group), and bucket totals prefix-merge over ONE carry
   * row per bucket (a bucket-count-bounded frame, the ksTest precedent)
   * broadcast back as offsets. Bucket boundaries only decide WHICH
   * bucket a row cumulates in — offset + within reconstructs the same
   * global prefix for any split. One honest envelope: costs are DOUBLES,
   * and double addition re-associates across buckets, so cum_cost can
   * wobble at ulp scale vs the naive single-window order; `selected`
   * therefore compares the 4dp-ROUNDED running total against the budget
   * (the repo's cusum rounding rule), so a boundary change can never
   * flip a selection by reassociation alone. (Integral costs are exact
   * at any split — the oracle gate replays bit-identical.)
   * Output: every input row + cum_cost (its position's inclusive
   * running total under the greedy order) + selected. Rows with a null
   * score carry no greedy position and are dropped (the prior
   * construction's join-on-score behavior, now explicit).
   */
  def selectByBudget(df: DataFrame, idCol: String, scoreCol: String,
      costCol: String, budget: Double): DataFrame = {
    require(budget >= 0, s"budget must be >= 0: $budget")
    val internal = Seq("_s", "_c", "_p", "_run", "_pt", "_off")
    require(!internal.contains(idCol),
      s"id column $idCol collides with selectByBudget internals")
    val base = df.select(col(idCol), col(scoreCol).cast("double").as("_s"),
        col(costCol).cast("double").as("_c"))
      .filter(col("_s").isNotNull)
    // the shared DistScan skeleton (null costs add nothing — zero-
    // coalesced inside the scan; the echoed cost column stays raw)
    DistScan.prefixSums(base, Seq(col("_s").desc, col(idCol).asc),
        Seq((col("_c"), "cum_cost")), inclusive = true)
      .select(col(idCol), col("_s").as(scoreCol), col("_c").as(costCol),
        col("cum_cost"))
      .withColumn("selected", round(col("cum_cost"), 4) <= budget)
  }

  /**
   * Per-domain token-budget LEDGER — the accounting artifact a recipe
   * pipeline reads each refresh, where [[selectByBudget]] answers
   * "which documents" and [[mixtureSample]] "which counts": every
   * domain gets an ALLOCATED token budget, fills it greedily in the
   * deterministic md5-rank order (the [[mixtureSample]] draw — a
   * budget ledger meters an unbiased sample of each domain, not its
   * longest documents), and the ledger reports allocated vs REALIZED
   * vs CARRYOVER per domain: how much of the allocation this refresh
   * could actually cover, and how much rolls forward because the
   * domain ran out of documents (realized < allocated with every doc
   * selected) — the under-served-domain signal a mixture rebalance
   * consumes. Domains present in the data but absent from
   * `allocations` are reported with allocated = 0 and nothing
   * selected (an unallocated domain showing realizable mass is a
   * finding, not a silent drop).
   *
   * Selection rule: a document is selected while the running cost
   * total AFTER it stays within the allocation (4dp-rounded compare,
   * the [[selectByBudget]] reassociation guard) — the same greedy
   * prefix rule, per domain.
   *
   * Scale shape: one domain-keyed cumulative window over the corpus +
   * one domain aggregation. The window partitions by DOMAIN, so a
   * single dominant domain is a hot partition — the documented
   * trade-off vs [[selectByBudget]]'s global [[DistScan]] scan; for a
   * corpus that is effectively one domain, run selectByBudget per
   * domain slice instead. Output: one row per domain — domain,
   * allocated, n_docs, n_selected, realized (4dp), carryover (4dp),
   * utilization (4dp), exhausted (every doc selected and the
   * allocation still not met).
   */
  def budgetLedger(df: DataFrame, domainCol: String, idCol: String,
      costCol: String, allocations: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    require(allocations.values.forall(_ >= 0.0),
      "allocations must be non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val alloc = allocations.toSeq.sortBy(_._1)
      .toDF(domainCol, "_alloc")
    val rank = md5(concat(lit(s"$seed|"), col(idCol).cast("string")))
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col("_hrank"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = df
      .select(col(domainCol), col(idCol),
        col(costCol).cast("double").as("_c"))
      .filter(col("_c").isNotNull)
      .join(broadcast(alloc), Seq(domainCol), "left")
      .withColumn("_hrank", rank)
      .withColumn("_cum", sum(col("_c")).over(w))
      .withColumn("_sel",
        round(col("_cum"), 4) <= coalesce(col("_alloc"), lit(0.0)))
    cum.groupBy(col(domainCol).as("domain"))
      .agg(round(max(coalesce(col("_alloc"), lit(0.0))), 4)
          .as("allocated"),
        count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("_sel"), 1L).otherwise(0L)), lit(0L))
          .as("n_selected"),
        round(coalesce(sum(when(col("_sel"), col("_c"))
          .otherwise(lit(0.0))), lit(0.0)), 4).as("realized"))
      .select(col("domain"), col("allocated"), col("n_docs"),
        col("n_selected"), col("realized"),
        round(col("allocated") - col("realized"), 4).as("carryover"),
        round(when(col("allocated") > 0,
          col("realized") / col("allocated")).otherwise(lit(0.0)), 4)
          .as("utilization"),
        (col("n_selected") === col("n_docs") &&
          col("realized") < col("allocated")).cast("long")
          .as("exhausted"))
  }
}
