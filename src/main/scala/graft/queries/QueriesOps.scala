package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ebw.{DesignMatrix, EbwOptions, EntropyBalance, GroupedEntropyBalance}
import graft.ops.{Dedup, Similarity, Skew, TextMetrics}
import graft.QShared._

/** ops-module gates (behavior, intervals, snapshots, sampling, layout, linkage, validation) — one `queries` entry per gate with its DuckDB oracle in
 * `oracles` (same names, same column aliases, same rounding; the
 * SparkEntry contract). Split out of the SparkEntry monolith so an
 * edit to one family can never touch another family's oracle text. */
private[graft] object QueriesOps {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_curation" -> ((s, dir) => {
      // the FULL curation pipeline as one gate (Curate.curateCorpus):
      // C4 rules -> gopher keep -> exact dedup -> minhash near-dup drop
      // -> quality score -> mixture sample -> packBins, every stage
      // individually gated elsewhere and composed here end-to-end. The
      // corpus gets the c4 gate's sentence spike (so C4 verdicts
      // split), one exact copy of every doc (exact-dedup victims) and
      // one near-dup copy with an extra kept line (minhash victims) —
      // every stage provably drops something on the way to the packed
      // artifact
      val docsRaw = t(s, dir, "documents").select("doc_id", "text",
        "source")
      val spiked = docsRaw.select(col("doc_id"), col("source"),
        concat(col("text"), lit(".\n"),
          when(col("doc_id") % 4 === 0,
              lit("click here javascript required."))
            .when(col("doc_id") % 4 === 1, lit("short line"))
            .when(col("doc_id") % 4 === 2,
              lit("read our privacy policy and terms of use."))
            .otherwise(lit(
              "a perfectly fine second sentence with many words in it.")),
          lit("\n"),
          when(col("doc_id") % 7 === 0,
              lit("Lorem Ipsum dolor { sit amet"))
            .otherwise(lit(
              "and a third closing sentence follows right here today!")))
          .as("text"))
      val exactDups = spiked.select((col("doc_id") + 1000000).as("doc_id"),
        col("source"), col("text"))
      val nearDups = spiked.select((col("doc_id") + 2000000).as("doc_id"),
        col("source"),
        concat(col("text"), lit(
          "\nfive extra trailing filler words follow right here today."))
          .as("text"))
      val corpus = spiked.unionByName(exactDups).unionByName(nearDups)
      val coeffs = s.range(64).select(col("id").as("b"),
        (((col("id") % 7) - 3) / lit(10.0)).as("w"))
      val weights = (0 until 20).map(i => (s"src$i", 1.0 + i % 4)).toMap
      graft.ops.Curate.curateCorpus(corpus, "text", "doc_id", "source",
          coeffs, intercept = -0.5, buckets = 64, minQuality = 0.5,
          weights, packBudget = 256, nShards = 8,
          maxBucketSize = ngramMaxBucket)
        .orderBy("doc_id")
    }),
    "q_asof_join" -> ((s, dir) => {
      // attribution: each click matched to the user's latest at-or-before
      // view (backward as-of join; union-window plan, no inequality join)
      val ev = eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.ops.AsOf.joinBackward(clicks, views, "user_id", "ts", "ts",
          "event_id", Seq("value"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          round(col("asof_value"), 2).as("view_value"))
        .orderBy("click_id")
    }),
    "q_asof_bucketed" -> ((s, dir) => {
      // skew-hardened as-of: same attribution semantics under a 30-minute
      // tolerance, window split into (user, 1-hour bucket) partitions so a
      // hot user never funnels through one task. Times stay integral
      // epoch-micros on both engines (== DuckDB's epoch_us).
      val ev = eventsTsUs(s, dir).withColumnRenamed("ts_us", "us")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("us"), col("value"))
      graft.ops.AsOf.joinBackwardBucketed(clicks, views, "user_id", "us", "us",
          "event_id", Seq("value"),
          bucketWidth = 3600000000L, tolerance = 1800000000L)
        .select(col("event_id").as("click_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          round(col("asof_value"), 2).as("view_value"))
        .orderBy("click_id")
    }),
    "q_stratified_sample" -> ((s, dir) => {
      // deterministic md5-ranked stratified sample: exact 50 orders per
      // priority, reproducible across engines and cluster layouts
      val orders = t(s, dir, "orders")
      graft.ops.Sampling.stratifiedExact(orders, "o_orderpriority",
          "o_orderkey", n = 50)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy("o_orderkey")
    }),
    "q_temperature_sample" -> ((s, dir) => {
      // T=2 temperature mixing over languages: quotas proportional to
      // sqrt(n_d), smallest domain taken in full — between the natural
      // mix and full balance
      val d = t(s, dir, "documents")
      graft.ops.Sampling.temperatureSample(d, "lang", "doc_id",
          temperature = 2.0)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    "q_balanced_sample" -> ((s, dir) => {
      // class-balanced downsample: every language keeps exactly the
      // smallest language's row count, md5-ranked; the target is a
      // 1-row aggregate subtree, never a driver collect
      val d = t(s, dir, "documents")
      graft.ops.Sampling.balancedSample(d, "lang", "doc_id")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),
    "q_dwell" -> ((s, dir) => {
      // dwell-time profile: per-event-type gap-to-next-action stats
      // (censored last events drop); one user-keyed lead window + one
      // type aggregation with exact percentiles
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.dwellTimes(ev, "user_id", "ts_us", "event_type")
        .orderBy("event_type")
    }),
    "q_select_budget" -> ((s, dir) => {
      // token-budget greedy selection: planted integer scores (heavy
      // ties — the boundary group is what the distinct-walk + per-group
      // cumsum construction exists for) and integral costs (so the
      // two-phase float addition is bit-identical to the oracle's naive
      // global window); budget 1000 cuts mid-corpus at every SF
      val d = t(s, dir, "documents").select(col("doc_id"),
        (col("doc_id") % 7).cast("double").as("score"),
        (lit(1) + col("doc_id") % 13).cast("double").as("cost"))
      graft.ops.Sampling.selectByBudget(d, "doc_id", "score", "cost",
          budget = 1000.0)
        .orderBy("doc_id")
    }),
    "q_budget_ledger" -> ((s, dir) => {
      // per-domain token-budget ledger: integral costs (exact window
      // sums), allocations cycling 100..500 over 15 of the 20 sources
      // so the artifact shows every regime — domains cut mid-fill
      // (carryover from an unfinished allocation), EXHAUSTED domains
      // (every doc selected, allocation unmet — the under-served
      // signal), and unallocated-but-present domains (allocated 0,
      // nothing selected, realizable mass visible in n_docs)
      val d = t(s, dir, "documents").select(col("source"), col("doc_id"),
        (lit(1) + col("doc_id") % 13).cast("double").as("cost"))
      val allocs = (0 until 15)
        .map(i => (s"src$i", (i % 5 + 1) * 100.0)).toMap
      graft.ops.Sampling.budgetLedger(d, "source", "doc_id", "cost",
          allocs)
        .orderBy("domain")
    }),
    "q_mixture_sample" -> ((s, dir) => {
      // domain-mixture realization at max corpus usage: weights cycle 1..4
      // over the sources, so the heaviest-weighted present source pins
      // T = min(n/w) and quotas land on floor(w * T) — the md5 election
      // inside each source is the stratifiedExact rule
      val weights = (0 until 20).map(i => (s"src$i", 1.0 + i % 4)).toMap
      graft.ops.Sampling.mixtureSample(
          t(s, dir, "documents"), "source", "doc_id", weights)
        .select(col("source"), col("doc_id"))
        .orderBy("source", "doc_id")
    }),
    "q_shard_assign" -> ((s, dir) =>
      // deterministic training-order shuffle: shard + position are pure
      // functions of (seed, id), so the (shard, shard_pos) read order is
      // an engine-independent permutation of the corpus
      graft.ops.Sampling.assignShards(
          t(s, dir, "orders").select("o_orderkey"), "o_orderkey", nShards = 8)
        .select(col("shard"), col("shard_pos"), col("o_orderkey"))
        .orderBy("shard", "shard_pos")),
    "q_fs_weights" -> ((s, dir) => {
      // Fellegi–Sunter m/u estimation on a labeled pair deck:
      // consecutive-custkey pairs, "match" = same nation (the planted
      // truth), agreement fields = segment / acctbal 1k-band / balance
      // sign — the probabilistic-linkage weight table the Census
      // matchers threshold on
      val c = t(s, dir, "customer")
      val a = c.select(col("c_custkey").as("k"),
        col("c_nationkey").as("na"), col("c_mktsegment").as("sa"),
        floor(col("c_acctbal") / 1000).as("ba"),
        (col("c_acctbal") >= 0).as("pa"))
      val b = c.select((col("c_custkey") - 1).as("k"),
        col("c_nationkey").as("nb"), col("c_mktsegment").as("sb"),
        floor(col("c_acctbal") / 1000).as("bb"),
        (col("c_acctbal") >= 0).as("pb"))
      val pairs = a.join(b, Seq("k"))
        .select((col("na") === col("nb")).as("is_match"),
          (col("sa") === col("sb")).as("seg"),
          (col("ba") === col("bb")).as("bal_band"),
          (col("pa") === col("pb")).as("bal_sign"))
      graft.ops.Linkage.fellegiSunter(pairs, "is_match",
        Seq("seg", "bal_band", "bal_sign"))
        .orderBy("field")
    }),
    "q_fs_em" -> ((s, dir) => {
      // unsupervised Fellegi–Sunter: the q_fs_weights deck WITHOUT the
      // label — EM fits (p, m_f, u_f) as a two-class mixture over the
      // 2^3 agreement patterns, 10 deterministic rounds from the
      // canonical (0.1, 0.9, 0.1) start; the oracle unrolls the
      // identical arithmetic
      val c = t(s, dir, "customer")
      val a = c.select(col("c_custkey").as("k"),
        col("c_mktsegment").as("sa"),
        floor(col("c_acctbal") / 1000).as("ba"),
        (col("c_acctbal") >= 0).as("pa"))
      val b = c.select((col("c_custkey") - 1).as("k"),
        col("c_mktsegment").as("sb"),
        floor(col("c_acctbal") / 1000).as("bb"),
        (col("c_acctbal") >= 0).as("pb"))
      val pairs = a.join(b, Seq("k"))
        .select((col("sa") === col("sb")).as("seg"),
          (col("ba") === col("bb")).as("bal_band"),
          (col("pa") === col("pb")).as("bal_sign"))
      graft.ops.Linkage.fellegiSunterEm(pairs,
          Seq("seg", "bal_band", "bal_sign"), iters = 10)
        .orderBy("field")
    }),
    "q_blocking_quality" -> ((s, dir) => {
      // blocking-quality readout BEFORE paying for comparisons:
      // (mktsegment × acctbal 1k-band) blocks over customers, truth =
      // the q_fs_weights deck's same-nation consecutive pairs; RR and
      // PC from aggregates only — no candidate pair is ever enumerated
      val c = t(s, dir, "customer")
        .withColumn("bal_band", floor(col("c_acctbal") / 1000))
      val a = c.select(col("c_custkey").as("k"),
        col("c_nationkey").as("na"))
      val b = c.select((col("c_custkey") - 1).as("k"),
        col("c_custkey").as("kb"), col("c_nationkey").as("nb"))
      val truth = a.join(b, Seq("k"))
        .filter(col("na") === col("nb"))
        .select(col("k").as("id_a"), col("kb").as("id_b"))
      graft.ops.Linkage.blockingQuality(c, "c_custkey",
        Seq("c_mktsegment", "bal_band"), truth, "id_a", "id_b")
    }),
    "q_fuzzy_join" -> ((s, dir) =>
      // blocked fuzzy record linkage: TPC-H customer names differ only in
      // their numeric suffix, so nation-blocked pairs within 2 edits are a
      // dense, deterministic match set; the oracle (full block-square
      // levenshtein) verifies the deletion-neighborhood candidate index
      // and the thresholded DP kernel change nothing — the FastSS path
      // is what keeps candidate enumeration linear when blocks grow with
      // the corpus (sf1 evidence in SURVEY §6)
      graft.ops.Linkage.fuzzySelfJoin(t(s, dir, "customer"),
          Seq("c_nationkey"), "c_name", "c_custkey", maxDist = 2,
          method = "delete")
        .select(col("id_a"), col("id_b"), col("c_nationkey"),
          col("dist").cast("long").as("dist"))
        .orderBy("id_a", "id_b")),
    "q_zorder" -> ((s, dir) =>
      // Morton interleave of two uncorrelated key projections — the sort
      // key behind clusterByZ's layout pass; the oracle recomputes the
      // bit arithmetic as plain integer shifts
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          graft.ops.Layout.zValue(
            Seq(pmod(col("o_custkey"), lit(256L)),
              pmod(col("o_orderkey"), lit(256L))), 8).as("zval"))
        .orderBy("zval", "o_orderkey")),
    "q_hilbert" -> ((s, dir) =>
      // Hilbert sort key over the same two projections as q_zorder —
      // the adjacency-preserving curve clusterByHilbert lays files by;
      // the oracle replays the 8-level rotate/reflect fold as
      // MATERIALIZED CTE rounds (same linearization as the engine's
      // named-column fold)
      graft.ops.Layout.withHilbert(
          t(s, dir, "orders").select(col("o_orderkey"),
            pmod(col("o_custkey"), lit(256L)).as("_qx"),
            pmod(col("o_orderkey"), lit(256L)).as("_qy")),
          col("_qx"), col("_qy"), bits = 8)
        .select(col("o_orderkey"), col("hval"))
        .orderBy("hval", "o_orderkey")),
    "q_asof_forward" -> ((s, dir) => {
      // the mirror as-of direction: each click matched to the user's
      // EARLIEST at-or-after view (next-event semantics; same union-
      // window plan, forward frame, smallest-id ties)
      val ev = eventsTsUs(s, dir)
        .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.ops.AsOf.joinForward(clicks, views, "user_id", "ts", "ts",
          "event_id", Seq("value"))
        .select(col("event_id").as("click_id"), col("user_id"),
          col("asof_event_id").as("view_id"),
          round(col("asof_value"), 2).as("view_value"))
        .orderBy("click_id")
    }),
    "q_attribution" -> ((s, dir) => {
      // last-touch attribution: each purchase credits the user's most
      // recent view/click/signup within 2h — one user-keyed window,
      // unattributed conversions stay as NULL-channel rows
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.lastTouchAttribution(ev, "user_id", "ts_us",
          "event_type", "event_id", conversionType = "purchase",
          channelTypes = Seq("view", "click", "signup"),
          lookbackMicros = 2L * 3600 * 1000000)
        .orderBy("event_id")
    }),
    "q_reconcile" -> ((s, dir) => {
      // bucket-checksum reconciliation: the b side drops every 97th
      // order and perturbs every 101st price — mismatched buckets
      // localize both corruptions in O(buckets) output
      val a = t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      val b = a.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 101 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      graft.ops.Validate.reconcile(a, b, "o_orderkey",
          Seq("o_orderkey", "o_totalprice", "o_orderstatus"),
          buckets = 32)
        .orderBy("bucket")
    }),
    "q_dedup_stats" -> ((s, dir) =>
      // one-row dedup run report over exact-hash clusters: corpus
      // size, duplicate fraction, largest cluster — the dashboard
      // number a silent 40%-drop pipeline owes its operators
      graft.ops.Dedup.clusterStats(
        t(s, dir, "documents").select(col("doc_id"),
          md5(col("text")).as("cluster")),
        "doc_id", "cluster")),
    "q_max_concurrent" -> ((s, dir) => {
      // peak concurrency per event type over [ts, ts + value) windows:
      // boundary sweep with ends-before-starts at the same instant,
      // one keyed running-sum window + key-level argmax
      val ev = eventsTsUs(s, dir)
      val iv = ev.select(col("event_type"), col("ts_us").as("s"),
        (col("ts_us") + floor(col("value") * 1e6).cast("long")).as("e"))
      graft.ops.Interval.maxConcurrent(iv, "event_type", "s", "e")
        .orderBy("event_type")
    }),
    "q_zone_map" -> ((s, dir) => {
      // zone-map pruning report over the q_zorder layout: 16 equal-
      // width z-value files, per-file min/max zones on the y dimension,
      // and the skip verdict for a y <= 15 reader — the measured
      // pruning rate the layout specs only assert qualitatively
      val o = t(s, dir, "orders").select(
        pmod(col("o_custkey"), lit(256L)).cast("double").as("cx"),
        pmod(col("o_orderkey"), lit(256L)).cast("double").as("cy"))
      graft.ops.Layout.zoneMapReport(o,
          Seq(("cx", 0.0, 256.0), ("cy", 0.0, 256.0)), bits = 8,
          numFiles = 16, auditCol = "cx", predLo = 0.0, predHi = 15.0)
        .orderBy("file_id")
    }),
    "q_lsh_tune" -> ((s, dir) =>
      // banding-parameter tuner for a 128-hash signature at threshold
      // 0.8: per divisor split, integrated FP/FN area of the S-curve,
      // rank 1 = the split minhashCandidatePairs should run with.
      // Data-independent arithmetic — the only gate query that reads
      // no table, because the operator's input IS the parameter space
      graft.ops.Dedup.lshTune(s, signatureLen = 128, threshold = 0.8)
        .orderBy("rank")),
    "q_adoption" -> ((s, dir) => {
      // adoption curve per event type: daily events/actives/new users +
      // cumulative uniques WITHOUT a cumulative distinct (first-day
      // marking + per-group running sum)
      val ev = eventsTsUs(s, dir)
        .withColumn("day", expr("ts_us div 86400000000"))
      graft.ops.Behavior.adoption(ev, "event_type", "user_id", "day")
        .orderBy("event_type", "day")
    }),
    "q_rfm" -> ((s, dir) =>
      // RFM quintile segmentation of customers from their orders:
      // key-level ntile windows (n_keys rows, the concentration
      // contract), ties broken by the key on both engines
      graft.ops.Behavior.rfm(
          t(s, dir, "orders").withColumn("o_ts",
            expr("unix_micros(cast(o_orderdate as timestamp)) div 1000000")),
          "o_custkey", "o_ts", "o_totalprice")
        .orderBy("o_custkey")),
    "q_geo_join" -> ((s, dir) => {
      // spatial within-150km join on deterministic key-derived
      // coordinates (lat in [-60,60), lon in [-180,180)): 3-degree
      // cells, left side exploded to its 3x3 neighborhood, equi-join on
      // the cell key — the oracle brute-forces the cross join, proving
      // the blocking lossless at gate scale
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        (pmod(col("c_custkey") * 37, lit(1200)) / 10.0 - 60.0).as("lat"),
        (pmod(col("c_custkey") * 73, lit(3600)) / 10.0 - 180.0).as("lon"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey"),
        (pmod(col("s_suppkey") * 41, lit(1200)) / 10.0 - 60.0).as("lat"),
        (pmod(col("s_suppkey") * 97, lit(3600)) / 10.0 - 180.0).as("lon"))
      graft.ops.Geo.withinDistanceJoin(
          supp, "s_suppkey", "lat", "lon",
          cust, "c_custkey", "lat", "lon",
          maxKm = 150.0, cellDeg = 3.0, maxAbsLat = 60.0)
        .orderBy("s_suppkey", "c_custkey")
    }),
    "q_corpus_diff" -> ((s, dir) => {
      // dataset-versioning diff: the new snapshot is a deterministic
      // mutation of the old (drops, edits, additions constructed from the
      // same expressions in both engines), so every status is exercised
      val d = t(s, dir, "documents")
      val oldv = d.select(col("doc_id"), col("text"))
      val newv = d.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(lit("new doc "), col("doc_id").cast("string")).as("text")))
      graft.ops.Snapshot.diff(oldv, newv, "doc_id", Seq("text"))
        .select(col("doc_id"), col("status"))
        .orderBy("doc_id")
    }),
    "q_weighted_sample" -> ((s, dir) =>
      // Efraimidis-Spirakis weighted sampling: 20 docs per language,
      // inclusion biased by document length (n_chars as the weight) —
      // exact-size, hash-deterministic, replayed key-for-key by the
      // oracle's identical ln(u)/w arithmetic
      graft.ops.Sampling.weightedSample(
          t(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "doc_id", "n_chars", n = 20)
        .orderBy("lang", "doc_id")),
    "q_corpus_upsert" -> ((s, dir) => {
      // the versioning roundtrip law as a gate: reconstruct the new
      // snapshot from old + diff + changes through the engine's
      // diff→apply path; the oracle computes the new snapshot DIRECTLY,
      // so a hash match proves applyChanges(old, diff(old,new), new)==new
      val d = t(s, dir, "documents")
      val oldv = d.select(col("doc_id"), col("text"))
      val newv = d.filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            concat(lit("new doc "), col("doc_id").cast("string")).as("text")))
      val df = graft.ops.Snapshot.diff(oldv, newv, "doc_id", Seq("text"))
      graft.ops.Snapshot.applyChanges(oldv, df, newv, "doc_id")
        .orderBy("doc_id")
    }),
    "q_interval_point" -> ((s, dir) => {
      // point-in-interval join: signup events open a value-seconds service
      // window, purchases landing inside any window are matched. Bucketed
      // equi-join (no nested loop); the oracle is DuckDB's native range
      // join over the identical micros arithmetic
      val ev = eventsTsUs(s, dir)
      val iv = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("i_id"), col("ts_us").as("i_start"),
          (col("ts_us") + floor(col("value") * 1e6).cast("long")).as("i_end"))
      val pt = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("ts_us").as("p_ts"))
      graft.ops.Interval.pointInInterval(iv, pt, "i_start", "i_end", "p_ts",
          bucketWidth = 600L * 1000 * 1000)
        .select(col("i_id"), col("p_id"),
          (col("p_ts") - col("i_start")).as("offset_us"))
        .orderBy("i_id", "p_id")
    }),
    "q_interval_overlap" -> ((s, dir) => {
      // interval-overlap join: signup windows vs error windows that share
      // any instant, with the shared-segment length; each qualifying pair
      // forms exactly once (overlap-start bucket rule), no distinct pass
      val ev = eventsTsUs(s, dir)
      def win(kind: String, p: String) = ev.filter(col("event_type") === kind)
        .select(col("event_id").as(s"${p}_id"), col("ts_us").as(s"${p}_s"),
          (col("ts_us") + floor(col("value") * 1e6).cast("long")).as(s"${p}_e"))
      graft.ops.Interval.overlapJoin(win("signup", "a"), win("error", "b"),
          "a_s", "a_e", "b_s", "b_e", bucketWidth = 600L * 1000 * 1000)
        .select(col("a_id"), col("b_id"), col("overlap").as("overlap_us"))
        .orderBy("a_id", "b_id")
    }),
    "q_resample_fill" -> ((s, dir) => {
      // time-series downsample to an hourly grid per user with gap rows
      // materialized and forward-filled — the tick→bar construction; gaps
      // dominate (sparse per-user activity over the corpus span)
      val ev = eventsTsUs(s, dir)
      graft.ops.Interval.resampleFill(ev, "user_id", "ts_us", "value",
          widthMicros = 3600L * 1000 * 1000)
        .orderBy("user_id", "bucket")
    }),
    "q_funnel" -> ((s, dir) => {
      // view→click→purchase conversion within 24h of funnel entry, greedy
      // earliest-entry matching; the oracle derives the same counts via
      // the INDEPENDENT sequential-min formulation (cross-derivation)
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.funnel(ev, "user_id", "ts_us", "event_type",
          Seq("view", "click", "purchase"), windowMicros = 86400L * 1000 * 1000)
        .orderBy("step")
    }),
    "q_cohort_retention" -> ((s, dir) => {
      // weekly cohorts by first event, activity per week offset; absent
      // (cohort, offset) rows mean zero active — not gap-filled
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.cohortRetention(ev, "user_id", "ts_us",
          widthMicros = 7L * 86400 * 1000 * 1000)
        .orderBy("cohort", "offset")
    }),
    "q_rrf_fuse" -> ((s, dir) => {
      // hybrid-retrieval fusion: BM25 shortlist ⊕ length-ranked
      // shortlist via reciprocal-rank fusion; the rank windows run on
      // 50-row LIMITed frames (tiny by construction, not a global sort)
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val bm = graft.ops.TextMetrics.bm25Scores(d, "text", "doc_id",
          Seq("query", "dup", "spark"))
        .orderBy(desc("bm25"), col("doc_id")).limit(50)
        .withColumn("rank", row_number()
          .over(Window.orderBy(desc("bm25"), col("doc_id"))).cast("long"))
      val ln = d.select(col("doc_id"), length(col("text")).as("len"))
        .orderBy(desc("len"), col("doc_id")).limit(50)
        .withColumn("rank", row_number()
          .over(Window.orderBy(desc("len"), col("doc_id"))).cast("long"))
      graft.ops.Similarity.rrfFuse(bm, ln, "doc_id")
        .orderBy(desc("rrf"), col("doc_id"))
    }),
    "q_scd2" -> ((s, dir) => {
      // SCD Type 2 history of each user's event-type state: consecutive
      // identical states suppressed, [from, to) validity bounds, NULL
      // `to` on the current version; event_id breaks equal-ts ties
      val ev = eventsTsUs(s, dir)
      graft.ops.Snapshot.scd2(ev, "user_id", "ts_us", Seq("event_type"),
          tieCols = Seq("event_id"))
        .select(col("user_id"), col("event_type"), col("effective_from"),
          col("effective_to"), col("version"), col("is_current"))
        .orderBy("user_id", "version")
    }),
    "q_scd2_asof" -> ((s, dir) => {
      // point-in-time lookup over the same history: each user's state
      // mid-corpus (2024-01-16) — one valid version per user active then
      val ev = eventsTsUs(s, dir)
      val hist = graft.ops.Snapshot.scd2(ev, "user_id", "ts_us",
        Seq("event_type"), tieCols = Seq("event_id"))
      graft.ops.Snapshot.asOf(hist, lit(1705363200000000L))
        .select(col("user_id"), col("event_type"), col("effective_from"),
          col("effective_to"), col("version"))
        .orderBy("user_id")
    }),
    "q_islands" -> ((s, dir) => {
      // gaps-and-islands: merge each event type's value-minute activity
      // windows into maximal disjoint spans (the outage/coverage merge);
      // one keyed Exchange, islands build inside their key's partition
      val ev = eventsTsUs(s, dir)
      val iv = ev.select(col("event_type"), col("ts_us").as("s_us"),
        (col("ts_us") + floor(col("value") * 60e6).cast("long")).as("e_us"))
      graft.ops.Interval.coalesceIntervals(iv, "event_type", "s_us", "e_us")
        .orderBy("event_type", "island_start")
    }),
    "q_validate" -> ((s, dir) => {
      // data-quality expectation suite as one audit frame: 4 row rules
      // in ONE scan aggregation, two key-uniqueness checks, two FK
      // checks; rules chosen so both verdicts appear (qty/discount and
      // the orders-per-customer "unique" check genuinely fail)
      import graft.ops.Validate
      val li = t(s, dir, "lineitem"); val ord = t(s, dir, "orders")
      Validate.report(
        Validate.rowRules(li, Seq(
          "li_qty_le_45" -> (col("l_quantity") > 45),
          "li_price_positive" -> (col("l_extendedprice") <= 0),
          "li_discount_cap" -> (col("l_discount") > 0.08),
          "li_shipdate_present" -> col("l_shipdate").isNull)),
        Validate.uniqueKey(li, Seq("l_orderkey", "l_linenumber"),
          "li_pk_unique"),
        Validate.uniqueKey(ord, Seq("o_custkey"), "orders_custkey_unique"),
        Validate.foreignKey(li, "l_orderkey", ord, "o_orderkey",
          "li_fk_orders"),
        Validate.foreignKey(ord, "o_custkey", t(s, dir, "customer"),
          "c_custkey", "orders_fk_customer"))
        .orderBy("rule")
    }),
    "q_compaction_plan" -> ((s, dir) => {
      // small-file compaction plan over a synthetic inventory (priority
      // = table partition, order = file, totalprice = bytes): per-
      // partition cumulative binning, deterministic and idempotent
      val inv = t(s, dir, "orders").select(
        col("o_orderpriority").as("part"),
        concat(lit("f"), col("o_orderkey").cast("string")).as("file"),
        (floor(col("o_totalprice")) + lit(1L)).as("bytes"))
      graft.ops.Layout.compactionPlan(inv, "part", "file", "bytes",
          targetBytes = 1000000L)
        .orderBy("part", "file")
    }),
    "q_soundex_block" -> ((s, dir) => {
      // phonetic block-key profile over part first words: the Soundex
      // chain is the SAME function composition on both engines (the
      // run collapse is seven per-digit passes — RE2 oracles have no
      // backreferences)
      val w = t(s, dir, "part").select(
        regexp_extract(lower(col("p_name")), "^[a-z]+", 0).as("w"))
        .filter(col("w") =!= "")
      w.select(col("w"), graft.ops.Linkage.soundex(col("w")).as("code"))
        .groupBy("code")
        .agg(count(lit(1)).as("n_parts"),
          countDistinct(col("w")).as("n_words"),
          min("w").as("sample_word"))
        .orderBy("code")
    }),
    "q_sorted_neighbors" -> ((s, dir) => {
      // sorted-neighborhood linkage over customer names (zero-padded,
      // so lexicographic == numeric order): window 3, JW verify;
      // buckets are 1000-key name-prefix ranges — a PREFIX of the sort
      // order, so bucket boundaries genuinely exercise the tail
      // duplication (999->1000 etc.) and the oracle replays the pure
      // global-window semantics the construction must equal
      graft.ops.Linkage.sortedNeighborPairs(t(s, dir, "customer"),
          "c_name", "c_name", "c_name", window = 3, minSim = 0.9,
          bucketExpr = substring(col("c_name"), 1, 15))
        .orderBy("id_a", "id_b")
    }),
    "q_edit_linkage" -> ((s, dir) => {
      // edit-distance linkage: first-letter blocks + exact Levenshtein
      // <= 2 verify (Spark's banded threshold kernel; DuckDB replays
      // the same cut) — the transposition/suffix misspelling recall
      // pass JW's prefix weighting underrates. The classic fixture
      // names ride along (the q_phonetic_pairs convention)
      import s.implicits._
      val names = Seq("smith", "smyth", "smithe", "ashcraft", "ashcroft",
        "robert", "roberta", "rupert", "jonathan", "jonothan").toDF("w")
      val words = t(s, dir, "part").select(
        regexp_extract(lower(col("p_name")), "^[a-z]+", 0).as("w"))
        .filter(col("w") =!= "").distinct()
        .unionAll(names)
      graft.ops.Linkage.editSelfJoin(
          words.select(col("w").as("wid"), col("w"),
            substring(col("w"), 1, 1).as("blk")),
          Seq("blk"), "w", "wid", maxDist = 2)
        .orderBy("id_a", "id_b")
    }),
    "q_phonetic_pairs" -> ((s, dir) => {
      // sound-alike pairs: soundex blocks + exact JW verify inside —
      // the complementary recall pass next to q_jaro_linkage's lexical
      // blocking (multi-pass blocking, Christen Ch. 4). The part
      // vocabulary is sound-alike-free by construction, so the classic
      // linkage fixture names ride along (the q_retrieval_eval literal
      // convention): smith/smyth, ashcraft/ashcroft, robert/rupert and
      // jonathan/jonothan survive; mayer/meier blocks together but the
      // verify rejects it (0.76 < 0.78); catherine/kathryn never meets
      // — soundex is first-letter-blind, the documented recall gap the
      // lexical pass covers
      import s.implicits._
      val names = Seq("smith", "smyth", "ashcraft", "ashcroft", "robert",
        "rupert", "catherine", "kathryn", "jonathan", "jonothan",
        "claire", "clare", "mayer", "meier").toDF("w")
      val words = t(s, dir, "part").select(
        regexp_extract(lower(col("p_name")), "^[a-z]+", 0).as("w"))
        .filter(col("w") =!= "").distinct()
        .unionAll(names)
      graft.ops.Linkage.phoneticSelfJoin(
          words.select(col("w").as("wid"), col("w")),
          "wid", "w", minSim = 0.78)
        .orderBy("id_a", "id_b")
    }),
    "q_jaro_linkage" -> ((s, dir) => {
      // name-similarity linkage over brand blocks scored by the native
      // graft_jaro codegen kernel — exact DuckDB jaro_winkler_similarity
      // semantics (3000-pair randomized cross-check), JW length-cap
      // prune provably lossless, 4dp round-before-cut
      graft.ops.Linkage.jaroSelfJoin(
          t(s, dir, "part").select(col("p_partkey"), col("p_brand"),
            col("p_name")),
          Seq("p_brand"), "p_name", "p_partkey", minSim = 0.9)
        .orderBy("id_a", "id_b")
    }),
    "q_twap" -> ((s, dir) => {
      // time-weighted average event value per type: each observation
      // weighted by how long it stayed current (censored last obs),
      // published next to the unweighted mean — the burstiness gap
      val ev = eventsTsUs(s, dir)
      graft.ops.Interval.timeWeightedAvg(ev, "event_type", "ts_us",
          "value")
        .orderBy("event_type")
    }),
    "q_split_leakage_safe" -> ((s, dir) =>
      // dedup-aware split: keyed by the content hash, so exact
      // duplicates can never straddle train/test — the leak an
      // id-keyed split silently opens
      graft.ops.Sampling.leakageSafeSplit(
          t(s, dir, "documents").select("doc_id", "text"),
          leakKey = md5(col("text")))
        .select(col("doc_id"), col("u"), col("split"))
        .orderBy("doc_id")),
    "q_kfold" -> ((s, dir) =>
      // leakage-safe 5-fold CV assignment keyed by the content hash:
      // duplicates always share a fold, so no fold's held-out set
      // contains another fold's training text; one narrow scan
      graft.ops.Sampling.kfoldAssign(
          t(s, dir, "documents").select("doc_id", "text"),
          leakKey = md5(col("text")), k = 5)
        .select(col("doc_id"), col("u"), col("fold"))
        .orderBy("doc_id")),
    "q_burstiness" -> ((s, dir) =>
      // event-cadence health per type: inter-arrival cv and
      // Goh–Barabási burstiness from lag gaps (ties by (ts, event_id)
      // — the acf determinism rule)
      graft.ops.Interval.interArrivalStats(eventsTsUs(s, dir),
          "event_type", "ts_us", "event_id")
        .orderBy("event_type")),
    "q_quota_alloc" -> ((s, dir) =>
      // crawl-budget apportionment over document sources: 1000 units by
      // largest remainder — sum of quotas is EXACTLY the budget, the
      // invariant float rounding breaks
      graft.ops.Sampling.allocateQuota(t(s, dir, "documents"),
          "source", budget = 1000L)
        .orderBy("domain")),
    "q_negative_sample" -> ((s, dir) => {
      // contrastive-training negatives: 4 deterministic corpus draws
      // per (query doc, positive doc) pair, positive-collision advanced
      // one rank — md5-ranked, so the oracle replays draw-for-draw.
      // pairs = each even doc paired with its successor
      val d = t(s, dir, "documents").select(col("doc_id"))
      val pairs = d.filter(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("q"), (col("doc_id") + 1).as("p"))
      graft.ops.Sampling.negativeSample(pairs, "q", "p",
          t(s, dir, "documents"), "doc_id", k = 4)
        .orderBy(col("query").cast("long"), col("slot"))
    }),
    "q_split_train" -> ((s, dir) =>
      // deterministic 90/5/5 train/val/test hash split: a pure function
      // of doc_id (append-stable, re-read-stable), one narrow scan
      graft.ops.Sampling.splitAssign(
          t(s, dir, "documents").select("doc_id"), "doc_id")
        .orderBy("doc_id")),
    "q_pareto_front" -> ((s, dir) =>
      // 2-D Pareto front (skyline): lineitem rows no other row beats on
      // BOTH quantity and price — one groupBy to the 50-value distinct-x
      // frame, a cardinality-bounded running-max walk, semi-join back;
      // duplicate frontier points all survive
      graft.ops.Sampling.paretoFront(
          t(s, dir, "lineitem").select(col("l_orderkey"),
            col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice")),
          "l_quantity", "l_extendedprice")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")),
    "q_top_paths" -> ((s, dir) => {
      // top user journeys: the 15 most common 3-step opening event
      // paths — per-user ordered prefix collect, one path aggregation,
      // TakeOrdered top-k (no global sort)
      val ev = eventsTsUs(s, dir)
      graft.ops.Behavior.topPaths(ev, "user_id", "ts_us", "event_type",
          maxSteps = 3, k = 15)
        .orderBy("rank")
    }),
    "q_retrieval_eval" -> ((s, dir) => {
      // retrieval evaluation: a deliberately imperfect length-ranked
      // retriever scored against tf-graded judgments for 3 query terms
      // — recall/precision@10, MRR, graded nDCG per query
      import org.apache.spark.sql.expressions.Window
      val d = t(s, dir, "documents")
      val tf = d.select(col("doc_id"),
          explode(split(col("text"), " ", -1)).as("w"))
        .filter(col("w").isin("query", "dup", "spark"))
        .groupBy(col("w").as("qid"), col("doc_id").as("doc"))
        .agg(count(lit(1)).as("tf"))
      val results = tf
        .join(d.select(col("doc_id").as("doc"), col("n_chars")), "doc")
        .withColumn("rank", row_number().over(
          Window.partitionBy("qid").orderBy(desc("n_chars"), col("doc"))))
        .filter(col("rank") <= 10).select("qid", "doc", "rank")
      val qrels = tf.select(col("qid"), col("doc"),
        least(col("tf"), lit(3L)).as("grade"))
      graft.ops.Similarity.retrievalMetrics(results, qrels, k = 10)
        .orderBy("qid")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_twap" ->
      """WITH e AS (SELECT event_type AS k, epoch_us(ts)::BIGINT AS t,
        |    value AS v FROM events WHERE value IS NOT NULL),
        |w AS (SELECT k, v,
        |    lead(t) OVER (PARTITION BY k ORDER BY t, v) - t AS dur
        |  FROM e)
        |SELECT k AS event_type, count(*)::BIGINT AS n_obs,
        |  coalesce(sum(dur), 0)::BIGINT AS span,
        |  round(CASE WHEN sum(dur) > 0
        |    THEN sum(v * dur) / sum(dur) END, 4) AS twa,
        |  round(avg(v), 4) AS mean_unweighted
        |FROM w GROUP BY k ORDER BY event_type""".stripMargin,
    "q_stratified_sample" ->
      """WITH r AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY md5(concat('42|', o_orderkey::VARCHAR)), o_orderkey)
        |      AS rn
        |  FROM orders)
        |SELECT o_orderkey, o_orderpriority FROM r
        |WHERE rn <= 50 ORDER BY o_orderkey""".stripMargin,
    "q_asof_join" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |v AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.event_id AS click_id, c.user_id,
        |    v.event_id AS view_id, v.value,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY v.ts DESC, v.event_id DESC) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id AND v.ts <= c.ts)
        |SELECT click_id, user_id, view_id, round(value, 2) AS view_value
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    "q_asof_bucketed" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'click'),
        |v AS (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events
        |  WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.event_id AS click_id, c.user_id,
        |    v.event_id AS view_id, v.value,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY v.us DESC, v.event_id DESC) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id AND v.us <= c.us
        |    AND c.us - v.us <= 1800000000)
        |SELECT click_id, user_id, view_id, round(value, 2) AS view_value
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    "q_mixture_sample" -> mixtureSampleOracle,
    "pipeline_curation" -> pipelineCurationOracle,
    "q_budget_ledger" -> {
      val avals = (0 until 15)
        .map(i => s"('src$i', ${(i % 5 + 1) * 100.0})").mkString(", ")
      s"""WITH a(source, alloc) AS (VALUES $avals),
         |base AS (SELECT source, doc_id,
         |    (1 + doc_id % 13)::DOUBLE AS c FROM documents),
         |j AS (SELECT b.source, b.doc_id, b.c,
         |    coalesce(a.alloc, 0) AS alloc,
         |    md5(concat('42|', b.doc_id::VARCHAR)) AS hr
         |  FROM base b LEFT JOIN a USING (source)),
         |cum AS (SELECT *, sum(c) OVER (PARTITION BY source
         |    ORDER BY hr, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
         |  FROM j),
         |sel AS (SELECT *, (round(cm, 4) <= alloc) AS s FROM cum),
         |g AS (SELECT source AS domain,
         |    round(max(alloc), 4) AS allocated,
         |    count(*)::BIGINT AS n_docs,
         |    coalesce(sum(CASE WHEN s THEN 1 ELSE 0 END), 0)::BIGINT
         |      AS n_selected,
         |    round(coalesce(sum(CASE WHEN s THEN c ELSE 0 END), 0), 4)
         |      AS realized
         |  FROM sel GROUP BY 1)
         |SELECT domain, allocated, n_docs, n_selected, realized,
         |  round(allocated - realized, 4) AS carryover,
         |  round(CASE WHEN allocated > 0 THEN realized / allocated
         |    ELSE 0.0 END, 4) AS utilization,
         |  (CASE WHEN n_selected = n_docs AND realized < allocated
         |    THEN 1 ELSE 0 END)::BIGINT AS exhausted
         |FROM g ORDER BY domain""".stripMargin
    },
    // the oracle's NAIVE global window equals the operator's two-phase
    // (distinct-score walk + per-group cumsum) construction exactly:
    // both realize sum(cost) over (score DESC, id ASC) prefixes, and
    // integral costs make the different addition orders bit-identical
    "q_select_budget" ->
      """WITH b AS (SELECT doc_id, (doc_id % 7)::DOUBLE AS score,
        |    (1 + doc_id % 13)::DOUBLE AS cost FROM documents),
        |c AS (SELECT doc_id, score, cost,
        |    sum(cost) OVER (ORDER BY score DESC, doc_id) AS cum_cost
        |  FROM b)
        |SELECT doc_id, score, cost, cum_cost,
        |  round(cum_cost, 4) <= 1000.0 AS selected
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_shard_assign" ->
      """WITH h AS (SELECT o_orderkey,
        |    md5(concat('42|', o_orderkey::VARCHAR)) AS hh FROM orders),
        |a AS (SELECT o_orderkey, hh,
        |    CAST(('0x' || substring(hh, 1, 6)) AS BIGINT) % 8 AS shard
        |  FROM h)
        |SELECT shard,
        |  (row_number() OVER (PARTITION BY shard ORDER BY hh, o_orderkey))
        |    ::BIGINT AS shard_pos,
        |  o_orderkey
        |FROM a ORDER BY shard, shard_pos""".stripMargin,
    "q_fs_weights" ->
      """WITH a AS (SELECT c_custkey AS k, c_nationkey AS na,
        |    c_mktsegment AS sa, floor(c_acctbal / 1000) AS ba,
        |    c_acctbal >= 0 AS pa FROM customer),
        |b AS (SELECT c_custkey - 1 AS k, c_nationkey AS nb,
        |    c_mktsegment AS sb, floor(c_acctbal / 1000) AS bb,
        |    c_acctbal >= 0 AS pb FROM customer),
        |p AS (SELECT na = nb AS m, sa = sb AS seg, ba = bb AS bal_band,
        |    pa = pb AS bal_sign FROM a JOIN b USING (k)),
        |t AS (SELECT
        |    sum(CASE WHEN m THEN 1 ELSE 0 END)::DOUBLE AS nm,
        |    sum(CASE WHEN NOT m THEN 1 ELSE 0 END)::DOUBLE AS nu,
        |    sum(CASE WHEN m AND seg THEN 1 ELSE 0 END)::DOUBLE AS am0,
        |    sum(CASE WHEN NOT m AND seg THEN 1 ELSE 0 END)::DOUBLE AS au0,
        |    sum(CASE WHEN m AND bal_band THEN 1 ELSE 0 END)::DOUBLE AS am1,
        |    sum(CASE WHEN NOT m AND bal_band THEN 1 ELSE 0 END)
        |      ::DOUBLE AS au1,
        |    sum(CASE WHEN m AND bal_sign THEN 1 ELSE 0 END)::DOUBLE AS am2,
        |    sum(CASE WHEN NOT m AND bal_sign THEN 1 ELSE 0 END)
        |      ::DOUBLE AS au2
        |  FROM p),
        |f AS (
        |  SELECT 'seg' AS field, (am0 + 0.5) / (nm + 1) AS m,
        |    (au0 + 0.5) / (nu + 1) AS u FROM t
        |  UNION ALL SELECT 'bal_band', (am1 + 0.5) / (nm + 1),
        |    (au1 + 0.5) / (nu + 1) FROM t
        |  UNION ALL SELECT 'bal_sign', (am2 + 0.5) / (nm + 1),
        |    (au2 + 0.5) / (nu + 1) FROM t)
        |SELECT field, round(m, 6) AS m, round(u, 6) AS u,
        |  round(log2(m / u), 4) AS w_agree,
        |  round(log2((1 - m) / (1 - u)), 4) AS w_disagree
        |FROM f ORDER BY field""".stripMargin,
    "q_fs_em" -> fsEmOracle(10),
    "q_blocking_quality" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |    floor(c_acctbal / 1000) AS bal_band, c_nationkey
        |  FROM customer),
        |keyed AS (SELECT c_custkey AS id, c_mktsegment AS s, bal_band AS bb
        |  FROM c WHERE c_mktsegment IS NOT NULL AND bal_band IS NOT NULL),
        |cnts AS (SELECT s, bb, count(*)::BIGINT AS cnt
        |  FROM keyed GROUP BY 1, 2),
        |ct AS (SELECT coalesce(sum(cnt), 0)::BIGINT AS n_records,
        |    coalesce(sum(cnt * (cnt - 1) // 2), 0)::BIGINT AS cand_pairs
        |  FROM cnts),
        |tr AS (SELECT a.c_custkey AS ta, b.c_custkey AS tb
        |  FROM c a JOIN c b ON b.c_custkey = a.c_custkey + 1
        |    AND a.c_nationkey = b.c_nationkey),
        |co AS (SELECT count(*)::BIGINT AS n_truth,
        |    sum(CASE WHEN ka.s IS NOT NULL AND ka.s = kb.s
        |      AND ka.bb = kb.bb THEN 1 ELSE 0 END)::BIGINT
        |      AS truth_coblocked
        |  FROM tr LEFT JOIN keyed ka ON ka.id = tr.ta
        |  LEFT JOIN keyed kb ON kb.id = tr.tb)
        |SELECT n_records,
        |  (n_records * (n_records - 1) // 2)::BIGINT AS total_pairs,
        |  cand_pairs,
        |  round(CASE WHEN n_records >= 2 THEN
        |      1.0 - cand_pairs / (n_records * (n_records - 1) / 2.0)
        |    ELSE 0 END, 6) AS reduction_ratio,
        |  n_truth, truth_coblocked,
        |  round(CASE WHEN n_truth > 0
        |      THEN truth_coblocked / n_truth::DOUBLE
        |    ELSE 0 END, 6) AS pairs_completeness
        |FROM ct, co""".stripMargin,
    "q_fuzzy_join" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |  a.c_nationkey,
        |  levenshtein(a.c_name, b.c_name)::BIGINT AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "q_zorder" -> zorderOracle,
    "q_zone_map" -> zoneMapOracle,
    "q_asof_forward" ->
      """WITH c AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |v AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'view'),
        |j AS (
        |  SELECT c.event_id AS click_id, c.user_id,
        |    v.event_id AS view_id, v.value,
        |    row_number() OVER (PARTITION BY c.event_id
        |      ORDER BY v.ts ASC, v.event_id ASC) AS rn
        |  FROM c JOIN v ON c.user_id = v.user_id AND v.ts >= c.ts)
        |SELECT click_id, user_id, view_id, round(value, 2) AS view_value
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_id AS eid, event_type AS ty FROM events
        |  WHERE event_type IN ('purchase', 'view', 'click', 'signup')),
        |k AS (SELECT u, t, eid,
        |    CASE WHEN ty = 'purchase' THEN 1 ELSE 0 END AS kind,
        |    CASE WHEN ty <> 'purchase' THEN ty END AS ch FROM e),
        |wv AS (SELECT *, last_value(ch IGNORE NULLS) OVER win AS lc,
        |    last_value(CASE WHEN ch IS NOT NULL THEN t END IGNORE NULLS)
        |      OVER win AS lt
        |  FROM k WINDOW win AS (PARTITION BY u ORDER BY t, kind, eid
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT eid AS event_id, u AS user_id, t AS conv_ts,
        |  CASE WHEN t - lt <= 7200000000 THEN lc END AS channel,
        |  CASE WHEN t - lt <= 7200000000 THEN lt END AS channel_ts,
        |  CASE WHEN t - lt <= 7200000000 THEN t - lt END AS gap_us
        |FROM wv WHERE kind = 1 ORDER BY event_id""".stripMargin,
    "q_reconcile" ->
      """WITH a0 AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders),
        |b0 AS (SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 101 = 0 THEN o_totalprice + 1
        |    ELSE o_totalprice END AS o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |ha AS (SELECT
        |    CAST(('0x' || substring(md5(o_orderkey::VARCHAR), 1, 4))
        |      AS BIGINT) % 32 AS bucket,
        |    CAST(('0x' || substring(md5(concat_ws('|',
        |      CASE WHEN o_orderkey IS NULL THEN 'n'
        |        ELSE 'v' || o_orderkey::VARCHAR END,
        |      CASE WHEN o_totalprice IS NULL THEN 'n'
        |        ELSE 'v' || o_totalprice::VARCHAR END,
        |      CASE WHEN o_orderstatus IS NULL THEN 'n'
        |        ELSE 'v' || o_orderstatus END)), 1, 8))
        |      AS BIGINT) AS h FROM a0),
        |hb AS (SELECT
        |    CAST(('0x' || substring(md5(o_orderkey::VARCHAR), 1, 4))
        |      AS BIGINT) % 32 AS bucket,
        |    CAST(('0x' || substring(md5(concat_ws('|',
        |      CASE WHEN o_orderkey IS NULL THEN 'n'
        |        ELSE 'v' || o_orderkey::VARCHAR END,
        |      CASE WHEN o_totalprice IS NULL THEN 'n'
        |        ELSE 'v' || o_totalprice::VARCHAR END,
        |      CASE WHEN o_orderstatus IS NULL THEN 'n'
        |        ELSE 'v' || o_orderstatus END)), 1, 8))
        |      AS BIGINT) AS h FROM b0),
        |ga AS (SELECT bucket, count(*)::BIGINT AS n_a,
        |    sum(h)::BIGINT AS sum_a FROM ha GROUP BY bucket),
        |gb AS (SELECT bucket, count(*)::BIGINT AS n_b,
        |    sum(h)::BIGINT AS sum_b FROM hb GROUP BY bucket)
        |SELECT bucket, coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
        |  coalesce(sum_a, 0) AS sum_a, coalesce(sum_b, 0) AS sum_b,
        |  coalesce(n_a, 0) = coalesce(n_b, 0)
        |    AND coalesce(sum_a, 0) = coalesce(sum_b, 0) AS matches
        |FROM ga FULL OUTER JOIN gb USING (bucket)
        |ORDER BY bucket""".stripMargin,
    "q_dedup_stats" ->
      """WITH sizes AS (SELECT md5(text) AS c, count(doc_id)::BIGINT AS n
        |  FROM documents GROUP BY 1)
        |SELECT sum(n)::BIGINT AS n_docs, count(*)::BIGINT AS n_clusters,
        |  sum(n - 1)::BIGINT AS n_dups,
        |  round((sum(n) - count(*)) / sum(n)::DOUBLE, 4) AS dup_frac,
        |  count(*) FILTER (WHERE n = 1)::BIGINT AS n_singletons,
        |  max(n)::BIGINT AS max_cluster_size
        |FROM sizes""".stripMargin,
    "q_max_concurrent" ->
      """WITH iv AS (SELECT event_type AS k, epoch_us(ts)::BIGINT AS s,
        |    epoch_us(ts)::BIGINT + floor(value * 1e6)::BIGINT AS e
        |  FROM events),
        |b AS (SELECT k, s AS t, 1 AS d FROM iv
        |  UNION ALL SELECT k, e, -1 FROM iv),
        |l AS (SELECT k, t, sum(d) OVER (PARTITION BY k ORDER BY t, d
        |    ROWS UNBOUNDED PRECEDING) AS lvl FROM b),
        |m AS (SELECT k, max(lvl) AS mc FROM l GROUP BY k)
        |SELECT l.k AS event_type, m.mc::BIGINT AS max_concurrent,
        |  min(l.t) AS peak_ts
        |FROM l JOIN m USING (k) WHERE l.lvl = m.mc
        |GROUP BY l.k, m.mc ORDER BY event_type""".stripMargin,
    "q_hilbert" -> hilbertOracle(8),
    "q_adoption" ->
      """WITH e AS (SELECT event_type AS g, user_id AS u,
        |    epoch_us(ts)::BIGINT // 86400000000 AS day FROM events),
        |fd AS (SELECT g, u, min(day) AS first_day FROM e GROUP BY 1, 2),
        |np AS (SELECT g, first_day AS day, count(*)::BIGINT AS n_new_users
        |  FROM fd GROUP BY 1, 2),
        |daily AS (SELECT g, day, count(*)::BIGINT AS n_events,
        |    count(DISTINCT u)::BIGINT AS n_active_users
        |  FROM e GROUP BY 1, 2)
        |SELECT daily.g AS event_type, daily.day AS day, daily.n_events,
        |  daily.n_active_users,
        |  coalesce(np.n_new_users, 0)::BIGINT AS n_new_users,
        |  sum(coalesce(np.n_new_users, 0)) OVER (PARTITION BY daily.g
        |    ORDER BY daily.day ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)::BIGINT AS cum_users
        |FROM daily LEFT JOIN np ON np.g = daily.g AND np.day = daily.day
        |ORDER BY 1, 2""".stripMargin,
    "q_rfm" ->
      """WITH a AS (SELECT o_custkey,
        |    max(epoch(o_orderdate))::BIGINT AS last_ts,
        |    count(*)::BIGINT AS n_orders,
        |    round(sum(o_totalprice::DOUBLE), 4) AS total_value
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey, last_ts, n_orders, total_value,
        |  ntile(5) OVER (ORDER BY last_ts, o_custkey)::BIGINT AS r_score,
        |  ntile(5) OVER (ORDER BY n_orders, o_custkey)::BIGINT AS f_score,
        |  ntile(5) OVER (ORDER BY total_value, o_custkey)::BIGINT
        |    AS m_score,
        |  (ntile(5) OVER (ORDER BY last_ts, o_custkey))::VARCHAR
        |    || (ntile(5) OVER (ORDER BY n_orders, o_custkey))::VARCHAR
        |    || (ntile(5) OVER (ORDER BY total_value, o_custkey))::VARCHAR
        |    AS segment
        |FROM a ORDER BY o_custkey""".stripMargin,
    "q_geo_join" ->
      """WITH c AS (SELECT c_custkey,
        |    ((c_custkey * 37) % 1200)::DOUBLE / 10.0 - 60.0 AS lat,
        |    ((c_custkey * 73) % 3600)::DOUBLE / 10.0 - 180.0 AS lon
        |  FROM customer),
        |s AS (SELECT s_suppkey,
        |    ((s_suppkey * 41) % 1200)::DOUBLE / 10.0 - 60.0 AS lat,
        |    ((s_suppkey * 97) % 3600)::DOUBLE / 10.0 - 180.0 AS lon
        |  FROM supplier),
        |p AS (SELECT s.s_suppkey, c.c_custkey,
        |    2 * 6371.0088 * asin(sqrt(
        |      sin(radians(c.lat - s.lat) / 2)
        |        * sin(radians(c.lat - s.lat) / 2)
        |      + cos(radians(s.lat)) * cos(radians(c.lat))
        |        * sin(radians(c.lon - s.lon) / 2)
        |        * sin(radians(c.lon - s.lon) / 2))) AS d
        |  FROM s, c)
        |SELECT s_suppkey, c_custkey, round(d, 3) AS dist_km
        |FROM p WHERE d <= 150.0 ORDER BY 1, 2""".stripMargin,
    "q_lsh_tune" ->
      """WITH d AS (SELECT b::BIGINT AS b, (128 // b)::BIGINT AS r
        |  FROM (SELECT unnest(range(1, 129)) AS b) WHERE 128 % b = 0),
        |g AS (SELECT (unnest(range(0, 200)) + 0.5) / 200.0 AS s),
        |x AS (SELECT b, r, s, 1 - pow(1 - pow(s, r), b) AS p FROM d, g),
        |a AS (SELECT b, r,
        |    round(sum(CASE WHEN s < 0.8 THEN p ELSE 0.0 END) / 200, 6)
        |      AS fp_area,
        |    round(sum(CASE WHEN s >= 0.8 THEN 1.0 - p ELSE 0.0 END) / 200,
        |      6) AS fn_area
        |  FROM x GROUP BY 1, 2),
        |t2 AS (SELECT b, r, fp_area, fn_area,
        |    round(fp_area + fn_area, 6) AS total_err FROM a)
        |SELECT b AS bands, r AS rows_per_band, fp_area, fn_area,
        |  total_err,
        |  row_number() OVER (ORDER BY total_err, b)::BIGINT AS rank
        |FROM t2 ORDER BY rank""".stripMargin,
    "q_weighted_sample" ->
      """WITH k AS (SELECT doc_id, lang, n_chars,
        |  round(ln((CAST('0x' || substring(md5('42|' || doc_id::VARCHAR),
        |      1, 12) AS BIGINT) + 1) / 281474976710657.0) / n_chars, 10)
        |    AS wkey
        |  FROM documents WHERE n_chars > 0),
        |r AS (SELECT doc_id, lang, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY wkey DESC, doc_id)
        |    AS rk
        |  FROM k)
        |SELECT doc_id, lang, n_chars FROM r WHERE rk <= 20
        |ORDER BY lang, doc_id""".stripMargin,
    "q_corpus_upsert" ->
      """WITH newv AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, 'new doc ' || doc_id::VARCHAR
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, text FROM newv ORDER BY doc_id""".stripMargin,
    "q_corpus_diff" ->
      """WITH oldv AS (SELECT doc_id, text FROM documents),
        |newv AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, 'new doc ' || doc_id::VARCHAR
        |  FROM documents WHERE doc_id % 5 = 0),
        |oh AS (SELECT doc_id, md5(text) AS old_hash FROM oldv),
        |nh AS (SELECT doc_id, md5(text) AS new_hash FROM newv)
        |SELECT coalesce(oh.doc_id, nh.doc_id) AS doc_id,
        |  CASE WHEN old_hash IS NULL THEN 'added'
        |       WHEN new_hash IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM oh FULL OUTER JOIN nh ON oh.doc_id = nh.doc_id
        |ORDER BY doc_id""".stripMargin,
    "q_interval_point" ->
      """WITH iv AS (SELECT event_id AS i_id, epoch_us(ts) AS i_start,
        |    epoch_us(ts) + CAST(floor(value * 1e6) AS BIGINT) AS i_end
        |  FROM events WHERE event_type = 'signup'),
        |pt AS (SELECT event_id AS p_id, epoch_us(ts) AS p_ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT i.i_id, p.p_id, p.p_ts - i.i_start AS offset_us
        |FROM iv i JOIN pt p ON p.p_ts BETWEEN i.i_start AND i.i_end
        |ORDER BY i_id, p_id""".stripMargin,
    "q_interval_overlap" ->
      """WITH a AS (SELECT event_id AS a_id, epoch_us(ts) AS a_s,
        |    epoch_us(ts) + CAST(floor(value * 1e6) AS BIGINT) AS a_e
        |  FROM events WHERE event_type = 'signup'),
        |b AS (SELECT event_id AS b_id, epoch_us(ts) AS b_s,
        |    epoch_us(ts) + CAST(floor(value * 1e6) AS BIGINT) AS b_e
        |  FROM events WHERE event_type = 'error')
        |SELECT a_id, b_id, least(a_e, b_e) - greatest(a_s, b_s) AS overlap_us
        |FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
        |ORDER BY a_id, b_id""".stripMargin,
    "q_resample_fill" ->
      """WITH e AS (SELECT user_id, epoch_us(ts)::BIGINT AS us, value
        |  FROM events),
        |a AS (SELECT user_id, us // 3600000000 AS bucket,
        |    count(*)::BIGINT AS n, round(avg(value), 4) AS avg_value
        |  FROM e GROUP BY 1, 2),
        |sp AS (SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
        |  FROM a GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(b0, b1 + 1)) AS bucket FROM sp),
        |j AS (SELECT g.user_id, g.bucket, coalesce(a.n, 0)::BIGINT AS n,
        |    a.avg_value
        |  FROM g LEFT JOIN a USING (user_id, bucket))
        |SELECT user_id, bucket, n, avg_value,
        |  last_value(avg_value IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_value
        |FROM j ORDER BY user_id, bucket""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS ts,
        |    event_type AS et FROM events),
        |t1 AS (SELECT u, min(ts) AS t FROM e WHERE et = 'view' GROUP BY 1),
        |t2 AS (SELECT e.u, min(e.ts) AS t FROM e JOIN t1 ON e.u = t1.u
        |  WHERE e.et = 'click' AND e.ts > t1.t
        |    AND e.ts <= t1.t + 86400000000 GROUP BY 1),
        |t3 AS (SELECT e.u, min(e.ts) AS t FROM e
        |  JOIN t2 ON e.u = t2.u JOIN t1 ON e.u = t1.u
        |  WHERE e.et = 'purchase' AND e.ts > t2.t
        |    AND e.ts <= t1.t + 86400000000 GROUP BY 1),
        |n AS (SELECT (SELECT count(*) FROM t1)::BIGINT AS n1,
        |             (SELECT count(*) FROM t2)::BIGINT AS n2,
        |             (SELECT count(*) FROM t3)::BIGINT AS n3)
        |SELECT 1 AS step, 'view' AS event_type, n1 AS n_users,
        |  round(n1 / n1::DOUBLE, 4) AS conv_rate FROM n
        |UNION ALL SELECT 2, 'click', n2, round(n2 / n1::DOUBLE, 4) FROM n
        |UNION ALL SELECT 3, 'purchase', n3, round(n3 / n1::DOUBLE, 4) FROM n
        |ORDER BY step""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT DISTINCT user_id AS u,
        |    epoch_us(ts)::BIGINT // 604800000000 AS wk FROM events),
        |f AS (SELECT u, min(wk) AS cohort FROM e GROUP BY 1),
        |a AS (SELECT f.cohort, e.wk - f.cohort AS "offset",
        |    count(*)::BIGINT AS n_active
        |  FROM e JOIN f ON e.u = f.u GROUP BY 1, 2),
        |s AS (SELECT cohort, count(*)::BIGINT AS n_cohort FROM f GROUP BY 1)
        |SELECT a.cohort, a."offset", a.n_active,
        |  round(a.n_active / s.n_cohort::DOUBLE, 4) AS retention
        |FROM a JOIN s ON a.cohort = s.cohort
        |ORDER BY a.cohort, a."offset"""".stripMargin,
    "q_rrf_fuse" -> (bm25Cte +
      """, ra AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_a
        |  FROM bm QUALIFY rank_a <= 50),
        |rb AS (SELECT doc_id,
        |    row_number() OVER (ORDER BY length(text) DESC, doc_id) AS rank_b
        |  FROM documents QUALIFY rank_b <= 50)
        |SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        |  round(coalesce(1.0 / (60 + rank_a), 0)
        |      + coalesce(1.0 / (60 + rank_b), 0), 6) AS rrf
        |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
        |ORDER BY rrf DESC, doc_id""".stripMargin),
    "q_scd2" -> (scd2Cte +
      """SELECT user_id, event_type, effective_from, effective_to, version,
        |  effective_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin),
    "q_scd2_asof" -> (scd2Cte +
      """SELECT user_id, event_type, effective_from, effective_to, version
        |FROM v
        |WHERE effective_from <= 1705363200000000
        |  AND (effective_to IS NULL OR 1705363200000000 < effective_to)
        |ORDER BY user_id""".stripMargin),
    "q_islands" ->
      """WITH iv AS (SELECT event_type, epoch_us(ts)::BIGINT AS s,
        |    epoch_us(ts)::BIGINT + floor(value * 60000000.0)::BIGINT AS e
        |  FROM events),
        |c AS (SELECT *, max(e) OVER (PARTITION BY event_type
        |    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    AS maxe FROM iv),
        |f AS (SELECT *, CASE WHEN maxe IS NULL OR s > maxe
        |    THEN 1 ELSE 0 END AS nw FROM c),
        |g AS (SELECT *, sum(nw) OVER (PARTITION BY event_type
        |    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS island FROM f)
        |SELECT event_type, min(s) AS island_start, max(e) AS island_end,
        |  count(*)::BIGINT AS n_merged
        |FROM g GROUP BY event_type, island
        |ORDER BY event_type, island_start""".stripMargin,
    "q_validate" ->
      """WITH rr AS (SELECT count(*)::BIGINT AS n,
        |    count(*) FILTER (WHERE l_quantity > 45)::BIGINT AS v1,
        |    count(*) FILTER (WHERE l_extendedprice <= 0)::BIGINT AS v2,
        |    count(*) FILTER (WHERE l_discount > 0.08)::BIGINT AS v3,
        |    count(*) FILTER (WHERE l_shipdate IS NULL)::BIGINT AS v4
        |  FROM lineitem),
        |u1 AS (SELECT (SELECT count(*) FROM lineitem)::BIGINT AS n,
        |    ((SELECT count(*) FROM lineitem) - (SELECT count(*) FROM
        |      (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)))
        |      ::BIGINT AS v),
        |u2 AS (SELECT (SELECT count(*) FROM orders)::BIGINT AS n,
        |    ((SELECT count(*) FROM orders) - (SELECT count(*) FROM
        |      (SELECT DISTINCT o_custkey FROM orders)))::BIGINT AS v),
        |f1 AS (SELECT (SELECT count(*) FROM lineitem)::BIGINT AS n,
        |    (SELECT count(*) FROM lineitem l
        |      WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
        |        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |      ::BIGINT AS v),
        |f2 AS (SELECT (SELECT count(*) FROM orders)::BIGINT AS n,
        |    (SELECT count(*) FROM orders o
        |      WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
        |        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |      ::BIGINT AS v),
        |rows_ AS (
        |  SELECT 'li_qty_le_45' AS rule, v1 AS n_violations, n AS n_rows
        |    FROM rr
        |  UNION ALL SELECT 'li_price_positive', v2, n FROM rr
        |  UNION ALL SELECT 'li_discount_cap', v3, n FROM rr
        |  UNION ALL SELECT 'li_shipdate_present', v4, n FROM rr
        |  UNION ALL SELECT 'li_pk_unique', v, n FROM u1
        |  UNION ALL SELECT 'orders_custkey_unique', v, n FROM u2
        |  UNION ALL SELECT 'li_fk_orders', v, n FROM f1
        |  UNION ALL SELECT 'orders_fk_customer', v, n FROM f2)
        |SELECT rule, n_violations, n_rows,
        |  round(n_violations / n_rows::DOUBLE, 4) AS violation_frac,
        |  n_violations = 0 AS passed
        |FROM rows_ ORDER BY rule""".stripMargin,
    "q_compaction_plan" ->
      """WITH inv AS (SELECT o_orderpriority AS part,
        |    'f' || o_orderkey::VARCHAR AS file,
        |    (floor(o_totalprice) + 1)::BIGINT AS bytes FROM orders),
        |c AS (SELECT part, file, bytes,
        |    coalesce(sum(bytes) OVER (PARTITION BY part ORDER BY file
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM inv)
        |SELECT part, file, bytes, (before // 1000000)::BIGINT AS bin,
        |  (before - (before // 1000000) * 1000000)::BIGINT AS bin_offset
        |FROM c ORDER BY part, file""".stripMargin,
    "q_soundex_block" ->
      """WITH f AS (SELECT regexp_extract(lower(p_name), '^[a-z]+') AS w
        |  FROM part WHERE regexp_extract(lower(p_name), '^[a-z]+') <> ''),
        |t0 AS (SELECT w, translate(substr(w, 1, 1),
        |      'abcdefgijklmnopqrstuvxyz', '012301202245501262301202')
        |    || translate(translate(regexp_replace(w, '^.', ''),
        |      'hw', ''), 'abcdefgijklmnopqrstuvxyz',
        |      '012301202245501262301202') AS t
        |  FROM f),
        |t1 AS (SELECT w, regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    t, '0+', '0', 'g'), '1+', '1', 'g'), '2+', '2', 'g'),
        |    '3+', '3', 'g'), '4+', '4', 'g'), '5+', '5', 'g'),
        |    '6+', '6', 'g') AS t FROM t0),
        |c AS (SELECT w, upper(substr(w, 1, 1)) || rpad(substr(
        |    regexp_replace(regexp_replace(t, '^.', ''), '0', '', 'g'),
        |    1, 3), 3, '0') AS code FROM t1)
        |SELECT code, count(*)::BIGINT AS n_parts,
        |  count(DISTINCT w)::BIGINT AS n_words, min(w) AS sample_word
        |FROM c GROUP BY code ORDER BY code""".stripMargin,
    "q_sorted_neighbors" ->
      """WITH r AS (SELECT c_name,
        |    row_number() OVER (ORDER BY c_name) AS rn FROM customer)
        |SELECT a.c_name AS id_a, b.c_name AS id_b,
        |  round(jaro_winkler_similarity(a.c_name, b.c_name), 4) AS sim
        |FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3
        |WHERE round(jaro_winkler_similarity(a.c_name, b.c_name), 4)
        |  >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "q_edit_linkage" ->
      """WITH f AS (SELECT DISTINCT
        |    regexp_extract(lower(p_name), '^[a-z]+') AS w
        |  FROM part WHERE regexp_extract(lower(p_name), '^[a-z]+') <> ''
        |  UNION ALL SELECT * FROM (VALUES ('smith'), ('smyth'),
        |    ('smithe'), ('ashcraft'), ('ashcroft'), ('robert'),
        |    ('roberta'), ('rupert'), ('jonathan'), ('jonothan')) v(w)),
        |c AS (SELECT w, substr(w, 1, 1) AS blk FROM f)
        |SELECT a.w AS id_a, b.w AS id_b, a.blk,
        |  levenshtein(a.w, b.w)::BIGINT AS dist
        |FROM c a JOIN c b ON a.blk = b.blk AND a.w < b.w
        |WHERE abs(length(a.w) - length(b.w)) <= 2
        |  AND levenshtein(a.w, b.w) <= 2
        |ORDER BY id_a, id_b""".stripMargin,
    "q_phonetic_pairs" ->
      """WITH f AS (SELECT DISTINCT
        |    regexp_extract(lower(p_name), '^[a-z]+') AS w
        |  FROM part WHERE regexp_extract(lower(p_name), '^[a-z]+') <> ''
        |  UNION ALL SELECT * FROM (VALUES ('smith'), ('smyth'),
        |    ('ashcraft'), ('ashcroft'), ('robert'), ('rupert'),
        |    ('catherine'), ('kathryn'), ('jonathan'), ('jonothan'),
        |    ('claire'), ('clare'), ('mayer'), ('meier')) v(w)),
        |t0 AS (SELECT w, translate(substr(w, 1, 1),
        |      'abcdefgijklmnopqrstuvxyz', '012301202245501262301202')
        |    || translate(translate(regexp_replace(w, '^.', ''),
        |      'hw', ''), 'abcdefgijklmnopqrstuvxyz',
        |      '012301202245501262301202') AS t
        |  FROM f),
        |t1 AS (SELECT w, regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |    t, '0+', '0', 'g'), '1+', '1', 'g'), '2+', '2', 'g'),
        |    '3+', '3', 'g'), '4+', '4', 'g'), '5+', '5', 'g'),
        |    '6+', '6', 'g') AS t FROM t0),
        |c AS (SELECT w, upper(substr(w, 1, 1)) || rpad(substr(
        |    regexp_replace(regexp_replace(t, '^.', ''), '0', '', 'g'),
        |    1, 3), 3, '0') AS code FROM t1)
        |SELECT a.w AS id_a, b.w AS id_b, a.code AS soundex,
        |  round(jaro_winkler_similarity(a.w, b.w), 4) AS sim
        |FROM c a JOIN c b ON a.code = b.code AND a.w < b.w
        |WHERE round(jaro_winkler_similarity(a.w, b.w), 4) >= 0.78
        |ORDER BY id_a, id_b""".stripMargin,
    "q_jaro_linkage" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, a.p_brand,
        |  round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS sim
        |FROM part a JOIN part b ON a.p_brand = b.p_brand
        |  AND a.p_partkey < b.p_partkey
        |WHERE round(jaro_winkler_similarity(a.p_name, b.p_name), 4) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,
    "q_split_leakage_safe" ->
      """WITH h AS (SELECT doc_id,
        |    md5(concat('42|', md5(text))) AS hh FROM documents),
        |u AS (SELECT doc_id,
        |    round(CAST(('0x' || substring(hh, 1, 8)) AS BIGINT)
        |      / 4294967296.0, 6) AS u FROM h)
        |SELECT doc_id, u,
        |  CASE WHEN u < 0.9 THEN 'train'
        |       WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
        |FROM u ORDER BY doc_id""".stripMargin,
    "q_kfold" ->
      """WITH h AS (SELECT doc_id,
        |    md5(concat('42|', md5(text))) AS hh FROM documents),
        |u AS (SELECT doc_id,
        |    round(CAST(('0x' || substring(hh, 1, 8)) AS BIGINT)
        |      / 4294967296.0, 6) AS u FROM h)
        |SELECT doc_id, u, least(floor(u * 5), 4)::INT AS fold
        |FROM u ORDER BY doc_id""".stripMargin,
    "q_burstiness" ->
      """WITH e AS (SELECT event_type AS k, epoch_us(ts)::BIGINT AS t,
        |    event_id FROM events),
        |g AS (SELECT k, (t - lag(t) OVER (PARTITION BY k
        |    ORDER BY t, event_id))::DOUBLE AS gap FROM e),
        |a AS (SELECT k, count(gap)::BIGINT AS n_gaps, avg(gap) AS mu,
        |    stddev_samp(gap) AS sd FROM g WHERE gap IS NOT NULL
        |  GROUP BY k)
        |SELECT k AS event_type, n_gaps, round(mu, 4) AS mean_gap,
        |  round(sd, 4) + 0.0 AS sd_gap,
        |  round(CASE WHEN mu > 0 THEN sd / mu END, 4) AS cv,
        |  round(CASE WHEN sd + mu > 0 THEN (sd - mu) / (sd + mu) END, 4)
        |    AS burstiness
        |FROM a ORDER BY event_type""".stripMargin,
    "q_quota_alloc" ->
      """WITH c AS (SELECT source AS domain, count(*)::BIGINT AS n
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS tot FROM c),
        |b AS (SELECT domain, n, 1000.0 * n / tot AS raw,
        |    floor(1000.0 * n / tot) AS base FROM c, t),
        |l AS (SELECT (1000 - sum(base))::BIGINT AS leftover FROM b),
        |r AS (SELECT b.*, row_number()
        |    OVER (ORDER BY raw - base DESC, domain) AS rk FROM b)
        |SELECT domain, n,
        |  (base + CASE WHEN rk <= l.leftover THEN 1 ELSE 0 END)::BIGINT
        |    AS quota
        |FROM r, l ORDER BY domain""".stripMargin,
    "q_negative_sample" ->
      """WITH ranked AS (SELECT doc_id::VARCHAR AS cid,
        |    row_number() OVER (ORDER BY doc_id::VARCHAR) - 1 AS rnk
        |  FROM (SELECT DISTINCT doc_id FROM documents)),
        |nn AS (SELECT count(*)::BIGINT AS n FROM ranked),
        |pairs AS (SELECT doc_id::VARCHAR AS q, (doc_id + 1)::VARCHAR AS p
        |  FROM documents WHERE doc_id % 20 = 0),
        |slots AS (SELECT q, p, s AS slot FROM pairs,
        |  (SELECT unnest(range(4)) AS s) _s),
        |draw AS (SELECT q, p, slot, nn.n AS n,
        |    CAST('0x' || substring(md5('42|' || q || '|'
        |      || slot::VARCHAR), 1, 12) AS BIGINT) % nn.n AS d
        |  FROM slots, nn),
        |wp AS (SELECT draw.*, r.rnk AS prank FROM draw
        |  LEFT JOIN ranked r ON r.cid = draw.p),
        |adj AS (SELECT q, p, slot,
        |    CASE WHEN d = prank THEN (d + 1) % n ELSE d END AS pick
        |  FROM wp)
        |SELECT adj.q AS query, adj.p AS positive, slot::BIGINT AS slot,
        |  r.cid AS negative
        |FROM adj JOIN ranked r ON r.rnk = adj.pick
        |ORDER BY query::BIGINT, slot""".stripMargin,
    "q_split_train" ->
      """WITH h AS (SELECT doc_id,
        |    md5(concat('42|', doc_id::VARCHAR)) AS hh FROM documents),
        |u AS (SELECT doc_id,
        |    round(CAST(('0x' || substring(hh, 1, 8)) AS BIGINT)
        |      / 4294967296.0, 6) AS u FROM h)
        |SELECT doc_id, u,
        |  CASE WHEN u < 0.9 THEN 'train'
        |       WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
        |FROM u ORDER BY doc_id""".stripMargin,
    // skyline replay: per-x max, running max over strictly-greater x,
    // then the (x, y) join back — duplicates on the front all survive
    "q_pareto_front" ->
      """WITH d AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_extendedprice FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |perx AS (SELECT l_quantity AS x, max(l_extendedprice) AS my
        |  FROM d GROUP BY 1),
        |w AS (SELECT x, my, max(my) OVER (ORDER BY x DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS gm
        |  FROM perx),
        |front AS (SELECT x, my FROM w WHERE gm IS NULL OR my > gm)
        |SELECT d.l_orderkey, d.l_linenumber, d.l_quantity,
        |  d.l_extendedprice
        |FROM d JOIN front ON d.l_quantity = front.x
        |  AND d.l_extendedprice = front.my
        |ORDER BY d.l_quantity, d.l_orderkey, d.l_linenumber""".stripMargin,
    "q_top_paths" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_type AS et FROM events),
        |p AS (SELECT u, array_to_string(
        |    (list(et ORDER BY t, et))[1:3], '>') AS path
        |  FROM e GROUP BY u),
        |c AS (SELECT path, count(*)::BIGINT AS n_users FROM p GROUP BY 1),
        |tt AS (SELECT sum(n_users)::DOUBLE AS tot FROM c),
        |r AS (SELECT path, n_users, round(n_users / tt.tot, 4) AS share,
        |    row_number() OVER (ORDER BY n_users DESC, path)::BIGINT AS rank
        |  FROM c, tt)
        |SELECT path, n_users, share, rank FROM r WHERE rank <= 15
        |ORDER BY rank""".stripMargin,
    "q_temperature_sample" ->
      """WITH c AS (SELECT lang, count(*)::DOUBLE AS n FROM documents
        |  GROUP BY lang),
        |p AS (SELECT lang, n, pow(n, 0.5) AS w FROM c),
        |m AS (SELECT min(n / w) AS rmin FROM p),
        |q AS (SELECT lang, floor(w * rmin + 1e-9)::BIGINT AS quota FROM p, m),
        |r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(concat('42|', doc_id::VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r JOIN q USING (lang)
        |WHERE rn <= quota ORDER BY doc_id""".stripMargin,
    "q_balanced_sample" ->
      """WITH n AS (SELECT min(c) AS target FROM (
        |    SELECT count(*)::BIGINT AS c FROM documents GROUP BY lang)),
        |r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(concat('42|', doc_id::VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r, n WHERE rn <= n.target
        |ORDER BY doc_id""".stripMargin,
    "q_dwell" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts)::BIGINT AS t,
        |    event_type AS et FROM events),
        |w AS (SELECT et,
        |    (lead(t) OVER (PARTITION BY u ORDER BY t, et) - t) / 1e6
        |      AS gap FROM e),
        |g AS (SELECT et, gap FROM w WHERE gap IS NOT NULL)
        |SELECT et AS event_type, count(*)::BIGINT AS n_gaps,
        |  round(avg(gap), 3) AS avg_s,
        |  round(quantile_cont(gap, 0.5), 3) AS p50_s,
        |  round(quantile_cont(gap, 0.9), 3) AS p90_s,
        |  round(max(gap), 3) AS max_s
        |FROM g GROUP BY et ORDER BY event_type""".stripMargin,
    "q_retrieval_eval" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS w FROM documents),
        |tf AS (SELECT w AS qid, doc_id AS doc, count(*)::BIGINT AS tf
        |  FROM tok WHERE w IN ('query', 'dup', 'spark') GROUP BY 1, 2),
        |res AS (SELECT tf.qid, tf.doc, row_number() OVER (
        |      PARTITION BY tf.qid ORDER BY d.n_chars DESC, tf.doc)
        |      ::BIGINT AS rank
        |  FROM tf JOIN documents d ON d.doc_id = tf.doc
        |  QUALIFY rank <= 10),
        |qr AS (SELECT qid, doc, least(tf, 3)::DOUBLE AS grade FROM tf),
        |nrel AS (SELECT qid,
        |    count(*) FILTER (WHERE grade > 0)::BIGINT AS n_rel
        |  FROM qr GROUP BY 1),
        |j AS (SELECT r.qid, r.doc, r.rank, coalesce(q.grade, 0.0) AS grade
        |  FROM res r LEFT JOIN qr q ON q.qid = r.qid AND q.doc = r.doc),
        |h AS (SELECT qid,
        |    count(*) FILTER (WHERE grade > 0)::BIGINT AS n_hit,
        |    min(rank) FILTER (WHERE grade > 0) AS first_rel,
        |    sum((pow(2.0, grade) - 1.0) / (ln(rank + 1.0) / ln(2.0)))
        |      AS dcg
        |  FROM j GROUP BY 1),
        |ideal AS (SELECT qid, grade, row_number() OVER (
        |      PARTITION BY qid ORDER BY grade DESC, doc)::BIGINT AS irank
        |  FROM qr WHERE grade > 0 QUALIFY irank <= 10),
        |i AS (SELECT qid,
        |    sum((pow(2.0, grade) - 1.0) / (ln(irank + 1.0) / ln(2.0)))
        |      AS idcg
        |  FROM ideal GROUP BY 1)
        |SELECT n.qid, n.n_rel,
        |  round(CASE WHEN n.n_rel > 0
        |    THEN coalesce(h.n_hit, 0) / n.n_rel::DOUBLE
        |    ELSE 0.0 END, 4) AS recall_k,
        |  round(coalesce(h.n_hit, 0) / 10.0, 4) AS precision_k,
        |  round(coalesce(1.0 / h.first_rel, 0.0), 4) AS mrr_k,
        |  round(CASE WHEN i.idcg > 0
        |    THEN coalesce(h.dcg, 0.0) / i.idcg
        |    ELSE 0.0 END, 4) AS ndcg_k
        |FROM nrel n LEFT JOIN h USING (qid) LEFT JOIN i USING (qid)
        |ORDER BY qid""".stripMargin,
  )
}
