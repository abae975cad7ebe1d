package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocked fuzzy record linkage — approximate entity matching at corpus
 * scale. The naive form (every left row against every right row with an
 * edit-distance predicate) is a cartesian product: Catalyst can only
 * plan a non-equi string predicate as BroadcastNestedLoopJoin, which is
 * O(n·m) compute and a broadcast of a whole side. The standard fix
 * (Christen, "Data Matching", Ch. 4) is BLOCKING: rows only compare
 * within an equi-join block key, so the join shuffles hash-partitioned
 * like any other equi-join and per-block work is bounded by the block
 * size.
 *
 * Two further prunes keep the verified pair count honest at scale, both
 * provably lossless for Levenshtein distance:
 *  - length filter: |len(a) - len(b)| <= maxDist (deleting/inserting is
 *    one edit each, so distance >= length gap) — applied as a join-side
 *    predicate, it prunes before the expensive DP kernel runs;
 *  - the `levenshtein(a, b, threshold)` form, which abandons the DP
 *    early once the running minimum exceeds the threshold (O(maxDist·n)
 *    per pair instead of O(n·m)).
 *
 * Blocking bounds the pair space to Σ block², which is still QUADRATIC
 * in block size: a low-cardinality block key over a growing corpus makes
 * candidate enumeration — not verification — the scale wall (measured:
 * 10× rows in 25 nation blocks ⇒ ~100× kernel invocations even when the
 * true match set is linear). `method = "delete"` switches candidate
 * generation to the DELETION NEIGHBORHOOD (FastSS, Bocek et al. 2007):
 * every string indexes its variants with up to maxDist characters
 * deleted, and candidates are variant-key equi-join hits. Lossless for
 * Levenshtein: every edit touches at most one aligned character of each
 * string, so ed(a,b) <= k implies D_k(a) ∩ D_k(b) ≠ ∅. Work per row is
 * O(C(len, maxDist)) index keys — linear in rows for the short entity
 * strings linkage exists for (len 18 / k=2 ⇒ 172 keys) — and bucket
 * sizes track TRUE similarity clusters, not block population, so the
 * candidate stream stays proportional to output instead of block².
 */
object Linkage {

  /**
   * Self-linkage: candidate duplicate-entity pairs within `df`, compared
   * only inside equal `blockCols` values, keeping pairs with
   * Levenshtein(strCol_a, strCol_b) <= maxDist. Emits (id_a, id_b,
   * block cols, dist) with id_a < id_b — each unordered pair once.
   *
   * One hash-partition shuffle on the block key; the id_a < id_b
   * predicate halves the verified pairs. Block-size skew is the caller's
   * lever (block on more columns, raise `saltBuckets`, or feed hot blocks
   * through [[Dedup]] banding instead — edit-distance blocks are the
   * record-linkage tool for SHORT entity strings, not documents).
   *
   * `saltBuckets` > 1 splits every block into S sub-tasks: the left side
   * is keyed by hash(id) % S and the right side is replicated S ways, so
   * the DP-kernel work of one hot block spreads over S partitions instead
   * of serializing on a single task. Replication cost is S copies of the
   * (narrow) right projection — negligible next to the pair stream it
   * parallelizes — and every pair still forms exactly once, at the
   * left row's own salt. Result is provably identical for any S >= 1.
   *
   * `method`: `"block"` (default) enumerates candidates as the full
   * within-block pair space — right at small block sizes; `"delete"`
   * (maxDist <= 2) enumerates via the deletion-neighborhood index (see
   * object doc) — the scale path when blocks grow with the corpus.
   * Results are provably identical (the spec asserts it); only the
   * candidate superset differs. Salting is a block-mode lever and is
   * ignored under "delete" (variant keys are high-cardinality already).
   */
  def fuzzySelfJoin(
      df: DataFrame, blockCols: Seq[String], strCol: String, idCol: String,
      maxDist: Int, saltBuckets: Int = 1, method: String = "block"): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking columns are required: an unblocked fuzzy join is a cartesian product")
    require(maxDist >= 0, "maxDist must be non-negative")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(method == "block" || method == "delete",
      s"method must be 'block' or 'delete': $method")
    if (method == "delete") {
      require(maxDist <= 2,
        s"deletion-neighborhood indexing supports maxDist <= 2 (keys per " +
        s"row grow as C(len, maxDist)); got $maxDist — use method=\"block\"")
      return fuzzySelfJoinDelete(df, blockCols, strCol, idCol, maxDist)
    }
    // the join INPUT is small (entity tables), but the join OUTPUT is the
    // candidate-pair stream — hundreds of times larger — and the DP kernel
    // runs inside the join's tasks. AQE sizes post-shuffle partitions from
    // input bytes, so it would coalesce this join onto a handful of tasks
    // and serialize the kernel; an explicit user repartition (which AQE
    // honors) keeps the kernel spread over real parallelism.
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val saltKeys = blockCols :+ "_salt"
    val left = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_a") :+ col(strCol).as("_sa")): _*)
      .withColumn("_salt", pmod(xxhash64(col(s"id_a")), lit(saltBuckets.toLong)))
      .repartition(nPart, saltKeys.map(col): _*)
    val right = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_b") :+ col(strCol).as("_sb")): _*)
      .withColumn("_salt", explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
      .repartition(nPart, saltKeys.map(col): _*)
    val joined = left.join(right,
      (blockCols.map(c => left(c) === right(c)) :+ (left("_salt") === right("_salt")))
        .reduce(_ && _)
        && col("id_a") < col("id_b")
        && abs(length(col("_sa")) - length(col("_sb"))) <= maxDist)
    // thresholded form returns -1 ABOVE the bound (that's the early-abandon
    // signal, not a distance) — keep 0 <= dist <= maxDist. The keep rule
    // runs through ONE generator (explode of a 0/1-element array) instead
    // of a Filter over a Project: predicate-pushdown would otherwise inline
    // the DP kernel into both filter conjuncts plus the projection and
    // evaluate it three times per candidate pair.
    val dist = levenshtein(col("_sa"), col("_sb"), math.max(maxDist, 1))
    joined
      .select((col("id_a") +: col("id_b") +: blockCols.map(left(_))) :+
        explode(when(dist.between(0, maxDist), array(dist))
          .otherwise(array().cast("array<int>"))).as("dist"): _*)
  }

  /** FastSS candidate generation (see object doc): variant-key equi-join
   * within blocks, pair-deduped BEFORE the DP kernel (near-identical
   * strings share up to C(len, maxDist) variants, so a matching pair is
   * hit many times). The candidate stream through the join and the
   * DISTINCT carries only (ids, block, len) — the strings re-join by id
   * AFTER dedup, so the multi-hit volume is ids-wide, not strings-wide,
   * and the kernel runs exactly once per candidate pair. */
  private def fuzzySelfJoinDelete(
      df: DataFrame, blockCols: Seq[String], strCol: String, idCol: String,
      maxDist: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val base = df.select(
      (blockCols.map(col) :+ col(idCol).as("_id") :+ col(strCol).as("_s")): _*)
    // variants shuffle as 64-bit kernel hashes, never as strings: a hash
    // collision only ADDS a candidate pair the exact DP verify then
    // rejects (losslessness is one-directional), the join input is
    // fixed-width, and the neighborhood comes from the compiled
    // graft_del_hashes kernel — the HOF formulation measured ~1 ms/row
    // interpreted, a 100x cliff (the graft_dot/graft_jaro precedent)
    def keyed(id: String, ln: String) = base.select(
      (blockCols.map(col) :+ col("_id").as(id) :+
        length(col("_s")).as(ln) :+
        explode(call_function("graft_del_hashes", col("_s"),
          lit(maxDist))).as("_v")): _*)
    val l = keyed("id_a", "_la")
    val r = keyed("id_b", "_lb")
    // candidates: same block, same deletion variant, canonical order,
    // length prefilter — all BEFORE the distinct so dead pairs never
    // shuffle; the repartition keeps the kernel spread after AQE sizes
    // the dedup from its (small) input.
    // MERGE hints throughout: Catalyst's Generate (explode) node keeps
    // its CHILD's size estimate, so a variant frame that explodes to
    // ~280 hash rows per record still LOOKS like the pruned base
    // projection — small enough that the planner picks a broadcast
    // build of what is really a data-scale side (measured: a 1.6 GB
    // driver broadcast at 16x the gate corpus, an OOM crash at 32x).
    // Sort-merge, not shuffled-hash: SHJ's per-partition build side
    // must FIT in execution memory (measured OOM at 32x under 32
    // shuffle partitions), while SMJ spills gracefully at any corpus
    // size; the string re-join sides scale with the data too, so they
    // get the same treatment.
    val cand = l.hint("merge").join(r.hint("merge"),
      (blockCols.map(c => l(c) === r(c)) :+ (l("_v") === r("_v")))
        .reduce(_ && _)
        && col("id_a") < col("id_b")
        && abs(col("_la") - col("_lb")) <= maxDist)
      .select((col("id_a") +: col("id_b") +: blockCols.map(l(_))): _*)
      .distinct()
      .repartition(nPart, col("id_a"))
    val sa = base.select(col("_id").as("id_a"), col("_s").as("_sa"))
    val sb = base.select(col("_id").as("id_b"), col("_s").as("_sb"))
    val dist = levenshtein(col("_sa"), col("_sb"), math.max(maxDist, 1))
    // pin the kernel stage's width: the DP verify evaluates in the stage
    // reading the id_b join, whose exchange AQE otherwise coalesces by
    // bytes (candidate rows are ids-wide) down to a handful of tasks —
    // r18 measured the kernel on 6 tasks under a 32-core session. The
    // keyed REPARTITION_BY_NUM satisfies the join's distribution, so no
    // extra exchange is added.
    cand
      .join(sa.hint("merge"), Seq("id_a"))
      .repartition(nPart, col("id_b"))
      .join(sb.hint("merge"), Seq("id_b"))
      .select((col("id_a") +: col("id_b") +: blockCols.map(col)) :+
        explode(when(dist.between(0, maxDist), array(dist))
          .otherwise(array().cast("array<int>"))).as("dist"): _*)
  }

  /**
   * Two-table linkage (e.g. a new batch against a master entity table):
   * every left row paired with the right rows in its block within
   * `maxDist` edits, plus a best-match rank (1 = closest, ties by right
   * id) so `rank = 1` is the classic deterministic-linkage assignment.
   * The rank window partitions by the LEFT id — state per key is the
   * match list, never the corpus.
   */
  def fuzzyJoin(
      left: DataFrame, right: DataFrame, blockCols: Seq[String],
      leftStr: String, rightStr: String, leftId: String, rightId: String,
      maxDist: Int, saltBuckets: Int = 1, method: String = "block"): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking columns are required: an unblocked fuzzy join is a cartesian product")
    require(maxDist >= 0, "maxDist must be non-negative")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(method == "block" || method == "delete",
      s"method must be 'block' or 'delete': $method")
    if (method == "delete") {
      require(maxDist <= 2,
        s"deletion-neighborhood indexing supports maxDist <= 2 (keys per " +
        s"row grow as C(len, maxDist)); got $maxDist — use method=\"block\"")
      return fuzzyJoinDelete(left, right, blockCols, leftStr, rightStr,
        leftId, rightId, maxDist)
    }
    // same kernel-parallelism shape as fuzzySelfJoin: explicit repartition
    // so AQE cannot coalesce the pair-generating join onto few tasks, salt
    // on the (unreplicated) left id, right replicated saltBuckets ways
    val nPart = left.sparkSession.sessionState.conf.numShufflePartitions
    val saltKeys = blockCols :+ "_salt"
    val l = left.select(
      (blockCols.map(col) :+ col(leftId).as("id_l") :+ col(leftStr).as("_sl")): _*)
      .withColumn("_salt", pmod(xxhash64(col("id_l")), lit(saltBuckets.toLong)))
      .repartition(nPart, saltKeys.map(col): _*)
    val r = right.select(
      (blockCols.map(col) :+ col(rightId).as("id_r") :+ col(rightStr).as("_sr")): _*)
      .withColumn("_salt", explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
      .repartition(nPart, saltKeys.map(col): _*)
    val dist0 = levenshtein(col("_sl"), col("_sr"), math.max(maxDist, 1))
    val joined = l.join(r,
      (blockCols.map(c => l(c) === r(c)) :+ (l("_salt") === r("_salt"))).reduce(_ && _)
        && abs(length(col("_sl")) - length(col("_sr"))) <= maxDist)
      // one generator evaluation of the DP kernel (see fuzzySelfJoin)
      .select((col("id_l") +: col("id_r") +: blockCols.map(l(_))) :+
        explode(when(dist0.between(0, maxDist), array(dist0))
          .otherwise(array().cast("array<int>"))).as("dist"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_l")).orderBy(col("dist"), col("id_r"))
    joined
      .withColumn("match_rank", row_number().over(w))
      .select((col("id_l") +: col("id_r") +: blockCols.map(l(_))) ++
        Seq(col("dist"), col("match_rank")): _*)
  }

  /** Two-table FastSS candidates (the [[fuzzySelfJoinDelete]] shape
   * without the canonical-order cut): variant-hash equi-join, ids-only
   * dedup, strings re-joined for the verify, then the same best-match
   * rank window as the block path. */
  private def fuzzyJoinDelete(
      left: DataFrame, right: DataFrame, blockCols: Seq[String],
      leftStr: String, rightStr: String, leftId: String, rightId: String,
      maxDist: Int): DataFrame = {
    graft.functions.GraftFunctions.register(left.sparkSession)
    val nPart = left.sparkSession.sessionState.conf.numShufflePartitions
    def keyed(df: DataFrame, strC: String, idC: String, id: String,
        ln: String) = df.select(
      (blockCols.map(col) :+ col(idC).as(id) :+
        length(col(strC)).as(ln) :+
        explode(call_function("graft_del_hashes", col(strC),
          lit(maxDist))).as("_v")): _*)
    val l = keyed(left, leftStr, leftId, "id_l", "_ll")
    val r = keyed(right, rightStr, rightId, "id_r", "_lr")
    // MERGE hints for the fuzzySelfJoinDelete reason: Generate keeps
    // its child's size estimate, so the exploded variant frames look
    // broadcastable when they are really data-scale (and SHJ's
    // no-spill build side OOMs where sort-merge spills)
    val cand = l.hint("merge").join(r.hint("merge"),
      (blockCols.map(c => l(c) === r(c)) :+ (l("_v") === r("_v")))
        .reduce(_ && _)
        && abs(col("_ll") - col("_lr")) <= maxDist)
      .select((col("id_l") +: col("id_r") +: blockCols.map(l(_))): _*)
      .distinct()
      .repartition(nPart, col("id_l"))
    val sl = left.select(col(leftId).as("id_l"), col(leftStr).as("_sl"))
    val sr = right.select(col(rightId).as("id_r"), col(rightStr).as("_sr"))
    val dist0 = levenshtein(col("_sl"), col("_sr"), math.max(maxDist, 1))
    val verified = cand
      .join(sl.hint("merge"), Seq("id_l"))
      .join(sr.hint("merge"), Seq("id_r"))
      .select((col("id_l") +: col("id_r") +: blockCols.map(col)) :+
        explode(when(dist0.between(0, maxDist), array(dist0))
          .otherwise(array().cast("array<int>"))).as("dist"): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_l")).orderBy(col("dist"), col("id_r"))
    verified
      .withColumn("match_rank", row_number().over(w))
      .select((col("id_l") +: col("id_r") +: blockCols.map(col)) ++
        Seq(col("dist"), col("match_rank")): _*)
  }

  /**
   * Jaro–Winkler self-linkage: the name-matching variant — same blocked
   * equi-join shape as [[fuzzySelfJoin]], scored by the native
   * `graft_jaro` kernel (graft.functions.JaroWinkler; codegen'd, exact
   * DuckDB-`jaro_winkler_similarity` semantics) and kept at
   * `sim >= minSim` (4dp-rounded before the cut, so near-threshold libm
   * noise can't flip membership between engines). Emits (id_a, id_b,
   * blocks…, sim) with id_a < id_b.
   *
   * The length prune here is the JW bound, provably lossless: with
   * la <= lb every character of the shorter side matching still caps
   * jaro at (2 + la/lb)/3, and the Winkler boost at its l=4 maximum
   * lifts that to at most 0.6·jaro + 0.4 — pairs whose length ratio
   * cannot reach `minSim` never run the kernel. (For minSim <= 0.4 the
   * bound prunes nothing and the blocks carry the full cost — JW is a
   * HIGH-threshold matcher; pair it with tight blocks.)
   */
  def jaroSelfJoin(
      df: DataFrame, blockCols: Seq[String], strCol: String, idCol: String,
      minSim: Double, saltBuckets: Int = 1): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking columns are required: an unblocked fuzzy join is a cartesian product")
    require(minSim > 0.0 && minSim <= 1.0, s"minSim must be in (0,1]: $minSim")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val saltKeys = blockCols :+ "_salt"
    val left = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_a") :+ col(strCol).as("_sa")): _*)
      .withColumn("_salt", pmod(xxhash64(col("id_a")), lit(saltBuckets.toLong)))
      .repartition(nPart, saltKeys.map(col): _*)
    val right = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_b") :+ col(strCol).as("_sb")): _*)
      .withColumn("_salt", explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
      .repartition(nPart, saltKeys.map(col): _*)
    val la = length(col("_sa")).cast("double")
    val lb = length(col("_sb")).cast("double")
    val jaroCap = (lit(2.0) + least(la, lb) / greatest(la, lb)) / 3.0
    val simCap = jaroCap + lit(0.4) * (lit(1.0) - jaroCap)
    // the prune must be lossless w.r.t. the ROUNDED membership cut
    // (round(sim,4) >= minSim admits true sims down to minSim - 5e-5),
    // so the bound compares against the half-ulp-relaxed threshold —
    // without it, a pair whose unrounded cap sits just under minSim
    // (attainable when one string is a >=4-char prefix of the other)
    // would be pruned although the rounded cut keeps it
    val joined = left.join(right,
      (blockCols.map(c => left(c) === right(c)) :+ (left("_salt") === right("_salt")))
        .reduce(_ && _)
        && col("id_a") < col("id_b")
        && simCap >= minSim - 0.00005)
    // one generator evaluation of the kernel (the fuzzySelfJoin rule)
    val sim = round(call_function("graft_jaro", col("_sa"), col("_sb")), 4)
    joined
      .select((col("id_a") +: col("id_b") +: blockCols.map(left(_))) :+
        explode(when(sim >= minSim, array(sim))
          .otherwise(array().cast("array<double>"))).as("sim"): _*)
  }

  /**
   * Portable American Soundex — the phonetic BLOCK KEY for name
   * linkage (length caps and JW bounds prune lexically; Soundex blocks
   * by how a name SOUNDS, catching Smith/Smyth, Ashcraft/Ashcroft —
   * the misspelling families edit-bounds still compare): first letter
   * + three digits, h/w transparent (same codes across h/w collapse:
   * Ashcraft → A261), vowels separate (Tymczak → T522), leading
   * same-code run absorbed (Pfister → P236), Lloyd → L300.
   *
   * Expressed as a pure function-chain (lower → strip → first-letter
   * code ++ h/w-stripped-rest codes → per-digit run collapse → drop
   * lead → strip zeros → pad) so the SAME construction runs codegen'd
   * in Spark and replays verbatim in any SQL engine: the run collapse
   * is seven per-digit `regexp_replace(d+, d)` passes, NOT a `(.)\1+`
   * backreference — RE2-based engines (DuckDB among them) don't
   * support backreferences, and an oracle that cannot replay the key
   * is no oracle. Non-Latin letters strip; an empty residue is NULL
   * (no phonetic signal is not a block).
   *
   * The first letter is coded SEPARATELY from the remainder: h/w are
   * transparent only in positions 2+. A leading 'h'/'w' has no digit
   * code, so it survives `translate` as itself and the lead-drop
   * removes it — never the following consonant's code (Wright → W623,
   * Hron → H650, the class an all-positions h/w strip mis-codes).
   * Leading same-code absorption still works because the first
   * letter's own code heads the run (Pfister → P236), including
   * across an h/w gap (first-letter code abuts the rest's codes).
   */
  def soundex(c: Column): Column = {
    val letters = regexp_replace(lower(c), "[^a-z]", "")
    val rest = regexp_replace(letters, "^.", "")
    val table = "012301202245501262301202"
    val codes = concat(
      translate(substring(letters, 1, 1), "abcdefgijklmnopqrstuvxyz",
        table),
      translate(translate(rest, "hw", ""), "abcdefgijklmnopqrstuvxyz",
        table))
    val collapsed = (0 to 6).foldLeft(codes) { (s, d) =>
      regexp_replace(s, s"$d+", s"$d")
    }
    val body = regexp_replace(regexp_replace(collapsed, "^.", ""), "0", "")
    when(length(letters) > 0,
      concat(upper(substring(letters, 1, 1)),
        rpad(substring(body, 1, 3), 3, "0")))
  }

  /**
   * Sorted-neighborhood self-linkage (Hernández & Stolfo 1995; Christen
   * Ch. 4's third blocking family next to lexical blocks and phonetic
   * keys): sort all records by a key, compare each record with its
   * `window` FOLLOWING neighbors in that order, verify with the exact
   * Jaro–Winkler kernel. Where blocking partitions (and misses pairs
   * straddling a block edge), the sliding window rides THROUGH
   * adjacent sort positions — the recall profile is different, which
   * is why production linkage runs both and unions.
   *
   * Distributed shape — the naive form is ONE global window (a
   * single-partition sort, the anti-pattern): instead rows hash-free
   * range-split by `bucketExpr` (a PREFIX of the sort order, e.g. the
   * first letter — so (bucket, key, id) IS the global order), each
   * bucket windows independently (bucket-keyed Exchange, w lead
   * columns), and each bucket's LAST `window` rows are duplicated into
   * the NEXT non-empty bucket so cross-boundary neighbors still meet;
   * duplicate-duplicate pairs are dropped (they already formed in the
   * home bucket — the overlap-join dedup rule). EXACTNESS CONTRACT:
   * equal to the global-window semantics iff every bucket holds at
   * least `window` rows — a thinner bucket could hide a pair spanning
   * three buckets — so bucket occupancy is CHECKED (one k-sized count,
   * loop-control state) and a violating bucketing throws with the
   * "coarsen the buckets" remedy rather than silently losing recall.
   * Output: id_a, id_b (a before b in sort order), sim (4dp).
   */
  def sortedNeighborPairs(df: DataFrame, sortCol: String, idCol: String,
      strCol: String, window: Int, minSim: Double,
      bucketExpr: Column): DataFrame = {
    require(window >= 1 && window <= 64, s"window must be in [1,64]: $window")
    require(minSim > 0.0 && minSim <= 1.0, s"minSim must be in (0,1]: $minSim")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val base = df.select(bucketExpr.cast("string").as("_bk"),
      col(sortCol).as("_k"), col(idCol).as("_id"), col(strCol).as("_s"))
    // bucket roster: k-sized, sorted — drives the next-bucket literal
    // map and the occupancy contract
    val roster = base.groupBy("_bk").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    require(roster.nonEmpty, "empty input")
    val thin = roster.filter(_._2 < window)
    require(thin.isEmpty,
      s"buckets thinner than window=$window would lose cross-bucket " +
      s"pairs: ${thin.take(5).mkString(", ")} — coarsen bucketExpr")
    // bucket -> next-bucket as a BROADCAST k-row frame, not a chained
    // when() literal: the expression form is a roster-deep CaseWhen tree
    // whose Catalyst analysis alone cost ~3 s of pure driver time at
    // 1500 buckets (the r12 sf1 drift, 2.2 -> 5.9 s, was exactly this —
    // bucket count grows with the corpus, so the "constant" plan cost
    // scaled with the data)
    val spark0 = df.sparkSession
    import spark0.implicits._
    val nextDf = broadcast(roster.map(_._1).sliding(2).collect {
      case Array(a, b) => (a, b)
    }.toSeq.toDF("_bk", "_nbk"))
    val wHome = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bk")).orderBy(col("_k"), col("_id"))
    val cnt = org.apache.spark.sql.expressions.Window.partitionBy(col("_bk"))
    val marked = base
      .withColumn("_rn", row_number().over(wHome))
      .withColumn("_n", count(lit(1)).over(cnt))
    val dups = marked
      .filter(col("_rn") > col("_n") - window)
      .join(nextDf, Seq("_bk")) // inner: the LAST bucket has no successor
      .withColumn("_bk", col("_nbk"))
      .drop("_nbk")
      .withColumn("_dup", lit(true))
    val all = marked.select(col("_bk"), col("_k"), col("_id"), col("_s"))
      .withColumn("_dup", lit(false))
      .unionByName(dups.select(col("_bk"), col("_k"), col("_id"),
        col("_s"), col("_dup")))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_bk")).orderBy(col("_k"), col("_id"))
    val withLeads = (1 to window).foldLeft(all) { (acc, i) =>
      acc.withColumn(s"_l$i",
        lead(struct(col("_id"), col("_s"), col("_dup")), i).over(wAll))
    }
    val sim = round(call_function("graft_jaro", col("_s"), col("_nb._s")), 4)
    withLeads
      .select(col("_id"), col("_s"), col("_dup"),
        explode(array((1 to window).map(i => col(s"_l$i")): _*)).as("_nb"))
      .filter(col("_nb").isNotNull)
      .filter(!(col("_dup") && col("_nb._dup")))
      .select(col("_id").as("id_a"), col("_nb._id").as("id_b"),
        explode(when(sim >= minSim, array(sim))
          .otherwise(array().cast("array<double>"))).as("sim"))
  }

  /**
   * Edit-distance blocked self-linkage — the third verify kernel next
   * to Jaro–Winkler ([[jaroSelfJoin]]) and phonetic blocking
   * ([[phoneticSelfJoin]]): candidate pairs share a block, survive the
   * LENGTH prune (||a|−|b|| > maxDist ⇒ dist > maxDist — inserting
   * the length difference is already too many edits, so the prune is
   * provably lossless), and verify by exact Levenshtein ≤ maxDist.
   * Edit distance complements JW where transposition-heavy or
   * suffix-divergent misspellings score poorly on prefix-weighted
   * similarity but are 1-2 raw edits apart.
   *
   * The kernel is Spark's native `levenshtein(l, r, threshold)` —
   * codegen'd BANDED DP: cost O(maxDist · min(|a|,|b|)) per pair, not
   * O(|a|·|b|), the difference between a verify step and a blow-up
   * when blocks hold long strings. DuckDB's `levenshtein` replays the
   * cut exactly (the threshold form returns the true distance whenever
   * it is ≤ threshold, −1 otherwise, and −1 rows are exactly the
   * > maxDist rows the oracle's `<=` drops). Same salt levers and
   * equi-join-only shape as jaroSelfJoin. Output: id_a, id_b, block
   * cols, dist (long).
   */
  def editSelfJoin(df: DataFrame, blockCols: Seq[String], strCol: String,
      idCol: String, maxDist: Int, saltBuckets: Int = 1): DataFrame = {
    require(blockCols.nonEmpty,
      "blocking columns are required: an unblocked fuzzy join is a cartesian product")
    require(maxDist >= 0, s"maxDist must be >= 0: $maxDist")
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    val saltKeys = blockCols :+ "_salt"
    val left = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_a") :+ col(strCol).as("_sa")): _*)
      .withColumn("_salt", pmod(xxhash64(col("id_a")), lit(saltBuckets.toLong)))
      .repartition(nPart, saltKeys.map(col): _*)
    val right = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_b") :+ col(strCol).as("_sb")): _*)
      .withColumn("_salt", explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
      .repartition(nPart, saltKeys.map(col): _*)
    val joined = left.join(right,
      (blockCols.map(c => left(c) === right(c)) :+ (left("_salt") === right("_salt")))
        .reduce(_ && _)
        && col("id_a") < col("id_b")
        && abs(length(col("_sa")) - length(col("_sb"))) <= maxDist)
    val dist = levenshtein(col("_sa"), col("_sb"), maxDist)
    joined
      .select((col("id_a") +: col("id_b") +: blockCols.map(left(_))) :+
        explode(when(dist >= 0, array(dist.cast("long")))
          .otherwise(array().cast("array<long>"))).as("dist"): _*)
  }

  /**
   * Phonetic-blocked self-linkage: [[jaroSelfJoin]] with [[soundex]]
   * as the block key — candidates share a sound class instead of a
   * length/prefix class, then the exact Jaro–Winkler kernel verifies
   * inside blocks (same rounded cut, same salt levers). The two
   * blockings are complementary recall strategies; production linkage
   * runs both and unions (Christen Ch. 4's multi-pass blocking).
   * NULL-soundex rows (no letters) never enter a block.
   * Output: id_a, id_b, block code, sim (4dp).
   */
  def phoneticSelfJoin(df: DataFrame, idCol: String, strCol: String,
      minSim: Double, saltBuckets: Int = 1): DataFrame = {
    require(!df.columns.contains("soundex"),
      "input column soundex collides with phoneticSelfJoin's block key")
    jaroSelfJoin(
      df.withColumn("soundex", soundex(col(strCol)))
        .filter(col("soundex").isNotNull),
      Seq("soundex"), strCol, idCol, minSim, saltBuckets)
  }

  /**
   * Fellegi–Sunter field weights (Fellegi & Sunter 1969 — the
   * probabilistic record-linkage framework the U.S. Census Bureau's
   * matchers are built on): from a LABELED pair frame (each row a
   * candidate pair with boolean per-field agreement indicators and a
   * match label), estimate per field
   *   m = P(agree | match),  u = P(agree | non-match),
   * with add-half smoothing (m = (a_M + 0.5)/(n_M + 1)) so a field that
   * never disagrees on matches still gets a finite log-ratio, and the
   * estimates are defined even when one class is empty. The scoring
   * weights are the log-likelihood ratios
   *   w_agree = log2(m/u),  w_disagree = log2((1−m)/(1−u)):
   * a scored pair sums w_agree over agreeing fields and w_disagree over
   * the rest, and thresholds on the sum (the classic match/clerical/
   * non-match bands). ONE aggregation scan estimates every field —
   * fields unroll as conditional sums, so the plan is one Exchange
   * regardless of field count; output is field-count-sized.
   * NULL agreement indicators count as disagreement (the conservative
   * Census convention); NULL labels are dropped.
   * Output: one row per field — field, m (6dp), u (6dp),
   * w_agree (4dp), w_disagree (4dp), in `agreeCols` order.
   */
  def fellegiSunter(pairs: DataFrame, matchCol: String,
      agreeCols: Seq[String]): DataFrame = {
    require(agreeCols.nonEmpty, "at least one agreement field")
    val lbl = col(matchCol).isNotNull && col(matchCol) === true
    val non = col(matchCol).isNotNull && col(matchCol) === false
    val base = pairs.filter(col(matchCol).isNotNull)
    val aggs: Seq[Column] =
      Seq(sum(when(lbl, 1L).otherwise(0L)).as("_nm"),
        sum(when(non, 1L).otherwise(0L)).as("_nu")) ++
      agreeCols.zipWithIndex.flatMap { case (f, i) =>
        val agree = coalesce(col(f), lit(false))
        Seq(sum(when(lbl && agree, 1L).otherwise(0L)).as(s"_am$i"),
          sum(when(non && agree, 1L).otherwise(0L)).as(s"_au$i"))
      }
    val tot = base.agg(aggs.head, aggs.tail: _*)
    val rows = agreeCols.zipWithIndex.map { case (f, i) =>
      val m = (col(s"_am$i") + 0.5) / (col("_nm") + 1.0)
      val u = (col(s"_au$i") + 0.5) / (col("_nu") + 1.0)
      struct(lit(f).as("field"),
        round(m, 6).as("m"), round(u, 6).as("u"),
        round(log2(m / u), 4).as("w_agree"),
        round(log2((lit(1.0) - m) / (lit(1.0) - u)), 4).as("w_disagree"))
    }
    tot.select(explode(array(rows: _*)).as("x")).select("x.*")
  }

  /**
   * Unsupervised Fellegi–Sunter via EM (Winkler 1988, "Using the EM
   * algorithm for weight computation in the Fellegi–Sunter model") —
   * the production form of [[fellegiSunter]]: real linkage decks have
   * no labels, so m/u and the match prevalence p are fitted as a
   * two-class mixture over the AGREEMENT PATTERNS. One scan aggregates
   * the ≤2^k pattern counts (k-bounded driver state — the IPF/codebook
   * contract, enforced); the EM loop then runs driver-side a FIXED
   * `iters` rounds from the canonical deterministic start
   * (p = 0.1, m = 0.9, u = 0.1), conditional independence across
   * fields (the standard FS assumption):
   *   E: g_j = p·Πm / (p·Πm + (1−p)·Πu)  per pattern j,
   *   M: p = Σn_j·g_j/N,  m_f = Σ_{agree f} n_j·g_j / Σ n_j·g_j,
   *      u_f analogous under (1−g).
   * Every float operation is order-pinned (fields multiply in
   * `agreeCols` order, patterns sum in sorted-pattern order) so the
   * fit replays exactly in any engine as an unrolled iteration.
   * NULL agreement indicators count as disagreement, as in the
   * supervised estimator. M-step divisions carry the standard EM
   * safeguard (class masses clamped off 0/N, rates into (eps, 1−eps),
   * eps = 1e-9) so a perfectly separated deck stays finite; the clamps
   * are exact no-ops wherever the raw arithmetic was already finite.
   * Output: one row per field in `agreeCols` order — field, m (6dp),
   * u (6dp), w_agree (4dp), w_disagree (4dp), p_match (6dp, the fitted
   * prevalence, constant across rows).
   */
  def fellegiSunterEm(pairs: DataFrame, agreeCols: Seq[String],
      iters: Int = 10): DataFrame = {
    require(agreeCols.nonEmpty && agreeCols.size <= 16,
      s"1..16 agreement fields (patterns are 2^k driver state): " +
      s"${agreeCols.size}")
    require(iters >= 1 && iters <= 1000, s"iters in [1,1000]: $iters")
    val k = agreeCols.size
    val patternCols = agreeCols.map(f => coalesce(col(f), lit(false)))
    val counts = pairs
      .groupBy(patternCols.zipWithIndex.map { case (c, i) =>
        c.as(s"_f$i") }: _*)
      .agg(count(lit(1)).as("_n"))
      .collect()
      .map { r =>
        ((0 until k).map(i => r.getBoolean(i)).toVector,
          r.getLong(k).toDouble)
      }
      .sortBy(_._1.map(b => if (b) '1' else '0').mkString)
    val nTotal = counts.map(_._2).sum
    require(nTotal > 0, "no pairs to fit")
    var p = 0.1
    var m = Array.fill(k)(0.9)
    var u = Array.fill(k)(0.1)
    for (_ <- 0 until iters) {
      // E-step: responsibilities per pattern, field terms multiplied
      // left-to-right in agreeCols order (the replay contract)
      val g = counts.map { case (bits, _) =>
        var tm = 1.0
        var tu = 1.0
        var f = 0
        while (f < k) {
          tm *= (if (bits(f)) m(f) else 1.0 - m(f))
          tu *= (if (bits(f)) u(f) else 1.0 - u(f))
          f += 1
        }
        val pm = p * tm
        val pu = (1.0 - p) * tu
        pm / (pm + pu)
      }
      // M-step: pattern sums in the sorted-pattern order of `counts`
      var sg = 0.0
      var i = 0
      while (i < counts.length) { sg += counts(i)._2 * g(i); i += 1 }
      // standard EM safeguard (Winkler): clamp the class masses away
      // from 0 and N, and the fitted rates into (eps, 1-eps) — on a
      // degenerate deck (perfectly separated, or responsibilities
      // saturating to 1.0 in float) the raw divisions go 0/0 or x/0 and
      // every later round is NaN/Inf garbage. Both clamps are exact
      // no-ops on any non-degenerate deck (the replay contract holds:
      // the unrolled arithmetic is unchanged wherever it was finite).
      val eps = 1e-9
      def clamp01(x: Double): Double =
        if (x.isNaN) 0.5 else math.min(1.0 - eps, math.max(eps, x))
      val sgC = math.min(nTotal - eps, math.max(eps, sg))
      val m2 = new Array[Double](k)
      val u2 = new Array[Double](k)
      var f = 0
      while (f < k) {
        var am = 0.0
        var au = 0.0
        i = 0
        while (i < counts.length) {
          val (bits, n) = counts(i)
          if (bits(f)) { am += n * g(i); au += n * (1.0 - g(i)) }
          i += 1
        }
        m2(f) = clamp01(am / sgC)
        u2(f) = clamp01(au / (nTotal - sgC))
        f += 1
      }
      p = clamp01(sg / nTotal)
      m = m2
      u = u2
    }
    val spark = pairs.sparkSession
    import spark.implicits._
    agreeCols.zipWithIndex.map { case (f, i) =>
      (f,
        BigDecimal(m(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        BigDecimal(u(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        BigDecimal(math.log(m(i) / u(i)) / math.log(2.0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.log((1.0 - m(i)) / (1.0 - u(i))) / math.log(2.0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toDF("field", "m", "u", "w_agree", "w_disagree", "p_match")
  }

  /**
   * Blocking-quality metrics (Christen, "Data Matching" Ch. 7): how good
   * is a blocking scheme BEFORE paying for comparisons —
   *   reduction ratio RR = 1 − candidate_pairs / total_pairs
   * (how much of the n(n−1)/2 pair space the blocks prune), and
   *   pairs completeness PC = truth pairs co-blocked / truth pairs
   * (how much recall the pruning sacrifices). Computed WITHOUT
   * enumerating a single candidate pair: candidate_pairs is
   * Σ_b c_b(c_b−1)/2 over the block-size aggregation, and PC joins the
   * truth pairs to the per-id block keys twice (two broadcast-friendly
   * equi-joins on the id). Rows with a NULL in any block column never
   * enter a block (they pair with nothing), matching the linkage
   * operators' behavior.
   * Output: 1 row — n_records, total_pairs, cand_pairs,
   * reduction_ratio (6dp), n_truth, truth_coblocked,
   * pairs_completeness (6dp).
   */
  def blockingQuality(base: DataFrame, idCol: String,
      blockCols: Seq[String], truth: DataFrame, idACol: String,
      idBCol: String): DataFrame = {
    require(blockCols.nonEmpty, "at least one block column")
    // unit separator so composite keys cannot alias ("a","bc" vs "ab","c")
    val key = concat_ws("\u0001",
      blockCols.map(c => col(c).cast("string")): _*)
    val nonNull = blockCols.map(col(_).isNotNull).reduce(_ && _)
    val keyed = base.filter(nonNull)
      .select(col(idCol).as("_id"), key.as("_bk"))
    val cnts = keyed.groupBy("_bk").agg(count(lit(1)).as("c"))
    val candTotals = cnts.agg(
      coalesce(sum(col("c")), lit(0L)).as("n_records"),
      coalesce(sum(col("c") * (col("c") - 1) / 2), lit(0L))
        .cast("long").as("cand_pairs"))
    val tr = truth.select(col(idACol).as("_ta"), col(idBCol).as("_tb"))
    val co = tr
      .join(keyed.select(col("_id").as("_ta"), col("_bk").as("_ka")),
        Seq("_ta"), "left")
      .join(keyed.select(col("_id").as("_tb"), col("_bk").as("_kb")),
        Seq("_tb"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(when(col("_ka").isNotNull && col("_ka") === col("_kb"), 1L)
          .otherwise(0L)).as("truth_coblocked"))
    candTotals.crossJoin(co).select(
      col("n_records"),
      (col("n_records") * (col("n_records") - 1) / 2).cast("long")
        .as("total_pairs"),
      col("cand_pairs"),
      round(when(col("n_records") >= 2,
        lit(1.0) - col("cand_pairs") /
          (col("n_records") * (col("n_records") - 1) / 2.0))
        .otherwise(lit(0.0)), 6).as("reduction_ratio"),
      col("n_truth"),
      col("truth_coblocked"),
      round(when(col("n_truth") > 0,
        col("truth_coblocked") / col("n_truth").cast("double"))
        .otherwise(lit(0.0)), 6).as("pairs_completeness"))
  }
}
