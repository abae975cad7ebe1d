package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session-scoped registry of DataFrames cached by graft operators, so a
 * long-lived session can release them without `spark.catalog.clearCache()`
 * (which would also nuke the user's own caches) and without reaching into
 * `sharedState.cacheManager` internals. Operators call `track` instead of
 * `.cache()`; users call `Dedup.unpersistAll(spark)` /
 * `Similarity.unpersistAll(spark)` (both delegate here) once the pair /
 * index results are consumed.
 *
 * Caches are grouped into named scopes so short-lived pair-operator caches
 * ([[Ops]]) release independently of long-lived index caches ([[Index]]):
 * `Dedup.unpersistAll` after a dedup pass must NOT evict a live
 * `IvfIndex`'s cell assignments (which would silently re-run the KMeans
 * transform scan on every subsequent query). Index caches release only
 * through their owner (e.g. `IvfIndex.unpersist()`).
 */
private[graft] object CacheScope {

  /** Short-lived pair-operator caches (signatures, band keys, shingles). */
  val Ops = "ops"

  /** [[DistScan]] input pins — optimization-only (an evicted or released
   * pin recomputes the IDENTICAL bucketing; DistScanSpec proves it).
   * Terminal 1-row statistics (rocAuc, ksTest, mannWhitney, spearman)
   * release exactly their OWN pins the moment their result is
   * materialized ([[DistScan.sealTerminal]] untracks the pins recorded
   * during that statistic's construction) — a long session of drift
   * dashboards never accumulates corpus-scale spill, and a concurrent
   * lazy scan's pin survives a sibling's seal. Separate from [[Ops]] so
   * the owners' unpersistAll drains can never touch a pair operator's
   * in-flight signature cache. */
  val Scan = "scan"

  /** Long-lived index caches (IVF cell assignments); released only by the
   * owning index object, never by `Dedup`/`Similarity.unpersistAll`. */
  val Index = "index"

  /** LEGACY scope: Bloom-filter broadcasts, from when
   * [[Dedup.exactIncrementalBloom]] pinned a session-lifetime broadcast.
   * The filter now lives inside the result plan as a foldable literal
   * (nothing to track), so this scope stays empty; kept so
   * `Dedup.releaseBloomFilters` remains a safe no-op. */
  val Bloom = "bloom"

  private val registry =
    new java.util.WeakHashMap[
      SparkSession,
      scala.collection.mutable.Map[String, scala.collection.mutable.Buffer[DataFrame]]]()

  /** Cache `df` and remember it under its session + scope for later release. */
  def track(df: DataFrame, scope: String = Ops): DataFrame = synchronized {
    // The value Buffer holds DataFrames that strongly reference their
    // session (the map key), so weak keys alone can't collect an entry —
    // sweep stopped sessions here to bound the registry to live sessions
    // plus at most the most recently stopped ones.
    registry.keySet.removeIf(s => s.sparkContext.isStopped)
    df.cache()
    var scopes = registry.get(df.sparkSession)
    if (scopes == null) {
      scopes = scala.collection.mutable.Map.empty
      registry.put(df.sparkSession, scopes)
    }
    scopes.getOrElseUpdate(scope, scala.collection.mutable.Buffer.empty) += df
    df
  }

  private val broadcasts =
    new java.util.WeakHashMap[
      SparkSession,
      scala.collection.mutable.Map[
        String, scala.collection.mutable.Buffer[org.apache.spark.broadcast.Broadcast[_]]]]()

  /** Remember an operator-created broadcast (e.g. the incremental-dedup
   * Bloom filter) under a scope for later release — without tracking,
   * every call would pin its broadcast on the driver and all executors
   * for the application lifetime. */
  def trackBroadcast(spark: SparkSession,
      bc: org.apache.spark.broadcast.Broadcast[_],
      scope: String = Ops): Unit = synchronized {
    var scopes = broadcasts.get(spark)
    if (scopes == null) {
      scopes = scala.collection.mutable.Map.empty
      broadcasts.put(spark, scopes)
    }
    scopes.getOrElseUpdate(scope, scala.collection.mutable.Buffer.empty) += bc
  }

  /** Unpersist every operator-cached frame of `spark` in `scope`
   * (non-blocking), destroy that scope's tracked broadcasts, and forget
   * both. Safe to call at any time for CACHES (in-flight queries
   * re-materialize lazily) — but a DESTROYED BROADCAST does not come
   * back, which is why Bloom broadcasts live in their own scope and are
   * never released by the routine Ops-scope call. */
  def unpersistAll(spark: SparkSession, scope: String = Ops): Unit = synchronized {
    val scopes = registry.get(spark)
    if (scopes != null) scopes.remove(scope).foreach(_.foreach { df =>
      try df.unpersist(false)
      catch { case scala.util.control.NonFatal(_) => () }
    })
    val bscopes = broadcasts.get(spark)
    if (bscopes != null) bscopes.remove(scope).foreach(_.foreach { bc =>
      try bc.destroy()
      catch { case scala.util.control.NonFatal(_) => () }
    })
  }

  /** Unpersist one tracked frame (any scope) and forget it — for owners
   * like `IvfIndex.unpersist()` that manage their own lifecycle. */
  def untrack(df: DataFrame): Unit = synchronized {
    val scopes = registry.get(df.sparkSession)
    if (scopes != null) scopes.values.foreach { buf =>
      // reference identity, not Dataset equality: remove exactly the
      // tracked frame, in place
      val i = buf.indexWhere(_ eq df)
      if (i >= 0) buf.remove(i)
    }
    try df.unpersist(false)
    catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Number of tracked (not yet released) frames for `spark` in `scope` —
   * spec hook. */
  def trackedCount(spark: SparkSession, scope: String = Ops): Int = synchronized {
    val scopes = registry.get(spark)
    if (scopes == null) 0 else scopes.get(scope).map(_.size).getOrElse(0)
  }
}
