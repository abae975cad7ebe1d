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
 */
private[ops] object CacheScope {

  private val registry =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Buffer[DataFrame]]()

  /** Cache `df` and remember it under its session for later release. */
  def track(df: DataFrame): DataFrame = synchronized {
    // The value Buffer holds DataFrames that strongly reference their
    // session (the map key), so weak keys alone can't collect an entry —
    // sweep stopped sessions here to bound the registry to live sessions
    // plus at most the most recently stopped ones.
    registry.keySet.removeIf(s => s.sparkContext.isStopped)
    df.cache()
    var buf = registry.get(df.sparkSession)
    if (buf == null) {
      buf = scala.collection.mutable.Buffer.empty[DataFrame]
      registry.put(df.sparkSession, buf)
    }
    buf += df
    df
  }

  /** Unpersist every operator-cached frame of `spark` (non-blocking) and
   * forget them. Safe to call at any time; in-flight queries re-materialize
   * lazily. */
  def unpersistAll(spark: SparkSession): Unit = synchronized {
    val buf = registry.remove(spark)
    if (buf != null) buf.foreach { df =>
      try df.unpersist(false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Number of tracked (not yet released) frames for `spark` — spec hook. */
  def trackedCount(spark: SparkSession): Int = synchronized {
    val buf = registry.get(spark)
    if (buf == null) 0 else buf.size
  }
}
