package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins. Spark's partial (map-side) aggregation
 * already flattens skewed groupBys, and AQE splits skewed shuffle joins at
 * runtime; explicit salting remains the tool when one join key dominates
 * AND the other side is too big to broadcast: replicate the small side
 * `salt` times and scatter the big side's hot keys across the replicas.
 *
 * When to prefer which (the PlanAuditSpec "AQE skew join" case proves the
 * AQE half against a planted hot key):
 *  - AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) is the
 *    default answer for sort-merge / shuffled-hash joins: it measures the
 *    ACTUAL map-output partition sizes at the shuffle boundary and splits
 *    only partitions observed over `skewedPartitionThresholdInBytes` —
 *    no data-shape foreknowledge, no replication cost when skew never
 *    materializes, and it composes with partition coalescing.
 *  - [[saltedJoin]] is for the cases AQE cannot reach: broadcast-disabled
 *    joins that must stay co-partitioned downstream, aggregation AFTER the
 *    join keyed by the same hot key (AQE's split duplicates the hot key's
 *    right-side rows across tasks, so a later same-key reduce re-converges
 *    on one reducer — salting keeps the composite `(key, salt)` key live
 *    through the pipeline), and engines/readers where the join is driven
 *    by a fixed partitioner (bucketed tables) so there is no runtime
 *    shuffle for AQE to re-plan.
 */
object Skew {

  /** Salted inner equi-join: `big` rows scatter deterministically
   * (xxhash64 of the whole row) over `salt` buckets; `small` is replicated
   * salt times. Result equals big.join(small, key) with the hot key's work
   * spread over `salt` reducers instead of one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must exceed 1")
    val bigCols = big.columns
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(bigCols.map(col): _*)), lit(salt.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
