package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for joins. Spark's partial (map-side) aggregation
 * already flattens skewed groupBys, and AQE splits skewed shuffle joins at
 * runtime; explicit salting remains the tool when one join key dominates
 * AND the other side is too big to broadcast: replicate the small side
 * `salt` times and scatter the big side's hot keys across the replicas.
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
