package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (point-in-time) join — the canonical event-pipeline operator Spark
 * has no built-in for. For each left row, find the LATEST right row with
 * `rightTime <= leftTime` on the same key (backward direction, the
 * time-series/attribution standard).
 *
 * Spark-native plan: instead of an inequality join (which Catalyst executes
 * as a per-key cartesian — quadratic in events per key), both sides are
 * tagged and UNIONED, then a single key-partitioned window ordered by
 * (time, tag, right-id) carries the last right payload forward via
 * last(ignoreNulls). Cost: ONE shuffle + sort per side, linear in rows —
 * the same plan class as any windowed aggregation, so it scales to 100 TB
 * with ordinary key-skew care.
 */
object AsOf {

  /**
   * Backward as-of join.
   *
   * @param left           probe side
   * @param right          reference side (its latest at-or-before row wins)
   * @param keyCol         equi-join key present on both sides
   * @param leftTimeCol    event-time column on `left`
   * @param rightTimeCol   event-time column on `right`
   * @param rightIdCol     unique right id: deterministic tie-break when two
   *                       right rows share (key, time) — the larger id wins
   * @param rightValueCols right columns to carry onto matches
   * @param tolerance      optional max allowed leftTime - rightTime (same
   *                       units as the time columns' underlying type);
   *                       matches older than this are dropped
   * @return left rows that found a match, with `asof_<id>`,
   *         `asof_time`, and the requested right value columns appended
   */
  def joinBackward(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, rightIdCol: String,
      rightValueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // join-key semantics: NULL keys/times never match (a window partition
    // WOULD group nulls together, and a null right time would sort
    // nulls-first and masquerade as a minus-infinity candidate)
    val leftClean = left.filter(col(keyCol).isNotNull && col(leftTimeCol).isNotNull)
    val rightClean = right.filter(col(keyCol).isNotNull && col(rightTimeCol).isNotNull)
    val rPayload = struct(
      (col(rightIdCol).as("_rid") +: col(rightTimeCol).as("_rt") +:
        rightValueCols.map(c => col(c).as(c))): _*)
    val rTagged = rightClean.select(
      col(keyCol).as("_k"), col(rightTimeCol).as("_t"), lit(0).as("_tag"),
      col(rightIdCol).as("_rord"), rPayload.as("_rp"),
      lit(null).cast(structType(left)).as("_lp"))
    val lPayload = struct(leftCols.map(c => col(c).as(c)): _*)
    val lTagged = leftClean.select(
      col(keyCol).as("_k"), col(leftTimeCol).as("_t"), lit(1).as("_tag"),
      lit(null).cast(right.select(col(rightIdCol)).schema.fields(0).dataType)
        .as("_rord"),
      lit(null).cast(rTagged.schema("_rp").dataType).as("_rp"),
      lPayload.as("_lp"))
    // right rows sort BEFORE left rows at equal time (tag 0 < 1): backward
    // inclusive semantics; ties among right rows resolve to the largest id
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_tag"), col("_rord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rTagged.unionByName(lTagged)
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_m").isNotNull)
    val withinTol = tolerance match {
      case Some(tol) => matched.filter(col("_t").cast("double") -
        col("_m._rt").cast("double") <= tol.cast("double"))
      case None => matched
    }
    withinTol.select(
      (leftCols.map(c => col(s"_lp.$c").as(c)) :+
        col("_m._rid").as("asof_" + rightIdCol) :+
        col("_m._rt").as("asof_time")) ++
        rightValueCols.map(c => col(s"_m.$c").as("asof_" + c)): _*)
  }

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
