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
 * the same plan class as any windowed aggregation.
 *
 * Hot-key envelope: `joinBackward` windows by key alone, so the largest
 * single key's full history (left + right rows) must sort in one task —
 * fine up to tens of millions of events per key, a straggler beyond that.
 * When a tolerance bounds how far back matches may reach, use
 * `joinBackwardBucketed`, which splits each key's window into
 * (key, time-bucket) partitions and removes the envelope.
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

  /**
   * Forward as-of join — the mirror direction: for each left row, the
   * EARLIEST right row with `rightTime >= leftTime` on the same key
   * (next quote after the order, next maintenance slot after the
   * failure, next deploy after the alert). Same union-window plan as
   * [[joinBackward]] — one shuffle, linear, never an inequality join —
   * with the frame looking FORWARD (`first(ignoreNulls)` over
   * current→unbounded): at equal time, left rows sort BEFORE right
   * rows (tag 0 < 1), so a right row at the exact left instant matches
   * (forward inclusive); ties among right rows at one (key, time)
   * resolve to the SMALLEST id — the deterministic mirror of
   * backward's largest-id rule. Same hot-key envelope as joinBackward.
   *
   * @param tolerance optional max allowed rightTime - leftTime;
   *                  matches farther ahead are dropped
   */
  def joinForward(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, rightIdCol: String,
      rightValueCols: Seq[String],
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val leftClean = left.filter(col(keyCol).isNotNull && col(leftTimeCol).isNotNull)
    val rightClean = right.filter(col(keyCol).isNotNull && col(rightTimeCol).isNotNull)
    val rPayload = struct(
      (col(rightIdCol).as("_rid") +: col(rightTimeCol).as("_rt") +:
        rightValueCols.map(c => col(c).as(c))): _*)
    val rTagged = rightClean.select(
      col(keyCol).as("_k"), col(rightTimeCol).as("_t"), lit(1).as("_tag"),
      col(rightIdCol).as("_rord"), rPayload.as("_rp"),
      lit(null).cast(structType(left)).as("_lp"))
    val lPayload = struct(leftCols.map(c => col(c).as(c)): _*)
    val lTagged = leftClean.select(
      col(keyCol).as("_k"), col(leftTimeCol).as("_t"), lit(0).as("_tag"),
      lit(null).cast(right.select(col(rightIdCol)).schema.fields(0).dataType)
        .as("_rord"),
      lit(null).cast(rTagged.schema("_rp").dataType).as("_rp"),
      lPayload.as("_lp"))
    // left rows sort BEFORE right rows at equal time (tag 0 < 1):
    // forward inclusive; right ties resolve to the smallest id (asc
    // order makes it the FIRST the forward frame sees)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_tag"), col("_rord").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = rTagged.unionByName(lTagged)
      .withColumn("_m", first(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 0 && col("_m").isNotNull)
    val withinTol = tolerance match {
      case Some(tol) => matched.filter(col("_m._rt").cast("double") -
        col("_t").cast("double") <= tol.cast("double"))
      case None => matched
    }
    withinTol.select(
      (leftCols.map(c => col(s"_lp.$c").as(c)) :+
        col("_m._rid").as("asof_" + rightIdCol) :+
        col("_m._rt").as("asof_time")) ++
        rightValueCols.map(c => col(s"_m.$c").as("asof_" + c)): _*)
  }

  /**
   * Skew-hardened backward as-of join for integral (epoch) time columns.
   *
   * `joinBackward` partitions its window by key alone, so one hot key (a
   * bot user, a default id) funnels its ENTIRE event history through a
   * single task — correct, but a straggler at corpus scale. This variant
   * partitions by (key, time bucket of `bucketWidth`): the hot key's
   * history splits across `span / bucketWidth` tasks. Cross-bucket
   * correctness comes from one CARRY row per (key, bucket) — the latest
   * right row of the previous bucket, injected into the next bucket's
   * partition — and the identity
   *
   *   result == joinBackward(..., tolerance)   whenever tolerance <= bucketWidth
   *
   * holds because a left row at time T can only match right rows in
   * [T - tolerance, T], which spans at most its own bucket (rows present)
   * and the previous bucket (only that bucket's LAST right row can be the
   * latest-at-or-before — the carry). Anything older is beyond tolerance.
   * The tolerance is therefore REQUIRED here; both it and `bucketWidth`
   * are in the time columns' own integral units.
   *
   * Cost: one extra map-side-combinable aggregation (the per-bucket
   * compaction producing carries, ~one row per non-empty (key, bucket))
   * on top of the same one-shuffle union-window plan.
   */
  def joinBackwardBucketed(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, rightIdCol: String,
      rightValueCols: Seq[String],
      bucketWidth: Long, tolerance: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(tolerance >= 0 && tolerance <= bucketWidth,
      s"tolerance ($tolerance) must be in [0, bucketWidth=$bucketWidth] — " +
        "larger tolerances would need carries across more than one bucket")
    val leftCols = left.columns.toSeq
    val leftClean = left.filter(col(keyCol).isNotNull && col(leftTimeCol).isNotNull)
    val rightClean = right.filter(col(keyCol).isNotNull && col(rightTimeCol).isNotNull)
    val rPayload = struct(
      (col(rightIdCol).as("_rid") +: col(rightTimeCol).as("_rt") +:
        rightValueCols.map(c => col(c).as(c))): _*)
    // bucket id = bucket START time: q - floorMod(q, w). Pure long
    // arithmetic — exact for the full epoch-nanos range, where a
    // float-double `floor(q / w)` can be off by one at bucket boundaries
    // (epoch-nanos exceed double's 2^53 exact range). "Next bucket" is
    // then _b + bucketWidth.
    def bucketOf(t: Column): Column = {
      val q = t.cast("long")
      q - pmod(q, lit(bucketWidth))
    }
    val rTagged = rightClean.select(
      col(keyCol).as("_k"), col(rightTimeCol).as("_t"), lit(0).as("_tag"),
      col(rightIdCol).as("_rord"), rPayload.as("_rp"),
      lit(null).cast(structType(left)).as("_lp"))
    val lTagged = leftClean.select(
      col(keyCol).as("_k"), col(leftTimeCol).as("_t"), lit(1).as("_tag"),
      lit(null).cast(right.select(col(rightIdCol)).schema.fields(0).dataType)
        .as("_rord"),
      lit(null).cast(rTagged.schema("_rp").dataType).as("_rp"),
      lPayloadOf(left, leftCols).as("_lp"))
    val withB = (df: DataFrame) => df.withColumn("_b", bucketOf(col("_t")))
    // carry = latest right row per (key, bucket), re-addressed to the NEXT
    // bucket (max_by on (time, id): same tie-break as the window ordering)
    val rB = withB(rTagged)
    val carry = rB.groupBy("_k", "_b")
      .agg(max_by(struct(col("_t"), col("_tag"), col("_rord"), col("_rp"), col("_lp")),
        struct(col("_t"), col("_rord"))).as("_c"))
      .select(col("_k"), col("_c._t").as("_t"), col("_c._tag").as("_tag"),
        col("_c._rord").as("_rord"), col("_c._rp").as("_rp"),
        col("_c._lp").as("_lp"), (col("_b") + bucketWidth).as("_b"))
    val w = Window.partitionBy("_k", "_b")
      .orderBy(col("_t"), col("_tag"), col("_rord").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = rB.unionByName(carry).unionByName(withB(lTagged))
      .withColumn("_m", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_m").isNotNull)
      .filter(col("_t").cast("long") - col("_m._rt").cast("long") <= tolerance)
    matched.select(
      (leftCols.map(c => col(s"_lp.$c").as(c)) :+
        col("_m._rid").as("asof_" + rightIdCol) :+
        col("_m._rt").as("asof_time")) ++
        rightValueCols.map(c => col(s"_m.$c").as("asof_" + c)): _*)
  }

  private def lPayloadOf(left: DataFrame, leftCols: Seq[String]) =
    struct(leftCols.map(c => col(c).as(c)): _*)

  private def structType(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
