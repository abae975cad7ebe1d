package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed interval joins: brute-force equality (every qualifying pair
  * exactly once, none missed), boundary semantics, and bucket-width
  * independence — the bucketing is an execution detail, never semantics. */
class IntervalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("interval-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  // deterministic pseudo-random intervals: spans from tiny (sub-bucket) to
  // huge (many buckets), starts scattered, some zero-length
  private def mkIntervals(n: Int, seed: Int): Seq[(Long, Long, Long)] =
    (0 until n).map { i =>
      val h = ((i * 2654435761L + seed * 40503L) & 0x7fffffffL)
      val start = h % 10000L
      val span = if (i % 7 == 0) 0L else (h / 10000L) % 700L
      (i.toLong, start, start + span)
    }

  test("pointInInterval == brute force, each pair exactly once, any width") {
    import spark.implicits._
    val iv = mkIntervals(120, 1).toDF("i_id", "i_s", "i_e")
    val pts = (0 until 300)
      .map(j => (1000L + j, (j * 997L + 13L) % 10700L)).toDF("p_id", "p_v")
    val want = (for {
      (i, s, e) <- mkIntervals(120, 1)
      (p, v) <- (0 until 300).map(j => (1000L + j, (j * 997L + 13L) % 10700L))
      if v >= s && v <= e
    } yield (i, p)).sorted
    assert(want.nonEmpty)
    for (w <- Seq(1L, 64L, 1000L, 100000L)) {
      val got = Interval.pointInInterval(iv, pts, "i_s", "i_e", "p_v", w)
        .select("i_id", "p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == want, s"width $w diverged from brute force")
    }
  }

  test("overlapJoin == brute force incl. touching endpoints, any width") {
    import spark.implicits._
    val a = mkIntervals(80, 2).toDF("a_id", "a_s", "a_e")
    val b = mkIntervals(90, 5).map { case (i, s, e) => (i + 500L, s, e) }
      .toDF("b_id", "b_s", "b_e")
    val want = (for {
      (ai, as_, ae) <- mkIntervals(80, 2)
      (bi, bs, be) <- mkIntervals(90, 5).map { case (i, s, e) => (i + 500L, s, e) }
      if as_ <= be && bs <= ae
    } yield (ai, bi, math.min(ae, be) - math.max(as_, bs))).sorted
    assert(want.nonEmpty && want.exists(_._3 == 0L),
      "fixture must include touching intervals (overlap == 0)")
    for (w <- Seq(1L, 64L, 1000L, 100000L)) {
      val got = Interval.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", w)
        .select("a_id", "b_id", "overlap").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      assert(got == want, s"width $w diverged from brute force")
    }
  }

  test("plans are equi-joins on the bucket key, never a nested loop") {
    import spark.implicits._
    val a = mkIntervals(10, 3).toDF("a_id", "a_s", "a_e")
    val b = mkIntervals(10, 4).toDF("b_id", "b_s", "b_e")
    val pts = Seq((1L, 5L)).toDF("p_id", "p_v")
    for (p <- Seq(
        Interval.pointInInterval(a.toDF("i_id", "i_s", "i_e"), pts,
          "i_s", "i_e", "p_v", 64L).queryExecution.executedPlan.toString,
        Interval.overlapJoin(a, b, "a_s", "a_e", "b_s", "b_e", 64L)
          .queryExecution.executedPlan.toString)) {
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"interval join planned as a product:\n$p")
    }
  }

  test("disjoint-name and width preconditions are enforced") {
    import spark.implicits._
    val a = Seq((1L, 2L, 3L)).toDF("id", "s", "e")
    val b = Seq((1L, 2L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Interval.pointInInterval(a, b, "s", "e", "v", 10L)
    }
    intercept[IllegalArgumentException] {
      Interval.pointInInterval(a, b.toDF("p_id", "v"), "s", "e", "v", 0L)
    }
  }
}
