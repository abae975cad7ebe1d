package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  import EventsStream.{Event, UserRunning}

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("windowed counts over a stream match the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(0), "click", 1.0), Event(2, ts(1), "click", 2.0),
      Event(1, ts(2), "view", 3.0), Event(3, ts(6), "click", 4.0),
      Event(2, ts(7), "view", 5.0), Event(1, ts(11), "click", 6.0))
    mem.addData(events: _*)
    val agg = EventsStream.windowedTypeCounts(mem.toDF())
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("win_out").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("win_out")
      .orderBy("bucket_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    val batch = EventsStream.windowedTypeCounts(events.toDF())
      .orderBy("bucket_start", "event_type")
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq) // one code path, two engines
  }

  test("streaming EBW recalibration: each micro-batch is re-solved") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("sw").toString
    val mem = MemoryStream[(Double, Double)]
    val stream = mem.toDF().toDF("x", "w0")
      .withColumn("feat", org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.col("x")))
    val q = StreamingWeighter.start(stream, "feat", "w0",
      Array(1.5), s"$tmp/sink", s"$tmp/chk")
    mem.addData((1.0, 1.0), (2.0, 1.0))
    q.processAllAvailable()
    mem.addData((1.0, 1.0), (1.5, 1.0), (2.5, 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$tmp/sink")
    assert(out.select("batch_id").distinct().count() == 2)
    // every batch's reweighted mean of x must hit the target 1.5
    val means = out.groupBy("batch_id")
      .agg((org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("x") *
          org.apache.spark.sql.functions.col("weight_new")) /
        org.apache.spark.sql.functions.sum("w0")).as("m"))
      .collect().map(_.getDouble(1))
    means.foreach(m => assert(math.abs(m - 1.5) < 1e-5, s"batch mean $m"))
    assert(out.filter(org.apache.spark.sql.functions.col("converged") === false).count() == 0)
  }

  test("streaming dedup collapses replayed events within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dedup = EventsStream.streamingDedup(
      mem.toDF(), "ts", "10 minutes", Seq("user_id", "event_type"))
    val q = dedup.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    mem.addData(
      Event(1, ts(0), "click", 1.0),
      Event(1, ts(1), "click", 1.0), // near-replay: same key, 1 min later
      Event(2, ts(0), "view", 2.0))
    q.processAllAvailable()
    mem.addData(Event(1, ts(2), "click", 1.0)) // still within watermark
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_out").collect()
    // one (1, click) and one (2, view) survive
    assert(rows.length == 2, rows.mkString(","))
  }

  test("session windows: gap-based sessions, stream == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: events at 0,2,3 (one session), then 20,21 (second session);
    // user 2: single event
    val events = Seq(
      Event(1, ts(0), "click", 1.0), Event(1, ts(2), "view", 2.0),
      Event(1, ts(3), "click", 3.0), Event(1, ts(20), "view", 4.0),
      Event(1, ts(21), "click", 5.0), Event(2, ts(5), "view", 10.0))
    val batch = EventsStream.userSessions(events.toDF(), "10 minutes")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(3), r.getDouble(4)))
    assert(batch.length == 3)
    assert(batch(0)._3 == 3 && math.abs(batch(0)._4 - 6.0) < 1e-12) // u1 s1
    assert(batch(1)._3 == 2 && math.abs(batch(1)._4 - 9.0) < 1e-12) // u1 s2
    assert(batch(2)._1 == 2 && batch(2)._3 == 1)
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = EventsStream.userSessions(mem.toDF(), "10 minutes", Some("0 seconds"))
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()
    q.processAllAvailable()
    // advance the watermark past every session end so they all finalize
    mem.addData(Event(99, Timestamp.valueOf("2024-01-01 12:00:00"), "view", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sess_out")
      .filter($"user_id" =!= 99)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(3), r.getDouble(4)))
    assert(streamed.toSeq == batch.toSeq) // one code path, two engines
  }

  test("stream-stream interval join bounds state and matches in-horizon views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    val cDf = clicks.toDF().toDF("click_user", "click_ts", "click_id")
    val vDf = views.toDF().toDF("view_user", "view_ts", "view_id")
    val joined = EventsStream.clickViewJoin(cDf, vDf, "30 minutes", "'10' MINUTES")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("join_out").start()
    views.addData((1L, ts(0), 100L), (1L, ts(15), 101L), (2L, ts(0), 200L))
    clicks.addData((1L, ts(18), 900L), (2L, ts(30), 901L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("join_out")
      .select("click_id", "view_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    // click 900 at :18 matches only view 101 at :15 (view 100 at :00 is
    // outside the 10-minute horizon); click 901 at :30 matches nothing
    assert(rows == Set(900L -> 101L), rows.toString)
  }

  test("stateful running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val running = EventsStream.runningUserTotals(mem.toDS())
    val q = running.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("run_out").start()
    mem.addData(Event(1, ts(0), "click", 1.0), Event(1, ts(1), "view", 2.0))
    q.processAllAvailable()
    mem.addData(Event(1, ts(2), "click", 4.0), Event(2, ts(2), "view", 10.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("run_out").as[UserRunning].collect()
    // last update for user 1 must reflect state carried across batches
    val u1 = rows.filter(_.user_id == 1).maxBy(_.n_events)
    assert(u1.n_events == 3 && math.abs(u1.total_value - 7.0) < 1e-12)
    val u2 = rows.filter(_.user_id == 2).maxBy(_.n_events)
    assert(u2.n_events == 1 && math.abs(u2.total_value - 10.0) < 1e-12)
  }
}
