package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming results must equal their batch counterparts when the
  * whole table is replayed through the stream. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming tumbling counts equal batch aggregation") {
    val stream = StreamingOps.tumblingCounts(
      StreamingOps.eventStream(spark, TestSpark.sf))
    val q = stream.writeStream.format("memory")
      .queryName("tumbling_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("tumbling_out")
      .select("bucket", "event_type", "n")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    val exp = Tables.events(spark, TestSpark.sf)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(got == exp)
  }

  test("built-in session windows equal batch session windows and gap sessionize") {
    import spark.implicits._
    val stream = StreamingOps.sessionWindows(
      StreamingOps.eventStream(spark, TestSpark.sf), "30 minutes")
    val q = stream.writeStream.format("memory")
      .queryName("sesswin_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sesswin_out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

    // batch execution of the SAME declarative plan
    val batch = StreamingOps.sessionWindows(
        Tables.events(spark, TestSpark.sf), "30 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == batch)

    // session COUNT per user must agree with the gap-based sessionizer
    val nSess = got.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val exp = SparkEntry.queries("q_sessionize")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nSess == exp)
    // and every event lands in exactly one session
    val nEvents = Tables.events(spark, TestSpark.sf).count()
    assert(got.values.sum == nEvents)
  }

  test("stateful sessionize drops cross-batch stale events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gap = 10L
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.sessionCounts(in.toDS(), gap)
      .writeStream.format("memory").queryName("stale_sessions")
      .outputMode("update").start()
    try {
      in.addData(StreamingOps.UserEvent(1L, 100L),
        StreamingOps.UserEvent(1L, 105L))
      q.processAllAvailable()
      // batch 2: ts 50 is OLDER than the last processed ts (105) — a
      // naive gap computation would go negative and drag state
      // backwards; it must be ignored. ts 200 opens session #2.
      in.addData(StreamingOps.UserEvent(1L, 50L),
        StreamingOps.UserEvent(1L, 200L))
      q.processAllAvailable()
      val last = spark.table("stale_sessions")
        .groupBy("user_id")
        .agg(max("n_sessions").as("s"), max("n_events").as("e"),
          max("n_dropped").as("d"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
      // ts 50 was dropped AND counted: late-data loss is observable
      assert(last == ((2L, 3L, 1L)), s"got $last")
    } finally q.stop()
  }

  test("stateful streaming sessionize equals batch sessionize") {
    import spark.implicits._
    val ev = StreamingOps.eventStream(spark, TestSpark.sf)
      .select($"user_id", unix_micros($"ts").as("ts_us"))
      .as[StreamingOps.UserEvent]
    val q = StreamingOps.sessionCounts(ev, 30L * 60 * 1000000)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    // last update per user wins
    val got = spark.table("sessions_out")
      .groupBy("user_id")
      .agg(max("n_sessions").as("n_sessions"), max("n_events").as("n_events"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val exp = SparkEntry.queries("q_sessionize")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    assert(got == exp)
  }
}
