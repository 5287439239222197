package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** New streaming ops must equal their batch counterparts when the
  * whole table replays through the stream. */
class StreamingSpec2 extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sliding-window counts equal batch double-windowing") {
    val stream = StreamingOps.slidingCounts(
      StreamingOps.eventStream(spark, TestSpark.sf))
    val q = stream.writeStream.format("memory")
      .queryName("sliding_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sliding_out")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    // batch equivalent: each event votes into the two half-hour-offset
    // windows that contain it
    val ev = Tables.events(spark, TestSpark.sf)
    val exp = ev.select(col("event_type"),
        explode(array(
          unix_timestamp(date_trunc("hour", col("ts"))),
          unix_timestamp(date_trunc("hour", col("ts") - expr("interval 30 minutes")))
            + 1800L)).as("bucket"))
      .groupBy("bucket", "event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    assert(got == exp)
  }

  test("stream-static enrichment equals the batch join") {
    val cohort = Tables.events(spark, TestSpark.sf)
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("first_day"))
    val enriched = StreamingOps.enrich(
      StreamingOps.eventStream(spark, TestSpark.sf), cohort, "user_id")
      .groupBy("first_day").agg(count(lit(1)).as("n"))
    val q = enriched.writeStream.format("memory")
      .queryName("enrich_out").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("enrich_out")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exp = Tables.events(spark, TestSpark.sf).join(cohort, "user_id")
      .groupBy("first_day").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("watermarked dedup collapses a doubled stream to distinct ids") {
    val s1 = StreamingOps.eventStream(spark, TestSpark.sf)
    val s2 = StreamingOps.eventStream(spark, TestSpark.sf)
    val q = StreamingOps.deduped(s1.unionAll(s2), "event_id")
      .select("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("dedup_out").count()
    val distinctIds = Tables.events(spark, TestSpark.sf)
      .select("event_id").distinct().count()
    assert(got == distinctIds)
  }
}
