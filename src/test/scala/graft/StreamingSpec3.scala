package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AvailableNow backfill and left-outer interval join equal their
  * batch counterparts when the whole table replays. */
class StreamingSpec3 extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AvailableNow backfill terminates on its own and equals batch") {
    val agg = StreamingOps.tumblingCounts(
      StreamingOps.eventStream(spark, TestSpark.sf))
    // returns only when the bounded run finished — no processAllAvailable
    StreamingOps.availableNowBackfill(agg, "backfill_out", "complete")
    val got = spark.table("backfill_out")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val exp = Tables.events(spark, TestSpark.sf)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == exp)
  }

  test("left-outer interval join emits unconverted clicks with nulls") {
    val q = StreamingOps.clickPurchaseLeftJoin(
        StreamingOps.eventStream(spark, TestSpark.sf),
        StreamingOps.eventStream(spark, TestSpark.sf))
      .writeStream.format("memory").queryName("left_join_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("left_join_out").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).sorted

    val ev = Tables.events(spark, TestSpark.sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    // a null (unconverted) row only emits once the watermark — which
    // ends at max(event_ts) - 2h delay, millisecond-truncated — passes
    // the click's 1h join interval; clicks closer than ~3h to the end
    // of history stay pending forever, exactly as on a live stream.
    // Matched rows must agree exactly; null rows up to a 5s band
    // around the 3h boundary, where truncation decides either way.
    // each side's watermark tracks ITS OWN filtered stream, and the
    // join evicts on the min of the two — so the decision horizon is
    // min(max click ts, max purchase ts), not the global max
    val maxTs = math.min(
      c.agg(max(unix_micros(col("click_ts")))).collect().head.getLong(0),
      p.agg(max(unix_micros(col("purchase_ts")))).collect().head.getLong(0))
    val expAll = c.join(p, expr(
        """user_id = p_user_id AND
          |purchase_ts >= click_ts AND
          |purchase_ts <= click_ts + interval 1 hour""".stripMargin),
        "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        unix_micros(col("click_ts")).as("cus"))
      .collect()
    val expMatched = expAll.filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val gotMatched = got.filter(_._3 != -1L).sorted
    assert(gotMatched.sameElements(expMatched))
    val gotNullIds = got.filter(_._3 == -1L).map(_._2).toSet
    val horizon = maxTs - 3L * 3600 * 1000000
    val requiredNulls = expAll.filter(r => r.isNullAt(2) &&
      r.getLong(3) < horizon - 5000000L).map(_.getLong(1)).toSet
    val allowedNulls = expAll.filter(r => r.isNullAt(2) &&
      r.getLong(3) < horizon + 5000000L).map(_.getLong(1)).toSet
    assert(requiredNulls.subsetOf(gotNullIds),
      s"missing nulls: ${(requiredNulls -- gotNullIds).take(5)}")
    assert(gotNullIds.subsetOf(allowedNulls),
      s"premature nulls: ${(gotNullIds -- allowedNulls).take(5)}")
    assert(gotNullIds.nonEmpty, "no unconverted clicks surfaced")
  }
}
