package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bloom-pruned join equals the unpruned join") {
    import spark.implicits._
    val got = SparkEntry.queries("q_bloom_prune")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = Tables.lineitem(spark, TestSpark.sf)
      .join(Tables.supplier(spark, TestSpark.sf), $"l_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, TestSpark.sf).filter($"n_name" === "NATION_3"),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"s_suppkey", $"s_name").agg(count(lit(1)).as("n_items"))
      .orderBy($"s_suppkey")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == exp.toSeq && got.nonEmpty)
  }

  test("count-min estimates bound the exact counts from above") {
    val rows = SparkEntry.queries("q_heavy_hitters")(spark, TestSpark.sf).collect()
    assert(rows.length == 10)
    for (r <- rows)
      assert(r.getBoolean(2),
        s"CMS est outside [n, n + eps·N] for part ${r.getLong(0)} (n=${r.getLong(1)})")
  }

  test("HLL day-sketches survive a parquet round-trip and merge exactly") {
    import spark.implicits._
    // the sketch-store pattern: per-day sketches persisted as BINARY,
    // reloaded by a later job, unioned — the rollup must equal the
    // rollup over the in-memory sketches (serialization is lossless)
    val act = Tables.events(spark, TestSpark.sf)
      .select($"user_id", $"ts".cast("date").as("day")).distinct()
    val daySketch = act.groupBy($"day")
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch_store").toString
    daySketch.write.mode("overwrite").parquet(dir)
    def total(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(hll_sketch_estimate(hll_union_agg($"sk", lit(true))))
        .collect().head.getLong(0)
    assert(total(spark.read.parquet(dir)) === total(daySketch))
    // and the merged estimate tracks the exact all-days cardinality
    val exact = act.select($"user_id").distinct().count()
    val est = total(daySketch)
    assert(math.abs(est - exact) <= math.max(1L, (exact * 0.05).toLong))
  }

  test("sketch rollup: every window's merged estimate is within tolerance") {
    val rows = SparkEntry.queries("q_sketch_rollup")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"window ${r.get(0)} estimate outside 5% of wau=${r.getLong(1)}"))
  }

  test("transformWithState running totals equal the batch rollup") {
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val totals = StreamingOps.runningTotals(
        StreamingOps.eventStream(spark, TestSpark.sf)
          .select($"user_id", $"value").as[StreamingOps.UserValue])
      val q = totals.toDF.writeStream.format("memory")
        .queryName("tws_out").outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
      // last update per user = final running totals
      val got = spark.table("tws_out")
        .groupBy($"user_id")
        .agg(max($"n_events").as("n"), max($"total_value").as("tv"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 1e4))))
        .toMap
      val exp = Tables.events(spark, TestSpark.sf)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"), sum($"value").as("tv"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), math.round(r.getDouble(2) * 1e4))))
        .toMap
      assert(got == exp && got.nonEmpty)
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("stream-stream interval join equals the batch interval join") {
    import spark.implicits._
    val joined = StreamingOps.clickPurchaseJoin(
      StreamingOps.eventStream(spark, TestSpark.sf),
      StreamingOps.eventStream(spark, TestSpark.sf))
    val q = joined.writeStream.format("memory")
      .queryName("ssj_out").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("ssj_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val ev = Tables.events(spark, TestSpark.sf)
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"))
    val exp = c.join(p, expr(
        """user_id = p_user_id AND
          |purchase_ts >= click_ts AND
          |purchase_ts <= click_ts + interval 1 hour""".stripMargin))
      .select($"user_id", $"click_id", $"purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp && got.nonEmpty)
  }

  test("sketch intersection refuses high-cardinality group columns") {
    // the driver pairwise loop is O(groups²) over kilobyte sketches —
    // sound for event types, an OOM if ever pointed at a user id.
    // Misuse must fail fast with the named bound, not degrade.
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sketch_guard_").toString
    (1 to 6500).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        (i % 100).toLong, s"type_${i % 65}", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      SparkEntry.queries("q_sketch_intersect")(spark, dir).collect()
    }
    assert(e.getMessage.contains("bounded to 64 groups"), e.getMessage)
  }
}
