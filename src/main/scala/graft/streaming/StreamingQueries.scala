package graft.streaming

import graft.QueryModule

/** §2.2 — the first streaming row in the DRIVER correctness gate.
  *
  * The whole events table is replayed through the real file-stream
  * source ([[StreamingOps.eventStream]]) into the watermarked
  * tumbling-window aggregate, the micro-batched result is captured in
  * a memory sink, and the DuckDB oracle is the plain batch aggregate
  * over the same parquet — streaming ≡ batch checked by the same
  * rows/schema/hash gate as every relational operator. The other
  * eight §2.2 streaming rows stay spec-covered (StreamingSpec etc.);
  * this one proves the equivalence holds under the driver's oracle,
  * not just under ScalaTest.
  */
object StreamingQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "stream_tumbling" -> ((s, d) => {
      import s.implicits._
      // Constructing this DataFrame RUNS the stream to completion —
      // documented sink-like eagerness (cf. pipe_vendor_artifact): a
      // streaming query only yields rows through its own action.
      val q = StreamingOps.tumblingCounts(StreamingOps.eventStream(s, d))
        .writeStream.format("memory")
        .queryName("stream_tumbling_gate").outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      // counts only: the double value-sum's accumulation order is
      // micro-batch-dependent, counts are exact under ANY batching
      val out = s.table("stream_tumbling_gate")
        .select($"bucket", $"event_type", $"n")
        .orderBy($"bucket", $"event_type")
      // Fail LOUDLY on schema/format drift: the round-8 corpus change
      // made the stale stream schema read garbage (10 rows vs 3385)
      // with no error. Complete-mode tumbling counts must equal the
      // batch group count exactly.
      val expected = graft.Tables.events(s, d)
        .select(org.apache.spark.sql.functions.date_trunc("hour", $"ts"),
          $"event_type").distinct().count()
      val got = out.count()
      require(got == expected,
        s"stream_tumbling drift: streamed $got groups, batch has $expected")
      out
    })
  )

  val oracles: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS bucket,
        |  event_type, count(*) AS n
        |FROM events GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin
  )
}
