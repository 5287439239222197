package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** foreachBatch sink plumbing: every source row is delivered to the
  * batch writer exactly once across micro-batches — the contract an
  * idempotent upsert/merge sink builds on. */
class ForeachBatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("foreachBatch delivers each row exactly once across micro-batches") {
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var batches = 0
    val q = StreamingOps.eventStream(spark, TestSpark.sf)
      .select(col("event_id"))
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val ids = df.collect().map(_.getLong(0))
        seen.synchronized { seen ++= ids; batches += 1 }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val total = Tables.events(spark, TestSpark.sf).count()
    assert(batches >= 1)
    assert(seen.size.toLong == total, s"delivered ${seen.size} of $total")
    assert(seen.distinct.size == seen.size, "duplicate delivery detected")
  }

  test("streaming GX quarantine gate matches the batch split") {
    // The reference's GX checkpoint as a STREAMING gate: each
    // micro-batch routes through ExpectationSuite.quarantine inside
    // foreachBatch (valid rows → sink, violations → quarantine sink,
    // both with exactly-once delivery per batch). The streamed
    // valid/bad totals must equal the batch-mode split of the same
    // data — micro-batching cannot change a row-level predicate.
    import graft.quality.{ExpectationSuite, ExpectBetween, ExpectNotNull}
    val suite = ExpectationSuite("events", Seq(
      ExpectNotNull("user_id"),
      ExpectBetween("value", 0, 50)))

    var okRows = 0L
    var badRows = 0L
    val q = StreamingOps.eventStream(spark, TestSpark.sf)
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val (ok, bad) = suite.quarantine(df)
        // one pass per route, as a real dual-sink write would do
        val (nOk, nBad) = (ok.count(), bad.count())
        this.synchronized { okRows += nOk; badRows += nBad }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val events = Tables.events(spark, TestSpark.sf)
    val (bOk, bBad) = suite.quarantine(events)
    assert(okRows == bOk.count(), s"valid route: streamed $okRows")
    assert(badRows == bBad.count(), s"quarantine route: streamed $badRows")
    assert(okRows + badRows == events.count())
    assert(badRows > 0, "gate exercised: the synthetic corpus has violations")
  }
}
