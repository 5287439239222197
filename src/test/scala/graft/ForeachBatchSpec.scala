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
}
