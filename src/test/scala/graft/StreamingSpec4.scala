package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Kafka-shape ingestion contract, pinned without a broker.
  *
  * Any production stream is Kafka-shaped: partitioned, offset-
  * addressed, ordered only WITHIN a partition, resumed from committed
  * offsets after a crash. The file-replay used by the other streaming
  * specs can't exercise that contract, so these tests drive the
  * `rate-micro-batch` source — whose batches are deterministic offset
  * ranges over N partitions, the closest in-process analog — through
  * a forced stop/restart on one checkpoint and assert the two
  * guarantees that matter:
  *
  *   1. offset resume is exactly-once END-TO-END when the sink is
  *      idempotent per batchId (the documented foreachBatch contract:
  *      re-delivered batches overwrite, never append);
  *   2. mapGroupsWithState state survives the restart (counters
  *      continue from the checkpoint, they don't restart at zero).
  */
class StreamingSpec4 extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rateSource(rowsPerBatch: Int, numPartitions: Int) =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toLong)
      .option("numPartitions", numPartitions.toLong)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", 1000L)
      .load()

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    p.toFile.deleteOnExit(); p.toString
  }

  /** Bounded progress poll: a stalled or failed-to-start stream fails
    * the test at the deadline instead of hanging the suite forever. */
  private def pollUntil(deadlineMs: Long = 90000L)(done: => Boolean): Unit = {
    val end = System.nanoTime() + deadlineMs * 1000000L
    while (!done) {
      if (System.nanoTime() > end)
        fail(s"stream made no progress within ${deadlineMs}ms")
      Thread.sleep(50)
    }
  }

  test("offsets resume exactly-once across a forced restart") {
    val ckpt = freshDir("kafka_ckpt")
    // idempotent-per-batchId sink: re-delivery of a batch after the
    // restart REPLACES its rows — appending instead would turn
    // Spark's at-least-once re-delivery into visible duplicates
    val byBatch = new scala.collection.concurrent.TrieMap[Long, Array[(Int, Long)]]()
    def start() = rateSource(rowsPerBatch = 64, numPartitions = 4)
      .select(spark_partition_id().as("part"), col("value"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        byBatch.put(batchId,
          df.collect().map(r => (r.getInt(0), r.getLong(1))))
        ()
      }.start()

    val q1 = start()
    try {
      pollUntil()(byBatch.size >= 4)
    } finally q1.stop() // forced stop mid-stream, offsets committed in ckpt
    val batchesBefore = byBatch.size

    val q2 = start()
    try {
      pollUntil()(byBatch.size >= batchesBefore + 2)
    } finally q2.stop()

    val all = byBatch.values.flatten.toSeq
    val offsets = all.map(_._2).sorted
    // exactly-once: the union of idempotently-upserted batches is a
    // gap-free, duplicate-free offset range from zero
    assert(offsets == (0L until offsets.length.toLong))
    assert(offsets.length >= (batchesBefore + 2) * 64)
    // per-partition ordering: within one batch, each partition's rows
    // arrive offset-ascending (the Kafka guarantee); across partitions
    // no order is promised and none is asserted
    byBatch.values.foreach { rows =>
      rows.groupBy(_._1).values.foreach { perPart =>
        val vs = perPart.map(_._2).toSeq
        assert(vs == vs.sorted, "partition delivered offsets out of order")
      }
    }
  }

  test("session state continues from the checkpoint after restart") {
    import spark.implicits._
    val ckpt = freshDir("kafka_state")
    // synthetic per-user event stream over the offset space: user =
    // offset % 8, event times 1ms apart — every event continues the
    // user's single session under a 1s gap, so n_sessions stays 1 and
    // n_events counts delivered offsets per user
    // foreachBatch sink (memory sink can't recover from a
    // checkpoint), idempotent per batchId as in the offsets test
    val byBatch = new scala.collection.concurrent.TrieMap[Long, Array[(Long, Long, Long)]]()
    def start() = StreamingOps.sessionCounts(
        rateSource(rowsPerBatch = 64, numPartitions = 4)
          .select((col("value") % 8).as("user_id"),
            (col("value") * 1000L).as("ts_us"))
          .as[StreamingOps.UserEvent],
        gapUs = 1000000L)
      .toDF()
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
        byBatch.put(batchId, df.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
        ()
      }.start()

    def maxEvents: Map[Long, Long] = byBatch.values.flatten
      .groupMapReduce(_._1)(_._3)(math.max)

    val q1 = start()
    try {
      // ≥5 batches × 64 offsets / 8 users = ≥40 events per user
      pollUntil()(byBatch.nonEmpty && maxEvents.size == 8 &&
        maxEvents.values.min >= 40)
    } finally q1.stop()
    val before = maxEvents
    val batchesBefore = byBatch.size

    val q2 = start()
    try {
      pollUntil()(byBatch.size >= batchesBefore + 1 &&
        maxEvents.values.min > before.values.max)
    } finally q2.stop()
    val after = maxEvents

    (0L until 8L).foreach { u =>
      // recovered counters CONTINUE past the pre-restart value; a
      // reset-to-zero state would emit small counts (one batch adds
      // only 8 events per user, well under the ≥40 accumulated)
      assert(after(u) > before(u),
        s"user $u state did not continue: ${before(u)} -> ${after(u)}")
      // counters count every delivered offset exactly once: totals
      // are a whole number of committed batches' worth per user
      // (offsets round-robin the 8 users, 8 per user per batch)
      assert(after(u) % 8 == 0)
    }
    // one unbroken session per user throughout
    val sessions = byBatch.values.flatten.map(_._2).toSet
    assert(sessions == Set(1L), s"sessions fragmented: $sessions")
    assert(after.values.toSet.size == 1, s"non-uniform delivery: $after")
  }
}
