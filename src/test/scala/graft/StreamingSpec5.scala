package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.JdbcUpsert

/** Exactly-once streaming → JDBC, end to end: the epoch-id-keyed
  * idempotent upsert ([[graft.streaming.JdbcUpsert]]) composed with a
  * checkpointed restart — including a FORCED replay (the offsets file
  * for the last epoch exists but its commit marker is removed, which
  * is exactly the crash-between-offset-and-commit window Structured
  * Streaming re-delivers for). The sink table must come out gap-free
  * and duplicate-free regardless. */
class StreamingSpec5 extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // run-unique DB dir: a repeated test run must not see the previous
  // run's tables
  private val url = "jdbc:derby:" + sys.props("java.io.tmpdir") +
    s"/graft_jdbc_eo_db_${java.util.UUID.randomUUID().toString.take(8)}" +
    ";create=true"

  private def rateSource() =
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", 32L)
      .option("numPartitions", 4L)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", 1000L)
      .load()

  private def pollUntil(deadlineMs: Long = 90000L)(done: => Boolean): Unit = {
    val end = System.nanoTime() + deadlineMs * 1000000L
    while (!done) {
      if (System.nanoTime() > end)
        fail(s"stream made no progress within ${deadlineMs}ms")
      Thread.sleep(50)
    }
  }

  test("epoch-keyed upsert replays a micro-batch without double-writing") {
    val table = "eo_sink"
    JdbcUpsert.createTable(url, table)
    val ckpt = Files.createTempDirectory("graft_eo_ckpt").toString

    def start() = rateSource()
      .select(col("value"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(JdbcUpsert.upsertBatch(url, table) _)
      .start()

    // phase 1: run a few epochs, stop
    val q1 = start()
    try pollUntil()(JdbcUpsert.readValues(url, table).size >= 4 * 32)
    finally q1.stop()

    // force a replay: drop the newest commit marker so the restart
    // re-delivers that epoch (offsets committed, sink commit "lost" —
    // the at-least-once window)
    val commits = Paths.get(ckpt, "commits")
    val newest = Files.list(commits).toArray.map(_.toString)
      .filter(_.matches(".*/\\d+$")).maxBy(p => p.split("/").last.toLong)
    val replayedEpoch = newest.split("/").last.toLong
    Files.delete(Paths.get(newest))
    // ChecksumFileSystem keeps a .N.crc sidecar; the re-written commit
    // marker renames into place and trips over a stale sidecar
    Files.deleteIfExists(commits.resolve(s".$replayedEpoch.crc"))
    val beforeReplay = JdbcUpsert.readValues(url, table)
    assert(beforeReplay.exists(_ >= replayedEpoch * 32),
      "replayed epoch's rows must already be in the sink")

    // phase 2: restart — epoch `replayedEpoch` is re-delivered and
    // re-upserted; then the stream continues with fresh epochs
    val q2 = start()
    try pollUntil()(
      JdbcUpsert.readValues(url, table).size >= beforeReplay.size + 2 * 32)
    finally q2.stop()

    val vals = JdbcUpsert.readValues(url, table).sorted
    // exactly-once: gap-free, duplicate-free offset range from zero —
    // the replayed epoch landed exactly once despite double delivery
    assert(vals == (0L until vals.length.toLong),
      s"sink not exactly-once: ${vals.size} rows, " +
        s"dups=${vals.size - vals.distinct.size}")
  }

  test("streaming into TxTable via appendEpoch is exactly-once across forced replay") {
    import graft.sources.TxTable
    val t = Files.createTempDirectory("graft_txstream_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_txstream_ckpt").toString

    def rows(): Seq[Long] =
      if (TxTable.snapshot(spark, t).isEmpty) Nil
      else TxTable.read(spark, t).select("value")
        .collect().map(_.getLong(0)).toSeq

    def start() = rateSource()
      .select(col("value"))
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
        TxTable.appendEpoch(df, t, "stream1", epoch); ()
      }.start()

    val q1 = start()
    try pollUntil()(rows().size >= 4 * 32)
    finally q1.stop()

    // forced replay: drop the newest stream commit marker — the table
    // ALREADY holds that epoch (its manifest txn marker proves it),
    // so the re-delivered batch must be skipped, not re-appended
    val commits = Paths.get(ckpt, "commits")
    val newest = Files.list(commits).toArray.map(_.toString)
      .filter(_.matches(".*/\\d+$")).maxBy(p => p.split("/").last.toLong)
    Files.delete(Paths.get(newest))
    Files.deleteIfExists(commits.resolve(s".${newest.split("/").last}.crc"))
    val before = rows().size

    val q2 = start()
    try pollUntil()(rows().size >= before + 2 * 32)
    finally q2.stop()

    val vals = rows().sorted
    assert(vals == (0L until vals.length.toLong),
      s"TxTable sink not exactly-once: ${vals.size} rows, " +
        s"dups=${vals.size - vals.distinct.size}")
    // and the dedup marker is in the table's own manifest
    assert(TxTable.snapshot(spark, t).get.txns.contains("stream1"))
  }

  test("NATIVE txtable streaming sink: exactly-once across forced replay") {
    import graft.sources.TxTable
    val t = Files.createTempDirectory("graft_txnative_").toString + "/t"
    val ckpt = Files.createTempDirectory("graft_txnative_ckpt").toString
    // the native sink streams into an EXISTING table (create first —
    // the documented contract; the provider pins schema from the log)
    TxTable.createEmpty(spark, t,
      org.apache.spark.sql.types.StructType.fromDDL("value BIGINT"))

    def rows(): Seq[Long] =
      TxTable.snapshot(spark, t) match {
        case Some(s) if s.files.nonEmpty =>
          TxTable.read(spark, t).select("value")
            .collect().map(_.getLong(0)).toSeq
        case _ => Nil
      }

    def start() = rateSource()
      .select(col("value"))
      .writeStream.format("txtable")
      .option("path", t)
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try pollUntil()(rows().size >= 4 * 32)
    finally q1.stop()

    // forced replay: the at-least-once window (offsets durable, sink
    // commit marker lost) — the manifest txn marker must skip the twin
    val commits = Paths.get(ckpt, "commits")
    val newest = Files.list(commits).toArray.map(_.toString)
      .filter(_.matches(".*/\\d+$")).maxBy(p => p.split("/").last.toLong)
    Files.delete(Paths.get(newest))
    Files.deleteIfExists(
      commits.resolve(s".${newest.split("/").last}.crc"))
    val before = rows().size

    val q2 = start()
    try pollUntil()(rows().size >= before + 2 * 32)
    finally q2.stop()

    val vals = rows().sorted
    assert(vals == (0L until vals.length.toLong),
      s"native sink not exactly-once: ${vals.size} rows, " +
        s"dups=${vals.size - vals.distinct.size}")
    // the dedup marker lives in the table's own manifest, keyed by the
    // engine's queryId (stable across the restart via the checkpoint)
    val snap = TxTable.snapshot(spark, t).get
    assert(snap.txns.size === 1 && snap.op === "append")
  }

  test("upsertBatch is idempotent when invoked twice with the same epoch") {
    val table = "eo_unit"
    JdbcUpsert.createTable(url, table)
    import spark.implicits._
    val df = (0L until 100L).toDF("value").repartition(4)
    JdbcUpsert.upsertBatch(url, table)(df, 7L)
    val once = JdbcUpsert.readValues(url, table).sorted
    JdbcUpsert.upsertBatch(url, table)(df, 7L) // replay, same epoch
    val twice = JdbcUpsert.readValues(url, table).sorted
    assert(once == (0L until 100L))
    assert(twice == once, "replay of the same epoch changed the sink")
    // a NEW epoch appends (different key, no delete overlap)
    JdbcUpsert.upsertBatch(url, table)(df.select($"value" + 100), 8L)
    assert(JdbcUpsert.readValues(url, table).sorted == (0L until 200L))
  }
}
