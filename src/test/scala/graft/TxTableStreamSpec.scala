package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxTable

/** TxTable as a Structured Streaming source: version-ranged
  * micro-batches through the engine's own offset log. The contract
  * under test: every committed row is delivered exactly once across
  * triggers AND across a checkpoint restart; rewriting commits fail
  * the stream fast instead of double-delivering rewritten rows. */
class TxTableStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("graft_txstream_").toString + "/t"

  private def df(ks: Range, tag: String) =
    ks.map(k => (k.toLong, tag)).toDF("k", "tag")

  private def readStreamOf(t: String, extra: (String, String)*) = {
    val r = spark.readStream.format("graft.sources.TxTableStreamSource")
      .option("path", t)
    extra.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("full replay: all committed versions arrive exactly once") {
    val t = freshTable()
    TxTable.overwrite(df(0 until 10, "v1"), t)
    TxTable.append(df(10 until 25, "v2"), t)
    TxTable.append(df(25 until 30, "v3"), t)
    val q = readStreamOf(t).writeStream.format("memory")
      .queryName("txs_full").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("txs_full").select($"k").as[Long]
      .collect().sorted.toSeq
    assert(got === (0L until 30L))
  }

  test("incremental triggers: appends landing mid-stream arrive once") {
    val t = freshTable()
    TxTable.overwrite(df(0 until 5, "v1"), t)
    val q = readStreamOf(t).writeStream.format("memory")
      .queryName("txs_incr").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("txs_incr").count() === 5)
      TxTable.append(df(5 until 12, "v2"), t)
      q.processAllAvailable()
      assert(spark.table("txs_incr").count() === 12)
      TxTable.append(df(12 until 15, "v3"), t)
      q.processAllAvailable()
      val got = spark.table("txs_incr").select($"k").as[Long]
        .collect().sorted.toSeq
      assert(got === (0L until 15L))
    } finally q.stop()
  }

  test("checkpoint restart resumes at the exact version boundary") {
    // memory sink refuses recovery, so the recoverable foreachBatch
    // sink collects per-run deliveries into a fresh buffer each run
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft_txstream_ckpt_").toString
    TxTable.overwrite(df(0 until 8, "v1"), t)
    TxTable.append(df(8 until 14, "v2"), t)
    def run(): Seq[Long] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = readStreamOf(t).writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          b.select($"k").as[Long].collect().foreach(buf.add)
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq.sorted
    }
    assert(run() === (0L until 14L))
    // new data lands while the stream is DOWN; the restarted run must
    // deliver ONLY it — exactly-once across the restart
    TxTable.append(df(14 until 20, "v3"), t)
    val got = run()
    assert(got === (14L until 20L),
      s"restart re-delivered or lost rows: $got")
  }

  test("startingVersion skips the backfill") {
    val t = freshTable()
    TxTable.overwrite(df(0 until 50, "v1"), t)
    TxTable.append(df(50 until 60, "v2"), t)
    val q = readStreamOf(t, "startingVersion" -> "1")
      .writeStream.format("memory")
      .queryName("txs_skip").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("txs_skip").select($"k").as[Long]
      .collect().sorted.toSeq
    assert(got === (50L until 60L))
  }

  test("maxVersionsPerBatch bounds the catch-up; rows still exactly once") {
    val t = freshTable()
    TxTable.overwrite(df(0 until 4, "v1"), t)
    TxTable.append(df(4 until 8, "v2"), t)
    TxTable.append(df(8 until 12, "v3"), t)
    TxTable.append(df(12 until 16, "v4"), t)
    val batchIds = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = readStreamOf(t, "maxVersionsPerBatch" -> "1")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], id: Long) =>
        batchIds.add(id)
        b.select($"k").as[Long].collect().foreach(rows.add)
      }.start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    assert(rows.asScala.toSeq.sorted === (0L until 16L),
      "rate-limited replay lost or duplicated rows")
    assert(batchIds.size >= 4,
      s"cap of 1 version/batch must take >= 4 batches, got ${batchIds.size}")
  }

  test("rate-limited restart resumes from the checkpoint, no stall, no replay") {
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft_txstream_rl_").toString
    TxTable.overwrite(df(0 until 3, "v1"), t)
    TxTable.append(df(3 until 6, "v2"), t)
    def run(): Seq[Long] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = readStreamOf(t, "maxVersionsPerBatch" -> "1")
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          b.select($"k").as[Long].collect().foreach(buf.add)
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq.sorted
    }
    assert(run() === (0L until 6L))
    TxTable.append(df(6 until 9, "v3"), t)
    TxTable.append(df(9 until 12, "v4"), t)
    // the restarted rate-limited source must anchor on the restored
    // offset (commit/getBatch replay), deliver ONLY v3..v4, and not
    // stall behind a cap computed from startingVersion
    assert(run() === (6L until 12L))
  }

  test("a rewriting commit mid-stream fails fast, never double-delivers") {
    val t = freshTable()
    TxTable.overwrite(df(0 until 10, "v1"), t)
    val q = readStreamOf(t).writeStream.format("memory")
      .queryName("txs_rewrite").outputMode("append").start()
    try {
      q.processAllAvailable()
      // overwrite REWRITES the table: files≡rows breaks for (1, 2]
      TxTable.overwrite(df(0 until 3, "v2"), t)
      val e = intercept[StreamingQueryException] { q.processAllAvailable() }
      def chain(x: Throwable): Seq[String] =
        if (x == null) Nil else x.getMessage +: chain(x.getCause)
      assert(chain(e).exists(m => m != null && m.contains("rewrote")),
        s"wrong failure: ${chain(e)}")
    } finally q.stop()
  }

  test("mid-stream schema evolution surfaces only the pinned columns") {
    val t = freshTable()
    TxTable.overwrite(df(0 until 5, "v1"), t)
    val q = readStreamOf(t).writeStream.format("memory")
      .queryName("txs_evolve").outputMode("append").start()
    try {
      q.processAllAvailable()
      // an append that GREW the schema lands mid-stream: the pinned
      // (k, tag) projection must keep flowing — new rows arrive, the
      // extra column simply isn't visible until a stream restart
      // (the documented pinned-at-definition contract)
      TxTable.append(
        df(5 until 9, "v2").withColumn("extra", col("k") * 2), t)
      q.processAllAvailable()
      val out = spark.table("txs_evolve")
      assert(out.columns.toSeq === Seq("k", "tag"),
        s"schema drifted mid-stream: ${out.columns.toSeq}")
      assert(out.select($"k").as[Long].collect().sorted.toSeq
        === (0L until 9L))
    } finally q.stop()
  }

  test("streaming a column-mapped table serves LOGICAL names, pinned") {
    val t = freshTable()
    TxTable.overwrite(df(0 until 4, "v1"), t) // physical (k, tag)
    TxTable.renameColumn(spark, t, "tag", "label") // metadata-only
    val q = readStreamOf(t).writeStream.format("memory")
      .queryName("txs_mapped").outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("txs_mapped")
      assert(out.columns.toSeq === Seq("k", "label"),
        s"stream served physical names: ${out.columns.toSeq}")
      assert(out.as[(Long, String)].collect().sorted.toSeq ===
        (0L until 4L).map(_ -> "v1"))
      // appends through the mapping keep flowing under logical names
      TxTable.append(Seq((9L, "v2")).toDF("k", "label"), t)
      q.processAllAvailable()
      assert(spark.table("txs_mapped").count() === 5)
      // an alter LANDING MID-STREAM stays invisible (the mapping is
      // pinned at definition, like the schema): rows keep flowing
      // under the pinned names until a restart
      TxTable.renameColumn(spark, t, "label", "tag2")
      TxTable.append(Seq((10L, "v3")).toDF("k", "tag2"), t)
      q.processAllAvailable()
      val out2 = spark.table("txs_mapped")
      assert(out2.columns.toSeq === Seq("k", "label"))
      assert(out2.count() === 6)
    } finally q.stop()
  }

  test("CDF mode under column mapping serves logical-named images") {
    val t = freshTable()
    TxTable.enableChangeFeed(spark, t)
    TxTable.append(df(0 until 3, "a"), t) // v1
    TxTable.renameColumn(spark, t, "tag", "label") // v2 (alter: no slice)
    TxTable.deleteWhere(spark, t, Seq(("k", 1.0, 1.0))) // v3: recorded
    val q = readStreamOf(t, "readChangeFeed" -> "true")
      .writeStream.format("memory")
      .queryName("txs_mapped_cdf").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("txs_mapped_cdf")
        .select($"k", $"label", col(TxTable.ChangeTypeCol))
        .as[(Long, String, String)].collect().sorted.toSeq
      assert(got === Seq((0L, "a", "insert"), (1L, "a", "delete"),
        (1L, "a", "insert"), (2L, "a", "insert")))
    } finally q.stop()
  }

  test("defining a stream over a never-committed table fails loudly") {
    val t = freshTable()
    val e = intercept[Exception] { readStreamOf(t) }
    assert(e.getMessage.contains("no committed version"))
  }

  test("streaming a DV'd table from scratch serves the dv-aware snapshot") {
    val t = freshTable()
    TxTable.overwriteIndexedMulti(df(0 until 20, "v1"), t,
      statCols = Seq("k"))
    TxTable.enableDeletionVectors(spark, t)
    TxTable.deleteWhere(spark, t, Seq(("k", 7.0, 7.0)))
    // bootstrap (from version 0) must serve VISIBLE rows — the batch
    // changesSince discipline, not addedBetween's dels fail-fast
    val q = readStreamOf(t).writeStream.format("memory")
      .queryName("txs_dv_boot").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("txs_dv_boot").select($"k").as[Long]
        .collect().sorted.toSeq
      assert(got === (0L until 20L).filterNot(_ == 7L),
        s"DV bootstrap diverged: $got")
      // appends after the bootstrap stay incremental and exact
      // (dels unchanged across the range)
      TxTable.append(df(20 until 25, "v2"), t)
      q.processAllAvailable()
      assert(spark.table("txs_dv_boot").select($"k").as[Long]
        .collect().sorted.toSeq ===
        ((0L until 20L).filterNot(_ == 7L) ++ (20L until 25L)))
    } finally q.stop()
  }

  test("CDF mode streams recorded DML images; restart stays exactly-once") {
    val t = freshTable()
    val ckpt = Files.createTempDirectory("graft_txstream_cdfckpt_").toString
    TxTable.enableChangeFeed(spark, t)
    TxTable.append(df(0 until 4, "a"), t) // v1: inserts
    TxTable.deleteWhere(spark, t, Seq(("k", 1.0, 2.0))) // v2: deletes
    def run(): Seq[(Long, String, Long)] = {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (Long, String, Long)]()
      val q = spark.readStream.format("graft.sources.TxTableStreamSource")
        .option("path", t).option("readChangeFeed", "true")
        .option("maxVersionsPerBatch", "1").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          b.select($"k", col(TxTable.ChangeTypeCol),
              col(TxTable.CommitVersionCol))
            .as[(Long, String, Long)].collect().foreach(buf.add)
        }
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq.sorted
    }
    assert(run() === Seq(
      (0L, "insert", 1L), (1L, "insert", 1L), (1L, "delete", 2L),
      (2L, "insert", 1L), (2L, "delete", 2L), (3L, "insert", 1L)).sorted)
    // DML lands while the stream is DOWN; the restart must deliver
    // ONLY the new version's images — exactly-once across the restart
    TxTable.updateWhere(spark, t, Seq(("k", 3.0, 3.0)), Nil,
      Map("tag" -> lit("B"))) // v3
    val got = run()
    assert(got === Seq(
      (3L, "update_preimage", 3L), (3L, "update_postimage", 3L)).sorted,
      s"CDF restart re-delivered or lost images: $got")
  }
}
