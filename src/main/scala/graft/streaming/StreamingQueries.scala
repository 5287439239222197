package graft.streaming

import graft.QueryModule
import org.apache.spark.sql.functions.{count, lit, sum, unix_micros}

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
    }),

    // Gap sessionization through the REAL streaming session_window
    // (merge-on-gap state), replayed from files. The file source
    // reads every available file in ONE trigger; complete mode then
    // re-emits the full merged session state each batch, so the
    // memory sink's final table IS the final sessions — no
    // append-mode tail (windows above the final watermark never
    // emit). Session windows reject update mode outright. The DuckDB oracle replays the gap rule with a
    // lag/running-sum session id: a new session starts when the gap
    // to the previous event is >= 30 minutes (Spark merges strictly
    // overlapping [ts, ts+gap) intervals, so touching = new session).
    "stream_session" -> ((s, d) => {
      import s.implicits._
      val q = StreamingOps.sessionWindows(
          StreamingOps.eventStream(s, d), "30 minutes")
        .writeStream.format("memory")
        .queryName("stream_session_gate").outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val out = s.table("stream_session_gate")
        .select($"user_id", $"sess_start", $"n_events")
        .orderBy($"user_id", $"sess_start")
      // sanity: one row per (user, session)
      val emitted = out.count()
      val distinct = out.distinct().count()
      require(emitted == distinct,
        s"stream_session emitted duplicates: $emitted vs $distinct distinct")
      out
    }),

    // The MANUAL stateful sessionizer (flatMapGroupsWithState) under
    // the same driver gate: per-user (n_sessions, n_events) with a
    // 30-minute gap, update mode. The single-trigger file replay
    // means one batch → events sorted within it → the state machine
    // sees in-order input and emits one final row per user (the
    // require below proves it stayed single-batch). Gap rule here is
    // STRICTLY-greater (t - last > gap), unlike session_window's
    // interval-overlap merge — the oracle replays exactly that rule.
    "stream_sessionize" -> ((s, d) => {
      import s.implicits._
      val ev = StreamingOps.eventStream(s, d)
        .select($"user_id",
          unix_micros($"ts").as("ts_us"))
        .as[StreamingOps.UserEvent]
      val q = StreamingOps.sessionCounts(ev, gapUs = 30L * 60 * 1000000)
        .writeStream.format("memory")
        .queryName("stream_sessionize_gate").outputMode("update").start()
      try q.processAllAvailable() finally q.stop()
      val out = s.table("stream_sessionize_gate")
        .select($"user_id", $"n_sessions", $"n_events", $"n_dropped")
        .orderBy($"user_id")
      val emitted = out.count()
      val users = out.select($"user_id").distinct().count()
      require(emitted == users,
        s"stream_sessionize replay was multi-batch: $emitted rows " +
          s"for $users users — update-mode rows would double-count")
      out
    }),

    // Sliding-window counts (1 h window / 30 min slide — every event
    // lands in exactly two windows), complete mode. The oracle
    // materializes the two bucket memberships per event and
    // re-aggregates.
    "stream_sliding" -> ((s, d) => {
      import s.implicits._
      val q = StreamingOps.slidingCounts(StreamingOps.eventStream(s, d))
        .writeStream.format("memory")
        .queryName("stream_sliding_gate").outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      s.table("stream_sliding_gate")
        .select($"bucket", $"event_type", $"n")
        .orderBy($"bucket", $"event_type")
    }),

    // Trigger.AvailableNow backfill under the driver gate: the same
    // watermarked tumbling aggregate, but through the BOUNDED catch-up
    // trigger that rate-limits into micro-batches and then TERMINATES
    // like batch — the operational pattern for replaying history
    // through the graph that then tails live data. Counts only (exact
    // under any batching); the oracle is the batch aggregate.
    "stream_backfill" -> ((s, d) => {
      import s.implicits._
      StreamingOps.availableNowBackfill(
        StreamingOps.tumblingCounts(StreamingOps.eventStream(s, d)),
        "stream_backfill_gate", outputMode = "complete")
      s.table("stream_backfill_gate")
        .select($"bucket", $"event_type", $"n")
        .orderBy($"bucket", $"event_type")
    }),

    // Stream-static broadcast enrichment under the driver gate: the
    // event stream joins a STATIC dimension (customer segment) via
    // broadcast — the planner never shuffles the stream side, the dim
    // re-reads per micro-batch (the stream-static contract). The
    // enriched rows land in the sink and are aggregated in batch; the
    // oracle is the plain batch join.
    "stream_enrich" -> ((s, d) => {
      import s.implicits._
      val dim = graft.Tables.customer(s, d)
        .select(($"c_custkey" - 1).as("user_id"), $"c_mktsegment")
      val q = StreamingOps.enrich(
          StreamingOps.eventStream(s, d)
            .select($"user_id", $"event_type"),
          dim, "user_id")
        .writeStream.format("memory")
        .queryName("stream_enrich_gate").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("stream_enrich_gate")
        .groupBy($"c_mktsegment", $"event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy($"c_mktsegment", $"event_type")
    }),

    // Watermarked streaming dedup under the driver gate: one surviving
    // row per (user, event_type) key through the bounded-state
    // dropDuplicatesWithinWatermark machine. WHICH row survives a
    // single-batch replay is engine-internal, so the gated output is
    // the surviving KEY SET (plus the exactly-one-per-key invariant
    // asserted in construction) — the oracle is the batch DISTINCT.
    "stream_dedup" -> ((s, d) => {
      import s.implicits._
      val q = StreamingOps.dedupedBy(
          StreamingOps.eventStream(s, d)
            .select($"ts", $"user_id", $"event_type"),
          Seq("user_id", "event_type"))
        .writeStream.format("memory")
        .queryName("stream_dedup_gate").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val out = s.table("stream_dedup_gate")
        .select($"user_id", $"event_type")
      val emitted = out.count()
      val keys = out.distinct().count()
      require(emitted == keys,
        s"streaming dedup emitted duplicates: $emitted rows, $keys keys")
      out.orderBy($"user_id", $"event_type")
    }),

    // transformWithState running totals (the Spark 4 arbitrary-state
    // API on the RocksDB store) under the driver gate: per-user
    // (count, value-sum) in update mode. The single-trigger replay
    // emits one final row per user (asserted); cents make the sum
    // exact under any in-batch iteration order.
    "stream_totals" -> ((s, d) => {
      import s.implicits._
      val prev = s.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      try {
        val ev = StreamingOps.eventStream(s, d)
          .select($"user_id",
            org.apache.spark.sql.functions.round($"value" * 100)
              .as("value"))
          .as[StreamingOps.UserValue]
        val q = StreamingOps.runningTotals(ev).toDF()
          .writeStream.format("memory")
          .queryName("stream_totals_gate").outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
      } finally prev match {
        case Some(v) => s.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => s.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
      val out = s.table("stream_totals_gate")
        .select($"user_id", $"n_events",
          ($"total_value".cast("long")).as("cents"))
      val emitted = out.count()
      val users = out.select($"user_id").distinct().count()
      require(emitted == users,
        s"stream_totals replay was multi-batch: $emitted rows " +
          s"for $users users — update-mode rows would double-count")
      out.orderBy($"user_id")
    }),

    // The TxTable STREAMING SOURCE under the driver gate: the events
    // table lands in a snapshot table as three append-only commits,
    // the whole table is then replayed through readStream (offsets =
    // table versions, one micro-batch per available version range)
    // into a memory sink, and the aggregate over the sink must equal
    // the batch aggregate DuckDB computes straight from parquet.
    // Value flows as integer cents so the sum is exact under ANY
    // micro-batching. A lost version, re-delivered file, or
    // wrong-offset resume diverges.
    "stream_txtable" -> ((s, d) => {
      import s.implicits._
      import graft.sources.TxTable
      val dir = sys.props("java.io.tmpdir") +
        "/graft_txstream_gate_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = graft.Tables.events(s, d).select($"event_id", $"event_type",
        org.apache.spark.sql.functions.round($"value" * 100)
          .cast("long").as("cents"))
      // three append-only commits split by event_id residue — the
      // producer shape changesSince/the source are exact for
      TxTable.overwrite(ev.filter($"event_id" % 3 === 0), dir)
      TxTable.append(ev.filter($"event_id" % 3 === 1), dir)
      TxTable.append(ev.filter($"event_id" % 3 === 2), dir)
      val q = s.readStream.format("graft.sources.TxTableStreamSource")
        .option("path", dir).load()
        .writeStream.format("memory")
        .queryName("stream_txtable_gate").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("stream_txtable_gate")
        .groupBy($"event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"cents").as("cents"))
        .orderBy($"event_type")
    }),

    // The CHANGE DATA FEED as a STREAM under the driver gate: the
    // same append/append/update/delete cycle as pipe_snapshot_cdf
    // (feed enabled), replayed through readStream with
    // readChangeFeed=true and maxVersionsPerBatch=1 — one micro-batch
    // per version, so the offset walk crosses every slice boundary.
    // The sink aggregate by (version, change type) must equal the
    // oracle's pure-SQL replay of the whole cycle: a DML version
    // that double-delivered its rewrite (the failure the non-CDF
    // source FAILS on, now SERVED as recorded images), a lost
    // preimage, or a wrong version attribution all diverge.
    "stream_txtable_cdf" -> ((s, d) => {
      import s.implicits._
      import graft.sources.TxTable
      val dir = sys.props("java.io.tmpdir") +
        "/graft_txstream_cdf_" + d.replaceAll("[^A-Za-z0-9]", "_")
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      TxTable.enableChangeFeed(s, dir)
      val base = graft.Tables.orders(s, d).select(
        $"o_orderkey".as("k"), $"o_orderpriority".as("pr"),
        org.apache.spark.sql.functions.round($"o_totalprice" * 100)
          .cast("long").as("cents"))
      TxTable.append(base.filter($"pr" === "1-URGENT"), dir) // v1
      TxTable.append(base.filter($"pr" === "2-HIGH"), dir) // v2
      TxTable.updateWhere(s, dir, Seq(("cents", 0.0, 1.0e7)), Nil,
        set = Map("cents" -> ($"cents" + 7))) // v3
      TxTable.deleteWhere(s, dir, Seq(("cents", 3.0e7, 1.0e12))) // v4
      val q = s.readStream.format("graft.sources.TxTableStreamSource")
        .option("path", dir).option("readChangeFeed", "true")
        .option("maxVersionsPerBatch", "1").load()
        .writeStream.format("memory")
        .queryName("stream_txtable_cdf_gate").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("stream_txtable_cdf_gate")
        .groupBy(
          org.apache.spark.sql.functions.col(TxTable.CommitVersionCol)
            .as("v"),
          org.apache.spark.sql.functions.col(TxTable.ChangeTypeCol)
            .as("change_type"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"k").as("sum_k"),
          org.apache.spark.sql.functions.sum($"cents").as("sum_cents"))
        .orderBy($"v", $"change_type")
    }),

    // STREAMING CDF → INCREMENTAL VIEW MAINTENANCE, composed under
    // the driver gate: the change feed of a DML cycle (append /
    // append / update / delete) drives a continuously-maintained
    // aggregate view through the REAL streaming engine —
    // readChangeFeed micro-batches (one per version) fold into the
    // view inside foreachBatch via IncrementalView.applyFeedBatch,
    // exactly-once per epoch (the marker commits atomically with the
    // view state). After the stream drains, a RESTART re-runs the
    // query over the same checkpoint — replays must be no-ops. The
    // final VIEW hash-matches the oracle's pure-SQL recompute of the
    // final source state: a double-folded epoch, a lost preimage, or
    // a missed emptied-group all diverge.
    "stream_ivm" -> ((s, d) => {
      import s.implicits._
      import graft.sources.{IncrementalView, TxTable}
      val slug = d.replaceAll("[^A-Za-z0-9]", "_")
      val tmp = sys.props("java.io.tmpdir")
      val srcDir = tmp + "/graft_stream_ivm_src_" + slug
      val dstDir = tmp + "/graft_stream_ivm_dst_" + slug
      val ckpt = tmp + "/graft_stream_ivm_ckpt_" + slug
      val hconf = s.sparkContext.hadoopConfiguration
      Seq(srcDir, dstDir, ckpt).foreach { p0 =>
        val p = new org.apache.hadoop.fs.Path(p0)
        p.getFileSystem(hconf).delete(p, true)
      }
      TxTable.enableChangeFeed(s, srcDir)
      val base = graft.Tables.orders(s, d).select(
        $"o_orderkey".as("k"), $"o_orderpriority".as("pr"),
        org.apache.spark.sql.functions.round($"o_totalprice" * 100)
          .cast("long").as("cents"))
      TxTable.append(base.filter($"pr" === "1-URGENT"), srcDir) // v1
      TxTable.append(base.filter($"pr" === "2-HIGH"), srcDir) // v2
      TxTable.updateWhere(s, srcDir, Seq(("cents", 0.0, 1.0e7)), Nil,
        set = Map("cents" -> ($"cents" + 7))) // v3
      TxTable.deleteWhere(s, srcDir, Seq(("cents", 3.0e7, 1.0e12))) // v4
      def start() = s.readStream
        .format("graft.sources.TxTableStreamSource")
        .option("path", srcDir).option("readChangeFeed", "true")
        .option("maxVersionsPerBatch", "1").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
          IncrementalView.applyFeedBatch(
            df, dstDir, "pr", "cents", "stream_ivm_gate", epoch)
          ()
        }.start()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // restart over the same checkpoint: any re-delivered epoch must
      // hit the manifest marker and fold NOTHING
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      TxTable.read(s, dstDir)
        .select($"pr".as("o_orderpriority"), $"n", $"s".as("cents"))
        .orderBy($"o_orderpriority")
    }),

    // The TxTable streaming SINK under the driver gate: the strongest
    // exactly-once claim in the tree, previously spec-only
    // (StreamingSpec5). An end-to-end TxTable → TxTable pipe: the
    // source's version-offsets deliver three micro-batches
    // (maxVersionsPerBatch=1), each lands in the sink table via
    // appendEpoch (the dedup marker lives IN the manifest it
    // commits), and then the run FORCES a replay — the newest stream
    // commit marker is deleted and the stream restarted, so
    // Structured Streaming re-delivers the final batch. The manifest
    // txn marker must skip it: any double-append diverges from the
    // DuckDB batch aggregate (integer cents, exact under any
    // batching), and an explicit duplicate-id require fails fast with
    // the better message.
    "stream_txtable_sink" -> ((s, d) => {
      import s.implicits._
      import graft.sources.TxTable
      val slug = d.replaceAll("[^A-Za-z0-9]", "_")
      val tmp = sys.props("java.io.tmpdir")
      val srcDir = tmp + "/graft_txsink_src_" + slug
      val sinkDir = tmp + "/graft_txsink_dst_" + slug
      val ckpt = tmp + "/graft_txsink_ckpt_" + slug
      val hconf = s.sparkContext.hadoopConfiguration
      Seq(srcDir, sinkDir, ckpt).foreach { p0 =>
        val p = new org.apache.hadoop.fs.Path(p0)
        p.getFileSystem(hconf).delete(p, true)
      }
      val ev = graft.Tables.events(s, d).select($"event_id", $"event_type",
        org.apache.spark.sql.functions.round($"value" * 100)
          .cast("long").as("cents"))
      TxTable.overwrite(ev.filter($"event_id" % 3 === 0), srcDir)
      TxTable.append(ev.filter($"event_id" % 3 === 1), srcDir)
      TxTable.append(ev.filter($"event_id" % 3 === 2), srcDir)
      def start() = s.readStream.format("graft.sources.TxTableStreamSource")
        .option("path", srcDir).option("maxVersionsPerBatch", "1").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
          TxTable.appendEpoch(df, sinkDir, "txsink_gate", epoch); ()
        }.start()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // forced replay: drop the newest commit marker so the restart
      // re-delivers an epoch the sink table already holds
      val commits = java.nio.file.Paths.get(ckpt, "commits")
      val commitPaths = {
        val st = java.nio.file.Files.list(commits)
        try st.toArray.map(_.toString).filter(_.matches(".*/\\d+$"))
        finally st.close() // directory streams leak fds if unclosed
      }
      require(commitPaths.nonEmpty,
        s"txtable sink gate: no commit markers under $commits — " +
          "the first run made no progress")
      val newest = commitPaths.maxBy(p => p.split("/").last.toLong)
      java.nio.file.Files.delete(java.nio.file.Paths.get(newest))
      java.nio.file.Files.deleteIfExists(
        commits.resolve(s".${newest.split("/").last}.crc"))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val sunk = TxTable.read(s, sinkDir)
      val n = sunk.count()
      val distinctIds = sunk.select($"event_id").distinct().count()
      require(n == distinctIds,
        s"TxTable sink not exactly-once: $n rows, ${n - distinctIds} dups")
      sunk.groupBy($"event_type")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"cents").as("cents"))
        .orderBy($"event_type")
    }),

    // Streaming GX quarantine gate under the driver oracle: every
    // micro-batch routes through ExpectationSuite.quarantine inside
    // foreachBatch (valid rows forward, violations to the side
    // output) and the per-route per-type counts accumulate across
    // batches — counts are exact under ANY batching, and the DuckDB
    // oracle is the same split computed over the batch table. The
    // per-batch collect is bounded at one row per event type.
    "stream_dq_quarantine" -> ((s, d) => {
      import s.implicits._
      import graft.quality.{ExpectBetween, ExpectInSet, ExpectationSuite}
      val suite = ExpectationSuite("events", Seq(
        ExpectBetween("value", 0.5, 1e9),
        ExpectInSet("event_type", Seq("click", "view", "purchase", "signup"))))
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (String, Long, Long, Long)]()
      val q = StreamingOps.eventStream(s, d)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val (ok, bad) = suite.quarantine(df)
          ok.groupBy($"event_type")
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"),
              org.apache.spark.sql.functions.sum(
                org.apache.spark.sql.functions.round($"value" * 100)
                  .cast("long")).as("cents"))
            .collect().foreach(r =>
              buf.add((r.getString(0), r.getLong(1), 0L, r.getLong(2))))
          bad.groupBy($"event_type")
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
            .collect().foreach(r =>
              buf.add((r.getString(0), 0L, r.getLong(1), 0L)))
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq
        .toDF("event_type", "nv", "nq", "cv")
        .groupBy($"event_type")
        .agg(sum($"nv").as("n_valid"), sum($"nq").as("n_quarantined"),
          sum($"cv").as("cents_valid"))
        .orderBy($"event_type")
    }),

    // Exactly-once streaming → JDBC (embedded Derby) UNDER the driver
    // gate, with a FORCED mid-run replay: the TxTable stream source
    // delivers three commits as three epochs, the newest checkpoint
    // commit marker is deleted, and the restart re-delivers an epoch
    // the sink already holds — JdbcUpsert's (epoch, part)-keyed
    // delete+insert transaction makes the re-delivery byte-idempotent.
    // The oracle recomputes the same per-bucket aggregate from the
    // raw table: any dropped or doubled row diverges.
    "stream_jdbc_sink" -> ((s, d) => {
      import s.implicits._
      import graft.sources.TxTable
      val slug = d.replaceAll("[^A-Za-z0-9]", "_")
      val tmp = sys.props("java.io.tmpdir")
      val srcDir = tmp + "/graft_jdbcsink_src_" + slug
      val ckpt = tmp + "/graft_jdbcsink_ckpt_" + slug
      val hconf = s.sparkContext.hadoopConfiguration
      Seq(srcDir, ckpt).foreach { p0 =>
        val p = new org.apache.hadoop.fs.Path(p0)
        p.getFileSystem(hconf).delete(p, true)
      }
      val url = s"jdbc:derby:memory:graftsink_$slug;create=true"
      val table = "sink_gate"
      try JdbcUpsert.createTable(url, table)
      catch { case _: java.sql.SQLException => // table from a prior run
        val c = java.sql.DriverManager.getConnection(url)
        try { val st = c.createStatement()
          st.executeUpdate(s"DELETE FROM $table"); st.close()
        } finally c.close()
      }
      val ev = graft.Tables.events(s, d).select($"event_id")
      TxTable.overwrite(ev.filter($"event_id" % 3 === 0), srcDir)
      TxTable.append(ev.filter($"event_id" % 3 === 1), srcDir)
      TxTable.append(ev.filter($"event_id" % 3 === 2), srcDir)
      def start() = s.readStream.format("graft.sources.TxTableStreamSource")
        .option("path", srcDir).option("maxVersionsPerBatch", "1").load()
        .select($"event_id".as("v"))
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch(JdbcUpsert.upsertBatch(url, table) _)
        .start()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // forced replay: drop the newest commit marker (same protocol
      // as stream_txtable_sink) so the restart re-delivers an epoch
      val commits = java.nio.file.Paths.get(ckpt, "commits")
      val commitPaths = {
        val st = java.nio.file.Files.list(commits)
        try st.toArray.map(_.toString).filter(_.matches(".*/\\d+$"))
        finally st.close()
      }
      require(commitPaths.nonEmpty,
        s"jdbc sink gate: no commit markers under $commits")
      val newest = commitPaths.maxBy(p => p.split("/").last.toLong)
      java.nio.file.Files.delete(java.nio.file.Paths.get(newest))
      java.nio.file.Files.deleteIfExists(
        commits.resolve(s".${newest.split("/").last}.crc"))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val sunk = s.read.format("jdbc")
        .option("url", url).option("dbtable", table).load()
        .select($"v")
      val n = sunk.count()
      val distinctIds = sunk.distinct().count()
      require(n == distinctIds,
        s"JDBC sink not exactly-once: $n rows, ${n - distinctIds} dups")
      sunk.groupBy(($"v" % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), sum($"v").as("id_sum"))
        .orderBy($"bucket")
    }),

    // Stream-stream interval join (clicks × purchases within the
    // following hour, both sides watermarked): inner-join matches
    // emit as they pair, and the single-trigger replay sees both
    // sides complete in batch 1, so the memory sink holds exactly
    // the batch join. The oracle is that batch join in SQL.
    "stream_join" -> ((s, d) => {
      import s.implicits._
      val ev = StreamingOps.eventStream(s, d)
      val q = StreamingOps.clickPurchaseJoin(ev, ev)
        .writeStream.format("memory")
        .queryName("stream_join_gate").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("stream_join_gate")
        .select($"user_id", $"click_id", $"purchase_id")
        .orderBy($"user_id", $"click_id", $"purchase_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // the same quarantine split over the batch table: a row is valid
    // iff it passes EVERY value-level expectation (conjunction)
    "stream_dq_quarantine" ->
      """SELECT event_type,
        |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
        |  CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_quarantined,
        |  CAST(sum(CASE WHEN ok THEN CAST(round(value * 100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS cents_valid
        |FROM (
        |  SELECT event_type, value,
        |    (value IS NULL OR (value >= 0.5 AND value <= 1e9))
        |    AND (event_type IS NULL OR event_type IN
        |      ('click', 'view', 'purchase', 'signup')) AS ok
        |  FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // direct per-bucket aggregate over the raw ids — equals the JDBC
    // read-back only if every event id landed exactly once through
    // the replayed epochs
    "stream_jdbc_sink" ->
      """SELECT event_id % 10 AS bucket, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "stream_tumbling" ->
      """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS bucket,
        |  event_type, count(*) AS n
        |FROM events GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,

    "stream_session" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |d AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin,

    "stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t FROM events),
        |d AS (
        |  SELECT user_id, t,
        |    CASE WHEN lag(t) OVER w IS NULL
        |           OR t - lag(t) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t))
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events, CAST(0 AS BIGINT) AS n_dropped
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,

    "stream_sliding" ->
      """WITH e AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |b AS (
        |  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w, event_type
        |  FROM e
        |  UNION ALL
        |  SELECT time_bucket(INTERVAL '30 minutes', ts)
        |    - INTERVAL '30 minutes' AS w, event_type
        |  FROM e)
        |SELECT CAST(epoch(w) AS BIGINT) AS bucket, event_type,
        |  count(*) AS n
        |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_backfill" ->
      """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |    AS BIGINT) AS bucket,
        |  event_type, count(*) AS n
        |FROM events GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,

    "stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n
        |FROM events JOIN customer ON c_custkey = user_id + 1
        |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin,

    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,

    "stream_totals" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(sum(round(value * 100)) AS BIGINT) AS cents
        |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin,

    "stream_txtable" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // pure-SQL replay of the streamed change-feed cycle — identical
    // to pipe_snapshot_cdf's oracle: the streaming delivery must be
    // invisible relative to the batch feed
    "stream_txtable_cdf" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS pr,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |v1 AS (SELECT k, cents FROM base WHERE pr = '1-URGENT'),
        |v2 AS (SELECT k, cents FROM base WHERE pr = '2-HIGH'),
        |tbl AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2),
        |upd AS (SELECT * FROM tbl WHERE cents BETWEEN 0 AND 10000000),
        |tbl3 AS (SELECT k, CASE WHEN cents BETWEEN 0 AND 10000000
        |    THEN cents + 7 ELSE cents END AS cents FROM tbl),
        |del AS (SELECT * FROM tbl3 WHERE cents >= 30000000),
        |feed AS (
        |  SELECT 1 AS v, 'insert' AS change_type, k, cents FROM v1
        |  UNION ALL SELECT 2, 'insert', k, cents FROM v2
        |  UNION ALL SELECT 3, 'update_preimage', k, cents FROM upd
        |  UNION ALL SELECT 3, 'update_postimage', k, cents + 7 FROM upd
        |  UNION ALL SELECT 4, 'delete', k, cents FROM del)
        |SELECT CAST(v AS BIGINT) AS v, change_type, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM feed GROUP BY 1, 2 ORDER BY v, change_type""".stripMargin,

    // the streamed-and-folded VIEW must equal the straight recompute
    // of the FINAL source state (same algebra as pipe_ivm's oracle) —
    // a double-folded epoch or a lost slice diverges
    "stream_ivm" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_orderpriority AS pr,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |t0 AS (SELECT k, pr, cents FROM base
        |  WHERE pr IN ('1-URGENT', '2-HIGH')),
        |t1 AS (SELECT k, pr, CASE WHEN cents BETWEEN 0 AND 10000000
        |    THEN cents + 7 ELSE cents END AS cents FROM t0),
        |fin AS (SELECT * FROM t1 WHERE cents < 30000000)
        |SELECT pr AS o_orderpriority, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS cents
        |FROM fin GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    // same batch aggregate: the sink pipe must be invisible — any
    // replay double-append or lost batch diverges
    "stream_txtable_sink" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "stream_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        | AND CAST(p.ts AS TIMESTAMP)
        |     <= CAST(c.ts AS TIMESTAMP) + INTERVAL 1 HOUR
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin
  )
}
