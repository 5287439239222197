package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** §2.2 streaming variants — Structured Streaming versions of the
  * tumbling-window aggregate and gap sessionization.
  *
  * Watermarks bound state (1h for windows); sessionization keeps one
  * tiny [[SessionState]] per user in the state store. Both run
  * identically on a 1000-executor cluster: state is partitioned by
  * the grouping key, exactly like the batch shuffles.
  */
object StreamingOps {

  /** The file-stream source requires an explicit schema — but pinning
    * a hand-written one breaks silently when the corpus's physical
    * encoding drifts (round 8: the ts column moved from int64-nanos to
    * TIMESTAMP and the stale long-typed schema read nulls, not an
    * error). Derive the schema from a one-off BATCH read of the same
    * glob, so the stream always sees what the files actually contain,
    * then canonicalize ts exactly as the batch loader does
    * ([[graft.Tables.normalizeTs]]). */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file stream source wants a directory: stream the sf dir,
    // globbed down to the events table
    val glob = "events.parquet"
    // one inference per JVM via the catalog cache (r19 verdict #1):
    // the glob resolves to exactly $dir/events.parquet — the same
    // immutable corpus file Tables serves — and the batch inference
    // here additionally paid a FULL sfDir listing per stream
    // construction. The drift-resilience contract is unchanged: the
    // schema still comes from the actual file (first read per JVM),
    // never a hand-pinned StructType.
    val fileSchema = graft.Tables.schemaFor(spark, s"$dir/events.parquet")
    graft.Tables.normalizeTs(
      spark.readStream.schema(fileSchema)
        .option("pathGlobFilter", glob)
        .parquet(dir))
  }

  /** Streaming tumbling-hour counts, watermarked so late state ages out. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"), col("total_value"))

  /** Built-in session windows (merge-on-gap): Spark fuses events
    * within `gap` of each other into one window per user and keeps
    * only bounded per-session state under the watermark — the
    * declarative alternative to [[sessionCounts]]'s manual state
    * machine. Works identically on batch and streaming frames. */
  def sessionWindows(events: DataFrame, gap: String): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("sess_start"),
        col("n_events"))

  case class SessionState(lastTsUs: Long, sessions: Long, events: Long,
      dropped: Long)
  case class UserEvent(user_id: Long, ts_us: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long,
      n_dropped: Long)

  /** Stateful gap sessionization via flatMapGroupsWithState: per-user
    * running (sessions, events) counts, updated per micro-batch.
    *
    * Ordering contract: events are sorted WITHIN each micro-batch;
    * ACROSS batches an event older than the last processed timestamp
    * is dropped (it would otherwise compute a negative gap — never
    * opening a session — and drag `lastTsUs` backwards, silently
    * undercounting). The drop is NOT silent: every dropped event
    * increments the per-user `n_dropped` counter carried in the
    * state and emitted with each update, so late-data loss is
    * observable and alertable. Cross-batch out-of-order input that
    * must be honored belongs in the watermark-merging
    * [[sessionWindows]] path, which buffers late data declaratively. */
  def sessionCounts(events: Dataset[UserEvent],
      gapUs: Long): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[SessionState]) =>
          var st = state.getOption.getOrElse(
            SessionState(Long.MinValue, 0L, 0L, 0L))
          val (stale, fresh) = rows.map(_.ts_us).toSeq.sorted
            .partition(t => st.lastTsUs != Long.MinValue && t < st.lastTsUs)
          st = st.copy(dropped = st.dropped + stale.size)
          fresh.foreach { t =>
            val newSession = st.lastTsUs == Long.MinValue || t - st.lastTsUs > gapUs
            st = SessionState(t,
              st.sessions + (if (newSession) 1 else 0), st.events + 1,
              st.dropped)
          }
          state.update(st)
          Iterator(UserSessions(user, st.sessions, st.events, st.dropped))
      }
  }

  /** Sliding-window counts (1h window / 30m slide): each event lands
    * in two windows; the watermark ages out closed windows' state. */
  def slidingCounts(events: DataFrame): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"))

  /** Stream-static enrichment: the static dimension joins against
    * every micro-batch (broadcast when small) — the streaming analog
    * of the star-schema broadcast join. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key))

  /** Watermarked streaming dedup: drops repeats of `idCol` arriving
    * within the watermark delay, with state bounded by the watermark
    * (exactly-once per id without unbounded memory). */
  def deduped(events: DataFrame, idCol: String): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(idCol)

  /** [[deduped]] over a composite key. */
  def dedupedBy(events: DataFrame, cols: Seq[String]): DataFrame =
    events.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark(cols.toSeq)

  case class UserValue(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

  /** Per-user running totals on the Spark 4 `transformWithState` API:
    * typed [[ValueState]] in the RocksDB state store, updated per
    * micro-batch. The arbitrary-state successor to
    * flatMapGroupsWithState — state is columnar-encoded, TTL-able,
    * and rescalable across executors. */
  class RunningTotalsProcessor
      extends StatefulProcessor[Long, UserValue, UserTotals] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[UserValue],
        timers: TimerValues): Iterator[UserTotals] = {
      var (n, tot) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { r => n += 1; tot += r.value }
      totals.update((n, tot))
      Iterator(UserTotals(user, n, tot))
    }
  }

  /** Running per-user (count, value-sum) via transformWithState.
    * Requires the RocksDB state store provider (set
    * `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider`). */
  def runningTotals(events: Dataset[UserValue]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Stream-stream interval join: each click pairs with the same
    * user's purchases within the following hour. Both sides carry
    * watermarks and the join condition bounds event time on both
    * ends, so the state store holds at most watermark+interval of
    * either stream — the standard bounded-state stream-stream join. */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p, expr(
      """user_id = p_user_id AND
        |purchase_ts >= click_ts AND
        |purchase_ts <= click_ts + interval 1 hour""".stripMargin))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** LEFT OUTER stream-stream interval join: like
    * [[clickPurchaseJoin]] but unconverted clicks ARE the product —
    * they emit (purchase_id = null) once the watermark passes the
    * join interval's upper bound, i.e. once a matching purchase has
    * provably not arrived. Same bounded state as the inner form; the
    * null rows are the abandoned-session feed. */
  def clickPurchaseLeftJoin(clicks: DataFrame,
      purchases: DataFrame): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val p = purchases.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    c.join(p, expr(
      """user_id = p_user_id AND
        |purchase_ts >= click_ts AND
        |purchase_ts <= click_ts + interval 1 hour""".stripMargin),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"))
  }

  /** Bounded backfill: run a streaming pipeline over everything
    * currently in the source and STOP — `Trigger.AvailableNow` splits
    * the catch-up into rate-limited micro-batches (unlike a plain
    * batch read) while terminating like one. The operational pattern
    * for replaying history through the same streaming graph that then
    * tails live data. Returns when the backfill completes. */
  def availableNowBackfill(stream: DataFrame, sinkTable: String,
      outputMode: String = "append"): Unit = {
    // outputMode must match the pipeline: full-aggregate streams need
    // "complete"; non-aggregated ones (e.g. clickPurchaseLeftJoin)
    // only run in the default "append" — the previous hardcoded
    // "complete" made those throw AnalysisException
    val q = stream.writeStream
      .format("memory").queryName(sinkTable)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
