package graft.operators

import graft.{QueryModule, Util, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.2 — event/time-series operators over the `events` table.
  *
  * All window partitioning is by `user_id` (the entity key) — no
  * global sorts; timestamps are projected as epoch micros (BIGINT) in
  * outputs so engine timestamp encodings never enter the compare.
  */
object EventQueries extends QueryModule {

  private val GapUs: Long = 30L * 60 * 1000000 // 30-min session gap

  val queries: Map[String, Q] = Map(
    "q_tumbling_window" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy(
          unix_timestamp(date_trunc("hour", $"ts")).as("bucket"),
          $"event_type")
        .agg(count(lit(1)).as("n"), r4(sum($"value")).as("total_value"))
        .orderBy($"bucket", $"event_type")
    }),

    "q_sessionize" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, d)
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > GapUs, 1L).otherwise(0L))
        .groupBy($"user_id")
        .agg(sum($"new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    }),

    // The BUILT-IN session_window (merge-on-gap) in batch mode, under
    // the DuckDB oracle — proving Spark's native session operator
    // computes exactly the gaps-and-islands SQL every warehouse runs.
    // Boundary semantics differ from q_sessionize's manual lag form:
    // a session's window end is EXCLUSIVE (end = last event + gap), so
    // an event at exactly `gap` after the last one starts a NEW
    // session (diff >= gap splits; the lag form splits on diff > gap)
    // — the oracle mirrors that with >=. Scale: state partitions on
    // user_id like every per-user window here.
    "q_session_window" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id", session_window($"ts", "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          unix_micros($"session_window.start").as("sess_start_us"),
          unix_micros($"session_window.end").as("sess_end_us"),
          $"n_events")
        .orderBy($"user_id", $"sess_start_us")
    }),

    "q_latest_event" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      T.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id",
          unix_micros($"ts").as("ts_us"), $"value")
        .orderBy($"user_id")
    }),

    "q_asof_join" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val views = ev.filter($"event_type" === "view")
        .select($"event_id", $"user_id", $"ts")
      AsOfJoin(purchases, views, key = "user_id", ts = "ts",
          tiebreak = "event_id")
        .filter($"asof_ts".isNotNull)
        .select($"event_id", $"user_id",
          unix_micros($"ts").as("ts_us"),
          unix_micros($"asof_ts").as("view_ts_us"))
        .orderBy($"event_id")
    }),

    // Same AS-OF semantics through the NATIVE whole-plan operator
    // (graft.plans.AsOfJoinNative: custom LogicalPlan + Strategy +
    // SparkPlan — one hash exchange + sort per side, then a
    // zipPartitions merge with O(1) state). Same oracle formulation
    // as q_asof_join, so the custom exec's correctness is
    // driver-gated end to end, not just spec-compared.
    "q_asof_native" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val views = ev.filter($"event_type" === "view")
        .select($"event_id", $"user_id", $"ts")
      graft.plans.AsOfJoinNative(purchases, views, key = "user_id",
          ts = "ts", tiebreak = "event_id")
        .filter($"asof_ts".isNotNull)
        .select($"event_id", $"user_id",
          unix_micros($"ts").as("ts_us"),
          unix_micros($"asof_ts").as("view_ts_us"))
        .orderBy($"event_id")
    }),

    "q_range_join" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .join(T.lineitem(s, d),
          $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" >= $"o_orderdate" &&
            $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 90 DAYS"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
        .orderBy($"o_orderpriority")
    }),

    // PURE interval join — no equi key anywhere: the ~0.2%
    // highest-value orders each open an 8-day shipping window, and
    // every line item shipped inside any window joins it regardless
    // of which order it belongs to. q_range_join above hash-joins on
    // its o_orderkey = l_orderkey key and merely filters the range;
    // HERE there is no key, and Spark's native plan is a broadcast
    // nested loop — every (item, window) pair compared, O(|L|·|I|).
    // Util.binnedIntervalJoin rewrites it as an EQUI join on 7-day
    // bins (each window explodes into ~2 bin rows), confining exact
    // comparisons to co-binned pairs; PlanSpec asserts the nested
    // loop is gone.
    "q_interval_join" -> ((s, d) => {
      import s.implicits._
      val epoch = to_date(lit("1992-01-01"))
      val windows = T.orders(s, d)
        .filter($"o_totalprice" > 499000.0)
        .select($"o_orderkey",
          datediff($"o_orderdate", epoch).as("lo"))
        .withColumn("hi", $"lo" + 7)
      val items = T.lineitem(s, d)
        .select(datediff($"l_shipdate", epoch).as("p"), $"l_extendedprice")
      Util.binnedIntervalJoin(items, "p", windows, "lo", "hi", binWidth = 7)
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n"), r4(sum($"l_extendedprice")).as("total"))
        .orderBy($"o_orderkey")
    }),

    // Conversion latency: first-view → first-purchase minutes per
    // converted user, p50/p90 by the weekday of the first view. The
    // per-user reduction is one partial agg over the event stream;
    // the percentiles ride the distributed exact-percentile (range
    // buckets + prefix offsets — no per-group value buffering), and
    // the per-dow counts broadcast-join back.
    "q_funnel_time" -> ((s, d) => {
      import s.implicits._
      val conv = T.events(s, d)
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "view", unix_micros($"ts"))).as("v"),
          min(when($"event_type" === "view", $"ts")).as("vts"),
          min(when($"event_type" === "purchase", unix_micros($"ts"))).as("p"))
        .filter($"p" > $"v")
        .select((weekday($"vts") + 1).as("dow"),
          (($"p" - $"v") / 60000000.0).as("latency_min"))
      // few-group literal path (7 weekdays — r19 verdict #3): ONE
      // events reduction feeds both the histogram (checkpointed) and
      // the per-dow counts (Σc over it), where the old shape computed
      // `conv` twice (once under the generic percentile, once for the
      // counts); p50/p90 fold in as literals — no broadcast join.
      val P = ExactPercentile
      val hist = conv
        .groupBy($"dow", $"latency_min".as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val pct = P.perGroupWeightedLocal(hist, "dow", "v", "c",
        Seq("p50" -> 0.5, "p90" -> 0.9))
      def pc(nm: String) = P.litCol(
        pct.map { case (g, m) => g -> P.r4d(m(nm)) }, $"dow")
      hist.groupBy($"dow").agg(sum($"c").as("n_converted"))
        .select($"dow", $"n_converted",
          pc("p50").as("p50_min"), pc("p90").as("p90_min"))
        .orderBy($"dow")
    }),

    "q_funnel" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "view", unix_micros($"ts"))).as("v"),
          min(when($"event_type" === "click", unix_micros($"ts"))).as("c"),
          min(when($"event_type" === "purchase", unix_micros($"ts"))).as("p"))
        .agg(
          count($"v").as("n_viewed"),
          sum(when($"c" > $"v", 1L).otherwise(0L)).as("n_clicked_after_view"),
          sum(when($"p" > $"c" && $"c" > $"v", 1L).otherwise(0L)).as("n_purchased_after_click"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_tumbling_window" ->
      """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS bucket,
        |  event_type, count(*) AS n, round(sum(value),4) AS total_value
        |FROM events GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin,

    "q_sessionize" ->
      """SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_us IS NULL OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM (
        |    SELECT user_id, ts,
        |      lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
        |        PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
        |    FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |i AS (SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM m)
        |SELECT user_id, epoch_us(min(ts)) AS sess_start_us,
        |  epoch_us(max(ts) + INTERVAL 30 MINUTE) AS sess_end_us,
        |  count(*) AS n_events
        |FROM i GROUP BY user_id, sess
        |ORDER BY user_id, sess_start_us""".stripMargin,

    "q_latest_event" ->
      """SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM (
        |  SELECT user_id, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_asof_join" ->
      """SELECT event_id, user_id, ts_us, view_ts_us FROM (
        |  SELECT event_id, user_id, tag, epoch_us(ts) AS ts_us,
        |    last_value(CASE WHEN tag = 0 THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |        ORDER BY ts, tag, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts_us
        |  FROM (
        |    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag
        |    FROM events WHERE event_type IN ('view','purchase')))
        |WHERE tag = 1 AND view_ts_us IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_asof_native" ->
      """SELECT event_id, user_id, ts_us, view_ts_us FROM (
        |  SELECT event_id, user_id, tag, epoch_us(ts) AS ts_us,
        |    last_value(CASE WHEN tag = 0 THEN epoch_us(ts) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |        ORDER BY ts, tag, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts_us
        |  FROM (
        |    SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |      CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS tag
        |    FROM events WHERE event_type IN ('view','purchase')))
        |WHERE tag = 1 AND view_ts_us IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue
        |FROM orders JOIN lineitem
        |  ON o_orderkey = l_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // keyless BETWEEN join recomputed directly — equals the binned
    // equi rewrite only if no co-bin was missed and no pair leaked
    "q_interval_join" ->
      """SELECT o_orderkey, count(*) AS n,
        |  round(sum(l_extendedprice), 4) AS total
        |FROM orders JOIN lineitem
        |  ON l_shipdate >= o_orderdate
        |  AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
        |WHERE o_totalprice > 499000.0
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_funnel_time" ->
      """WITH u AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view'
        |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS v,
        |    min(CASE WHEN event_type = 'view'
        |      THEN CAST(ts AS TIMESTAMP) END) AS vts,
        |    min(CASE WHEN event_type = 'purchase'
        |      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p
        |  FROM events GROUP BY 1),
        |conv AS (SELECT CAST(extract(isodow FROM vts) AS INT) AS dow,
        |    (p - v) / 60000000.0 AS latency_min FROM u WHERE p > v)
        |SELECT dow, CAST(count(*) AS BIGINT) AS n_converted,
        |  round(quantile_cont(latency_min, 0.5), 4) AS p50_min,
        |  round(quantile_cont(latency_min, 0.9), 4) AS p90_min
        |FROM conv GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_funnel" ->
      """SELECT count(v) AS n_viewed,
        |  CAST(sum(CASE WHEN c > v THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
        |  CAST(sum(CASE WHEN p > c AND c > v THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click
        |FROM (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS v,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS c,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p
        |  FROM events GROUP BY user_id)""".stripMargin
  )
}
