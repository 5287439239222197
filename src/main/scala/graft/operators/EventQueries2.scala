package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second tranche of event/time-series operators — the monitoring /
  * feature-extraction signals a metrics pipeline computes per entity:
  * time-weighted averages, fixed-tap EWMA smoothing, rolling z-score
  * anomaly detection.
  *
  * Same discipline as [[EventQueries]]: every window partitions by
  * `user_id` (never a global sort), ties break on `event_id`, and
  * timestamps enter arithmetic as epoch micros so engine encodings
  * stay out of the compare.
  */
object EventQueries2 extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Time-weighted average value per (user, day): each observation
    // holds until the next one the same day, so the weight is the gap
    // to the successor (classic TWAP; the last observation of a day
    // carries no weight). One window pass + one aggregation.
    "q_twap" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"day")
        .orderBy($"ts", $"event_id")
      T.events(s, d)
        .withColumn("day", unix_timestamp(date_trunc("day", $"ts")))
        .withColumn("dur_us", lead(unix_micros($"ts"), 1).over(w) -
          unix_micros($"ts"))
        .filter($"dur_us".isNotNull)
        .groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n_obs"),
          r4(sum($"value" * $"dur_us") / sum($"dur_us")).as("twap"))
        .orderBy($"user_id", $"day")
    }),

    // 8-tap exponentially weighted moving average (alpha = 1/2):
    // weights are exact powers of two and the 8-term sum evaluates in
    // fixed expression order, so the smoothed value is bit-identical
    // in any engine — no recursive state, one window pass. Reported
    // at each user's final event (argmax by time, no cross-row float
    // summation at all).
    "q_ewma" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val taps = (0 to 7).map { k =>
        val x = if (k == 0) $"value" else lag($"value", k).over(w)
        (x, math.pow(0.5, k))
      }
      val num = taps.map { case (x, wt) =>
        when(x.isNotNull, x * wt).otherwise(0.0) }.reduce(_ + _)
      val den = taps.map { case (x, wt) =>
        when(x.isNotNull, wt).otherwise(0.0) }.reduce(_ + _)
      T.events(s, d)
        .withColumn("ewma", num / den)
        .withColumn("us", unix_micros($"ts"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"),
          r4(max(struct($"us", $"event_id", $"ewma")).getField("ewma"))
            .as("last_ewma"))
        .orderBy($"user_id")
    }),

    // Inter-purchase cadence: exact quartiles of the gap (whole
    // days) between a user's consecutive purchases — the
    // repeat-purchase rhythm metric. Gaps are integer day counts, so
    // the percentile interpolation sees identical values everywhere.
    "q_purchase_gaps" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      T.events(s, d)
        .filter($"event_type" === "purchase")
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev", lag($"us", 1).over(w))
        .withColumn("gap_days", expr("(us - prev) div 86400000000"))
        .filter($"gap_days".isNotNull)
        .agg(count(lit(1)).as("n_gaps"),
          r4(percentile($"gap_days", lit(0.25))).as("p25"),
          r4(percentile($"gap_days", lit(0.5))).as("p50"),
          r4(percentile($"gap_days", lit(0.75))).as("p75"))
    }),

    // Session abandonment: of sessions (30-min gap rule) that saw a
    // click or view, the share that ended without a purchase — per
    // ISO week, in integer basis points.
    "q_abandon_rate" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      val sess = T.events(s, d)
        .withColumn("us", unix_micros($"ts"))
        .withColumn("prev", lag($"us", 1).over(w))
        .withColumn("brk",
          when($"prev".isNull || $"us" - $"prev" > 30L * 60 * 1000000, 1L)
            .otherwise(0L))
        .withColumn("sess", sum($"brk").over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"sess")
        .agg(min($"us").as("start_us"),
          count_if($"event_type".isin("click", "view")).as("n_browse"),
          count_if($"event_type" === "purchase").as("n_buy"))
        .filter($"n_browse" > 0)
      sess
        .groupBy(weekofyear(timestamp_micros($"start_us")).as("week"))
        .agg(count(lit(1)).as("n_sessions"),
          count_if($"n_buy" === 0).as("n_abandoned"))
        .select($"week", $"n_sessions", $"n_abandoned",
          expr("(n_abandoned * 20000 + n_sessions) div (2 * n_sessions)")
            .as("abandon_bp"))
        .orderBy($"week")
    }),

    // Burst detection: each user's maximum event count inside any
    // trailing 1-hour window — a RANGE frame over epoch micros, so
    // the "window" is true event time, not row count.
    "q_burst_max" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(-3600L * 1000000, 0)
      T.events(s, d)
        .withColumn("us", unix_micros($"ts"))
        .withColumn("in_hour", count(lit(1)).over(w))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), max($"in_hour").as("max_burst"))
        .orderBy($"user_id")
    }),

    // Time-decayed engagement leaderboard: each event contributes
    // value · 0.97^age_days (age against the corpus max day), summed
    // per user; top 20 via TakeOrdered (sort+limit pushes to a
    // per-partition top-k + driver merge of 20-row partials — no full
    // sort shuffle). One linear aggregation pass; the decay power is
    // an integer-day exponent, so both engines evaluate the identical
    // pow() grid.
    "q_decayed_score" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d)
        .select($"user_id", $"value", $"ts".cast("date").as("day"))
      val maxDay = ev.agg(max($"day").as("max_day"))
      ev.crossJoin(broadcast(maxDay))
        .select($"user_id",
          ($"value" * pow(lit(0.97), datediff($"max_day", $"day")))
            .as("w"))
        .groupBy($"user_id").agg(sum($"w").as("score0"))
        .select($"user_id", r4($"score0").as("score"))
        .orderBy($"score".desc, $"user_id")
        .limit(20)
    }),

    // Rolling z-score anomaly counts: each event scores against the
    // mean/stddev of its user's previous 8..20 events (current row
    // excluded — no self-contamination); |z| > 3 flags an anomaly.
    // Aggregated per event type.
    "q_anomaly_zscore" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-20, -1)
      T.events(s, d)
        .withColumn("n_prev", count($"value").over(w))
        .withColumn("mu", avg($"value").over(w))
        .withColumn("sd", stddev_samp($"value").over(w))
        .filter($"n_prev" >= 8 && $"sd" > 0)
        .withColumn("z", ($"value" - $"mu") / $"sd")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_scored"),
          count_if(abs($"z") > 3).as("n_anomalies"),
          r4(max(abs($"z"))).as("max_abs_z"))
        .orderBy($"event_type")
    })
  )

  private val ord = "ORDER BY CAST(ts AS TIMESTAMP), event_id"

  val oracles: Map[String, String] = Map(
    "q_decayed_score" ->
      """WITH m AS (SELECT max(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS max_day
        |  FROM events),
        |w AS (SELECT user_id,
        |    value * pow(0.97, datediff('day',
        |      CAST(CAST(ts AS TIMESTAMP) AS DATE), max_day)) AS w
        |  FROM events, m)
        |SELECT user_id, round(sum(w), 4) AS score
        |FROM w GROUP BY user_id
        |ORDER BY score DESC, user_id LIMIT 20""".stripMargin,

    "q_twap" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) AS BIGINT) AS day,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, value, event_id
        |  FROM events),
        |durs AS (
        |  SELECT user_id, day, value,
        |    lead(us, 1) OVER (PARTITION BY user_id, day
        |      ORDER BY us, event_id) - us AS dur_us
        |  FROM e)
        |SELECT user_id, day, count(*) AS n_obs,
        |  round(sum(value * dur_us) / sum(dur_us), 4) AS twap
        |FROM durs WHERE dur_us IS NOT NULL
        |GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,

    "q_ewma" -> {
      val num = (0 to 7).map { k =>
        val x = if (k == 0) "value" else s"lag(value, $k) OVER w"
        s"CASE WHEN $x IS NOT NULL THEN $x * ${math.pow(0.5, k)} ELSE 0.0 END"
      }.mkString(" + ")
      val den = (0 to 7).map { k =>
        val x = if (k == 0) "value" else s"lag(value, $k) OVER w"
        s"CASE WHEN $x IS NOT NULL THEN ${math.pow(0.5, k)} ELSE 0.0 END"
      }.mkString(" + ")
      s"""WITH sm AS (
         |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
         |    ($num) / ($den) AS ewma
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id $ord)),
         |last AS (
         |  SELECT user_id, ewma,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY us DESC, event_id DESC) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS n_events
         |  FROM sm)
         |SELECT user_id, n_events, round(ewma, 4) AS last_ewma
         |FROM last WHERE rn = 1 ORDER BY user_id""".stripMargin
    },

    "q_purchase_gaps" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (
        |  SELECT (us - lag(us, 1) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id)) // 86400000000 AS gap_days
        |  FROM p)
        |SELECT count(*) AS n_gaps,
        |  round(quantile_cont(gap_days, 0.25), 4) AS p25,
        |  round(quantile_cont(gap_days, 0.5), 4) AS p50,
        |  round(quantile_cont(gap_days, 0.75), 4) AS p75
        |FROM g WHERE gap_days IS NOT NULL""".stripMargin,

    "q_abandon_rate" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, event_type, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (
        |  SELECT user_id, event_type, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM b),
        |sv AS (
        |  SELECT user_id, sess, min(us) AS start_us,
        |    count(*) FILTER (event_type IN ('click', 'view')) AS n_browse,
        |    count(*) FILTER (event_type = 'purchase') AS n_buy
        |  FROM s GROUP BY 1, 2
        |  HAVING count(*) FILTER (event_type IN ('click', 'view')) > 0)
        |SELECT weekofyear(make_timestamp(start_us)) AS week,
        |  count(*) AS n_sessions,
        |  count(*) FILTER (n_buy = 0) AS n_abandoned,
        |  (count(*) FILTER (n_buy = 0) * 20000 + count(*))
        |    // (2 * count(*)) AS abandon_bp
        |FROM sv GROUP BY 1 ORDER BY week""".stripMargin,

    "q_burst_max" ->
      """WITH c AS (
        |  SELECT user_id,
        |    count(*) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |      AS in_hour
        |  FROM events)
        |SELECT user_id, count(*) AS n_events, max(in_hour) AS max_burst
        |FROM c GROUP BY 1 ORDER BY user_id""".stripMargin,

    "q_anomaly_zscore" ->
      """WITH scored AS (
        |  SELECT event_type, value,
        |    count(value) OVER w AS n_prev,
        |    avg(value) OVER w AS mu,
        |    stddev_samp(value) OVER w AS sd
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, (value - mu) / sd AS z
        |  FROM scored WHERE n_prev >= 8 AND sd > 0)
        |SELECT event_type, count(*) AS n_scored,
        |  count(*) FILTER (abs(z) > 3) AS n_anomalies,
        |  round(max(abs(z)), 4) AS max_abs_z
        |FROM z GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
