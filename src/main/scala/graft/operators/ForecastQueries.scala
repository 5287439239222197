package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** Time-series forecasting and engagement-health operators.
  *
  * - q_forecast_linear: per-segment OLS trend over the monthly revenue
  *   series plus the one-step-ahead forecast — the ubiquitous
  *   "capacity/budget projection" query. Fitting happens on the
  *   AGGREGATED series (months, not rows), so the regression state is
  *   months-sized no matter how many raw orders feed it; the raw table
  *   is touched exactly once, by the monthly rollup.
  * - q_anomaly_mad: robust outlier counts per event type using the
  *   median/MAD gate (|x − med| > 3.5·1.4826·MAD — the modified
  *   z-score rule, immune to the outliers it hunts, unlike the mean ±
  *   kσ gate of q_anomaly_zscore). Rides the same one-histogram
  *   two-round exact-percentile discipline as q_mad: the raw table
  *   shuffles ONCE into a (group, value, count) histogram, medians and
  *   deviation medians come from distributed prefix sums, and the
  *   outlier count is a histogram re-aggregation — no second table
  *   scan, no per-group sort.
  * - q_stickiness: DAU/WAU engagement ratio per week — the standard
  *   product-health metric. Two partial-agg shuffles (per-day and
  *   per-week distincts); integer counts make cross-engine parity
  *   exact.
  */
object ForecastQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Sample-ratio-mismatch guard (the first thing to check on any
    // A/B readout): orders hash-split 50/50 by key; the chi-square
    // stat against the expected equal split flags a broken
    // randomizer. One scalar aggregate; integer counts make the stat
    // a division of identical integers in both engines.
    "q_srm_check" -> ((s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select(
        (conv(substring(md5($"o_orderkey".cast("string")), 1, 8), 16, 10)
          .cast("long") % 2 === 0).as("arm_a"))
      o.agg(count_if($"arm_a").as("n_a"), count_if(!$"arm_a").as("n_b"))
        .select($"n_a", $"n_b",
          r4(pow($"n_a" - ($"n_a" + $"n_b") / 2.0, 2) /
              (($"n_a" + $"n_b") / 2.0) +
            pow($"n_b" - ($"n_a" + $"n_b") / 2.0, 2) /
              (($"n_a" + $"n_b") / 2.0)).as("chisq"),
          // χ²(1df) > 3.84 ⇒ p < 0.05 ⇒ the split is broken
          (pow($"n_a" - ($"n_a" + $"n_b") / 2.0, 2) /
              (($"n_a" + $"n_b") / 2.0) +
            pow($"n_b" - ($"n_a" + $"n_b") / 2.0, 2) /
              (($"n_a" + $"n_b") / 2.0) > 3.84).as("srm_flag"))
    }),

    // Trailing 30-day rolling correlation between the daily order
    // count and daily revenue — computed over the DAY-GRAIN aggregate
    // series (the raw table shuffles once into ~2500 day rows; every
    // window after that is day-sized, the q_seasonal_decompose
    // discipline). corr from windowed raw sums, n pinned at 30.
    "q_rolling_corr" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .orderBy($"day").rowsBetween(-29, 0)
      val daily = T.orders(s, d)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(count(lit(1)).cast("double").as("x"),
          (sum(round($"o_totalprice" * 100).cast("long")) / 100.0)
            .as("y"))
      daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum($"x").over(w))
        .withColumn("sy", sum($"y").over(w))
        .withColumn("sxx", sum($"x" * $"x").over(w))
        .withColumn("syy", sum($"y" * $"y").over(w))
        .withColumn("sxy", sum($"x" * $"y").over(w))
        .filter($"n" === 30)
        .select($"day".cast("string").as("day"),
          r4(($"n" * $"sxy" - $"sx" * $"sy") /
            sqrt(($"n" * $"sxx" - $"sx" * $"sx") *
              ($"n" * $"syy" - $"sy" * $"sy"))).as("corr30"))
        .orderBy($"day")
    }),

    "q_forecast_linear" -> ((s, d) => {
      import s.implicits._
      // monthly revenue in integer cents first (order-free), then one
      // closed-form OLS per priority over the ~80-point series
      val monthly = T.orders(s, d)
        .select($"o_orderpriority".as("p"),
          (year($"o_orderdate") * 12 + month($"o_orderdate") - 23905)
            .cast("double").as("x"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
        .groupBy($"p", $"x")
        .agg((sum($"cents") / 100.0).as("y"))
      monthly.groupBy($"p")
        .agg(count(lit(1)).as("n_months"),
          (covar_pop($"y", $"x") / var_pop($"x")).as("b"),
          avg($"y").as("ybar"), avg($"x").as("xbar"),
          max($"x").as("xmax"))
        .select($"p".as("o_orderpriority"), $"n_months",
          r4($"b").as("slope"),
          r4($"ybar" - $"b" * $"xbar").as("intercept"),
          r4(($"ybar" - $"b" * $"xbar") + $"b" * ($"xmax" + 1))
            .as("forecast_next"))
        .orderBy($"o_orderpriority")
    }),

    "q_anomaly_mad" -> ((s, d) => {
      import s.implicits._
      // Few-group literal path (event_type is handful-sized): both
      // percentile rounds ride ExactPercentile.perGroupWeightedLocal
      // — the q_mad shape, r19 verdict #3 — so the generic chain's
      // sample job + rank window + TWO broadcast joins collapse into
      // literal-plan jobs, and round 2's bucket bounds derive from
      // round 1's (min, max, med) without a min/max job. The closing
      // report is ONE aggregate over the checkpointed histogram with
      // med/mad folded in as literals. Same selection algorithm, same
      // comparison expressions — values unchanged (oracle-gated).
      val ev = T.events(s, d).select($"event_type", $"value")
      val hist = ev
        .groupBy($"event_type", $"value".cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val P = ExactPercentile
      val (med, mm) = P.perGroupWeightedLocalStats(hist,
        "event_type", "v", "c", Seq("med" -> 0.5))
      val medC = P.litCol(
        med.map { case (g, m) => g -> m("med") }, $"event_type")
      val devHist = hist
        .select($"event_type", abs($"v" - medC).as("dv"), $"c")
      val devMM = mm.map { case (g, (mn, mx)) =>
        val m0 = med(g)("med")
        g -> (0.0, math.max(mx - m0, m0 - mn)) }
      val mad = P.perGroupWeightedLocalStats(devHist,
        "event_type", "dv", "c", Seq("mad" -> 0.5),
        knownMinMax = Some(devMM))._1
      val madC = P.litCol(
        mad.map { case (g, m) => g -> m("mad") }, $"event_type")
      hist.groupBy($"event_type")
        .agg(sum($"c").as("n"),
          sum(when(abs($"v" - medC) > lit(3.5) * lit(1.4826) * madC,
            $"c").otherwise(0L)).as("n_outliers"))
        .select($"event_type", $"n",
          r4(medC).as("med"), r4(madC).as("mad"), $"n_outliers")
        .orderBy($"event_type")
    }),

    // Hourly OHLC candles over the event value stream — the market-
    // data rollup shape. Open/close are argmin/argmax over a
    // fixed-width (micros, event_id) string key — numeric order as
    // string order, deterministic under timestamp ties, and the one
    // ordering-key encoding both engines' arg_min/min_by accept.
    // One grouped aggregate, no window.
    // Volume-weighted average price per month per return flag — the
    // VWAP rollup: one grouped aggregate; integer cents × integer
    // quantity keep the numerator order-free until the final division.
    "q_vwap" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_returnflag",
          trunc($"l_shipdate", "month").cast("string").as("month"),
          round($"l_extendedprice" * 100).cast("long").as("cents"),
          $"l_quantity".cast("long").as("qty"))
        .groupBy($"l_returnflag", $"month")
        .agg(sum($"qty").as("volume"),
          r4(sum($"cents" * $"qty") / (sum($"qty") * 100.0)).as("vwap"))
        .orderBy($"l_returnflag", $"month")
    }),

    // Order→ship fulfillment lag per priority: mean plus exact
    // p50/p90 of the integer day-lag, through the distributed
    // two-stage percentile (the histogram is (priority, lag) —
    // day-granular, so it is tiny regardless of row count).
    "q_fulfillment_lag" -> ((s, d) => {
      import s.implicits._
      val lags = T.lineitem(s, d)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .select($"o_orderpriority",
          datediff($"l_shipdate", $"o_orderdate").cast("double").as("lag"))
      val hist = lags
        .groupBy($"o_orderpriority", $"lag")
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      // few-group literal path (5 priorities — r19 verdict #3): the
      // p50/p90 come back driver-side and fold into the closing
      // aggregate as literals, replacing the generic chain + join
      val P = ExactPercentile
      val pct = P.perGroupWeightedLocal(hist,
        "o_orderpriority", "lag", "c", Seq("p50" -> 0.5, "p90" -> 0.9))
      def pc(nm: String) = P.litCol(
        pct.map { case (g, m) => g -> P.r4d(m(nm)) }, $"o_orderpriority")
      hist.groupBy($"o_orderpriority")
        .agg(sum($"c").as("n"),
          r4(sum($"lag" * $"c") / sum($"c")).as("mean_lag"))
        .select($"o_orderpriority", $"n", $"mean_lag",
          pc("p50").as("p50"), pc("p90").as("p90"))
        .orderBy($"o_orderpriority")
    }),

    "q_ohlc" -> ((s, d) => {
      import s.implicits._
      T.events(s, d)
        .select(date_trunc("hour", $"ts").cast("long").as("bucket"),
          format_string("%020d%012d", unix_micros($"ts"), $"event_id")
            .as("ord"),
          $"value")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          r4(min_by($"value", $"ord")).as("open"),
          r4(max($"value")).as("high"),
          r4(min($"value")).as("low"),
          r4(max_by($"value", $"ord")).as("close"))
        .orderBy($"bucket")
    }),

    "q_stickiness" -> ((s, d) => {
      import s.implicits._
      val ev = T.events(s, d).select(
        date_trunc("week", $"ts").cast("date").as("wk"),
        to_date($"ts").as("day"), $"user_id")
      val dau = ev.groupBy($"wk", $"day")
        .agg(countDistinct($"user_id").as("dau"))
        .groupBy($"wk")
        .agg(count(lit(1)).as("n_days"), avg($"dau").as("avg_dau"))
      val wau = ev.groupBy($"wk")
        .agg(countDistinct($"user_id").as("wau"))
      dau.join(wau, "wk")
        .select($"wk".cast("string").as("wk"), $"n_days",
          r4($"avg_dau").as("avg_dau"), $"wau",
          r4($"avg_dau" / $"wau").as("stickiness"))
        .orderBy($"wk")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_srm_check" ->
      """WITH o AS (
        |  SELECT (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
        |      ::BIGINT % 2 = 0) AS arm_a
        |  FROM orders),
        |c AS (
        |  SELECT CAST(count(*) FILTER (arm_a) AS BIGINT) AS n_a,
        |    CAST(count(*) FILTER (NOT arm_a) AS BIGINT) AS n_b
        |  FROM o)
        |SELECT n_a, n_b,
        |  round(pow(n_a - (n_a + n_b)/2.0, 2) / ((n_a + n_b)/2.0)
        |      + pow(n_b - (n_a + n_b)/2.0, 2) / ((n_a + n_b)/2.0), 4)
        |    AS chisq,
        |  (pow(n_a - (n_a + n_b)/2.0, 2) / ((n_a + n_b)/2.0)
        |      + pow(n_b - (n_a + n_b)/2.0, 2) / ((n_a + n_b)/2.0) > 3.84)
        |    AS srm_flag
        |FROM c""".stripMargin,

    "q_rolling_corr" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(count(*) AS DOUBLE) AS x,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS y
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day,
        |    count(*) OVER win AS n,
        |    sum(x) OVER win AS sx, sum(y) OVER win AS sy,
        |    sum(x*x) OVER win AS sxx, sum(y*y) OVER win AS syy,
        |    sum(x*y) OVER win AS sxy
        |  FROM daily
        |  WINDOW win AS (ORDER BY day ROWS BETWEEN 29 PRECEDING
        |    AND CURRENT ROW))
        |SELECT CAST(day AS VARCHAR) AS day,
        |  round((n*sxy - sx*sy)
        |    / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 4) AS corr30
        |FROM w WHERE n = 30 ORDER BY day""".stripMargin,

    "q_forecast_linear" ->
      """WITH m AS (
        |  SELECT o_orderpriority AS p,
        |    CAST(year(o_orderdate)*12 + month(o_orderdate) - 23905
        |      AS DOUBLE) AS x,
        |    sum(CAST(round(o_totalprice*100) AS BIGINT)) / 100.0 AS y
        |  FROM orders GROUP BY 1, 2),
        |f AS (
        |  SELECT p, count(*) AS n_months,
        |    covar_pop(y, x)/var_pop(x) AS b,
        |    avg(y) AS ybar, avg(x) AS xbar, max(x) AS xmax
        |  FROM m GROUP BY 1)
        |SELECT p AS o_orderpriority, n_months,
        |  round(b, 4) AS slope,
        |  round(ybar - b*xbar, 4) AS intercept,
        |  round((ybar - b*xbar) + b*(xmax + 1), 4) AS forecast_next
        |FROM f ORDER BY o_orderpriority""".stripMargin,

    "q_anomaly_mad" ->
      """WITH st AS (
        |  SELECT event_type, median(value) AS med, mad(value) AS mad
        |  FROM events GROUP BY 1)
        |SELECT e.event_type AS event_type, count(*) AS n,
        |  round(any_value(med), 4) AS med, round(any_value(mad), 4) AS mad,
        |  CAST(sum(CASE WHEN abs(value - med) > 3.5 * 1.4826 * mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN st ON e.event_type = st.event_type
        |GROUP BY 1 ORDER BY e.event_type""".stripMargin,

    "q_vwap" ->
      """SELECT l_returnflag,
        |  CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS VARCHAR)
        |    AS month,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume,
        |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |            * CAST(l_quantity AS BIGINT))
        |    / (sum(CAST(l_quantity AS BIGINT)) * 100.0), 4) AS vwap
        |FROM lineitem
        |GROUP BY 1, 2 ORDER BY l_returnflag, month""".stripMargin,

    "q_fulfillment_lag" ->
      """WITH lags AS (
        |  SELECT o_orderpriority,
        |    CAST(datediff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS DOUBLE) AS lag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, count(*) AS n,
        |  round(avg(lag), 4) AS mean_lag,
        |  round(quantile_cont(lag, 0.5), 4) AS p50,
        |  round(quantile_cont(lag, 0.9), 4) AS p90
        |FROM lags GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q_ohlc" ->
      """WITH e AS (
        |  SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |      AS BIGINT) AS bucket,
        |    printf('%020d%012d', epoch_us(CAST(ts AS TIMESTAMP)),
        |      event_id) AS ord,
        |    value
        |  FROM events)
        |SELECT bucket, count(*) AS n,
        |  round(arg_min(value, ord), 4) AS open,
        |  round(max(value), 4) AS high,
        |  round(min(value), 4) AS low,
        |  round(arg_max(value, ord), 4) AS close
        |FROM e GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_stickiness" ->
      """WITH e AS (
        |  SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
        |      AS wk,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
        |  FROM events),
        |dau AS (
        |  SELECT wk, count(*) AS n_days, avg(dau) AS avg_dau FROM (
        |    SELECT wk, day, count(DISTINCT user_id) AS dau
        |    FROM e GROUP BY 1, 2)
        |  GROUP BY 1),
        |wau AS (SELECT wk, count(DISTINCT user_id) AS wau FROM e GROUP BY 1)
        |SELECT CAST(d.wk AS VARCHAR) AS wk, d.n_days,
        |  round(d.avg_dau, 4) AS avg_dau, w.wau,
        |  round(d.avg_dau / w.wau, 4) AS stickiness
        |FROM dau d JOIN wau w USING (wk) ORDER BY wk""".stripMargin
  )
}
