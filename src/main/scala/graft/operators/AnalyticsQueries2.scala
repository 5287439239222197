package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second analytics batch: deterministic per-group sampling, 2-D
  * skyline, sweep-line concurrency, chi-square independence.
  *
  * Scale notes:
  * - reservoir sample: one window per group key, k rows survive per
  *   group — the exchange ships only (key, md5) sort runs, and the
  *   limit applies before any wide row is carried.
  * - skyline: the classic NOT-EXISTS dominance check is O(n²); after
  *   reducing to one max-y point per distinct x (a partial agg), the
  *   skyline is a single ordered window with an exclusive-preceding
  *   running max — one shuffle of the distinct-x set only.
  * - concurrency: pairwise interval overlap is O(n²); the sweep-line
  *   form explodes each interval into ±1 delta points and takes a
  *   running sum per partition key — linear, one shuffle.
  * - chi-square: observed/marginal counts are map-side-combinable
  *   aggregates; the expected grid is a broadcast cross of the two
  *   marginal vectors (|types| × |weekdays| rows), never the data.
  */
object AnalyticsQueries2 extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Deterministic k-per-group sample: order by md5 of the key —
    // uniform, reproducible, engine-independent (reservoir-sampling
    // semantics without RNG state).
    "q_reservoir_sample" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy(md5($"c_custkey".cast("string")), $"c_custkey")
      T.customer(s, d)
        .select($"c_nationkey", $"c_custkey",
          row_number().over(w).as("rk"))
        .filter($"rk" <= 5)
        .orderBy($"c_nationkey", $"rk")
    }),

    // Pareto frontier over per-customer (n_orders, floor(total
    // spend)): a point survives iff no other point beats-or-ties it
    // on both dims (strictly on one). Reduce to max-y per distinct x,
    // sort x desc, keep where y exceeds the running max of all
    // strictly-greater-x points.
    "q_skyline" -> ((s, d) => {
      import s.implicits._
      val pts = T.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("x"),
          floor(sum($"o_totalprice")).cast("long").as("y"))
        .groupBy($"x").agg(max($"y").as("y"))
      val w = Window.orderBy($"x".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pts.withColumn("prev_max", max($"y").over(w))
        .filter($"prev_max".isNull || $"y" > $"prev_max")
        .select($"x", $"y")
        .orderBy($"x")
    }),

    // Max concurrent intervals per event_type: interval = [ts, ts +
    // value seconds); sweep-line over ±1 endpoint deltas, ends sort
    // before starts at the same instant (half-open semantics). The
    // RANGE-with-peers default frame makes the running sum
    // deterministic under endpoint ties.
    "q_concurrency" -> ((s, d) => {
      import s.implicits._
      val iv = T.events(s, d).select($"event_type",
        unix_micros($"ts").as("t0"),
        (unix_micros($"ts") +
          floor($"value" * 1e6).cast("long")).as("t1"))
      val pts = iv.select($"event_type", $"t0".as("t"), lit(1).as("delta"))
        .unionAll(iv.select($"event_type", $"t1".as("t"), lit(-1).as("delta")))
      val w = Window.partitionBy($"event_type").orderBy($"t", $"delta")
      pts.withColumn("conc", sum($"delta").over(w))
        .groupBy($"event_type")
        .agg(max($"conc").as("max_concurrent"))
        .orderBy($"event_type")
    }),

    // Trailing 7-row moving median of daily revenue — robust
    // smoothing (median ignores single-day spikes that wreck a moving
    // average). Daily totals are a partial agg; the window orders the
    // small daily series, not the fact rows. Inputs are rounded to
    // 4dp BEFORE the median so both engines pick middles from
    // identical values.
    "q_median_window" -> ((s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderdate".cast("date").as("day"))
        .agg(r4(sum($"o_totalprice")).as("rev"))
      val w = Window.orderBy($"day").rowsBetween(-6, 0)
      daily.withColumn("med7",
          r4(expr("percentile(rev, 0.5D)").over(w)))
        .orderBy($"day")
    }),

    // Lag-1 autocorrelation of the daily revenue series: daily totals
    // are a partial agg; corr over (rev, lag(rev)) needs one ordered
    // window over the small daily series, then a scalar aggregate.
    // Classical seasonal decomposition of daily revenue: trend =
    // centered 7-day moving average, DOW seasonal = mean detrended
    // deviation, residual spread per weekday. The ordered windows run
    // over the DAILY rollup — a TIME-bounded frame (~2.4k rows here,
    // and it grows with calendar span, not data volume), the same
    // accepted class as q_autocorr's lag window.
    "q_seasonal_decompose" -> ((s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderdate".as("d"))
        .agg(sum($"o_totalprice").as("v"))
      val w = Window.orderBy($"d").rowsBetween(-3, 3)
      val dev = daily
        .select($"d", $"v", (weekday($"d") + 1).as("dow"),
          avg($"v").over(w).as("trend"), count(lit(1)).over(w).as("wn"))
        .filter($"wn" === 7)
        .select($"dow", ($"v" - $"trend").as("dt"))
      val seas = dev.groupBy($"dow")
        .agg(avg($"dt").as("seasonal"), count(lit(1)).as("n_days"))
      dev.join(broadcast(seas), "dow")
        .groupBy($"dow", $"n_days", $"seasonal")
        .agg(stddev_samp($"dt" - $"seasonal").as("sd"))
        .select($"dow", $"n_days", r4($"seasonal").as("seasonal"),
          r4($"sd").as("resid_sd"))
        .orderBy($"dow")
    }),

    // CUSUM mean-shift changepoint on the daily revenue series:
    // the running sum of deviations from the global mean peaks at
    // the most likely shift point. Prefix sums ride an ordered
    // window over the bounded daily frame; the argmax is a
    // TakeOrdered(1), and the before/after means are one
    // conditional-aggregation pass against the broadcast peak.
    "q_changepoint" -> ((s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderdate".as("d"))
        .agg(sum($"o_totalprice").as("v"))
        .localCheckpoint(false)
      val mu = daily.agg(avg($"v").as("mu"))
      val w = Window.orderBy($"d")
      val cp = daily.crossJoin(broadcast(mu))
        .select($"d",
          abs(sum($"v").over(w) - row_number().over(w) * $"mu").as("ca"))
        .orderBy($"ca".desc, $"d").limit(1)
        .select($"d".as("cp_day"), $"ca")
      daily.crossJoin(broadcast(cp))
        .agg(max($"cp_day").as("cp_day"), r4(max($"ca")).as("cusum_max"),
          r4(avg(when($"d" <= $"cp_day", $"v"))).as("mean_before"),
          r4(avg(when($"d" > $"cp_day", $"v"))).as("mean_after"))
    }),

    "q_autocorr" -> ((s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderdate".cast("date").as("day"))
        .agg(r4(sum($"o_totalprice")).as("rev"))
      val w = Window.orderBy($"day")
      daily.withColumn("prev", lag($"rev", 1).over(w))
        .filter($"prev".isNotNull)
        .agg(r4(corr($"rev", $"prev")).as("autocorr_lag1"),
          count(lit(1)).as("n_days"))
    }),

    // Day-of-week seasonality index: avg daily revenue per ISO
    // weekday over the grand mean of daily revenue. The grand mean is
    // a broadcast scalar — no second scan of the fact table.
    "q_seasonality" -> ((s, d) => {
      import s.implicits._
      val daily = T.orders(s, d)
        .groupBy($"o_orderdate".cast("date").as("day"))
        .agg(sum($"o_totalprice").as("rev"))
      val byDow = daily
        .groupBy((weekday($"day") + 1).as("dow"))
        .agg(avg($"rev").as("avg_rev"))
      val overall = daily.agg(avg($"rev").as("grand"))
      byDow.crossJoin(broadcast(overall))
        .select($"dow", r4($"avg_rev").as("avg_rev"),
          r4($"avg_rev" / $"grand").as("season_idx"))
        .orderBy($"dow")
    }),

    // Chi-square independence: event_type × ISO weekday. The expected
    // grid (rowtot × coltot / N) covers empty observed cells, so
    // zero-count cells still contribute their expectation.
    "q_chisq" -> ((s, d) => {
      import s.implicits._
      val cells = T.events(s, d)
        .select($"event_type", (weekday($"ts") + 1).as("dow"))
      val obs = cells.groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("o"))
      val rowt = cells.groupBy($"event_type").agg(count(lit(1)).as("rt"))
      val colt = cells.groupBy($"dow").agg(count(lit(1)).as("ct"))
      val n = cells.agg(count(lit(1)).as("n"))
      val grid = broadcast(rowt).crossJoin(broadcast(colt))
        .join(obs, Seq("event_type", "dow"), "left")
        .crossJoin(broadcast(n))
        .select($"event_type", $"dow",
          coalesce($"o", lit(0L)).as("o"),
          ($"rt" * $"ct" / $"n").cast("double").as("e"))
      grid.agg(
        r4(sum(pow($"o" - $"e", 2) / $"e")).as("chisq"),
        ((countDistinct($"event_type") - 1) *
          (countDistinct($"dow") - 1)).as("dof"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_reservoir_sample" ->
      """SELECT c_nationkey, c_custkey, CAST(rk AS INT) AS rk FROM (
        |  SELECT c_nationkey, c_custkey,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rk
        |  FROM customer)
        |WHERE rk <= 5 ORDER BY c_nationkey, rk""".stripMargin,

    "q_skyline" ->
      """WITH cust AS (SELECT o_custkey, count(*) AS x,
        |    CAST(floor(sum(o_totalprice)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT x, max(y) AS y FROM cust GROUP BY 1)
        |SELECT x, y FROM pts p
        |WHERE NOT EXISTS (SELECT 1 FROM pts q
        |  WHERE q.x > p.x AND q.y >= p.y)
        |ORDER BY x""".stripMargin,

    "q_concurrency" ->
      """WITH iv AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS t0,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      + CAST(floor(value * 1e6) AS BIGINT) AS t1
        |  FROM events),
        |pts AS (
        |  SELECT event_type, t0 AS t, 1 AS delta FROM iv
        |  UNION ALL
        |  SELECT event_type, t1 AS t, -1 AS delta FROM iv),
        |sw AS (SELECT event_type,
        |    sum(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta) AS conc
        |  FROM pts)
        |SELECT event_type, CAST(max(conc) AS BIGINT) AS max_concurrent
        |FROM sw GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_seasonal_decompose" ->
      """WITH daily AS (SELECT o_orderdate AS d, sum(o_totalprice) AS v
        |  FROM orders GROUP BY 1),
        |tr AS (SELECT d, v, CAST(extract(isodow FROM d) AS INT) AS dow,
        |    avg(v) OVER (ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend,
        |    count(*) OVER (ORDER BY d
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
        |  FROM daily),
        |dev AS (SELECT dow, v - trend AS dt FROM tr WHERE wn = 7),
        |seas AS (SELECT dow, avg(dt) AS seasonal, count(*) AS n_days
        |  FROM dev GROUP BY 1)
        |SELECT s.dow, CAST(s.n_days AS BIGINT) AS n_days,
        |  round(s.seasonal, 4) AS seasonal,
        |  round(stddev_samp(d.dt - s.seasonal), 4) AS resid_sd
        |FROM seas s JOIN dev d ON d.dow = s.dow
        |GROUP BY s.dow, s.n_days, s.seasonal ORDER BY s.dow""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (SELECT o_orderdate AS d, sum(o_totalprice) AS v
        |  FROM orders GROUP BY 1),
        |st AS (SELECT d, abs(sum(v) OVER (ORDER BY d)
        |    - row_number() OVER (ORDER BY d)
        |      * (SELECT avg(v) FROM daily)) AS ca FROM daily),
        |mx AS (SELECT d AS cp_day, ca FROM st ORDER BY ca DESC, d LIMIT 1)
        |SELECT cp_day, round(ca, 4) AS cusum_max,
        |  round((SELECT avg(v) FROM daily WHERE d <= cp_day), 4)
        |    AS mean_before,
        |  round((SELECT avg(v) FROM daily WHERE d > cp_day), 4)
        |    AS mean_after
        |FROM mx""".stripMargin,

    "q_autocorr" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    round(sum(o_totalprice), 4) AS rev
        |  FROM orders GROUP BY 1),
        |lagged AS (SELECT rev, lag(rev) OVER (ORDER BY day) AS prev
        |  FROM daily)
        |SELECT round(corr(rev, prev), 4) AS autocorr_lag1,
        |  count(*) AS n_days
        |FROM lagged WHERE prev IS NOT NULL""".stripMargin,

    "q_seasonality" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(o_totalprice) AS rev
        |  FROM orders GROUP BY 1),
        |by_dow AS (SELECT CAST(extract(isodow FROM day) AS INT) AS dow,
        |    avg(rev) AS avg_rev
        |  FROM daily GROUP BY 1),
        |overall AS (SELECT avg(rev) AS grand FROM daily)
        |SELECT dow, round(avg_rev, 4) AS avg_rev,
        |  round(avg_rev / grand, 4) AS season_idx
        |FROM by_dow CROSS JOIN overall ORDER BY dow""".stripMargin,

    "q_median_window" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    round(sum(o_totalprice), 4) AS rev
        |  FROM orders GROUP BY 1)
        |SELECT day, rev, round(median(rev) OVER (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
        |FROM daily ORDER BY day""".stripMargin,

    "q_chisq" ->
      """WITH cells AS (SELECT event_type,
        |    CAST(extract(isodow FROM CAST(ts AS TIMESTAMP)) AS INT) AS dow
        |  FROM events),
        |obs AS (SELECT event_type, dow, count(*) AS o
        |  FROM cells GROUP BY 1, 2),
        |rowt AS (SELECT event_type, count(*) AS rt FROM cells GROUP BY 1),
        |colt AS (SELECT dow, count(*) AS ct FROM cells GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM cells),
        |grid AS (SELECT r.event_type, c.dow,
        |    coalesce(o.o, 0) AS o,
        |    CAST(r.rt * c.ct AS DOUBLE) / n.n AS e
        |  FROM rowt r CROSS JOIN colt c
        |  LEFT JOIN obs o ON o.event_type = r.event_type AND o.dow = c.dow
        |  CROSS JOIN n)
        |SELECT round(sum((o - e) * (o - e) / e), 4) AS chisq,
        |  CAST((count(DISTINCT event_type) - 1)
        |    * (count(DISTINCT dow) - 1) AS BIGINT) AS dof
        |FROM grid""".stripMargin
  )
}
