package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.1c analytics extensions: mode, histogram, weighted moving
  * average, string aggregation, date spine / gap-fill, conditional
  * expressions, argmax, stratified sampling.
  *
  * Same design rules as [[RelationalQueries]]: declarative plans,
  * windows partitioned by an entity key wherever a global sort would
  * not survive 100 TB, total ORDER BY for oracle determinism.
  */
object AnalyticsQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_mode" -> ((s, d) => {
      import s.implicits._
      // Most frequent priority per status; ties break on the smaller
      // priority so the answer is deterministic on both engines.
      val counted = T.orders(s, d)
        .groupBy($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"n".desc, $"o_orderpriority".asc)
      counted.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"o_orderstatus", $"o_orderpriority".as("mode_priority"), $"n")
        .orderBy($"o_orderstatus")
    }),

    "q_histogram" -> ((s, d) => {
      import s.implicits._
      // Fixed-width histogram: bucket math is row-local (no global
      // min/max pass), so the whole plan is one partial-agg shuffle.
      T.orders(s, d)
        .groupBy(floor($"o_totalprice" / 50000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          r4(min($"o_totalprice")).as("lo"),
          r4(max($"o_totalprice")).as("hi"))
        .orderBy($"bucket")
    }),

    "q_weighted_ma" -> ((s, d) => {
      import s.implicits._
      // Exponential-decay weighted moving average over each
      // customer's order history (window partitioned by key — never a
      // global sort). Short histories renormalize over the weights
      // actually present.
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      def lg(i: Int) = lag($"o_totalprice", i).over(w)
      val weights = Seq(1 -> 0.5, 2 -> 0.25, 3 -> 0.125)
      val num = weights.foldLeft($"o_totalprice".cast("double")) {
        case (acc, (i, wt)) => acc + coalesce(lg(i), lit(0.0)) * wt
      }
      val den = weights.foldLeft(lit(1.0)) {
        case (acc, (i, wt)) => acc + when(lg(i).isNull, 0.0).otherwise(wt)
      }
      T.orders(s, d)
        .filter($"o_custkey" < 100)
        .select($"o_custkey", $"o_orderkey", r4(num / den).as("wma"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "q_agg_strings" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy($"o_orderpriority")
        .agg(
          concat_ws(",", array_sort(collect_set($"o_orderstatus"))).as("statuses"),
          countDistinct($"o_orderstatus").as("n_status"))
        .orderBy($"o_orderpriority")
    }),

    "q_date_spine" -> ((s, d) => {
      import s.implicits._
      // Gap-fill: month spine per customer via sequence+explode — the
      // spine is generated NEXT TO the data (per-key explode), not on
      // the driver, so it scales to any number of keys.
      val monthly = T.orders(s, d)
        .filter($"o_custkey" < 100)
        .groupBy($"o_custkey",
          date_trunc("month", $"o_orderdate").cast("date").as("mon"))
        .agg(sum($"o_totalprice").as("spend"))
      val spine = monthly.groupBy($"o_custkey")
        .agg(min($"mon").as("lo"), max($"mon").as("hi"))
        .select($"o_custkey",
          explode(sequence($"lo", $"hi", expr("interval 1 month"))).as("mon"))
      spine.join(monthly, Seq("o_custkey", "mon"), "left")
        .select($"o_custkey", date_format($"mon", "yyyy-MM").as("mon"),
          r4(coalesce($"spend", lit(0.0))).as("spend"))
        .orderBy($"o_custkey", $"mon")
    }),

    "q_cond_expr" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_linestatus")
        .agg(
          r4(sum(least($"l_extendedprice" * (lit(1.0) - $"l_discount"),
            lit(50000.0)))).as("rev_capped"),
          r4(sum(greatest($"l_quantity" * 1000, $"l_extendedprice" * $"l_tax")))
            .as("qty_or_tax"),
          r4(avg(nullif($"l_discount", lit(0.0)))).as("disc_nz"))
        .orderBy($"l_linestatus")
    }),

    "q_argmax" -> ((s, d) => {
      import s.implicits._
      // argmax via struct max: one partial-aggregable pass, no window
      // — the struct orders by (price, orderkey) so ties are
      // deterministic.
      T.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(max(struct($"o_totalprice", $"o_orderkey", $"o_custkey")).as("m"))
        .select($"o_orderstatus", $"m.o_custkey".as("top_cust"),
          r4($"m.o_totalprice").as("top_price"))
        .orderBy($"o_orderstatus")
    }),

    // Sketch-only plan — what Bench times (q_approx_quantile below
    // is verify-only via SparkEntry.benchExclude: its plan
    // deliberately pairs the sketch with the exact percentile it is
    // checked against, so timing it would measure the exact sort the
    // sketch exists to avoid — the round-3 mis-measurement).
    // Rows-only correctness; the 1% sketch-vs-exact assertion lives
    // in ApproxQuantileSpec.
    "q_approx_quantile_sketch" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d).select($"l_returnflag", $"l_extendedprice")
        .groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice",
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"))
        .select($"l_returnflag",
          r4(element_at($"q", 1)).as("a25"),
          r4(element_at($"q", 2)).as("a50"),
          r4(element_at($"q", 3)).as("a75"))
        .orderBy($"l_returnflag")
    }),

    "q_approx_quantile" -> ((s, d) => {
      import s.implicits._
      // Sketch-based quantiles (fixed-size state per group,
      // partial-mergeable) — the 100 TB path where the exact
      // per-group form (q_percentile) would sort too much. The
      // hashed output carries the EXACT quantiles plus booleans
      // asserting the sketch landed within 1% of them (accuracy
      // 10000 ⇒ rank error ≤ n/10000, far inside 1% of value here),
      // so DuckDB verifies the sketch against quantile_cont.
      val li = T.lineitem(s, d).select($"l_returnflag", $"l_extendedprice")
      val approx = li
        .groupBy($"l_returnflag")
        .agg(percentile_approx($"l_extendedprice",
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("q"))
      val exact = ExactPercentile.perGroup(li,
        "l_returnflag", "l_extendedprice",
        Seq("e25" -> 0.25, "e50" -> 0.5, "e75" -> 0.75))
      def ok(a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
        abs(a - e) <= greatest(abs(e) * 0.01, lit(0.01))
      approx.join(exact, "l_returnflag")
        .select($"l_returnflag",
          r4($"e25").as("p25"), r4($"e50").as("p50"), r4($"e75").as("p75"),
          ok(element_at($"q", 1), $"e25").as("p25_ok"),
          ok(element_at($"q", 2), $"e50").as("p50_ok"),
          ok(element_at($"q", 3), $"e75").as("p75_ok"))
        .orderBy($"l_returnflag")
    }),

    "q_mad" -> ((s, d) => {
      import s.implicits._
      // Median absolute deviation — the robust spread statistic —
      // as two rounds of the scalable two-stage exact percentile.
      // The raw table is scanned and shuffled ONCE, into the
      // (group, value, count) histogram; round 2's deviation
      // histogram is |v − med| over that same frame (deviations of
      // equal values are equal), so the second percentile costs a
      // distinct-value-sized re-group, not a second table pass.
      val li = T.lineitem(s, d).select($"l_returnflag", $"l_extendedprice")
      val hist = li
        .groupBy($"l_returnflag", $"l_extendedprice".cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      // few-group literal path, TWICE: round 1's medians come back
      // driver-side and fold into round 2's deviation projection as
      // literals (no broadcast join, no med checkpoint); round 2's
      // deviation histogram is still a map-side projection off round
      // 1's checkpointed blocks — no second table pass, no window.
      // Round 2 DERIVES its bucket bounds from round 1's collected
      // (min, max) + median — dev = |v − med| ∈ [0, max(mx−med,
      // med−mn)] without looking at the data (bounds are balance-only)
      // — skipping round 2's min/max job (r19 verdict #3: one fewer
      // serial barrier, 7 → 6 jobs).
      val (med, mm) = ExactPercentile.perGroupWeightedLocalStats(hist,
        "l_returnflag", "v", "c", Seq("med" -> 0.5))
      val medC = ExactPercentile.litCol(
        med.map { case (g, m) => g -> m("med") }, $"l_returnflag")
      val devHist = hist
        .select($"l_returnflag", abs($"v" - medC).as("dev"), $"c")
      val devMM = mm.map { case (g, (mn, mx)) =>
        val m0 = med(g)("med")
        g -> (0.0, math.max(mx - m0, m0 - mn)) }
      val m2 = ExactPercentile.perGroupWeightedLocalStats(devHist,
        "l_returnflag", "dev", "c", Seq("m" -> 0.5),
        knownMinMax = Some(devMM))._1
      m2.toSeq.map { case (g, m) =>
        (g.asInstanceOf[String], ExactPercentile.r4d(m("m"))) }
        .sortBy(_._1)
        .toDF("l_returnflag", "mad")
        .orderBy($"l_returnflag")
    }),

    "q_entropy" -> ((s, d) => {
      import s.implicits._
      // Shannon entropy (base 2) of each user's event-type mix from
      // the count decomposition H = log2(n) − Σ c·log2(c) / n — two
      // partial-agg shuffles, no per-user collections.
      T.events(s, d)
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
        .groupBy($"user_id")
        .agg(r4(log2(sum($"c")) - sum($"c" * log2($"c")) / sum($"c"))
          .as("ent"))
        .orderBy($"user_id")
    }),

    "q_percent_rank" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      T.orders(s, d).filter($"o_custkey" < 200)
        .select($"o_orderpriority", $"o_orderkey",
          r4(percent_rank().over(w)).as("pr"),
          r4(cume_dist().over(w)).as("cd"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    }),

    "q_stratified_sample" -> ((s, d) => {
      import s.implicits._
      // Per-stratum systematic sampling on the key — deterministic
      // across engines and rerun-stable, unlike rand(); rare strata
      // keep everything, common ones are thinned.
      val rate = when($"event_type" === "view", 20L)
        .when($"event_type" === "click", 4L)
        .when($"event_type" === "purchase", 1L)
        .otherwise(10L)
      T.events(s, d)
        .filter($"event_id" % rate === 0)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), r4(sum($"value")).as("total"))
        .orderBy($"event_type")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_mode" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
        |  count(*) AS n, round(min(o_totalprice),4) AS lo,
        |  round(max(o_totalprice),4) AS hi
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_weighted_ma" ->
      """SELECT o_custkey, o_orderkey,
        |  round((o_totalprice + coalesce(l1,0)*0.5 + coalesce(l2,0)*0.25
        |         + coalesce(l3,0)*0.125)
        |        / (1 + CASE WHEN l1 IS NULL THEN 0 ELSE 0.5 END
        |             + CASE WHEN l2 IS NULL THEN 0 ELSE 0.25 END
        |             + CASE WHEN l3 IS NULL THEN 0 ELSE 0.125 END),4) AS wma
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        lag(o_totalprice,1) OVER w AS l1,
        |        lag(o_totalprice,2) OVER w AS l2,
        |        lag(o_totalprice,3) OVER w AS l3
        |      FROM orders WHERE o_custkey < 100
        |      WINDOW w AS (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey))
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_agg_strings" ->
      """SELECT o_orderpriority,
        |  array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        |  count(DISTINCT o_orderstatus) AS n_status
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_date_spine" ->
      """WITH m AS (
        |  SELECT o_custkey, date_trunc('month', o_orderdate)::DATE AS mon,
        |    sum(o_totalprice) AS spend
        |  FROM orders WHERE o_custkey < 100 GROUP BY 1, 2),
        |span AS (SELECT o_custkey, min(mon) AS lo, max(mon) AS hi FROM m GROUP BY 1),
        |spine AS (
        |  SELECT o_custkey, unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
        |    INTERVAL 1 MONTH))::DATE AS mon FROM span)
        |SELECT s.o_custkey, strftime(s.mon, '%Y-%m') AS mon,
        |  round(coalesce(m.spend, 0),4) AS spend
        |FROM spine s LEFT JOIN m ON s.o_custkey = m.o_custkey AND s.mon = m.mon
        |ORDER BY s.o_custkey, mon""".stripMargin,

    "q_cond_expr" ->
      """SELECT l_linestatus,
        |  round(sum(least(l_extendedprice * (1.0 - l_discount), 50000.0)),4) AS rev_capped,
        |  round(sum(greatest(l_quantity * 1000, l_extendedprice * l_tax)),4) AS qty_or_tax,
        |  round(avg(nullif(l_discount, 0.0)),4) AS disc_nz
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_argmax" ->
      """SELECT o_orderstatus, o_custkey AS top_cust,
        |  round(o_totalprice,4) AS top_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "q_mad" ->
      """SELECT l_returnflag, round(mad(l_extendedprice), 4) AS mad
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_entropy" ->
      """SELECT user_id, round(entropy(event_type), 4) AS ent
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_percent_rank" ->
      """SELECT o_orderpriority, o_orderkey,
        |  round(percent_rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey), 4) AS pr,
        |  round(cume_dist() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey), 4) AS cd
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    "q_stratified_sample" ->
      """SELECT event_type, count(*) AS n, round(sum(value),4) AS total
        |FROM events
        |WHERE event_id % (CASE event_type WHEN 'view' THEN 20
        |  WHEN 'click' THEN 4 WHEN 'purchase' THEN 1 ELSE 10 END) = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Exact quantiles recomputed in DuckDB; the sketch's 1%-closeness
    // contract is the hashed boolean triple (≡ TRUE when healthy).
    "q_approx_quantile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25),4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75),4) AS p75,
        |  TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
