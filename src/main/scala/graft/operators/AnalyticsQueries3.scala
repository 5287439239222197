package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third analytics batch: weighted percentiles, RFM segmentation,
  * behavioral path mining.
  *
  * All three follow the repo's percentile discipline: aggregate the
  * fact stream down to (group, value, weight) partials FIRST (map-
  * side combinable), then window only the reduced set. Weights here
  * are integral-valued doubles, so running sums are fp-exact and the
  * threshold comparison agrees bit-for-bit across engines.
  */
object AnalyticsQueries3 extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Weighted median: smallest value whose running weight reaches
    // half the total. Both window frames share one partitioning →
    // ONE exchange of the distinct-value set.
    "q_weighted_percentile" -> ((s, d) => {
      import s.implicits._
      // the smallest value whose cumulative quantity-weight reaches
      // half the total = the weighted discrete median — found by the
      // shared bucket-selection pass over the (flag, price, weight)
      // histogram, never expanding the weights or ranking the full
      // distinct-price set.
      val byVal = T.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_extendedprice".cast("double").as("v"))
        .agg(sum($"l_quantity").cast("long").as("w"))
        .persist() // cache, not checkpoint: measured faster (r18)
      // few-group literal path, discrete selection
      val m = ExactPercentile.perGroupWeightedLocal(byVal,
        "l_returnflag", "v", "w", Seq("w_median" -> 0.5), disc = true)
      m.toSeq.map { case (g, vs) =>
        (g.asInstanceOf[String], ExactPercentile.r4d(vs("w_median"))) }
        .sortBy(_._1)
        .toDF("l_returnflag", "w_median")
        .orderBy($"l_returnflag")
    }),

    // RFM segmentation: per-customer recency/frequency/monetary,
    // quartiled with ntile (custkey tie-break ⇒ deterministic), then
    // segment population counts. Windows order the customer-level
    // aggregate, never the fact rows.
    "q_rfm" -> ((s, d) => {
      import s.implicits._
      // recency ranks on its day number (datediff is monotonic in the
      // date, and only the quartile id survives to the output).
      val cust = T.orders(s, d).groupBy($"o_custkey")
        .agg(datediff(max($"o_orderdate".cast("date")),
            lit("1990-01-01").cast("date")).as("recency"),
          count(lit(1)).as("frequency"),
          r4(sum($"o_totalprice")).as("monetary"))
      // all three distributed row_numbers in ONE rank pass (an
      // unpartitioned ntile window would single-task sort all
      // customers; three chained rank passes would replan the
      // customer aggregate 4× per level): melt to (metric, value)
      // rows — a fixed 3× of the customer-level aggregate, not the
      // facts — rank grouped by metric, pivot back, then NTILE
      // arithmetic on (rn, total).
      val melted = cust.select($"o_custkey", explode(map(
        lit("r"), $"recency".cast("double"),
        lit("f"), $"frequency".cast("double"),
        lit("m"), $"monetary")).as(Seq("metric", "value")))
      val ranked = Rank.runningSums(melted, Seq("metric"), "value",
        Seq("o_custkey"), Seq("rn" -> lit(1L)))
      def q(m: String) = Rank.ntileOf(
        max(when($"metric" === m, $"rn")),
        max(when($"metric" === m, $"rn_total")), 4)
      ranked
        .groupBy($"o_custkey")
        .agg(q("r").as("r_q"), q("f").as("f_q"), q("m").as("m_q"))
        .groupBy($"r_q", $"f_q", $"m_q")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"r_q", $"f_q", $"m_q")
    }),

    // 7-day rolling active users (WAU per day), exactly and linearly:
    // each (user, active-day) posting fans out to the 7 window-ends
    // it belongs to — constant 7× amplification of the DISTINCT
    // (user, day) set, never a distinct-over-range window (which
    // can't decompose) or a pairwise date self-join.
    "q_rolling_active" -> ((s, d) => {
      import s.implicits._
      val act = T.events(s, d)
        .select($"user_id", $"ts".cast("date").as("day")).distinct()
      val maxDay = act.agg(max($"day").as("max_day"))
      act
        .select($"user_id",
          explode(sequence($"day", date_add($"day", 6))).as("day"))
        .distinct()
        .crossJoin(broadcast(maxDay))
        .filter($"day" <= $"max_day")
        .groupBy($"day")
        .agg(count(lit(1)).as("wau"))
        .orderBy($"day")
    }),

    // Weight-of-evidence encoding of order priority against the
    // "order fulfilled" label — the classic scorecard categorical
    // encoder. Class totals ride along via window-free broadcast.
    "feat_woe" -> ((s, d) => {
      import s.implicits._
      val labeled = T.orders(s, d)
        .select($"o_orderpriority",
          ($"o_orderstatus" === "F").cast("int").as("y"))
      val per = labeled.groupBy($"o_orderpriority")
        .agg(sum($"y").as("pos"), sum(lit(1) - $"y").as("neg"))
      val tot = labeled.agg(sum($"y").as("tpos"),
        sum(lit(1) - $"y").as("tneg"))
      per.crossJoin(broadcast(tot))
        .select($"o_orderpriority", $"pos", $"neg",
          r4(log(($"pos" / $"tpos") / ($"neg" / $"tneg"))).as("woe"))
        .orderBy($"o_orderpriority")
    }),

    // Benford first-digit audit of order totals: digit frequencies vs
    // the Benford expectation — one projection + tiny aggregate.
    "q_benford" -> ((s, d) => {
      import s.implicits._
      // first digit via floor→bigint→string: engine-identical (no
      // locale formatting, no log10 ulp differences at power-of-ten
      // boundaries)
      val digits = T.orders(s, d)
        .select(substring($"o_totalprice".cast("long").cast("string"), 1, 1)
          .cast("int").as("digit"))
        .filter($"digit".between(1, 9))
      val tot = digits.agg(count(lit(1)).as("n_tot"))
      digits.groupBy($"digit").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select($"digit", $"n",
          r4($"n" / $"n_tot").as("freq"),
          r4(log(10.0, lit(1) + lit(1) / $"digit")).as("benford"))
        .orderBy($"digit")
    }),

    // Top event-type trigram paths: per-user ordered lead/lead2 —
    // partitioned by user (no global sort), then a global count of
    // the tiny path vocabulary.
    "q_event_paths" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, d)
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("e2", lead($"event_type", 1).over(w))
        .withColumn("e3", lead($"event_type", 2).over(w))
        .filter($"e2".isNotNull && $"e3".isNotNull)
        .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"path")
        .limit(20)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_weighted_percentile" ->
      """WITH by_val AS (SELECT l_returnflag, l_extendedprice,
        |    sum(l_quantity) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |cum AS (SELECT l_returnflag, l_extendedprice,
        |    sum(w) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS cum_w,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tot_w
        |  FROM by_val)
        |SELECT l_returnflag, round(min(l_extendedprice), 4) AS w_median
        |FROM cum WHERE cum_w >= tot_w * 0.5
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q_rfm" ->
      """WITH cust AS (SELECT o_custkey,
        |    max(CAST(o_orderdate AS DATE)) AS recency,
        |    count(*) AS frequency,
        |    round(sum(o_totalprice), 4) AS monetary
        |  FROM orders GROUP BY 1),
        |scored AS (SELECT
        |    CAST(ntile(4) OVER (ORDER BY recency, o_custkey) AS INT) AS r_q,
        |    CAST(ntile(4) OVER (ORDER BY frequency, o_custkey) AS INT) AS f_q,
        |    CAST(ntile(4) OVER (ORDER BY monetary, o_custkey) AS INT) AS m_q
        |  FROM cust)
        |SELECT r_q, f_q, m_q, count(*) AS n_customers
        |FROM scored GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin,

    "q_rolling_active" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |maxd AS (SELECT max(day) AS max_day FROM act),
        |expanded AS (SELECT DISTINCT user_id, CAST(w AS DATE) AS day
        |  FROM (SELECT user_id,
        |          unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS w
        |        FROM act))
        |SELECT day, count(*) AS wau
        |FROM expanded CROSS JOIN maxd
        |WHERE day <= max_day
        |GROUP BY day ORDER BY day""".stripMargin,

    "feat_woe" ->
      """WITH labeled AS (SELECT o_orderpriority,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |per AS (SELECT o_orderpriority, sum(y) AS pos, sum(1 - y) AS neg
        |  FROM labeled GROUP BY 1),
        |tot AS (SELECT sum(y) AS tpos, sum(1 - y) AS tneg FROM labeled)
        |SELECT o_orderpriority, CAST(pos AS BIGINT) AS pos,
        |  CAST(neg AS BIGINT) AS neg,
        |  round(ln((pos / tpos) / (neg / tneg)), 4) AS woe
        |FROM per CROSS JOIN tot ORDER BY o_orderpriority""".stripMargin,

    "q_benford" ->
      """WITH digits AS (SELECT CAST(substring(
        |    CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
        |    AS INT) AS digit
        |  FROM orders),
        |filtered AS (SELECT digit FROM digits WHERE digit BETWEEN 1 AND 9),
        |tot AS (SELECT count(*) AS n_tot FROM filtered)
        |SELECT digit, count(*) AS n,
        |  round(count(*) / CAST(n_tot AS DOUBLE), 4) AS freq,
        |  round(log10(1 + 1.0 / digit), 4) AS benford
        |FROM filtered CROSS JOIN tot
        |GROUP BY digit, n_tot ORDER BY digit""".stripMargin,

    "q_event_paths" ->
      """WITH seq AS (SELECT
        |    event_type,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY CAST(ts AS TIMESTAMP), event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |  count(*) AS n
        |FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin
  )
}
