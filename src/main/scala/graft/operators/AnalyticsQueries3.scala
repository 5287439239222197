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
      val byVal = T.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_extendedprice")
        .agg(sum($"l_quantity").as("w"))
      val ord = Window.partitionBy($"l_returnflag")
        .orderBy($"l_extendedprice")
      val all = Window.partitionBy($"l_returnflag")
      byVal
        .withColumn("cum_w", sum($"w").over(ord))
        .withColumn("tot_w", sum($"w").over(all))
        .filter($"cum_w" >= $"tot_w" * 0.5)
        .groupBy($"l_returnflag")
        .agg(r4(min($"l_extendedprice")).as("w_median"))
        .orderBy($"l_returnflag")
    }),

    // RFM segmentation: per-customer recency/frequency/monetary,
    // quartiled with ntile (custkey tie-break ⇒ deterministic), then
    // segment population counts. Windows order the customer-level
    // aggregate, never the fact rows.
    "q_rfm" -> ((s, d) => {
      import s.implicits._
      val cust = T.orders(s, d).groupBy($"o_custkey")
        .agg(max($"o_orderdate".cast("date")).as("recency"),
          count(lit(1)).as("frequency"),
          r4(sum($"o_totalprice")).as("monetary"))
      def q(c: String) = ntile(4).over(
        Window.orderBy(col(c), $"o_custkey"))
      cust
        .withColumn("r_q", q("recency"))
        .withColumn("f_q", q("frequency"))
        .withColumn("m_q", q("monetary"))
        .groupBy($"r_q", $"f_q", $"m_q")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"r_q", $"f_q", $"m_q")
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
