package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.1b relational extensions: set ops, cube/grouping-sets, window
  * frames, scalar subqueries, JSON/regex extraction, unpivot.
  *
  * Same design rules as [[RelationalQueries]] — declarative plans,
  * broadcast hints only where star-schema ratios guarantee the side
  * stays small at 100 TB, total ORDER BY for oracle determinism.
  */
object AdvancedQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_cube" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), r4(sum($"o_totalprice")).as("revenue"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    "q_grouping_sets" -> ((s, d) => {
      import s.implicits._
      // status-only and priority-only rollups in one pass (no grand total).
      T.orders(s, d)
        .groupingSets(
          Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority")),
          $"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), r4(sum($"o_totalprice")).as("revenue"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    "q_intersect" -> ((s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      o.filter($"o_orderstatus" === "F").select($"o_custkey")
        .intersect(o.filter($"o_orderstatus" === "O").select($"o_custkey"))
        .orderBy($"o_custkey")
    }),

    "q_except" -> ((s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
      o.filter($"o_orderstatus" === "F").select($"o_custkey")
        .except(o.filter($"o_orderstatus" === "P").select($"o_custkey"))
        .orderBy($"o_custkey")
    }),

    "q_full_join" -> ((s, d) => {
      import s.implicits._
      // Customers active in 1998 vs 1999 — full outer keeps either-side-only.
      val o = T.orders(s, d)
      def yr(y: Int) = o.filter(year($"o_orderdate") === y)
        .groupBy($"o_custkey").agg(count(lit(1)))
      val a = yr(1998).toDF("custkey", "n98")
      val b = yr(1999).toDF("custkey", "n99")
      a.join(b, Seq("custkey"), "full_outer")
        .select($"custkey",
          coalesce($"n98", lit(0L)).as("n98"),
          coalesce($"n99", lit(0L)).as("n99"))
        .orderBy($"custkey")
    }),

    "q_ntile" -> ((s, d) => {
      import s.implicits._
      // Global quartiles WITHOUT `ntile().over(Window.orderBy(...))`,
      // whose empty partition spec plans a single-task full sort:
      // distributed row_number via [[Rank.runningSums]], then NTILE
      // arithmetic on (row_number, total).
      val ranked = Rank.runningSums(
        T.orders(s, d).select($"o_totalprice", $"o_orderkey"),
        Nil, "o_totalprice", Seq("o_orderkey"), Seq("rn" -> lit(1L)))
      ranked
        .withColumn("quartile", Rank.ntileOf($"rn", $"rn_total", 4))
        .groupBy($"quartile")
        .agg(count(lit(1)).as("n"),
          r4(min($"o_totalprice")).as("lo"),
          r4(max($"o_totalprice")).as("hi"))
        .orderBy($"quartile")
    }),

    "q_first_last" -> ((s, d) => {
      import s.implicits._
      // Cheapest/priciest order per customer via one full-frame window.
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      T.orders(s, d)
        .select($"o_custkey",
          first_value($"o_totalprice").over(w).as("cheapest"),
          last_value($"o_totalprice").over(w).as("priciest"))
        .distinct()
        .orderBy($"o_custkey")
    }),

    "q_range_window" -> ((s, d) => {
      import s.implicits._
      // Trailing-7-day spend per customer: RANGE frame over a day index,
      // partitioned by key — no global sort at scale.
      val day = datediff($"o_orderdate", lit("1990-01-01").cast("date"))
      val w = Window.partitionBy($"o_custkey").orderBy(day)
        .rangeBetween(-7, Window.currentRow)
      T.orders(s, d)
        .withColumn("d7_spend", r4(sum($"o_totalprice").over(w)))
        .groupBy($"o_custkey")
        .agg(r4(max($"d7_spend")).as("max_7d_spend"))
        .orderBy($"o_custkey")
    }),

    "q_scalar_subquery" -> ((s, d) => {
      import s.implicits._
      // Orders above the global average — the scalar aggregate is a
      // 1-row broadcast, not a driver collect.
      val o = T.orders(s, d)
      val g = o.agg(avg($"o_totalprice").as("gavg"))
      o.crossJoin(broadcast(g))
        .filter($"o_totalprice" > $"gavg")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), r4(sum($"o_totalprice")).as("total"))
        .orderBy($"o_orderstatus")
    }),

    "q_self_join" -> ((s, d) => {
      import s.implicits._
      // Nation pairs sharing a region (self equi-join, k < k dedup).
      val n1 = T.nation(s, d).select($"n_nationkey".as("k1"),
        $"n_name".as("name1"), $"n_regionkey".as("r1"))
      val n2 = T.nation(s, d).select($"n_nationkey".as("k2"),
        $"n_name".as("name2"), $"n_regionkey".as("r2"))
      n1.join(n2, $"r1" === $"r2" && $"k1" < $"k2")
        .select($"r1".as("regionkey"), $"name1", $"name2")
        .orderBy($"regionkey", $"name1", $"name2")
    }),

    "q_corr_stats" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          r4(corr($"l_quantity", $"l_extendedprice")).as("qp_corr"),
          r4(covar_pop($"l_quantity", $"l_extendedprice")).as("qp_covar"),
          r4(stddev_samp($"l_extendedprice")).as("price_sd"))
        .orderBy($"l_returnflag")
    }),

    "q_regex_extract" -> ((s, d) => {
      import s.implicits._
      T.part(s, d)
        .withColumn("brand_no",
          regexp_extract($"p_brand", "Brand#(\\d+)", 1).cast("long"))
        .groupBy($"brand_no")
        .agg(count(lit(1)).as("n"), r4(avg($"p_retailprice")).as("avg_price"))
        .orderBy($"brand_no")
    }),

    "q_json_extract" -> ((s, d) => {
      import s.implicits._
      // props is a JSON object column; bucket on $.k.
      T.events(s, d)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .withColumn("bucket", $"k" % 10)
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), r4(avg($"value")).as("avg_value"))
        .orderBy($"bucket")
    }),

    "q_explode_tokens" -> ((s, d) => {
      import s.implicits._
      T.documents(s, d)
        .filter($"doc_id" < 200)
        .select(explode(graft.Util.tokens($"text")).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token")
        .limit(30)
    }),

    "q_unpivot" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .select($"l_orderkey", $"l_quantity", $"l_extendedprice", $"l_discount")
        .unpivot(
          Array($"l_orderkey"),
          Array($"l_quantity", $"l_extendedprice", $"l_discount"),
          "measure", "val")
        .groupBy($"measure")
        .agg(count(lit(1)).as("n"), r4(sum($"val")).as("total"))
        .orderBy($"measure")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice),4) AS revenue
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice),4) AS revenue
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,

    "q_full_join" ->
      """SELECT coalesce(a.custkey, b.custkey) AS custkey,
        |  coalesce(n98, 0) AS n98, coalesce(n99, 0) AS n99
        |FROM (SELECT o_custkey AS custkey, count(*) AS n98 FROM orders
        |      WHERE year(o_orderdate) = 1998 GROUP BY 1) a
        |FULL OUTER JOIN
        |     (SELECT o_custkey AS custkey, count(*) AS n99 FROM orders
        |      WHERE year(o_orderdate) = 1999 GROUP BY 1) b
        |USING (custkey)
        |ORDER BY custkey""".stripMargin,

    "q_ntile" ->
      """SELECT quartile, count(*) AS n,
        |  round(min(o_totalprice),4) AS lo, round(max(o_totalprice),4) AS hi
        |FROM (SELECT o_totalprice,
        |        ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        |      FROM orders)
        |GROUP BY quartile ORDER BY quartile""".stripMargin,

    "q_first_last" ->
      """SELECT DISTINCT o_custkey,
        |  first_value(o_totalprice) OVER w AS cheapest,
        |  last_value(o_totalprice) OVER w AS priciest
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey""".stripMargin,

    "q_range_window" ->
      """SELECT o_custkey, round(max(d7_spend),4) AS max_7d_spend FROM (
        |  SELECT o_custkey,
        |    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |      ORDER BY date_diff('day', DATE '1990-01-01', o_orderdate)
        |      RANGE BETWEEN 7 PRECEDING AND CURRENT ROW),4) AS d7_spend
        |  FROM orders)
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice),4) AS total
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_self_join" ->
      """SELECT n1.n_regionkey AS regionkey, n1.n_name AS name1, n2.n_name AS name2
        |FROM nation n1 JOIN nation n2
        |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
        |ORDER BY regionkey, name1, name2""".stripMargin,

    "q_corr_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice),4) AS qp_corr,
        |  round(covar_pop(l_quantity, l_extendedprice),4) AS qp_covar,
        |  round(stddev_samp(l_extendedprice),4) AS price_sd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_regex_extract" ->
      """SELECT CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_no,
        |  count(*) AS n, round(avg(p_retailprice),4) AS avg_price
        |FROM part GROUP BY brand_no ORDER BY brand_no""".stripMargin,

    "q_json_extract" ->
      """SELECT CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) % 10 AS bucket,
        |  count(*) AS n, round(avg(value),4) AS avg_value
        |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |  FROM documents WHERE doc_id < 200)
        |GROUP BY token ORDER BY n DESC, token LIMIT 30""".stripMargin,

    "q_unpivot" ->
      """SELECT measure, count(*) AS n, round(sum(val),4) AS total FROM (
        |  SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem)
        |GROUP BY measure ORDER BY measure""".stripMargin
  )
}
