package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** §2.1 relational core.
  *
  * Declarative DataFrame plans only — Catalyst handles pushdown,
  * pruning, join strategy. Dimension tables (region/nation/supplier/
  * part/customer) are broadcast explicitly where the star-schema
  * ratio guarantees they stay small at 100 TB fact scale.
  */
object RelationalQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "q_filter_project" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1999-01-01").cast("timestamp") &&
          $"l_discount" > 0.05)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q1_pricing_summary" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_shipdate" <= lit("2000-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          r4(sum($"l_quantity")).as("sum_qty"),
          r4(sum($"l_extendedprice")).as("sum_base_price"),
          r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("sum_disc_price"),
          r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"))).as("sum_charge"),
          r4(avg($"l_quantity")).as("avg_qty"),
          r4(avg($"l_extendedprice")).as("avg_price"),
          r4(avg($"l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "q_case_agg" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(
          r4(sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), $"o_totalprice").otherwise(0.0))).as("urgent_rev"),
          r4(sum(when(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"), $"o_totalprice").otherwise(0.0))).as("other_rev"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    }),

    "q_distinct_agg" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    }),

    "q_join_revenue" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp"))
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(
          r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"),
          countDistinct($"o_orderkey").as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    "q_star_join" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .join(broadcast(T.supplier(s, d)), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    }),

    "q_multi_join" -> ((s, d) => {
      import s.implicits._
      // TPC-H Q5 shape: local-supplier revenue by nation.
      T.customer(s, d)
        .join(T.orders(s, d), $"c_custkey" === $"o_custkey")
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .join(broadcast(T.supplier(s, d)),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"))
        .orderBy($"n_name")
    }),

    "q_left_join_count" -> ((s, d) => {
      import s.implicits._
      // TPC-H Q13: distribution of orders-per-customer incl. zero.
      T.customer(s, d)
        .join(T.orders(s, d), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }),

    "q_semi_join" -> ((s, d) => {
      import s.implicits._
      T.customer(s, d)
        .join(T.orders(s, d).filter($"o_orderstatus" === "F"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    "q_anti_join" -> ((s, d) => {
      import s.implicits._
      T.customer(s, d)
        .join(T.orders(s, d).filter($"o_orderstatus" === "P"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_acctbal")
        .orderBy($"c_custkey")
    }),

    "q_subquery_avg" -> ((s, d) => {
      import s.implicits._
      // TPC-H Q17 shape: small-quantity lineitems vs per-part average.
      val li = T.lineitem(s, d)
      val avgQ = li.groupBy($"l_partkey".as("p_key"))
        .agg(avg($"l_quantity").as("avg_qty"))
      li.join(avgQ, $"l_partkey" === $"p_key")
        .filter($"l_quantity" < lit(0.5) * $"avg_qty")
        .agg(r4(sum($"l_extendedprice") / 7.0).as("avg_yearly"))
    }),

    "q_topk_per_group" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      T.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice", $"rn")
        .orderBy($"o_orderpriority", $"rn")
    }),

    "q_running_sum" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T.orders(s, d)
        .withColumn("running_total", r4(sum($"o_totalprice").over(w)))
        .select($"o_custkey", $"o_orderkey", $"running_total")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "q_lag_delta" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      T.events(s, d)
        .withColumn("prev_value", lag($"value", 1).over(w))
        .filter($"prev_value".isNotNull)
        .select($"event_id", $"user_id", r4($"value" - $"prev_value").as("delta"))
        .orderBy($"event_id")
    }),

    "q_order_limit" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(50)
    }),

    "q_union_agg" -> ((s, d) => {
      import s.implicits._
      val o = T.orders(s, d).select(lit("order").as("src"), $"o_totalprice".as("amount"))
      val l = T.lineitem(s, d).select(lit("line").as("src"), $"l_extendedprice".as("amount"))
      o.unionAll(l)
        .groupBy($"src")
        .agg(count(lit(1)).as("n"), r4(sum($"amount")).as("total"))
        .orderBy($"src")
    }),

    "q_having" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), r4(sum($"o_totalprice")).as("total"))
        .filter($"n_orders" >= 5)
        .orderBy($"o_custkey")
    }),

    "q_in_filter" -> ((s, d) => {
      import s.implicits._
      T.part(s, d)
        .filter($"p_brand".isin("Brand#1", "Brand#7", "Brand#13") &&
          $"p_size".isin(1, 5, 9, 13, 17))
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n"), r4(avg($"p_retailprice")).as("avg_price"))
        .orderBy($"p_brand")
    }),

    "q_string_ops" -> ((s, d) => {
      import s.implicits._
      T.customer(s, d)
        .filter($"c_name".like("%1%"))
        .select(
          $"c_custkey",
          upper($"c_name").as("uname"),
          substring($"c_name", 1, 8).as("prefix"),
          length($"c_name").cast("long").as("namelen"),
          concat($"c_mktsegment", lit(":"), $"c_name").as("tagged"))
        .orderBy($"c_custkey")
    }),

    "q_date_rollup" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy(to_date(date_trunc("month", $"o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n_orders"), r4(sum($"o_totalprice")).as("revenue"))
        .orderBy($"month")
    }),

    "q_rollup" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), r4(sum($"o_totalprice")).as("revenue"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    "q_pivot" -> ((s, d) => {
      import s.implicits._
      T.orders(s, d)
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy($"o_orderpriority")
    }),

    "q_percentile" -> ((s, d) => {
      import s.implicits._
      // Exact interpolated percentiles. l_returnflag has 3 groups, so
      // this rides the FEW-GROUP literal path (r19 verdict #3, the
      // q_mad shape): one histogram shuffle + three literal-plan jobs
      // instead of the generic chain's sample job + broadcast join +
      // rank window (~13 AQE stage-jobs). Same percentile_cont
      // selection, same interpolation arithmetic (r4d is bit-for-bit
      // Catalyst round(x,4)), so values are unchanged; above 64 groups
      // the local helper itself falls back to the distributed path.
      val hist = T.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_extendedprice".cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val q = ExactPercentile.perGroupWeightedLocal(hist,
        "l_returnflag", "v", "c",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75))
      q.toSeq.map { case (g, m) => (g.asInstanceOf[String],
          ExactPercentile.r4d(m("p25")), ExactPercentile.r4d(m("p50")),
          ExactPercentile.r4d(m("p75"))) }
        .sortBy(_._1)
        .toDF("l_returnflag", "p25", "p50", "p75")
        .orderBy($"l_returnflag")
    }),

    "q_percentile_disc" -> ((s, d) => {
      import s.implicits._
      // ANSI percentile_disc: the actual value at rank ceil(p·n) —
      // the other standard percentile semantics, no interpolation
      // (fractions are binary-exact so the rank can't flip vs the
      // oracle's double arithmetic). Few-group literal path as in
      // q_percentile (r19 verdict #3), disc selection.
      val hist = T.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_extendedprice".cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(false)
      val q = ExactPercentile.perGroupWeightedLocal(hist,
        "l_returnflag", "v", "c",
        Seq("d25" -> 0.25, "d50" -> 0.5, "d75" -> 0.75), disc = true)
      q.toSeq.map { case (g, m) => (g.asInstanceOf[String],
          ExactPercentile.r4d(m("d25")), ExactPercentile.r4d(m("d50")),
          ExactPercentile.r4d(m("d75"))) }
        .sortBy(_._1)
        .toDF("l_returnflag", "d25", "d50", "d75")
        .orderBy($"l_returnflag")
    }),

    "q_approx_distinct" -> ((s, d) => {
      import s.implicits._
      // HLL sketch next to its exact counterpart in ONE pass; the
      // hashed output is the exact count + a sketch-sanity boolean,
      // so DuckDB can verify the sketch without re-implementing it.
      // The default rsd 0.05 is ONE standard deviation (~68%), not a
      // hard bound — asserting it directly would make the gate flip
      // red legitimately at some scale factors. 4σ (P(fail) < 1e-4)
      // still separates a working sketch from a broken one.
      T.lineitem(s, d)
        .groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_partkey").as("approx_parts"),
          countDistinct($"l_partkey").as("exact_parts"))
        .select($"l_returnflag", $"exact_parts",
          (abs($"approx_parts" - $"exact_parts")
            <= $"exact_parts" * 0.20).as("within_tol"))
        .orderBy($"l_returnflag")
    }),

    "q_hash_sample" -> ((s, d) => {
      import s.implicits._
      // Deterministic 1-in-10 key sample: reproducible across engines,
      // unlike rand()-based sampling.
      T.lineitem(s, d)
        .filter($"l_orderkey" % 10 === 3)
        .agg(count(lit(1)).as("n_rows"), r4(sum($"l_extendedprice")).as("total"))
    }),

    "q_cross_join" -> ((s, d) => {
      import s.implicits._
      T.region(s, d)
        .crossJoin(T.orders(s, d).select($"o_orderstatus").distinct())
        .select($"r_regionkey", $"r_name", $"o_orderstatus")
        .orderBy($"r_regionkey", $"o_orderstatus")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),4) AS sum_qty,
        |  round(sum(l_extendedprice),4) AS sum_base_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),4) AS sum_charge,
        |  round(avg(l_quantity),4) AS avg_qty,
        |  round(avg(l_extendedprice),4) AS avg_price,
        |  round(avg(l_discount),4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_case_agg" ->
      """SELECT o_orderstatus,
        |  round(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0.0 END),4) AS urgent_rev,
        |  round(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN o_totalprice ELSE 0.0 END),4) AS other_rev,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_revenue" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_star_join" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q_multi_join" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice*(1.0-l_discount)),4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_left_join_count" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        |ORDER BY c_custkey""".stripMargin,

    "q_subquery_avg" ->
      """SELECT round(sum(l_extendedprice)/7.0, 4) AS avg_yearly
        |FROM lineitem l
        |JOIN (SELECT l_partkey AS p_key, avg(l_quantity) AS avg_qty
        |      FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.p_key
        |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,

    "q_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),4) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_lag_delta" ->
      """SELECT event_id, user_id, round(value - prev_value, 4) AS delta FROM (
        |  SELECT event_id, user_id, value,
        |    lag(value, 1) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_value
        |  FROM events)
        |WHERE prev_value IS NOT NULL ORDER BY event_id""".stripMargin,

    "q_order_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,

    "q_union_agg" ->
      """SELECT src, count(*) AS n, round(sum(amount),4) AS total FROM (
        |  SELECT 'order' AS src, o_totalprice AS amount FROM orders
        |  UNION ALL
        |  SELECT 'line' AS src, l_extendedprice AS amount FROM lineitem)
        |GROUP BY src ORDER BY src""".stripMargin,

    "q_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice),4) AS total
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 5
        |ORDER BY o_custkey""".stripMargin,

    "q_in_filter" ->
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice),4) AS avg_price
        |FROM part
        |WHERE p_brand IN ('Brand#1','Brand#7','Brand#13')
        |  AND p_size IN (1,5,9,13,17)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_string_ops" ->
      """SELECT c_custkey, upper(c_name) AS uname, substr(c_name,1,8) AS prefix,
        |  length(c_name) AS namelen,
        |  concat(c_mktsegment, ':', c_name) AS tagged
        |FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""".stripMargin,

    "q_date_rollup" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_orders, round(sum(o_totalprice),4) AS revenue
        |FROM orders GROUP BY month ORDER BY month""".stripMargin,

    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice),4) AS revenue
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_pivot" ->
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25),4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5),4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75),4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_percentile_disc" ->
      """SELECT l_returnflag,
        |  round(quantile_disc(l_extendedprice, 0.25),4) AS d25,
        |  round(quantile_disc(l_extendedprice, 0.5),4) AS d50,
        |  round(quantile_disc(l_extendedprice, 0.75),4) AS d75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_hash_sample" ->
      """SELECT count(*) AS n_rows, round(sum(l_extendedprice),4) AS total
        |FROM lineitem WHERE l_orderkey % 10 = 3""".stripMargin,

    "q_cross_join" ->
      """SELECT r_regionkey, r_name, o_orderstatus
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
        |ORDER BY r_regionkey, o_orderstatus""".stripMargin,

    // The oracle states the HLL accuracy CONTRACT: the exact count is
    // recomputed in DuckDB and the sketch estimate must sit within the
    // advertised 5% rsd (within_tol ≡ TRUE). A broken sketch flips the
    // boolean and the hash compare fails.
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
