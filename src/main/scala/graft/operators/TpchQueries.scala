package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** Recognizable TPC-H query shapes (Q3/Q5/Q10 adapted to this
  * corpus's columns and 1995-2001 date range) — the canonical
  * multi-join/agg plans every warehouse engine is judged on.
  *
  * Plan shapes at scale: `customer`/`nation`/`region`/`supplier` are
  * dimension-sized and broadcast; `orders ⋈ lineitem` is the one real
  * shuffle, keyed on orderkey; aggregates are partial-agg friendly;
  * date + segment filters push to the parquet scans.
  */
object TpchQueries extends QueryModule {

  private def revenue = sum(col("l_extendedprice") * (lit(1) - col("l_discount")))

  val queries: Map[String, Q] = Map(
    // Q3: unshipped-order revenue priority for one market segment.
    "q_tpch_q3" -> ((s, d) => {
      import s.implicits._
      val cut = lit("1997-03-15").cast("timestamp")
      T.customer(s, d).filter($"c_mktsegment" === "BUILDING")
        .join(T.orders(s, d).filter($"o_orderdate" < cut),
          $"c_custkey" === $"o_custkey")
        .join(T.lineitem(s, d).filter($"l_shipdate" > cut),
          $"o_orderkey" === $"l_orderkey")
        .groupBy($"l_orderkey",
          $"o_orderdate".cast("date").as("odate"), $"o_orderpriority")
        .agg(r4(revenue).as("revenue"))
        .select($"l_orderkey", $"revenue", $"odate", $"o_orderpriority")
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // Q5: local-supplier volume per nation inside one region-year
    // (customer and supplier share the nation).
    "q_tpch_q5" -> ((s, d) => {
      import s.implicits._
      T.customer(s, d)
        .join(T.orders(s, d)
            .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
              $"o_orderdate" < lit("1998-01-01").cast("timestamp")),
          $"c_custkey" === $"o_custkey")
        .join(T.lineitem(s, d), $"o_orderkey" === $"l_orderkey")
        .join(T.supplier(s, d),
          $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d).filter($"r_name" === "ASIA")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(r4(revenue).as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // Q6: forecast revenue change — pure scan+filter+agg, the
    // pushdown benchmark (filters reach the parquet footer stats).
    "q_tpch_q6" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
          $"l_discount".between(0.02, 0.04) && $"l_quantity" < 24)
        .agg(r4(sum($"l_extendedprice" * $"l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Q18: large-volume orders — the HAVING-subquery reduction joins
    // back to the enriched row. The qualifying-order set is tiny and
    // AQE converts its join side to broadcast at runtime.
    "q_tpch_q18" -> ((s, d) => {
      import s.implicits._
      val big = T.lineitem(s, d).groupBy($"l_orderkey")
        .agg(sum($"l_quantity").as("qty"))
        .filter($"qty" > 300)
      T.orders(s, d)
        .join(big, $"o_orderkey" === $"l_orderkey")
        .join(broadcast(T.customer(s, d)), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey",
          $"o_orderdate".cast("date").as("odate"),
          r4($"o_totalprice").as("o_totalprice"),
          r4($"qty").as("qty"))
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(20)
    }),

    // Q10: returned-item revenue loss per customer for one quarter.
    "q_tpch_q10" -> ((s, d) => {
      import s.implicits._
      T.customer(s, d)
        .join(T.orders(s, d)
            .filter($"o_orderdate" >= lit("1997-10-01").cast("timestamp") &&
              $"o_orderdate" < lit("1998-01-01").cast("timestamp")),
          $"c_custkey" === $"o_custkey")
        .join(T.lineitem(s, d).filter($"l_returnflag" === "R"),
          $"o_orderkey" === $"l_orderkey")
        .join(broadcast(T.nation(s, d)), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name", $"c_acctbal")
        .agg(r4(revenue).as("revenue"))
        .select($"c_custkey", $"c_name", $"revenue",
          r4($"c_acctbal").as("c_acctbal"), $"n_name")
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    })
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  CAST(o_orderdate AS DATE) AS odate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15'
        |  AND l_shipdate > TIMESTAMP '1997-03-15'
        |GROUP BY l_orderkey, odate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q18" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  round(o_totalprice, 4) AS o_totalprice,
        |  round(qty, 4) AS qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS qty
        |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  round(c_acctbal, 4) AS c_acctbal, n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-10-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name, c_acctbal
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}
