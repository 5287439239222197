package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** TPC-H shapes Q2 / Q9 / Q20 — the three the inventory lacked,
  * completing all 22. The corpus has no PARTSUPP table, so the
  * part-supplier cost relation is DERIVED from lineitem (which part
  * did which supplier ship, at what aggregate value) — the join
  * topology, correlated-min / nested-semi-join structure, and
  * integer-cent discipline of the originals are preserved; only the
  * cost column's provenance changes. Same adaptation precedent as
  * Q11/Q16 (no partsupp) in [[TpchQueries3]].
  */
object TpchQueries4 extends QueryModule {

  // revenue in cent×percent units: exact integer, /10000 to dollars
  private def revC = sum(
    (round(col("l_extendedprice") * 100).cast("long") *
      (lit(100) - round(col("l_discount") * 100).cast("long")))
      .cast("decimal(38,0)"))

  val queries: Map[String, Q] = Map(
    // Q2 shape: for every ECONOMY part, the EUROPE supplier with the
    // MINIMUM aggregate supply value — correlated min + join-back
    // (ties kept, like the original's multi-supplier output), 5-table
    // topology, integer-cent min so the comparison never floats.
    "q_tpch_q2" -> ((s, d) => {
      import s.implicits._
      val euroSupp = T.supplier(s, d)
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d).filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
      val perPartSupp = T.lineitem(s, d)
        .join(broadcast(T.part(s, d).filter($"p_type" === "ECONOMY")
          .select($"p_partkey")), $"l_partkey" === $"p_partkey")
        .join(broadcast(euroSupp), $"l_suppkey" === $"s_suppkey")
        .groupBy($"p_partkey", $"s_suppkey", $"s_name", $"s_acctbal",
          $"n_name")
        .agg(revC.as("val_c"))
      val minPer = perPartSupp.groupBy($"p_partkey".as("mp_partkey"))
        .agg(min($"val_c").as("min_c"))
      perPartSupp
        .join(minPer, $"p_partkey" === $"mp_partkey" &&
          $"val_c" === $"min_c")
        .select($"p_partkey", $"s_name", $"n_name",
          r4($"s_acctbal").as("s_acctbal"),
          r4($"val_c" / 10000.0).as("value"))
        .orderBy($"p_partkey", $"s_name")
    }),

    // Q9 shape: product profit by supplier nation × order year for
    // name-matched parts — profit = revenue − qty·retail cost, all in
    // exact integer cents until the final /10000.
    "q_tpch_q9" -> ((s, d) => {
      import s.implicits._
      val profitC = sum(
        (round($"l_extendedprice" * 100).cast("long") *
          (lit(100) - round($"l_discount" * 100).cast("long")) -
          $"l_quantity".cast("long") *
            round($"p_retailprice" * 100).cast("long") * 100)
          .cast("decimal(38,0)"))
      T.lineitem(s, d)
        .join(broadcast(T.part(s, d).filter($"p_name".contains("red"))
          .select($"p_partkey", $"p_retailprice")),
          $"l_partkey" === $"p_partkey")
        .join(broadcast(T.supplier(s, d)
            .select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(T.orders(s, d).select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name".as("nation"),
          year($"o_orderdate").as("o_year"))
        .agg(r4(profitC / 10000.0).as("sum_profit"))
        .orderBy($"nation", $"o_year".desc)
    }),

    // Q20 shape: EUROPE suppliers whose shipped quantity of
    // name-matched parts exceeds the per-supplier AVERAGE — the
    // original's nested-IN structure (aggregate subquery + derived
    // scalar threshold → left-semi), integer quantity sums, and the
    // threshold comparison uses the identical IEEE division in both
    // engines (exact integer sum / exact count).
    "q_tpch_q20" -> ((s, d) => {
      import s.implicits._
      val per = T.lineitem(s, d)
        .join(broadcast(T.part(s, d).filter($"p_name".contains("blue"))
          .select($"p_partkey")), $"l_partkey" === $"p_partkey")
        .groupBy($"l_suppkey")
        .agg(sum($"l_quantity".cast("long")).as("q"))
      val thr = per.agg(avg($"q").as("t"))
      val concentrated = per.crossJoin(broadcast(thr))
        .filter($"q" > $"t").select($"l_suppkey")
      T.supplier(s, d)
        .join(broadcast(T.nation(s, d)), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(T.region(s, d).filter($"r_name" === "EUROPE")),
          $"n_regionkey" === $"r_regionkey")
        .join(concentrated, $"s_suppkey" === $"l_suppkey", "left_semi")
        .select($"s_suppkey", $"s_name")
        .orderBy($"s_suppkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q2" ->
      """WITH euro AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |pps AS (
        |  SELECT l_partkey AS p_partkey, s_suppkey, s_name, s_acctbal,
        |    n_name,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS val_c
        |  FROM lineitem
        |  JOIN part ON l_partkey = part.p_partkey AND p_type = 'ECONOMY'
        |  JOIN euro ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4, 5),
        |mn AS (SELECT p_partkey, min(val_c) AS min_c FROM pps GROUP BY 1)
        |SELECT pps.p_partkey AS p_partkey, s_name, n_name,
        |  round(s_acctbal, 4) AS s_acctbal,
        |  round(val_c / 10000.0, 4) AS value
        |FROM pps JOIN mn
        |  ON pps.p_partkey = mn.p_partkey AND val_c = min_c
        |ORDER BY pps.p_partkey, s_name""".stripMargin,

    "q_tpch_q9" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  round(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l_discount * 100) AS BIGINT)) -
        |      CAST(l_quantity AS BIGINT) *
        |      CAST(round(p_retailprice * 100) AS BIGINT) * 100)
        |    / 10000.0, 4) AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,

    "q_tpch_q20" ->
      """WITH per AS (
        |  SELECT l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS q
        |  FROM lineitem JOIN part
        |    ON l_partkey = p_partkey AND p_name LIKE '%blue%'
        |  GROUP BY 1),
        |thr AS (SELECT avg(q) AS t FROM per)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |AND s_suppkey IN (SELECT l_suppkey FROM per, thr WHERE q > t)
        |ORDER BY s_suppkey""".stripMargin
  )
}
