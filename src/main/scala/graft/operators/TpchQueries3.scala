package graft.operators

import graft.{QueryModule, Tables => T}
import graft.Util.r4
import org.apache.spark.sql.functions._

/** Third tranche of TPC-H shapes (Q11/Q12/Q13/Q15/Q16/Q17/Q21/Q22),
  * adapted to this corpus's columns. Each exercises an optimizer path
  * the earlier tranches don't:
  *
  *   - Q11: HAVING against a scalar subquery over the SAME aggregate
  *     (group share > fraction of global total);
  *   - Q12: join + dual conditional counts (CASE-sum) by category;
  *   - Q13: left outer join with a FILTERED build side, then an
  *     aggregate OF an aggregate (distribution of per-key counts);
  *   - Q15: join-back on a scalar MAX (top revenue supplier, ties
  *     kept — no LIMIT nondeterminism);
  *   - Q16: NOT IN decorrelated to a left-anti join + count distinct
  *     over a multi-attribute group;
  *   - Q17: correlated per-group average threshold (quantity below
  *     0.2× the part's mean);
  *   - Q21: the EXISTS + NOT EXISTS double-correlation, decorrelated
  *     to a left-semi then left-anti join on the same fact;
  *   - Q22: anti join against orders gated by an integer-exact
  *     scalar-aggregate comparison.
  *
  * The corpus lacks partsupp / l_shipmode / c_phone, so Q11 ranks
  * part revenue instead of stock value, Q12 classifies LATE lines
  * (shipped >60 days after ordering) instead of ship modes, and Q22
  * derives the "country code" from c_custkey. The plan shapes — the
  * point of the family — are unchanged.
  *
  * Where a filter sits on an aggregate boundary (Q11's share
  * threshold, Q15's max equality, Q22's above-average balance) the
  * comparison runs in integer cents so Spark and the oracle cannot
  * diverge on float summation order. Reference behavior: the star
  * joins mirror the per-dataset transform joins of
  * aws_infrastructure/airflow-setup.py:172-241.
  */
object TpchQueries3 extends QueryModule {

  /** Exact line revenue in "centi-basis-points of a cent": price in
    * cents × discount remainder in percent. The per-row product fits
    * a long, but the SUM crosses Long.Max around 6e9 rows — so it
    * accumulates in decimal(38,0), the JVM analog of the HUGEINT
    * DuckDB promotes to. Order-proof either way. */
  private def revC = sum((round(col("l_extendedprice") * 100).cast("long") *
    (lit(100) - round(col("l_discount") * 100).cast("long")))
    .cast("decimal(38,0)"))

  val queries: Map[String, Q] = Map(
    // Q11: parts whose revenue exceeds 1.5× the mean part revenue —
    // TPC-H's fixed 0.01%/SF fraction is scale-dependent, so the
    // threshold is restated against the mean to stay meaningful at
    // any SF. The scalar (total, count) is a 1-row broadcast join;
    // the comparison is integer cross-multiplication, never a float.
    "q_tpch_q11" -> ((s, d) => {
      import s.implicits._
      val per = T.lineitem(s, d).groupBy($"l_partkey")
        .agg(revC.as("val_c"))
      val tot = per.agg(sum($"val_c").as("tot_c"), count(lit(1)).as("n_parts"))
      per.crossJoin(broadcast(tot))
        .filter($"val_c" * 2 * $"n_parts" > $"tot_c" * 3)
        .select($"l_partkey".as("p_partkey"),
          r4($"val_c" / 10000.0).as("revenue"))
    }),

    // Q12: of lines shipped >60 days after ordering in 1997, how many
    // carried urgent/high order priority vs the rest, by line status.
    "q_tpch_q12" -> ((s, d) => {
      import s.implicits._
      T.lineitem(s, d)
        .filter(year($"l_shipdate") === 1997)
        .join(T.orders(s, d), $"l_orderkey" === $"o_orderkey")
        .filter($"l_shipdate" >= $"o_orderdate" + expr("INTERVAL 60 DAYS"))
        .groupBy($"l_linestatus")
        .agg(
          count_if($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
            .as("high_line_count"),
          count_if(!$"o_orderpriority".isin("1-URGENT", "2-HIGH"))
            .as("low_line_count"))
        .orderBy($"l_linestatus")
    }),

    // Q13: distribution of per-customer order counts, counting only
    // specified-priority orders — the filter lives on the JOIN's build
    // side so customers with zero such orders still appear (c_count=0).
    "q_tpch_q13" -> ((s, d) => {
      import s.implicits._
      val o = T.orders(s, d)
        .filter($"o_orderpriority" =!= "4-NOT SPECIFIED")
        .select($"o_custkey", $"o_orderkey")
      T.customer(s, d).select($"c_custkey")
        .join(o, $"c_custkey" === $"o_custkey", "left_outer")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("c_count"))
        .groupBy($"c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy($"custdist".desc, $"c_count".desc)
    }),

    // Q15: supplier(s) with the maximum Q1-1997 revenue. Integer-cent
    // revenue makes the max-equality join exact; ties all survive, so
    // the result carries no LIMIT nondeterminism.
    "q_tpch_q15" -> ((s, d) => {
      import s.implicits._
      val rev = T.lineitem(s, d)
        .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1997-04-01").cast("timestamp_ntz"))
        .groupBy($"l_suppkey").agg(revC.as("val_c"))
      val top = rev.agg(max($"val_c").as("max_c"))
      rev.crossJoin(broadcast(top))
        .filter($"val_c" === $"max_c")
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .select($"s_suppkey", $"s_name",
          r4($"val_c" / 10000.0).as("total_revenue"))
    }),

    // Q16: distinct supplier count per (brand, type, size) for parts
    // outside one brand and within a size list, excluding low-balance
    // suppliers via a left-anti join (the NOT IN decorrelation).
    "q_tpch_q16" -> ((s, d) => {
      import s.implicits._
      val bad = T.supplier(s, d).filter($"s_acctbal" < 500)
        .select($"s_suppkey".as("bad_key"))
      val p = T.part(s, d)
        .filter($"p_brand" =!= "BRAND_10" &&
          $"p_size".isin(1, 4, 9, 16, 25, 36, 49))
      T.lineitem(s, d).select($"l_partkey", $"l_suppkey")
        .join(bad, $"l_suppkey" === $"bad_key", "left_anti")
        .join(p, $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand", $"p_type", $"p_size")
        .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
        .orderBy($"supplier_cnt".desc, $"p_brand", $"p_type", $"p_size")
    }),

    // Q17: revenue lost to small orders — lines whose quantity is
    // under 20% of their part's average quantity. Quantities are
    // integral doubles, so sum-then-divide is bit-identical in both
    // engines regardless of accumulation order.
    "q_tpch_q17" -> ((s, d) => {
      import s.implicits._
      val avgQ = T.lineitem(s, d).groupBy($"l_partkey".as("ap"))
        .agg((sum($"l_quantity") / count(lit(1))).as("avg_qty"))
      // integer-cent discipline: summing raw double prices is
      // accumulation-order-dependent; an exact long cent sum is not,
      // so both engines divide the identical integer at the end
      T.lineitem(s, d)
        .join(avgQ, $"l_partkey" === $"ap")
        .filter($"l_quantity" < $"avg_qty" * 0.2)
        .agg(r4(sum(round($"l_extendedprice" * 100).cast("long")) / 700.0)
          .as("avg_yearly"))
    }),

    // Q21: suppliers whose line was the LAST shipped in a
    // multi-supplier order — EXISTS (another supplier in the order)
    // as a left-semi join, NOT EXISTS (another supplier shipping
    // later) as a left-anti join, both equi on orderkey with the
    // extra predicates in the join condition.
    "q_tpch_q21" -> ((s, d) => {
      import s.implicits._
      val li = T.lineitem(s, d).select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      val l2 = li.select($"l_orderkey".as("o2"), $"l_suppkey".as("s2"))
      val l3 = li.select($"l_orderkey".as("o3"), $"l_suppkey".as("s3"),
        $"l_shipdate".as("d3"))
      li
        .join(l2, $"l_orderkey" === $"o2" && $"l_suppkey" =!= $"s2", "left_semi")
        .join(l3, $"l_orderkey" === $"o3" && $"l_suppkey" =!= $"s3" &&
          $"d3" > $"l_shipdate", "left_anti")
        .join(T.supplier(s, d), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
        .orderBy($"numwait".desc, $"s_name")
    }),

    // Q22: "country code" groups of well-funded customers with no
    // orders since 2000 (the corpus has no fully order-less
    // customers). The above-average test cross-multiplies integer cents
    // (bal_c * n_pos > sum_c) so no float average ever materializes.
    "q_tpch_q22" -> ((s, d) => {
      import s.implicits._
      val c = T.customer(s, d)
        .withColumn("cntrycode", ($"c_custkey" % 7).cast("int"))
        .withColumn("bal_c", round($"c_acctbal" * 100).cast("long"))
        .filter($"cntrycode".isin(0, 1, 2, 3))
      val avg = c.filter($"bal_c" > 0)
        .agg(sum($"bal_c").as("sum_c"), count(lit(1)).as("n_pos"))
      c.crossJoin(broadcast(avg))
        .filter($"bal_c" * $"n_pos" > $"sum_c")
        .join(T.orders(s, d)
            .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp_ntz"))
            .select($"o_custkey"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"cntrycode")
        .agg(count(lit(1)).as("numcust"),
          r4(sum($"bal_c") / 100.0).as("totacctbal"))
        .orderBy($"cntrycode")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_tpch_q11" ->
      """WITH per AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS val_c
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(val_c) AS tot_c, count(*) AS n_parts FROM per)
        |SELECT l_partkey AS p_partkey, round(val_c / 10000.0, 4) AS revenue
        |FROM per, tot WHERE val_c * 2 * n_parts > tot_c * 3""".stripMargin,

    "q_tpch_q12" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (o_orderpriority IN ('1-URGENT','2-HIGH'))
        |    AS high_line_count,
        |  count(*) FILTER (o_orderpriority NOT IN ('1-URGENT','2-HIGH'))
        |    AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE year(l_shipdate) = 1997
        |  AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN (
        |    SELECT o_custkey, o_orderkey FROM orders
        |    WHERE o_orderpriority <> '4-NOT SPECIFIED') o
        |    ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |        (100 - CAST(round(l_discount * 100) AS BIGINT))) AS val_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, round(val_c / 10000.0, 4) AS total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE val_c = (SELECT max(val_c) FROM rev)""".stripMargin,

    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'BRAND_10'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 500)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q_tpch_q17" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS DOUBLE) / 700.0, 4) AS avg_yearly
        |FROM lineitem l JOIN (
        |  SELECT l_partkey AS ap, sum(l_quantity) / count(*) AS avg_qty
        |  FROM lineitem GROUP BY 1) a ON l.l_partkey = a.ap
        |WHERE l.l_quantity < a.avg_qty * 0.2""".stripMargin,

    "q_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin,

    "q_tpch_q22" ->
      """WITH c AS (
        |  SELECT c_custkey, CAST(c_custkey % 7 AS INT) AS cntrycode,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
        |  FROM customer WHERE c_custkey % 7 IN (0, 1, 2, 3)),
        |a AS (SELECT sum(bal_c) AS sum_c, count(*) AS n_pos
        |  FROM c WHERE bal_c > 0)
        |SELECT cntrycode, count(*) AS numcust,
        |  round(sum(bal_c) / 100.0, 4) AS totacctbal
        |FROM c, a
        |WHERE bal_c * n_pos > sum_c
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |    WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
