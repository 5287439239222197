package graft

import graft.operators.StatQueries2
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the second stat batch that the oracle hash-compare
  * can't express: statistic ranges, and the bounded-aggregator
  * weighted sample matching the window-sort reference row for row. */
class StatSpec2 extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("one-way ANOVA: F non-negative, 5 groups, all rows counted") {
    val r = StatQueries2.queries("q_anova")(spark, sf).collect().head
    assert(r.getLong(0) > 0, "rows counted")
    assert(r.getLong(1) == 5, "5 market segments")
    assert(r.getDouble(2) >= 0.0, "F is a ratio of sums of squares")
  }

  test("Kruskal-Wallis: H non-negative, 5 groups") {
    val r = StatQueries2.queries("q_kruskal")(spark, sf).collect().head
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) == 5)
    assert(r.getDouble(2) >= 0.0, "H is a rank-variance decomposition")
  }

  test("Kendall tau-b: bounded by [-1, 1], pair counts consistent") {
    val r = StatQueries2.queries("q_kendall")(spark, sf).collect().head
    val (n, nc, nd, tau) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(nc >= 0 && nd >= 0)
    assert(nc + nd <= n * (n - 1) / 2, "comparable pairs bounded by all pairs")
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("weighted sample: TopKAgg path equals the window-sort reference") {
    import spark.implicits._
    val got = StatQueries2.queries("q_weighted_sample")(spark, sf)
      .as[(String, Int, Long)].collect().toSeq
    // brute-force reference: same deterministic key, explicit window
    // sort (fine on test-sized data; the operator exists to avoid it)
    val keyed = Tables.orders(spark, sf).select(
      $"o_orderpriority", $"o_orderkey",
      (log(
        (conv(substring(md5($"o_orderkey".cast("string")), 1, 8), 16, 10)
          .cast("double") + 0.5) / 4294967296.0) /
        $"o_totalprice".cast("double")).as("ky"))
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"ky".desc, $"o_orderkey".asc)
    val ref = keyed.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
      .select($"o_orderpriority", $"rn".cast("int"), $"o_orderkey")
      .as[(String, Int, Long)].collect().toSeq
    assert(got.sorted == ref.sorted)
    assert(got.groupBy(_._1).forall(_._2.size == 10), "10 draws per group")
  }
}
