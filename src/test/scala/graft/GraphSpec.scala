package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph-operator checks at smoke scale: invariants the DuckDB oracle
  * can't express (plan shapes, BFS consistency against the edge set). */
class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("basket rules respect support, confidence and lift ranges") {
    val rows = run("q_basket_rules").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("pair_cnt") >= 2))
    assert(rows.forall { r =>
      val c = r.getAs[Long]("conf_bp"); c > 0 && c <= 10000 })
    assert(rows.forall(_.getAs[Double]("lift") > 0))
  }

  test("triangle census is positive with clustering in (0, 1]") {
    val r = run("q_triangles").collect().head
    assert(r.getAs[Long]("n_triangles") > 0)
    assert(r.getAs[Long]("n_edges") > r.getAs[Long]("n_nodes"))
    val c = r.getAs[Double]("clustering")
    assert(c > 0 && c <= 1.0)
  }

  test("triangle wedge join never falls back to a nested loop") {
    val p = run("q_triangles").queryExecution.executedPlan.toString
    // the single BroadcastNestedLoopJoin allowed is the 1-row × 1-row
    // stats × triangle-count cross at the very top; the wedge and
    // closure joins must both stay keyed
    assert(!p.contains("CartesianProduct"), s"cartesian:\n${p.take(3000)}")
    assert("BroadcastNestedLoop".r.findAllIn(p).size <= 1,
      s"wedge/closure joins degenerated:\n${p.take(3000)}")
    assert(p.contains("LeftSemi"), s"closure not a semi join:\n${p.take(3000)}")
  }

  test("bfs distances are consistent with the edge set") {
    val rows = run("q_bfs_hops").collect()
    val dist = rows.map(r => r.getAs[Int]("node") -> r.getAs[Int]("dist")).toMap
    assert(dist(0) == 0)
    assert(dist.values.forall(d => d >= 0 && d <= 8))
    assert(dist.values.exists(_ > 1), "sparsified graph should need >1 hop")
    // every node at distance k>0 must have a neighbor at distance k-1
    // (rebuild the same top-2 partner edges the query uses)
    import spark.implicits._
    val trade = Tables.lineitem(spark, TestSpark.sf)
      .select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, TestSpark.sf)
        .select($"o_orderkey", $"o_custkey"), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, TestSpark.sf)
        .select($"c_custkey", $"c_nationkey"), $"o_custkey" === $"c_custkey")
      .join(Tables.supplier(spark, TestSpark.sf)
        .select($"s_suppkey", $"s_nationkey"), $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .groupBy($"c_nationkey".as("n1"), $"s_nationkey".as("n2"))
      .agg(count(lit(1)).as("cnt"))
    val top2 = trade.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"n1").orderBy($"cnt".desc, $"n2")))
      .filter($"rn" <= 2).select($"n1", $"n2").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val adj = (top2 ++ top2.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    for ((n, d) <- dist if d > 0)
      assert(adj(n).exists(m => dist.get(m).contains(d - 1)),
        s"node $n at dist $d has no neighbor at ${d - 1}")
  }
}
