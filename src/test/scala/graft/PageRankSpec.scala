package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.Row

  private def toyEdges = {
    // a <-> b <-> c triangle plus a pendant d attached to a
    val rows = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    spark.createDataFrame(rows).toDF("src", "dst")
  }

  test("ranks conserve mass on a symmetric graph") {
    // symmetric edges have no dangling mass: sum(rank) == n nodes
    val r = PageRank.run(toyEdges, iters = 20)
    val total = r.agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total - 4.0) < 1e-6, s"rank mass $total != 4")
  }

  test("hub node outranks the pendant and ranks are positive") {
    val r = PageRank.run(toyEdges, iters = 20)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.values.forall(_ > 0.15 - 1e-9))
    assert(r(1L) > r(4L), s"hub ${r(1L)} not above pendant ${r(4L)}")
    assert(math.abs(r(2L) - r(3L)) < 1e-9,
      "symmetric nodes b and c must tie")
  }

  test("q_pagerank is deterministic across runs") {
    val a = SparkEntry.queries("q_pagerank")(spark, TestSpark.sf).collect()
    val b = SparkEntry.queries("q_pagerank")(spark, TestSpark.sf).collect()
    assert(a.sameElements(b))
    assert(a.length > 0)
  }
}
