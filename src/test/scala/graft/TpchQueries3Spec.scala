package graft

import org.scalatest.funsuite.AnyFunSuite

/** Result-shape and plan-shape checks for the third TPC-H tranche
  * (Q11/Q12/Q13/Q15/Q16/Q17/Q21/Q22) at smoke scale. */
class TpchQueries3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("q11 returns only parts above 1.5x the mean part revenue") {
    val rows = run("q_tpch_q11").collect()
    assert(rows.nonEmpty, "threshold produced an empty result at smoke scale")
    val revs = rows.map(_.getAs[Double]("revenue"))
    // recompute the mean over ALL parts from the base table
    import org.apache.spark.sql.functions._
    val per = Tables.lineitem(spark, TestSpark.sf)
      .groupBy(col("l_partkey"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100) - round(col("l_discount") * 100).cast("long"))) / 10000.0)
        .as("rev"))
    val all = per.collect().map(_.getAs[Double]("rev"))
    val mean = all.sum / all.length
    assert(revs.forall(_ > 1.5 * mean * 0.999))
    assert(revs.length == all.count(_ > 1.5 * mean))
  }

  test("q13 counts every customer exactly once, including zero-order bins") {
    val rows = run("q_tpch_q13").collect()
    val total = rows.map(_.getAs[Long]("custdist")).sum
    val nCust = Tables.customer(spark, TestSpark.sf).count()
    assert(total == nCust, s"distribution covers $total of $nCust customers")
  }

  test("q15 returns exactly the argmax supplier(s)") {
    val rows = run("q_tpch_q15").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "ties must share the single max revenue")
  }

  test("q21 last-shipped supplier counts are positive and named") {
    val rows = run("q_tpch_q21").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("numwait") > 0 &&
      r.getAs[String]("s_name") != null))
  }

  test("q21 plans the EXISTS as left-semi and NOT EXISTS as left-anti") {
    val p = run("q_tpch_q21").queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS did not stay a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not stay an anti join:\n$p")
  }

  test("q16 excludes suppliers via left-anti, not a shuffled NOT IN") {
    val p = run("q_tpch_q16").queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT IN did not decorrelate:\n$p")
  }

  test("q11/q15/q22 scalar aggregates broadcast, never sort-merge") {
    for (q <- Seq("q_tpch_q11", "q_tpch_q15", "q_tpch_q22")) {
      val df = run(q)
      df.collect() // finalize AQE
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!p.contains("SortMergeJoin"),
        s"$q shuffled a 1-row scalar frame:\n${p.take(3000)}")
    }
  }

  test("q12 late-line counts partition the filtered lines") {
    val rows = run("q_tpch_q12").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("high_line_count") + r.getAs[Long]("low_line_count") > 0))
  }

  test("q17 emits one non-null aggregate row") {
    val rows = run("q_tpch_q17").collect()
    assert(rows.length == 1 && !rows.head.isNullAt(0))
  }

  test("q22 returns only above-average balances with no recent orders") {
    val rows = run("q_tpch_q22").collect()
    assert(rows.nonEmpty, "q22 empty at smoke scale")
    assert(rows.forall(_.getAs[Long]("numcust") > 0))
  }
}
