package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** k-fold complement algebra, LTV monotonicity, and moment sanity. */
class Analytics4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("kfold complement fit equals a direct fit on the held-in folds") {
    val rows = run("ml_kfold").collect()
    assert(rows.length == 5)
    val r0 = rows.find(_.getAs[Int]("fold") == 0).get
    // direct fit excluding fold 0
    val li = Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_orderkey") % 5 =!= 0)
      .select(col("l_quantity").cast("double").as("x"),
        (round(col("l_extendedprice") * 100)).as("y"))
    val m = li.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy")).collect().head
    val (n, sx, sy, sxx, sxy) = (m.getLong(0).toDouble, m.getDouble(1),
      m.getDouble(2), m.getDouble(3), m.getDouble(4))
    val b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r0.getAs[Double]("slope_c") - b) < 1e-2,
      s"complement slope ${r0.getAs[Double]("slope_c")} vs direct $b")
    assert(rows.forall(_.getAs[Double]("rmse") > 0))
  }

  test("cohort LTV is cumulative-monotone within each cohort") {
    val rows = run("q_ltv_cohort").collect()
      .map(r => (r.getAs[Int]("cohort"), r.getAs[Int]("age"),
        r.getAs[Double]("cum_revenue")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byAge = g.sortBy(_._2).map(_._3)
      assert(byAge.zip(byAge.tail).forall { case (a, b) => b >= a })
    }
  }

  test("second boosting round strictly reduces training error") {
    val r = run("ml_boost2").collect().head
    val (r1, r2) = (r.getAs[Double]("rmse1"), r.getAs[Double]("rmse2"))
    assert(r1 > 0 && r2 > 0 && r2 < r1,
      s"round 2 did not improve: rmse1=$r1 rmse2=$r2")
  }

  test("burst maxima are bounded by event counts") {
    val rows = run("q_burst_max").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("max_burst")
      b >= 1 && b <= r.getAs[Long]("n_events") })
  }

  test("moments match the uniform-quantity shape") {
    val rows = run("q_moments").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val q = rows("l_quantity")
    assert(math.abs(q.getAs[Double]("mean") - 25.5) < 1.5)
    assert(math.abs(q.getAs[Double]("skewness")) < 0.2) // symmetric
    // uniform distribution: excess kurtosis -1.2
    assert(math.abs(q.getAs[Double]("kurtosis") + 1.2) < 0.2)
  }
}
