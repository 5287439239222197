package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TWAP / EWMA / rolling-z-score invariants at smoke scale, plus the
  * partition-by-user plan discipline. */
class EventSeries2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("twap stays inside the per-day value envelope") {
    val rows = run("q_twap").collect()
    assert(rows.nonEmpty)
    val (lo, hi) = {
      val mm = Tables.events(spark, TestSpark.sf)
        .agg(min(col("value")), max(col("value"))).collect().head
      (mm.getDouble(0), mm.getDouble(1))
    }
    assert(rows.forall { r =>
      val t = r.getAs[Double]("twap"); t >= lo - 1e-9 && t <= hi + 1e-9 })
  }

  test("ewma covers every user and stays inside the value envelope") {
    val rows = run("q_ewma").collect()
    val nUsers = Tables.events(spark, TestSpark.sf)
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(rows.length == nUsers)
    val mm = Tables.events(spark, TestSpark.sf)
      .agg(min(col("value")), max(col("value"))).collect().head
    assert(rows.forall { r =>
      val e = r.getAs[Double]("last_ewma")
      e >= mm.getDouble(0) - 1e-9 && e <= mm.getDouble(1) + 1e-9 })
  }

  test("anomaly counts are bounded by scored counts") {
    val rows = run("q_anomaly_zscore").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("n_anomalies") <= r.getAs[Long]("n_scored")))
    assert(rows.forall(_.getAs[Double]("max_abs_z") > 0))
  }

  test("all three window on user_id — never an unpartitioned sort") {
    for (q <- Seq("q_twap", "q_ewma", "q_anomaly_zscore")) {
      val p = run(q).queryExecution.executedPlan.toString
      // every Window operator's spec must open with a partition list
      // containing user_id — a global (unpartitioned) window would
      // print "Window [..], [..ORDER BY..]" with no partition cols
      val specs = "Window \\[[^\\]]*\\], \\[([^\\]]*)\\]".r
        .findAllMatchIn(p).map(_.group(1)).toList
      assert(specs.nonEmpty, s"$q plans no Window operator:\n${p.take(1500)}")
      assert(specs.forall(_.contains("user_id")),
        s"$q windows without user_id partitioning: $specs")
    }
  }
}
