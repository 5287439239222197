package graft

import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx quantiles land within 1% of the exact percentiles") {
    val rows = SparkEntry.queries("q_approx_quantile")(spark, TestSpark.sf)
      .collect()
    assert(rows.length == 3)
    for (r <- rows; i <- 4 to 6)
      assert(r.getBoolean(i), s"${r.getString(0)} sketch outside 1%: $r")
  }

  test("date spine has contiguous months per customer") {
    val rows = SparkEntry.queries("q_date_spine")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    for ((cust, months) <- rows.groupBy(_._1)) {
      val ms = months.map(_._2).sorted.map { m =>
        val Array(y, mo) = m.split("-"); y.toInt * 12 + mo.toInt
      }
      assert(ms.zip(ms.tail).forall { case (a, b) => b == a + 1 },
        s"customer $cust has month gaps: ${months.map(_._2).sorted.mkString(",")}")
    }
  }

  test("weighted moving average stays within each customer's price range") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wma = SparkEntry.queries("q_weighted_ma")(spark, TestSpark.sf)
    val bounds = Tables.orders(spark, TestSpark.sf)
      .filter($"o_custkey" < 100)
      .groupBy($"o_custkey")
      .agg(min($"o_totalprice").as("lo"), max($"o_totalprice").as("hi"))
    val violations = wma.join(bounds, "o_custkey")
      .filter($"wma" < $"lo" - 0.01 || $"wma" > $"hi" + 0.01)
      .count()
    assert(violations == 0)
  }

  test("stratified sample keeps every purchase and thins views") {
    import spark.implicits._
    val sampled = SparkEntry.queries("q_stratified_sample")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Tables.events(spark, TestSpark.sf)
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled("purchase") == full("purchase")) // rate 1: all kept
    assert(sampled("view") < full("view") / 10)     // rate 20: thinned
  }
}
