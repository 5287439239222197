package graft

import graft.sources.Bucketing
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed-bucketed equi-join plans with no shuffle exchange") {
    val orders = Tables.orders(spark, TestSpark.sf)
    val customer = Tables.customer(spark, TestSpark.sf)
    Bucketing.writeBucketed(orders, "orders_bkt", "o_custkey", 4)
    Bucketing.writeBucketed(customer, "customer_bkt", "c_custkey", 4)

    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.coLocatedJoin(spark, "orders_bkt", "customer_bkt",
        "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      // correctness: same result as the plain join
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }

  test("aggregation on the bucket key needs no exchange") {
    val orders = Tables.orders(spark, TestSpark.sf)
    Bucketing.writeBucketed(orders, "orders_bkt2", "o_custkey", 4)
    try {
      val agg = spark.table("orders_bkt2").groupBy("o_custkey").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed groupBy still shuffles:\n${plan.take(1500)}")
      assert(agg.count() == orders.select("o_custkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS orders_bkt2")
  }
}
