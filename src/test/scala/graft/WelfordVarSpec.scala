package graft

import graft.functions.WelfordVar
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WelfordVarSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed Aggregator matches var_samp per group") {
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSpark.sf)
    val ds = li.select($"l_returnflag", $"l_extendedprice")
      .as[(String, Double)]
    val got = ds.groupByKey(_._1)
      .agg(new WelfordVar[(String, Double)](_._2).toColumn.name("v"))
      .collect().toMap
    val exp = li.groupBy($"l_returnflag")
      .agg(var_samp($"l_extendedprice").as("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == exp.keySet)
    for ((k, e) <- exp)
      assert(math.abs(got(k) - e) <= 1e-6 * math.abs(e), s"$k: ${got(k)} vs $e")
  }

  test("udaf registration makes the Aggregator callable from SQL") {
    spark.udf.register("welford_var", udaf(WelfordVar.ofDouble))
    Tables.lineitem(spark, TestSpark.sf).createOrReplaceTempView("li_wv")
    val got = spark.sql(
      """SELECT l_returnflag, welford_var(l_extendedprice) AS v
        |FROM li_wv GROUP BY l_returnflag""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exp = Tables.lineitem(spark, TestSpark.sf)
      .groupBy("l_returnflag").agg(var_samp(col("l_extendedprice")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, e) <- exp)
      assert(math.abs(got(k) - e) <= 1e-6 * math.abs(e))
  }
}
