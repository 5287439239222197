package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The engine is reachable from plain SQL too: temp views over the
  * corpus + `spark.sql` produce the same results as the DataFrame
  * builders, and the registered custom functions (`array_dot`) work
  * from SQL text. */
class SqlApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def registerViews(): Unit = {
    Tables.lineitem(spark, TestSpark.sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, TestSpark.sf).createOrReplaceTempView("orders")
    Tables.embeddings(spark, TestSpark.sf).createOrReplaceTempView("embeddings")
  }

  test("spark.sql pricing summary equals the DataFrame plan") {
    registerViews()
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect()
    val df = Tables.lineitem(spark, TestSpark.sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(sql.sameElements(df))
  }

  test("custom array_dot expression is callable from SQL text") {
    graft.functions.GraftFunctions.registerAll(spark)
    registerViews()
    val viaSql = spark.sql(
      """SELECT vec_id, round(array_dot(embedding, embedding), 4) AS sq
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    val viaDf = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), round(
        graft.functions.ArrayDot.dot(col("embedding"), col("embedding")), 4)
        .as("sq"))
      .orderBy("vec_id").limit(5).collect()
    assert(viaSql.sameElements(viaDf))
  }
}
