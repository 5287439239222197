package graft

import graft.ml.LinearModel
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-check the closed-form normal-equations fit against MLlib's
  * LinearRegression (the independent reference implementation that
  * ships with Spark) on the same data — coefficients must agree to
  * high precision when regularization is off. */
class MllibParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("closed-form multi-feature fit matches MLlib LinearRegression") {
    import spark.implicits._
    val xs = Seq("l_quantity", "l_discount", "l_tax")
    val df = Tables.lineitem(spark, TestSpark.sf)
      .select((xs :+ "l_extendedprice").map(col): _*)

    val (intercept, slopes) = LinearModel.fitMulti(df, xs, "l_extendedprice")

    val assembled = new VectorAssembler()
      .setInputCols(xs.toArray).setOutputCol("features")
      .transform(df)
    val m = new LinearRegression()
      .setLabelCol("l_extendedprice").setFeaturesCol("features")
      .setRegParam(0.0).setSolver("normal")
      .fit(assembled)

    assert(math.abs(m.intercept - intercept) <= 1e-4 * math.abs(m.intercept),
      s"intercept ${m.intercept} vs $intercept")
    for ((w, i) <- slopes.zipWithIndex)
      assert(math.abs(m.coefficients(i) - w) <= 1e-4 * math.max(1.0, math.abs(w)),
        s"slope $i: ${m.coefficients(i)} vs $w")
  }
}
