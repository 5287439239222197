package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form simple linear regression + evaluation — the model stage
  * of the reference's taxi trip-duration pipeline, as pure aggregates.
  *
  * slope = covar_pop(y,x)/var_pop(x); intercept = ȳ − slope·x̄.
  * Fitting is ONE aggregation (partial-agg friendly: covar/var
  * decompose into sums), so it scales like any group-by; the fitted
  * 1-row model is broadcast for prediction — no collect, no driver
  * math, the whole fit+predict+eval composes lazily.
  */
object LinearModel {

  /** Fit per group (pass no columns for a global fit). Output columns:
    * groupCols ++ (slope, intercept). */
  def fit(df: DataFrame, x: String, y: String, groupCols: String*): DataFrame = {
    val base = if (groupCols.isEmpty) df.groupBy() else
      df.groupBy(groupCols.map(col): _*)
    base.agg(
        covar_pop(col(y), col(x)).as("__cov"),
        var_pop(col(x)).as("__varx"),
        avg(col(y)).as("__my"), avg(col(x)).as("__mx"))
      .withColumn("slope", col("__cov") / col("__varx"))
      .withColumn("intercept", col("__my") - col("slope") * col("__mx"))
      .drop("__cov", "__varx", "__my", "__mx")
  }

  /** Apply a global (1-row) fitted model via broadcast cross join. */
  def predict(df: DataFrame, model: DataFrame, x: String,
      out: String = "prediction"): DataFrame =
    df.crossJoin(broadcast(model.select("slope", "intercept")))
      .withColumn(out, col("slope") * col(x) + col("intercept"))
      .drop("slope", "intercept")

  /** Multi-feature OLS via normal equations on the CENTERED moment
    * matrix: ONE aggregation computes covar_pop(xi,xj) and
    * covar_pop(xi,y) (all decomposable sums), the tiny d×d system is
    * solved on the driver with partial-pivot Gaussian elimination,
    * and the intercept comes from the means. Driver state is O(d²) —
    * the data never leaves the cluster. Returns (intercept, slopes). */
  def fitMulti(df: DataFrame, xs: Seq[String], y: String): (Double, Seq[Double]) =
    fitRidge(df, xs, y, lambdaPerN = 0.0)

  /** Ridge regression = [[fitMulti]] with `lambdaPerN` added to the
    * covariance diagonal: on centered data (X'X + λI)β = X'y divided
    * by n is (C + (λ/n)I)β = c_y, so the regularizer is expressed
    * per-sample and the distributed pass is IDENTICAL to OLS — one
    * covariance aggregate, no extra scan. The intercept stays
    * unpenalized (standard practice: it comes from the means). */
  def fitRidge(df: DataFrame, xs: Seq[String], y: String,
      lambdaPerN: Double): (Double, Seq[Double]) = {
    val d = xs.length
    val aggs =
      (for { i <- 0 until d; j <- i until d } yield
        covar_pop(col(xs(i)), col(xs(j))).as(s"c_${i}_$j")) ++
      (0 until d).map(i => covar_pop(col(xs(i)), col(y)).as(s"cy_$i")) ++
      (col(y) +: xs.map(col)).zipWithIndex.map { case (c, k) => avg(c).as(s"m_$k") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def g(n: String): Double = row.getAs[Double](n)
    val a = Array.tabulate(d, d)((i, j) =>
      (if (i <= j) g(s"c_${i}_$j") else g(s"c_${j}_$i")) +
        (if (i == j) lambdaPerN else 0.0))
    val b = Array.tabulate(d)(i => g(s"cy_$i"))
    // partial-pivot Gaussian elimination on the d×d covariance system
    for (k <- 0 until d) {
      val piv = (k until d).maxBy(i => math.abs(a(i)(k)))
      val (tr, tb) = (a(k), b(k)); a(k) = a(piv); b(k) = b(piv)
      a(piv) = tr; b(piv) = tb
      require(math.abs(a(k)(k)) > 1e-12,
        s"singular covariance matrix at pivot $k: feature '${xs(k)}' is " +
          "constant or collinear with earlier features — drop it or use " +
          "a subset of independent features")
      for (i <- k + 1 until d) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k until d) a(i)(j) -= f * a(k)(j)
        b(i) -= f * b(k)
      }
    }
    val slopes = new Array[Double](d)
    for (i <- d - 1 to 0 by -1) {
      var s = b(i)
      for (j <- i + 1 until d) s -= a(i)(j) * slopes(j)
      slopes(i) = s / a(i)(i)
    }
    val intercept = g("m_0") -
      (0 until d).map(i => slopes(i) * g(s"m_${i + 1}")).sum
    (intercept, slopes.toSeq)
  }

  /** Apply a fitMulti model as a codegen'd literal expression. */
  def predictMulti(df: DataFrame, model: (Double, Seq[Double]),
      xs: Seq[String], out: String = "prediction"): DataFrame =
    df.withColumn(out, xs.zip(model._2)
      .map { case (x, w) => col(x) * lit(w) }
      .foldLeft(lit(model._1): Column)(_ + _))

  /** RMSE / MAE / R² in one aggregate pass. R² uses
    * 1 − Σe²/(var_pop(y)·n) — decomposable, engine-portable. */
  def evaluate(df: DataFrame, y: String, pred: String): DataFrame = {
    val e = col(y) - col(pred)
    df.agg(
      sqrt(avg(e * e)).as("rmse"),
      avg(abs(e)).as("mae"),
      (lit(1.0) - sum(e * e) / (var_pop(col(y)) * count(lit(1)))).as("r2"))
  }
}
