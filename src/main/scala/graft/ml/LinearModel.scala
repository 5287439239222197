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
