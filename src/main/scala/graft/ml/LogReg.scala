package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-gradient-descent logistic regression as pure DataFrame
  * aggregates (cf. the reference's model-fit stage,
  * aws_infrastructure/airflow-setup.py's train task).
  *
  * Every iteration is ONE distributed aggregate producing a
  * (dim+1)-vector of gradient means — the only driver state is the
  * weight vector, so the fit scales with the cluster like any other
  * grouped aggregate. Deterministic: zero init, fixed step, fixed
  * iteration count, z-scored features.
  */
object LogReg {

  final case class Fit(weights: Seq[(String, Double)], intercept: Double,
      accuracy: Double, losses: Seq[Double])

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Fit P(label=1|x) with `iters` full-batch GD steps at rate `lr`. */
  def fit(df: DataFrame, labelCol: String, featureCols: Seq[String],
      iters: Int = 8, lr: Double = 1.0): Fit = {
    // z-score standardization so one global lr works (single pass)
    val statAgg = featureCols.flatMap(c =>
      Seq(avg(col(c)).as(s"mu_$c"), stddev_pop(col(c)).as(s"sd_$c")))
    val stats = df.agg(statAgg.head, statAgg.tail: _*).collect()(0)
    val scaled = featureCols.zipWithIndex.map { case (c, i) =>
      val sd = math.max(stats.getDouble(2 * i + 1), 1e-12)
      ((col(c) - stats.getDouble(2 * i)) / sd).as(s"x_$i")
    }
    val base = graft.Util.ensureParallelism(
      df.select((col(labelCol).cast("double").as("y") +: scaled): _*)).cache()
    try {
      var w = Array.fill(featureCols.size + 1)(0.0) // last = intercept
      val losses = Seq.newBuilder[Double]
      for (_ <- 0 until iters) {
        val margin = (0 until featureCols.size)
          .map(i => col(s"x_$i") * w(i)).foldLeft(lit(w.last): Column)(_ + _)
        val p = sigmoid(margin)
        val gradAgg = (0 until featureCols.size)
          .map(i => avg((p - col("y")) * col(s"x_$i")).as(s"g_$i")) ++ Seq(
            avg(p - col("y")).as("g_b"),
            // log-loss with clamping for numerical safety
            avg(-col("y") * log(greatest(p, lit(1e-12)))
              - (lit(1.0) - col("y")) * log(greatest(lit(1.0) - p, lit(1e-12))))
              .as("loss"))
        val g = base.agg(gradAgg.head, gradAgg.tail: _*).collect()(0)
        for (i <- w.indices) w(i) -= lr * g.getDouble(i)
        losses += g.getDouble(featureCols.size + 1)
      }
      val margin = (0 until featureCols.size)
        .map(i => col(s"x_$i") * w(i)).foldLeft(lit(w.last): Column)(_ + _)
      val acc = base.agg(avg(
        when((sigmoid(margin) >= 0.5) === (col("y") === 1.0), 1.0)
          .otherwise(0.0)).as("acc")).collect()(0).getDouble(0)
      Fit(featureCols.zip(w.take(featureCols.size)).map { case (c, v) => c -> v },
        w.last, acc, losses.result())
    } finally base.unpersist(blocking = false)
  }
}
