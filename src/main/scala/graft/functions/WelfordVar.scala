package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass numerically stable sample variance (Welford update,
  * Chan et al. parallel merge) as a typed [[Aggregator]].
  *
  * Demonstrates the typed Dataset aggregation surface: use with
  * `groupByKey(...).agg(new WelfordVar(f).toColumn)` on a
  * `Dataset[I]`, or register for SQL via
  * `spark.udf.register("welford_var", functions.udaf(WelfordVar.ofDouble))`.
  * The merge step is associative over partition partials, so the
  * aggregate is partial-mergeable exactly like the built-ins.
  */
class WelfordVar[I](f: I => Double) extends Aggregator[I, (Long, Double, Double), Double]
    with Serializable {

  def zero: (Long, Double, Double) = (0L, 0.0, 0.0)

  def reduce(b: (Long, Double, Double), in: I): (Long, Double, Double) = {
    val x = f(in)
    val n = b._1 + 1
    val delta = x - b._2
    val mean = b._2 + delta / n
    (n, mean, b._3 + delta * (x - mean))
  }

  def merge(a: (Long, Double, Double), b: (Long, Double, Double)): (Long, Double, Double) = {
    if (a._1 == 0) b
    else if (b._1 == 0) a
    else {
      val n = a._1 + b._1
      val delta = b._2 - a._2
      val mean = a._2 + delta * b._1 / n
      (n, mean, a._3 + b._3 + delta * delta * a._1 * b._1 / n)
    }
  }

  def finish(r: (Long, Double, Double)): Double =
    if (r._1 < 2) Double.NaN else r._3 / (r._1 - 1)

  def bufferEncoder: Encoder[(Long, Double, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WelfordVar {
  /** Instance over a plain double column — what `functions.udaf`
    * wants for SQL registration. */
  val ofDouble: WelfordVar[Double] = new WelfordVar[Double](identity)
}
