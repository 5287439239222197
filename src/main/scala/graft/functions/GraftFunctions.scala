package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the library's custom Catalyst expressions, so
  * `spark.sql("... array_dot(a, b) ...")` works alongside the Column
  * API. Session-local via [[GraftFunctions.registerAll]], or
  * cluster-wide via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "array_dot" -> (es => ArrayDot(es(0), es(1))),
    "array_l1" -> (es => ArrayL1(es(0), es(1))),
    "shingle_hashes" -> (es => ShingleHashes(es(0),
      es(1).eval().asInstanceOf[Number].intValue)),
    "jaro_winkler" -> (es => JaroWinkler(es(0), es(1))))

  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  /** Session-local install of the keyless-range-join rewrite
    * ([[graft.plans.RangeJoinRule]]) for sessions built without
    * `spark.sql.extensions`, setting the OPT-IN bin width the rule
    * requires. `binWidth` is deliberately NOT defaulted: the rule
    * rewrites every keyless BETWEEN join in the session, and a width
    * far below the typical interval length explodes each interval
    * into interval/width bin rows (a one-day epoch-millis interval at
    * width 16 is ~5.4M rows). Pick it near the typical interval
    * length in the column's own units. Idempotent. */
  def installRangeJoin(spark: SparkSession, binWidth: Long): Unit = {
    require(binWidth > 0)
    spark.conf.set("spark.graft.rangeJoin.binWidth", binWidth.toString)
    val rules = spark.experimental.extraOptimizations
    if (!rules.contains(graft.plans.RangeJoinRule))
      spark.experimental.extraOptimizations =
        rules :+ graft.plans.RangeJoinRule
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[ArrayDot].getName, name), builder))
    }
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    // OPTIMIZE / VACUUM / DESCRIBE HISTORY statement sugar over the
    // CALL maintenance procedures (see TxMaintenanceParser)
    e.injectParser((_, delegate) =>
      new graft.sources.TxMaintenanceParser(delegate))
  }
}
