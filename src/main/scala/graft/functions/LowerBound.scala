package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd lower-bound over a SORTED double array: the number of
  * elements strictly less than `value` — equivalently the range
  * bucket id for quantile boundaries.
  *
  * The higher-order `size(filter(bounds, b => b < v))` formulation
  * evaluates an interpreted lambda per element per row — it was the
  * single hottest expression in the exact-percentile family's
  * profile (≈2 s CPU per pass over a 500k-value histogram at sf0.1,
  * evaluated once per consumer of the bucketed frame). This is a
  * branch-light binary search inside whole-stage codegen: O(log n)
  * with no per-row allocation.
  *
  * The array must be non-decreasing (quantile boundaries are); with
  * duplicated boundary values every equal input still maps to the
  * same bucket, which is all the rank machinery needs.
  */
case class LowerBound(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lower_bound needs (array<double>, double), got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val v = r.asInstanceOf[Double]
    var lo = 0
    var hi = a.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a.getDouble(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $a.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($a.getDouble($mid) < $v) $lo = $mid + 1; else $hi = $mid;
         |}
         |${ev.value} = $lo;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LowerBound {
  /** Count of sorted-array elements strictly below `v`. */
  def apply(bounds: Column, v: Column): Column =
    GraftColumnBridge.column(LowerBound(
      GraftColumnBridge.expression(bounds), GraftColumnBridge.expression(v)))
}
