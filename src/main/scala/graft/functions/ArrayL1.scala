package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd L1 distance (sum of |a_i − b_i|) over two int array
  * columns — the bag-distance bound for edit-distance prefilters:
  * every edit operation moves a character histogram's L1 by at most
  * 2, so edit(a, b) ≥ L1(hist_a, hist_b) / 2 and pairs above the
  * bound skip the DP entirely.
  *
  * Same rationale as [[ArrayDot]]: the higher-order
  * `aggregate(zip_with(abs))` formulation evaluates interpreted
  * lambdas with boxing per element (~100 µs/pair measured on the
  * dedup_edit candidate stream — it TRIPLED the query instead of
  * halving it); this is a tight scalar loop inside whole-stage
  * codegen. Array elements must be non-null; mismatched lengths
  * throw (a histogram pair of different widths is caller error, and
  * a silent min-length walk would under-count the distance — a
  * WRONG-direction error for a lower bound).
  */
case class ArrayL1(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_l1 needs array<int> inputs, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"array_l1: length mismatch ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.abs(a.getInt(i).toLong - b.getInt(i).toLong); i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "array_l1: length mismatch " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $diff = (long)$a.getInt($i) - (long)$b.getInt($i);
         |  $acc += ($diff < 0) ? -$diff : $diff;
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayL1 {
  /** Column-level L1 distance over two int arrays. */
  def of(a: Column, b: Column): Column =
    GraftColumnBridge.column(ArrayL1(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
