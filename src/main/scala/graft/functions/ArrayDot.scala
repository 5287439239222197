package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dot product over two numeric array columns.
  *
  * The higher-order `aggregate(zip_with(...))` formulation allocates
  * an intermediate array per row and evaluates lambdas interpreted —
  * ~100× slower on a 12M-pair similarity join. This expression is a
  * tight scalar loop inside whole-stage codegen. Accumulation order
  * is ascending-index sequential double adds — identical to DuckDB's
  * list_cosine_similarity on DOUBLE[], so oracle parity holds.
  *
  * Array elements must be non-null (dense embeddings). Mismatched
  * lengths throw (matching DuckDB's list_cosine_similarity, which
  * errors on mismatch) — silently truncating would return a
  * plausible-but-wrong score for malformed embeddings.
  */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"array_dot needs array<float|double> inputs, got " +
            s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
    }
  }

  private def get(a: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"array_dot: length mismatch ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, lt, i) * get(b, rt, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def elem(arr: String, t: DataType, i: String): String = t match {
      case FloatType => s"(double)$arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "array_dot: length mismatch " + $a.numElements() + " vs " + $b.numElements());
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${elem(a, elemType(left), i)} * ${elem(b, elemType(right), i)};
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column-level dot product. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(ArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
