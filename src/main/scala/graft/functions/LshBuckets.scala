package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All L random-hyperplane LSH bucket ids of one embedding in ONE
  * pass — `array[t] = Σ_p (⟨vec, signs(t,p)⟩ > 0) << p`.
  *
  * The composable formulation (16 structs × 4 `CASE WHEN arraydot >
  * 0` over 64-double `typedlit` sign vectors, exploded) builds a
  * generator expression with 4096 literal doubles; at that size the
  * whole-stage codegen unit blows past JVM limits and the entire
  * posting stage falls back to interpreted evaluation — measured
  * 8.6 s single-task at sf1, and 70× worse CPU after a repartition
  * (round-12 probe). This expression computes the identical bucket
  * ids — the sign bits come from the same Knuth multiplicative hash
  * as [[graft.similarity.Similarity.planeSigns]], so the DuckDB
  * oracle's literal replay still matches bit-for-bit — in a tight
  * generated loop with zero plan literals.
  */
case class LshBuckets(child: Expression, nPlanes: Int, nTables: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      if (nPlanes < 1 || nPlanes > 62)
        TypeCheckResult.TypeCheckFailure(s"nPlanes out of range: $nPlanes")
      else if (nTables < 1)
        TypeCheckResult.TypeCheckFailure(s"nTables out of range: $nTables")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets needs array<float|double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    LshUtil.buckets(v.asInstanceOf[ArrayData], isFloat, nPlanes, nTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshUtil.buckets($c, $isFloat, $nPlanes, $nTables)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshUtil {
  /** Same sign stream as Similarity.planeSigns: +v when the hashed
    * bit is 0, −v when 1. */
  def buckets(a: ArrayData, isFloat: Boolean,
      nPlanes: Int, nTables: Int): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val base = (t * 1009 + p) * 4096
        var dot = 0.0
        var i = 0
        while (i < n) {
          val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          val h = ((base + i).toLong * 2654435761L) & 0xFFFFFFFFL
          dot += (if (((h >> 16) & 1L) == 0L) v else -v)
          i += 1
        }
        if (dot > 0) bucket += (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

object LshBuckets {
  def of(vec: Column, nPlanes: Int, nTables: Int): Column =
    GraftColumnBridge.column(LshBuckets(
      GraftColumnBridge.expression(vec), nPlanes, nTables))
}
