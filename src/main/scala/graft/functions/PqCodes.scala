package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoding in ONE codegen'd pass: the m
  * argmin-L2 sub-codebook indices of an embedding, as array<int>.
  *
  * The composable formulation ([[graft.similarity.Pq.codeExpr]]:
  * `array_position(array_min(transform(typedlit(codebook), ...)))`
  * per subspace) embeds m×k×(d/m) literal doubles in the plan and
  * evaluates the nested HOFs interpreted — the same codegen-fallback
  * trap as the LSH/IVF literal formulations ([[LshBuckets]],
  * [[NearestCells]]), measured at ~1 ms/vector. Here the codebooks
  * ride along as a codegen reference object; the arithmetic
  * (ascending-index sequential (x−c)² accumulation, strict `<` so
  * ties keep the LOWEST centroid index — array_position's
  * first-minimum rule) is bit-identical to the HOF form, which the
  * equivalence spec pins on real data. */
case class PqCodes(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes needs array<float|double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    PqUtil.encode(v.asInstanceOf[ArrayData], isFloat, matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("books", matrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqUtil.encode($c, $isFloat, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqUtil {
  /** Argmin-L2 code per subspace; strict `<` keeps the first (lowest)
    * centroid on ties, matching the HOF form's array_position rule.
    * Distance terms accumulate in ascending dimension order — the
    * same sequential order as the HOF `aggregate` over `sequence`. */
  def encode(a: ArrayData, isFloat: Boolean,
      books: Array[Array[Array[Double]]]): ArrayData = {
    val m = books.length
    val sub = books(0)(0).length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = books(s)
      val base = s * sub
      var best = 0
      var bd = Double.PositiveInfinity
      var j = 0
      while (j < cb.length) {
        val ct = cb(j)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = (if (isFloat) a.getFloat(base + i).toDouble
            else a.getDouble(base + i)) - ct(i)
          d += x * x
          i += 1
        }
        if (d < bd) { bd = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }
}

object PqCodes {
  def of(vec: Column, books: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(PqCodes(
      GraftColumnBridge.expression(vec), books))
}
