package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The `nprobe` nearest k-means cells of an embedding by cosine, as
  * an array<int> ordered best-first (ties → lower cell id) — the IVF
  * quantizer's routing step in ONE codegen'd pass.
  *
  * The composable formulation (`array_min`/`array_sort` over k
  * structs of `-cosine(vec, typedlit(centroid))`) embeds k×dim
  * literal doubles in the plan; like the LSH posting literals
  * ([[LshBuckets]]) that blows the codegen unit at k·dim ≈ 1024 and
  * the whole assignment stage drops to interpreted evaluation
  * (dedup_embed's sf1 probe: 126 CPU-s for 320k cosines). Here the
  * centroid matrix rides along as a codegen reference object; the
  * arithmetic (sequential index-order dot/norm accumulation,
  * `d/sqrt(na·nb)`, NaN ordered greatest, ties to the lower cell) is
  * bit-identical to the struct-min formulation, so the DuckDB
  * oracles' literal replays still match exactly. */
case class NearestCells(child: Expression, cents: Seq[Seq[Double]],
    nprobe: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      if (nprobe < 1 || nprobe > cents.length)
        TypeCheckResult.TypeCheckFailure(
          s"nprobe $nprobe out of range for ${cents.length} cells")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells needs array<float|double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val matrix: Array[Array[Double]] =
    cents.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    KMeansUtil.nearest(v.asInstanceOf[ArrayData], isFloat, matrix, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KMeansUtil.nearest($c, $isFloat, $ref, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KMeansUtil {
  /** Best-first `nprobe` cells by (-cos, cell) ascending; arithmetic
    * mirrors ArrayDot (ascending-index sequential accumulation) and
    * Spark's double ordering (NaN greatest). */
  def nearest(a: ArrayData, isFloat: Boolean,
      cents: Array[Array[Double]], nprobe: Int): ArrayData = {
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    var na = 0.0
    while (i < n) {
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      na += v(i) * v(i)
      i += 1
    }
    val k = cents.length
    val neg = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ct = cents(c)
      var d = 0.0
      var nb = 0.0
      i = 0
      while (i < n) { d += v(i) * ct(i); i += 1 }
      i = 0
      while (i < ct.length) { nb += ct(i) * ct(i); i += 1 }
      neg(c) = -(d / math.sqrt(na * nb))
      c += 1
    }
    // selection of nprobe smallest by (neg, cell) — k is small
    val out = new Array[Int](nprobe)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var best = -1
      c = 0
      while (c < k) {
        if (!used(c) &&
          (best < 0 || java.lang.Double.compare(neg(c), neg(best)) < 0))
          best = c
        c += 1
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }
}

object NearestCells {
  def of(vec: Column, cents: Seq[Seq[Double]], nprobe: Int): Column =
    GraftColumnBridge.column(NearestCells(
      GraftColumnBridge.expression(vec), cents, nprobe))
}
