package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle hashes in ONE pass over the string.
  *
  * The composable formulation (split → n slices → n-1 zip_with →
  * explode → xxhash64) materializes the token array plus n shifted
  * slices plus every intermediate joined string per row; this
  * expression tokenizes the UTF-8 bytes in place, FNV-hashes each
  * token, and mixes each n-window into one 64-bit key — no
  * intermediate strings or arrays, a single tight loop inside
  * whole-stage codegen.
  *
  * Tokens are maximal ASCII-whitespace-free runs (equivalent to
  * `split(trim(x), "\\s+")` for non-empty input; multi-byte UTF-8
  * units never collide with ASCII whitespace bytes). Fewer than n
  * tokens → empty array. Distinct-hash counts are interchangeable
  * with distinct-shingle counts (collision odds ~n²/2⁶⁵).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes needs a string input, got ${child.dataType.simpleString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"shingle width must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    ShingleUtil.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Plain object (no companion class) so the generated Java calls the
  * static forwarder directly. */
object ShingleUtil {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Golden = 0x9e3779b97f4a7c15L

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0b

  /** splitmix64 finalizer — spreads the polynomial window mix. */
  private def mix(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 30); z *= 0xbf58476d1ce4e5b9L
    z ^= (z >>> 27); z *= 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // 1) FNV-1a hash per whitespace-delimited token, in place
    var tokenHashes = new Array[Long](math.max(8, bytes.length / 4))
    var m = 0
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        var h = FnvOffset
        while (i < bytes.length && !isWs(bytes(i))) {
          h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1
        }
        if (m == tokenHashes.length)
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, m * 2)
        tokenHashes(m) = h; m += 1
      }
    }
    // 2) polynomial mix over each n-token window
    val k = math.max(m - n + 1, 0)
    val out = new Array[Long](k)
    var w = 0
    while (w < k) {
      var acc = FnvOffset
      var j = 0
      while (j < n) { acc = acc * Golden + tokenHashes(w + j); j += 1 }
      out(w) = mix(acc)
      w += 1
    }
    ArrayData.toArrayData(out)
  }
}

object ShingleHashes {
  /** Column-level shingle hashes. */
  def of(text: Column, n: Int): Column =
    GraftColumnBridge.column(ShingleHashes(
      GraftColumnBridge.expression(text), n))
}
