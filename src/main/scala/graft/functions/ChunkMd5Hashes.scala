package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The 60-bit md5 prefix of every n-token chunk of a document, in one
  * pass over the raw UTF-8 bytes — bit-for-bit the value of
  *
  *   conv(substring(md5(concat_ws(" ",
  *     slice(split(lower(text), " "), i, n))), 1, 15), 16, 10)
  *
  * for i in 1..tokens-n+1, so a DuckDB oracle replays it with its own
  * `md5()`. Unlike [[ShingleHashes]] (FNV, not oracle-replayable),
  * the hash here must stay md5 — the win is evaluation shape, not the
  * function: the composable form allocates the token array, an
  * n-element slice, and a joined string per position inside an
  * interpreted higher-order lambda; this expression digests the
  * original byte span directly (joining consecutive single-space
  * split elements with a single space reproduces the source bytes),
  * allocation-free per chunk and inside whole-stage codegen.
  *
  * Split semantics match `split(text, " ")` exactly: elements are the
  * runs between single 0x20 bytes, consecutive spaces yield empty
  * elements, trailing empties are kept. Fewer than n elements →
  * empty array.
  */
case class ChunkMd5Hashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"chunk_md5_hashes needs a string input, got ${child.dataType.simpleString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"chunk width must be >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(s: Any): Any =
    ChunkMd5Util.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ChunkMd5Util.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkMd5Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String, n: Int): ArrayData = {
    // lower() first, exactly like the composable form — digests run
    // over the lowercased bytes
    val bytes = s.toLowerCase.getBytes
    // element start offsets under single-space split semantics:
    // starts(i) = first byte of element i; element i ends at
    // starts(i+1) - 2 (the byte before its trailing space), or at
    // bytes.length - 1 for the last element
    var starts = new Array[Int](16)
    starts(0) = 0
    var m = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') {
        if (m == starts.length)
          starts = java.util.Arrays.copyOf(starts, m * 2)
        starts(m) = i + 1; m += 1
      }
      i += 1
    }
    val k = math.max(m - n + 1, 0)
    val out = new Array[Long](k)
    val digest = md.get()
    var w = 0
    while (w < k) {
      val from = starts(w)
      // end of element w+n-1 (exclusive): one byte before the start
      // of element w+n, or end-of-string for the final element
      val until = if (w + n < m) starts(w + n) - 1 else bytes.length
      digest.reset()
      digest.update(bytes, from, until - from)
      val d = digest.digest()
      // first 15 hex chars of the digest = the big-endian top 8
      // bytes' 64-bit value with the low nibble dropped
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(w) = v >>> 4
      w += 1
    }
    ArrayData.toArrayData(out)
  }
}

object ChunkMd5Hashes {
  /** Column-level chunk md5 prefixes. */
  def of(text: Column, n: Int): Column =
    GraftColumnBridge.column(ChunkMd5Hashes(
      GraftColumnBridge.expression(text), n))
}
