package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization of one word in ONE codegen'd pass:
  * the merge table rides along as a codegen reference object (the
  * [[PqCodes]]/[[LshBuckets]] discipline — a `transform`/`aggregate`
  * HOF formulation with the merges as literals would fall out of
  * whole-stage codegen and interpret R passes of array churn per row).
  *
  * Semantics are the standard rank-loop greedy (Sennrich 2016 /
  * GPT-2 encoder shape): start from single characters, then for each
  * merge rank in order replace every adjacent (a, b) occurrence with
  * the concatenated token, scanning left to right without overlap.
  * The table is constrained to a != b at construction: self-pair
  * occurrences can overlap (in "aaa", (a,a) at 0 and 1 share a
  * token), which makes pairing order-dependent — with a != b every
  * occurrence is disjoint, so "merge all, left to right" is the ONLY
  * greedy outcome and the SQL oracle's string-replace replay is
  * provably identical (see graft.text.Bpe for the replay argument).
  *
  * Input is expected to be one word (no separator handling); the
  * caller splits text into words first — BPE is per-word by
  * construction in every production tokenizer (the regex pre-split),
  * which is also what keeps the vocabulary join small at 100 TB.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  require(merges.forall { case (a, b) => a != b },
    "bpe_encode: self-pair merges (a == b) are excluded — overlapping " +
      "occurrences make greedy pairing order-dependent")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"bpe_encode needs a string input, got ${child.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  // parallel arrays: the tight loop compares interned Strings by
  // equals(); the concatenated replacement is precomputed per rank
  @transient private lazy val table: Array[Array[String]] = Array(
    merges.map(_._1).toArray,
    merges.map(_._2).toArray,
    merges.map { case (a, b) => a + b }.toArray)

  override def nullSafeEval(s: Any): Any =
    BpeUtil.encode(s.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("merges", table, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeUtil.encode($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeUtil {
  /** Rank-loop greedy merge. `table` = [lefts, rights, concats]. */
  def encode(w: UTF8String, table: Array[Array[String]]): ArrayData = {
    val s = w.toString
    // initial tokens: one per Unicode code point
    var toks = new Array[String](s.length)
    var len = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      toks(len) = s.substring(i, i + n)
      len += 1
      i += n
    }
    val lefts = table(0); val rights = table(1); val concats = table(2)
    var r = 0
    while (r < lefts.length && len > 1) {
      val a = lefts(r); val b = rights(r); val c = concats(r)
      var in = 0
      var out = 0
      while (in < len) {
        if (in + 1 < len && toks(in) == a && toks(in + 1) == b) {
          toks(out) = c; in += 2
        } else {
          toks(out) = toks(in); in += 1
        }
        out += 1
      }
      len = out
      r += 1
    }
    val res = new Array[AnyRef](len)
    i = 0
    while (i < len) { res(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(res)
  }
}

object BpeEncode {
  /** Column-level BPE tokens of one word under a fixed merge table. */
  def of(word: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(BpeEncode(
      GraftColumnBridge.expression(word), merges))
}
