package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed [[Aggregator]]: each partition keeps at
  * most k (value, id) pairs, partials merge by re-truncating — the
  * aggregate state is O(k) regardless of group size.
  *
  * This is the scale path for "top N per group": the window form
  * (`row_number().over(partitionBy(g).orderBy(v))`) must SORT every
  * group's full row set; this aggregator reduces each group map-side
  * to k tuples before the shuffle, so a 100 TB group contributes k
  * rows to the exchange, not all of them. Ordering is total (value
  * desc, then id asc), so results are deterministic and match
  * `row_number` with the same ORDER BY.
  */
class TopKAgg[I](k: Int, f: I => (Double, Long))
    extends Aggregator[I, TopKAgg.Buf, TopKAgg.Buf] with Serializable {
  require(k > 0)

  import TopKAgg.Buf

  /** value desc, id asc — matches ORDER BY v DESC, id ASC. */
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def zero: Buf = Buf(Nil)

  def reduce(b: Buf, in: I): Buf = {
    val t = f(in)
    // fast path: buffer full and the new tuple can't displace the tail
    if (b.items.lengthCompare(k) >= 0 && lt(b.items.last, t)) b
    else Buf((t +: b.items).sortWith(lt).take(k))
  }

  def merge(a: Buf, b: Buf): Buf =
    Buf((a.items ++ b.items).sortWith(lt).take(k))

  def finish(r: Buf): Buf = r

  def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
}

object TopKAgg {
  /** Concrete product buffer so tungsten derives a columnar encoder
    * (`items` surfaces as array<struct<_1,_2>> — explodable). */
  final case class Buf(items: Seq[(Double, Long)])
}
