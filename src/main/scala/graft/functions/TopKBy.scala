package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state top-k-per-group: keeps the k best (score, id) pairs —
  * score descending, id ascending on ties — as a sorted buffer of at
  * most k elements. The mergeable form of `row_number() <= k`: partials
  * combine map-side and the group shuffle carries k rows, instead of a
  * window sorting every row of every group on one task. Deterministic
  * (total order on (score, id)), so oracle-checkable.
  */
class TopKBy(k: Int)
    extends Aggregator[TopKBy.In, Array[TopKBy.In], Array[TopKBy.In]] {
  require(k >= 1, s"TopKBy needs k >= 1, got $k")

  private def beats(a: TopKBy.In, b: TopKBy.In): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Array[TopKBy.In] = Array.empty

  override def reduce(buf: Array[TopKBy.In], v: TopKBy.In): Array[TopKBy.In] = {
    if (buf.length == k && !beats(v, buf(k - 1))) buf
    else {
      var ins = buf.length
      while (ins > 0 && beats(v, buf(ins - 1))) ins -= 1
      val out = new Array[TopKBy.In](math.min(buf.length + 1, k))
      System.arraycopy(buf, 0, out, 0, ins)
      if (ins < out.length) {
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, out.length - ins - 1)
      }
      out
    }
  }

  override def merge(a: Array[TopKBy.In], b: Array[TopKBy.In]): Array[TopKBy.In] = {
    val out = new Array[TopKBy.In](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      val takeA = j >= b.length || (i < a.length && !beats(b(j), a(i)))
      if (takeA) { out(n) = a(i); i += 1 } else { out(n) = b(j); j += 1 }
      n += 1
    }
    out
  }

  override def finish(buf: Array[TopKBy.In]): Array[TopKBy.In] = buf

  override def bufferEncoder: Encoder[Array[TopKBy.In]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[TopKBy.In]]()

  override def outputEncoder: Encoder[Array[TopKBy.In]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[TopKBy.In]]()
}

object TopKBy {
  final case class In(score: Double, id: Long)
}
