package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch as a mergeable `Aggregator`: the
  * buffer is a counter map capped at k entries — bounded state,
  * partial-aggregated map-side and merged associatively (Agarwal et al.,
  * "Mergeable Summaries", PODS'12), so a 1000-executor pass shuffles k
  * counters per partition instead of the full vocabulary.
  *
  * Guarantee (preserved by the merge): every item with true frequency
  * > N/(k+1) appears in the final candidate set. Estimated counts
  * undercount by at most N/(k+1), so candidates are a SUPERSET of the
  * true heavy hitters — callers re-count candidates exactly in a second
  * pass and filter on the exact counts (q136), which makes the final
  * result deterministic even though the candidate set itself depends on
  * merge order.
  *
  * The two-pass shape is the 100 TB play: pass 1 is a full scan with
  * O(k) state per task; pass 2 re-scans but aggregates only rows whose
  * key survives a broadcast semi-join against the <=k candidates — no
  * full-vocabulary shuffle ever happens.
  */
class FrequentItems(k: Int)
    extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k >= 1, s"FrequentItems needs k >= 1, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    buf.get(v) match {
      case Some(c) => buf.updated(v, c + 1)
      case None if buf.size < k => buf.updated(v, 1L)
      case None =>
        // classic MG step: decrement every counter, drop zeros — O(k),
        // amortized O(1) per arriving item
        buf.flatMap { case (i, c) => if (c > 1) Some(i -> (c - 1)) else None }
    }

  override def merge(
      a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest count from everything, keep positives
      // — the mergeable-summaries offset step (error adds, stays <= N/(k+1))
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      combined.flatMap { case (i, c) =>
        if (c > cut) Some(i -> (c - cut)) else None
      }
    }
  }

  /** Sorted for a deterministic column value; counts are estimates by
    * construction, so only the items surface.
    */
  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keysIterator.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Array[String]] =
    ExpressionEncoder[Array[String]]()
}

object FrequentItems {
  /** Column-level entry point: frequentItems(128)(tokenCol). */
  def apply(k: Int): Column => Column = c => udaf(new FrequentItems(k)).apply(c)
}
