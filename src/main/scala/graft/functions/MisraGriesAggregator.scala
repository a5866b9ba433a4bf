package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Misra–Gries heavy-hitters sketch as a typed [[Aggregator]]: at most `k`
 * counters per partial, merged associatively — frequent-token detection
 * with NO token-keyed shuffle at all (each partition reduces to a k-entry
 * map; partials merge pairwise). This is the bounded-memory alternative to
 * `groupBy(token).count()` when the vocabulary is unbounded at 100 TB and
 * only the head matters.
 *
 * Guarantees (the verdict the x-gate checks, order-independent even though
 * the sketch CONTENT is arrival-order-dependent):
 *  - every token with true count > n/(k+1) is present in the sketch;
 *  - counts are underestimates with error ≤ n/(k+1), where n is the total
 *    stream length (Misra & Gries 1982; merge bound per Agarwal et al.,
 *    "Mergeable Summaries", PODS 2012: subtracting the (k+1)-th largest
 *    count on overflow preserves the error bound).
 */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "sketch size must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1)
      case None if buf.size < k => buf.updated(tok, 1L)
      case None =>
        // full + miss: decrement all k counters and drop the incoming —
        // removes k+1 mass total, which is what bounds decrement events
        // (and hence the per-token underestimate) by n/(k+1)
        buf.iterator
          .map { case (t, c) => t -> (c - 1) }
          .filter(_._2 > 0)
          .toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // keep the k largest by subtracting the (k+1)-th largest count from
      // every counter (zeros drop) — the mergeable-summaries reduction
      val cut = summed.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.iterator
        .map { case (t, c) => t -> (c - cut) }
        .filter(_._2 > 0)
        .toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
