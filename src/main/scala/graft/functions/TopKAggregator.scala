package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Exact top-k (score DESC, id ASC) as a typed [[Aggregator]] with a bounded
 * buffer: each partition keeps at most k candidates and partials merge in
 * O(k) — per-group top-k without sorting each group's full row set, the
 * shuffle carries k rows per (group, partition) instead of every row. This is
 * the aggregation-based alternative to `row_number().over(Window)` for
 * "top-k per group" at 100 TB (a window sorts every group in full).
 *
 * Deterministic: ties on score break toward the smaller id, matching the
 * declared (score DESC, id ASC) ordering the DuckDB oracle uses.
 */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[Long]] {

  // (score, id) ordering: better = higher score, then lower id.
  private def better(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(buf: Seq[(Long, Long)]): Seq[(Long, Long)] =
    buf.sortWith(better).take(k)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], row: (Long, Long)): Seq[(Long, Long)] = {
    val scored = (row._2, row._1) // input is (id, score) -> keep as (score, id)
    if (buf.length < k) trim(buf :+ scored)
    else if (better(scored, buf.last)) trim(buf :+ scored)
    else buf
  }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    trim(a ++ b)

  /** Ids of the top-k rows, in (score DESC, id ASC) order. */
  override def finish(buf: Seq[(Long, Long)]): Seq[Long] = trim(buf).map(_._2)

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
