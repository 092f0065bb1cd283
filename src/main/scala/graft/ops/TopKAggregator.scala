package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k accumulator for per-group k-NN (SURVEY §7.4's
  * `Aggregator[Row, BoundedPQ, Seq[...]]` option).
  *
  * The window/`row_number` form of per-query top-k shuffles the full
  * |corpus|×|Q| candidate set before sorting each group; this Aggregator
  * partially aggregates map-side (ObjectHashAggregate), so each
  * partition contributes at most k rows per query to the shuffle —
  * shuffle volume drops from |corpus|×|Q| to |partitions|×|Q|×k, the
  * difference between a scalable and a doomed plan at 100 TB.
  *
  * Buffer: an array kept ≤ 2k and trimmed to k on overflow/merge
  * (amortized O(log k) per row via sort-on-trim), ordered by
  * (dist asc, id asc) — the engine's deterministic tie-break.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {
  require(k > 0, s"k must be positive, got $k")

  private def ord: Ordering[(Long, Double)] =
    Ordering.by { case (id, dist) => (dist, id) }

  private def trim(buf: Array[(Long, Double)]): Array[(Long, Double)] =
    if (buf.length <= k) buf else buf.sorted(ord).take(k)

  override def zero: Array[(Long, Double)] = Array.empty

  override def reduce(buf: Array[(Long, Double)], row: (Long, Double)): Array[(Long, Double)] = {
    val appended = buf :+ row
    if (appended.length >= 2 * k) trim(appended) else appended
  }

  override def merge(a: Array[(Long, Double)], b: Array[(Long, Double)]): Array[(Long, Double)] =
    trim(a ++ b)

  override def finish(buf: Array[(Long, Double)]): Array[(Long, Double)] =
    trim(buf).sorted(ord)

  override def bufferEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()

  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
}
