package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable bounded max-heap buffer for [[TopKAggregator]]: two primitive
  * arrays ordered as a binary heap on (dist desc, id desc), so the root
  * is the WORST retained candidate and a better row replaces it in
  * O(log k) with zero allocation. Positional state serializes as-is
  * through the expression encoder (primitive arrays + an int), so heap
  * shape survives the partial-aggregation shuffle. */
final case class TopKBuf(var ids: Array[Long], var dists: Array[Double], var size: Int) {

  // (a) worse than (b) in retention order = greater by (dist, id)
  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(dists(l), ids(l), dists(m), ids(m))) m = l
      if (r < size && worse(dists(r), ids(r), dists(m), ids(m))) m = r
      if (m == i) return
      val td = dists(i); dists(i) = dists(m); dists(m) = td
      val ti = ids(i); ids(i) = ids(m); ids(m) = ti
      i = m
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (!worse(dists(i), ids(i), dists(p), ids(p))) return
      val td = dists(i); dists(i) = dists(p); dists(p) = td
      val ti = ids(i); ids(i) = ids(p); ids(p) = ti
      i = p
    }
  }

  /** Offer one candidate; keeps the best k by (dist asc, id asc). */
  def offer(id: Long, dist: Double, k: Int): Unit = {
    if (ids.length == 0) { ids = new Array[Long](k); dists = new Array[Double](k) }
    if (size < k) {
      ids(size) = id; dists(size) = dist; size += 1
      siftUp(size - 1)
    } else if (worse(dists(0), ids(0), dist, id)) {
      ids(0) = id; dists(0) = dist
      siftDown(0)
    }
  }

  def sorted: Array[(Long, Double)] = {
    val out = new Array[(Long, Double)](size)
    var i = 0
    while (i < size) { out(i) = (ids(i), dists(i)); i += 1 }
    out.sortBy { case (id, dist) => (dist, id) }
  }
}

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
  * Buffer: a mutable bounded heap ([[TopKBuf]]) — O(log k), allocation-
  * free per input row in the innermost loop of the join. */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), TopKBuf, Array[(Long, Double)]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: TopKBuf = TopKBuf(Array.emptyLongArray, Array.emptyDoubleArray, 0)

  override def reduce(buf: TopKBuf, row: (Long, Double)): TopKBuf = {
    buf.offer(row._1, row._2, k)
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.size) { a.offer(b.ids(i), b.dists(i), k); i += 1 }
    a
  }

  override def finish(buf: TopKBuf): Array[(Long, Double)] = buf.sorted

  override def bufferEncoder: Encoder[TopKBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TopKBuf]()

  override def outputEncoder: Encoder[Array[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Double)]]()
}
