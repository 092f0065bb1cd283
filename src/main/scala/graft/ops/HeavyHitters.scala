package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Misra–Gries frequent-items summary as a typed [[Aggregator]] — the
  * classic MERGEABLE heavy-hitters sketch (Misra & Gries 1982; merge
  * rule from Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * Guarantee: with capacity `c`, every item whose true frequency
  * exceeds n/(c+1) is present in the summary, and each reported count
  * under-estimates the true count by at most n/(c+1). The summary is
  * O(c) memory per partition, merges associatively (add counters, then
  * decrement all by the (c+1)-th largest and drop non-positive), and
  * never touches the driver until the final ≤c-entry map — the shape
  * that finds hot keys in a 100 TB column without a full groupBy.
  *
  * WHICH low-frequency items survive alongside the guaranteed ones
  * depends on partition merge order (nondeterministic under Spark
  * scheduling), so consumers must treat the summary as a CANDIDATE set:
  * the deterministic contract is containment of the true heavy hitters,
  * which [[heavyHitterCheck]] verifies against exact counts — the
  * declared-query convention for sketches (estimate-within-model, not
  * byte-stability).
  */
object HeavyHitters {

  final class MgAggregator(capacity: Int)
      extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
    require(capacity >= 1, s"capacity must be positive, got $capacity")

    def zero: mutable.Map[String, Long] = mutable.Map.empty

    private def shrink(m: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      if (m.size <= capacity) return m
      // decrement every counter by the (capacity+1)-th largest count and
      // drop non-positive — the standard batched MG decrement
      val counts = m.values.toArray.sorted(Ordering[Long].reverse)
      val dec = counts(capacity)
      val out = mutable.Map.empty[String, Long]
      m.foreach { case (k, v) => if (v - dec > 0) out(k) = v - dec }
      out
    }

    def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
      if (a != null) {
        b(a) = b.getOrElse(a, 0L) + 1L
        if (b.size > capacity) return shrink(b)
      }
      b
    }

    def merge(x: mutable.Map[String, Long], y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      y.foreach { case (k, v) => x(k) = x.getOrElse(k, 0L) + v }
      shrink(x)
    }

    def finish(r: mutable.Map[String, Long]): Map[String, Long] = r.toMap

    def bufferEncoder: Encoder[mutable.Map[String, Long]] =
      Encoders.kryo[mutable.Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** The ≤`capacity`-entry candidate summary of `colName`. */
  def summarize(df: DataFrame, colName: String, capacity: Int): Map[String, Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(colName).cast("string")).as[String]
      .select(new MgAggregator(capacity).toColumn)
      .head()
  }

  /** Verify the MG guarantee on real data: every item with exact
    * frequency > n/(capacity+1) must appear in the summary. Returns
    * (n_rows, n_hitters, all_found-flag) — n_rows and n_hitters are
    * exact (oracle-computable); the flag is the sketch contract. */
  def heavyHitterCheck(df: DataFrame, colName: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    val summary = summarize(df, colName, capacity)
    val n = df.count()
    val threshold = n / (capacity + 1)
    val exact = df.groupBy(col(colName)).agg(count(lit(1)).as("c"))
      .filter(col("c") > threshold)
    val hitters = exact.collect().map(r => r.getString(0) -> r.getLong(1))
    val allFound = hitters.forall { case (k, _) => summary.contains(k) }
    import spark.implicits._
    Seq((n, hitters.length.toLong, if (allFound) 1L else 0L))
      .toDF("n_rows", "n_hitters", "all_found")
  }
}
