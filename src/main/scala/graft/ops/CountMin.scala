package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
  * Summary: The Count-Min Sketch and its Applications", J. Algorithms
  * 2005) as a mergeable typed [[Aggregator]] — the point-frequency
  * complement to the HLL (distinct count) and Misra–Gries (top items)
  * sketches already in the registry.
  *
  * State is a depth×width counter grid; each input increments one
  * bucket per row (independent seeded hashes). A point estimate is the
  * MIN over the rows' buckets: it never under-counts, and over-counts
  * by more than εn (ε = e/width) with probability ≤ e^−depth. Unlike
  * MG's lossy decrement, the merge is elementwise ADDITION — the sketch
  * is linear, so partition merge order cannot change the result and
  * sketch(A) + sketch(B) == sketch(A ∪ B) exactly. O(depth·width)
  * state regardless of key cardinality: per-key frequency estimates
  * over a 100 TB column for the cost of one map-side pass and a
  * (depth·width)-long reduce — no groupBy shuffle of the keys.
  */
object CountMin {

  /** Row-`row` bucket of `key` (seeded murmur3; deterministic across
    * JVMs and partitionings). */
  def bucket(key: String, row: Int, width: Int, seed: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key, seed + row), width)

  final class CmsAggregator(depth: Int, width: Int, seed: Int = 42)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth >= 1 && width >= 2, s"degenerate grid ${depth}x$width")

    def zero: Array[Long] = new Array[Long](depth * width)

    def reduce(b: Array[Long], a: String): Array[Long] = {
      if (a != null) {
        var r = 0
        while (r < depth) { b(r * width + bucket(a, r, width, seed)) += 1L; r += 1 }
      }
      b
    }

    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

    def finish(r: Array[Long]): Array[Long] = r

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** One distributed pass → the counter grid. */
  def sketch(df: DataFrame, colName: String, depth: Int = 4, width: Int = 1024,
      seed: Int = 42): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(colName).cast("string")).as[String]
      .select(new CmsAggregator(depth, width, seed).toColumn)
      .head()
  }

  /** Point estimate: min over the depth rows — never below the true
    * count. */
  def estimate(sk: Array[Long], key: String, depth: Int = 4, width: Int = 1024,
      seed: Int = 42): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = sk(r * width + bucket(key, r, width, seed))
      if (v < best) best = v
      r += 1
    }
    best
  }

  /** Verify the CMS contract on real data, the declared-query convention
    * for sketches (estimate-within-model, not byte-stability):
    *  - `underest`: keys whose estimate fell below the exact count —
    *    must be 0 (structural guarantee);
    *  - `over_bound`: keys overestimated by more than εn, ε = e/width —
    *    0 on this data (deterministic for a seeded sketch);
    *  - `merge_exact`: the sketch is linear, so sketching two disjoint
    *    halves (split by `splitOn`) and adding the grids must equal the
    *    whole-corpus grid bucket-for-bucket.
    * The exact per-key table this checks against is a groupBy collect —
    * bounded by the column's key cardinality (the check harness is for
    * low-cardinality columns; the sketch itself has no such limit). */
  def cmsCheck(df: DataFrame, colName: String, splitOn: Column,
      depth: Int = 4, width: Int = 1024, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val whole = sketch(df, colName, depth, width, seed)
    val a = sketch(df.filter(splitOn), colName, depth, width, seed)
    val b = sketch(df.filter(!splitOn), colName, depth, width, seed)
    val mergedEq = whole.indices.forall(i => whole(i) == a(i) + b(i))
    val exact = df.groupBy(col(colName).cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    val n = exact.map(_._2).sum
    val bound = (math.E / width * n).toLong + 1L
    val under = exact.count { case (k, c) => estimate(whole, k, depth, width, seed) < c }
    val over = exact.count { case (k, c) => estimate(whole, k, depth, width, seed) > c + bound }
    Seq((exact.length.toLong, under.toLong, over.toLong, if (mergedEq) 1L else 0L))
      .toDF("n_keys", "underest", "over_bound", "merge_exact")
  }
}
