package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based aggregates for 100 TB-scale profiling, wrapping Spark's
  * built-in mergeable sketches (both are partial-aggregating: fixed-size
  * per-partition state merged at the reducer — the only shape that works
  * when exact distinct/quantile state would not fit).
  *
  *  - cardinality: HyperLogLog++ (`approx_count_distinct`, tunable rsd)
  *  - quantiles:   a Greenwald-Khanna variant (`percentile_approx`)
  *
  * Error bounds are pinned by tests against exact answers on fixtures.
  */
object Sketches {

  /** Approximate distinct count; `rsd` = target relative standard
    * deviation (default 5%, smaller → bigger sketch). */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Approximate quantiles at `probs`; `accuracy` trades memory for
    * error (err ≤ 1/accuracy of the rank). */
  def approxQuantiles(c: Column, probs: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c,
      array(probs.map(lit): _*),
      lit(accuracy))

  /** Per-group profile of a numeric column: count, HLL distinct of the
    * key, p50/p95/p99 — one partial-aggregating pass. */
  def numericProfile(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      distinctCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        approxDistinct(col(distinctCol)).as("n_distinct_approx"),
        approxQuantiles(col(valueCol), Seq(0.5, 0.95, 0.99)).as("quantiles"))
}
