package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join utilities for the scale path: skew-salted equi-join and an
  * as-of (nearest-prior-event) join — operators a training-data
  * pipeline needs that plain equi-joins don't cover.
  */
object Joins {

  /** Skew-salted inner equi-join: the large (skewed) side gets a random
    * salt in [0, saltFactor); the small side is replicated `saltFactor`
    * times, so one hot key spreads over `saltFactor` shuffle partitions
    * instead of melting a single reducer. AQE's skew handling covers
    * sort-merge joins it can see; this is the explicit form for when the
    * skew is known up front or the join is produced by an API.
    *
    * The salt uses a deterministic hash of the row (xxhash64 over all
    * large-side columns), not rand(), so retried tasks produce identical
    * output — nondeterministic salting breaks Spark's task-retry
    * assumptions.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    saltedLarge.join(saltedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Range (interval) join: left point-events joined to right intervals
    * containing them (`start ≤ ts < end`), same key. A naive theta-join
    * is a per-key cartesian; here both sides are bucketed into
    * `binWidth`-second time bins — intervals explode into the bins they
    * overlap, points into their single bin — so the join is an equi-join
    * on (key, bin) with an exact containment filter after. Shuffle key =
    * (key, bin); an interval costs ceil(len/binWidth) replicas, so pick
    * binWidth near the typical interval length.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      tsCol: String,
      startCol: String,
      endCol: String,
      binWidthSec: Long = 3600L): DataFrame = {
    require(binWidthSec > 0, s"binWidthSec must be positive, got $binWidthSec")
    val binnedPoints = points.withColumn("_bin",
      floor(unix_timestamp(col(tsCol)) / binWidthSec))
    val binnedIntervals = intervals.withColumn("_bin",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / binWidthSec),
        // end is exclusive: a zero-length tail bin is still generated,
        // the exact filter discards non-matches
        floor(unix_timestamp(col(endCol)) / binWidthSec))))
    binnedPoints.join(binnedIntervals, Seq(key, "_bin"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bin")
  }

  /** As-of join: for every left row, the single right row with the
    * greatest `rightTs` ≤ `leftTs` within the same `key` (classic
    * market-data / feature-store semantics). Implemented as union +
    * window `last_value(ignoreNulls)` ordered by time — one shuffle on
    * (key), no per-row range scan, no cartesian; scales as a plain
    * window over the combined stream.
    *
    * Left columns are preserved; right columns (minus the key, but
    * including `rightTs`) are appended, null when no prior right row
    * exists.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String): DataFrame = {
    val rightVals = right.columns.filterNot(_ == key).toSeq
    val leftCols = left.columns.toSeq

    // tag and align the two sides on (key, ts); right rows sort before
    // left rows at the same timestamp so "<=" semantics hold
    val taggedRight = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        rightVals.map(c => col(c).as(s"_r_$c")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).as(s"_l_$c")): _*)
    val taggedLeft = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col(key), col("_ts"), col("_side")) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")) ++
        leftCols.filterNot(_ == key).map(c => col(c).as(s"_l_$c")): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = taggedRight.unionByName(taggedLeft)
      .select(
        (Seq(col(key), col("_ts"), col("_side")) ++
          leftCols.filterNot(_ == key).map(c => col(s"_l_$c")) ++
          rightVals.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"_r_$c"))): _*)
      .filter(col("_side") === 1)

    filled.select(
      leftCols.map(c => if (c == key) col(key) else col(s"_l_$c").as(c)) ++
        rightVals.map(c => col(s"_r_$c").as(c)): _*)
  }
}
