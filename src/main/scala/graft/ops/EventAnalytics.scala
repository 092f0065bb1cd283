package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over (user, ts, event_type, value) streams —
  * the profiling layer of a training-data/telemetry pipeline. Both are
  * single-shuffle shapes: funnel groups once by user, histogram
  * aggregates once by bin.
  */
object EventAnalytics {

  /** Ordered funnel conversion: for each prefix of `steps`, how many
    * users performed those steps in timestamp order (first occurrence of
    * each step; strictly increasing first-occurrence times). One shuffle
    * on user, then a tiny aggregation — no self-joins, no explosion in
    * the number of steps. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val firstSeen: Seq[Column] = steps.map { s =>
      min(when(col(typeCol) === s, col(tsCol))).as(s"t_$s")
    }
    val perUser = events.groupBy(col(userCol)).agg(firstSeen.head, firstSeen.tail: _*)
    // reached step i  ⇔  every t_1..t_i non-null and strictly increasing
    val reached: Seq[Column] = steps.indices.map { i =>
      val chain = (0 to i).map(j => col(s"t_${steps(j)}"))
      val ordered = chain.sliding(2).collect { case Seq(a, b) => a < b }
        .foldLeft(lit(true))(_ && _)
      val allPresent = chain.map(_.isNotNull).reduce(_ && _)
      sum(when(allPresent && ordered, 1L).otherwise(0L)).as(s"n_step${i + 1}_${steps(i)}")
    }
    perUser.agg(reached.head, reached.tail: _*)
  }

  /** Batch sessionization: split each user's event stream into sessions
    * separated by gaps > `gapSec` — the classic lag-flag-cumsum window
    * form (the batch twin of
    * [[graft.streaming.Sessionize.sessions]]'s stateful streaming
    * operator). One wide dependency: the per-user window (the session-id
    * groupBy rides the same user partitioning). A pathologically hot
    * user serializes one partition — same caveat and same salted-bucket
    * remedy as the as-of join. Ties on `tsCol` are broken by `tieCol`
    * so the session numbering is deterministic. */
  def sessionize(
      events: DataFrame,
      gapSec: Long = 1800L,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("new_s",
        when(col("prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("prev_ts")) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"))
  }

  /** Cohort retention: users grouped by first-seen day (the cohort),
    * counted as active at each day offset from that cohort. Three
    * bucketed shuffles — first-seen per user, distinct (user, day),
    * final (cohort, offset) rollup — all on uniform keys, no windows,
    * no self-join: the shape that holds when the event log is the
    * 100 TB side. */
  def cohortRetention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val day = to_date(col(tsCol))
    val first = events.groupBy(col(userCol))
      .agg(min(day).as("cohort"))
    val active = events.select(col(userCol), day.as("day")).distinct()
    active.join(first, userCol)
      .groupBy(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).cast("long").as("n_users"))
  }

  /** Fixed-width histogram of a numeric column over [minVal, maxVal):
    * one partial-aggregating groupBy on the bin id; out-of-range rows
    * are clamped into the edge bins so mass is never dropped. */
  def histogram(
      df: DataFrame,
      valueCol: String,
      minVal: Double,
      maxVal: Double,
      bins: Int): DataFrame = {
    require(bins > 0 && maxVal > minVal, "need bins > 0 and maxVal > minVal")
    val width = (maxVal - minVal) / bins
    val rawBin = floor((col(valueCol) - minVal) / width).cast("long")
    val bin = least(greatest(rawBin, lit(0L)), lit(bins - 1L))
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_start", lit(minVal) + col("bin") * width)
      .orderBy(col("bin"))
  }

  /** Approximate quantiles through Spark's built-in MERGEABLE sketch
    * (`percentile_approx` — Greenwald-Khanna style QuantileSummaries,
    * partial-aggregated map-side like the HLL/CMS/MG family), verified
    * against the exact rank definition in the same job. TIE-AWARE: an
    * element's rank under duplicates is the RANGE
    * [count(v < est) + 1, count(v <= est)], and the sketch's
    * n/accuracy bound holds for SOME rank of the returned element —
    * so a violation exists only when that whole range misses
    * [q·n − bound, q·n + bound] (a max-rank-only check would flag
    * duplicate-heavy data the sketch actually handled perfectly).
    * Estimates must also be monotone. The exact-rank check is ONE
    * distributed conditional-sum pass — at 100 TB the sketch is the
    * operator and the check is the monitor, a single extra narrow
    * scan. Output is a single-row BIGINT verdict — constants when the
    * sketch honors its contract, so an oracle pins them; empty or
    * all-null input reports nonempty = 0 with zero violations. */
  def approxQuantilesReport(
      df: DataFrame,
      valueCol: Column,
      qs: Seq[Double],
      accuracy: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q < 1.0), "targets must be in (0,1)")
    // the monotonicity verdict compares adjacent estimates, so the
    // targets must arrive ascending — an unsorted list would pair the
    // estimates wrong and report a phantom sketch-contract violation
    require(qs == qs.sorted, s"quantile targets must be ascending, got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    def verdict(nonempty: Long, violations: Long, monotone: Long): DataFrame =
      Seq((qs.size.toLong, nonempty, violations, monotone))
        .toDF("n_quantiles", "nonempty", "rank_violations", "monotone")
    val vals = df.select(valueCol.cast("double").as("v")).where(col("v").isNotNull)
    val head = vals.agg(
      percentile_approx(col("v"), lit(qs.toArray), lit(accuracy)).as("qv"),
      count(lit(1)).as("n")).head()
    val n = head.getLong(1)
    if (n == 0L || head.isNullAt(0)) return verdict(0L, 0L, 1L)
    val est = head.getSeq[Double](0)
    val rankCols = est.zipWithIndex.flatMap { case (v, i) => Seq(
      sum(when(col("v") <= lit(v), 1L).otherwise(0L)).as(s"hi$i"),
      sum(when(col("v") < lit(v), 1L).otherwise(0L)).as(s"lo$i")) }
    val ranks = vals.agg(rankCols.head, rankCols.tail: _*).head()
    val bound = n.toDouble / accuracy + 1.0
    val violations = qs.indices.count { i =>
      val hiRank = ranks.getLong(2 * i).toDouble      // max rank under ties
      val loRank = ranks.getLong(2 * i + 1).toDouble + 1.0 // min rank
      val target = qs(i) * n
      hiRank < target - bound || loRank > target + bound
    }
    val monotone = est.zip(est.drop(1)).forall { case (a, b) => a <= b }
    verdict(1L, violations.toLong, if (monotone) 1L else 0L)
  }

  /** Exact per-group quantiles of an integer-quantized measure, the
    * counting-sort way: aggregate to a (group, value) histogram first
    * (shuffle carries one row per DISTINCT value, not per event), then
    * rank-select over the cumulative counts. The only window runs over
    * the bounded histogram — never over the raw events — so a hot group
    * costs |distinct values| rows on one task, not |events|. The
    * selected quantile is the classic type-1 discrete statistic
    * (smallest value whose cumulative count reaches ceil(q·n)), which
    * both engines reproduce bit-for-bit on integers — unlike
    * interpolating percentiles, whose float blend is engine-specific.
    * (The sketch-based scale path for continuous domains is
    * [[approxQuantilesReport]], bounds-checked in events_sketch_check
    * style.) */
  def exactQuantiles(
      df: DataFrame,
      groupCol: String,
      valueMilli: Column,
      quantiles: Seq[(Double, String)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    val hist = df
      .groupBy(col(groupCol), valueMilli.as("vm"))
      .agg(count(lit(1)).as("c"))
    val cum = Window.partitionBy(col(groupCol)).orderBy(col("vm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(col(groupCol))
    val ranked = hist
      .withColumn("cum", sum(col("c")).over(cum))
      .withColumn("n", sum(col("c")).over(tot))
    val picks = quantiles.map { case (q, name) =>
      min(when(col("cum") >= ceil(col("n") * q), col("vm"))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(picks.head, picks.tail: _*)
      .orderBy(col(groupCol))
  }
}
