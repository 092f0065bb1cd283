package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("funnel counts users reaching each ordered step prefix") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2: view then click only
      (2L, ts(0), "view"), (2L, ts(5), "click"),
      // user 3: out of order (click before view) → only step 1
      (3L, ts(5), "view"), (3L, ts(1), "click"),
      // user 4: purchase before the rest → steps 1,2 only
      (4L, ts(0), "purchase"), (4L, ts(1), "view"), (4L, ts(2), "click"),
      // user 5: never views
      (5L, ts(0), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].head()
    assert(out == ((4L, 3L, 1L)))
  }

  test("funnel ignores repeat events after the first occurrence") {
    val events = Seq(
      (1L, ts(0), "view"), (1L, ts(9), "view"),  // second view later is irrelevant
      (1L, ts(5), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = EventAnalytics.funnel(events, Seq("view", "click"))
      .as[(Long, Long)].head()
    assert(out == ((1L, 1L)))
  }

  test("sessionize splits on gaps, numbers sessions deterministically, aggregates bounds") {
    val events = Seq(
      (1L, ts(0), 10L), (1L, ts(5), 11L),   // session 1: 10:00-10:05
      (1L, ts(40), 12L),                    // gap 35min > 30min → session 2
      (2L, ts(1), 20L)                      // separate user
    ).toDF("user_id", "ts", "event_id")
    val out = EventAnalytics.sessionize(events, gapSec = 1800L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(out.keySet == Set((1L, 1L), (1L, 2L), (2L, 1L)))
    val (n1, s1, e1) = out((1L, 1L))
    assert(n1 == 2L && (e1 - s1) == 5L * 60 * 1000000L)
    assert(out((1L, 2L))._1 == 1L && out((2L, 1L))._1 == 1L)
  }

  test("cohortRetention counts each user once per active day offset") {
    def day(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")
    val events = Seq(
      (1L, day(1, 9)), (1L, day(1, 17)),  // two events same day → one active day
      (1L, day(3, 9)),                    // offset 2
      (2L, day(2, 9)), (2L, day(3, 9))    // cohort Jan 2, offsets 0 and 1
    ).toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(events)
      .as[(String, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      ("2024-01-01", 0) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-02", 0) -> 1L, ("2024-01-02", 1) -> 1L))
  }

  test("histogram bins values and clamps out-of-range mass into edge bins") {
    val df = Seq(-5.0, 0.0, 4.9, 5.0, 9.9, 10.0, 99.0, 150.0).toDF("v")
    val out = EventAnalytics.histogram(df, "v", minVal = 0.0, maxVal = 100.0, bins = 20)
      .select("bin", "n").as[(Long, Long)].collect().toMap
    assert(out(0L) == 3L)  // -5 (clamped), 0.0, 4.9
    assert(out(1L) == 2L)  // 5.0, 9.9
    assert(out(2L) == 1L)  // 10.0
    assert(out(19L) == 2L) // 99.0, 150.0 (clamped)
    assert(out.values.sum == 8L)
  }

  test("exactQuantiles picks the type-1 discrete statistic per group") {
    import org.apache.spark.sql.functions.col
    // group a: values 1..10 → p50 = ceil(0.5*10)=5th = 5, p90 = 9th = 9
    // group b: constant 7 → every quantile is 7
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      Seq.fill(4)(("b", 7L))).toDF("g", "vm")
    val out = EventAnalytics.exactQuantiles(df, "g", col("vm"),
        Seq(0.5 -> "p50", 0.9 -> "p90"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("a" -> ((5L, 9L)), "b" -> ((7L, 7L))))
  }

  test("exactQuantiles: single-row group and empty input degenerate cleanly") {
    import org.apache.spark.sql.functions.col
    val one = Seq(("g", 42L)).toDF("g", "vm")
    val r = EventAnalytics.exactQuantiles(one, "g", col("vm"),
      Seq(0.5 -> "p50", 0.99 -> "p99")).collect()
    assert(r.length == 1 && r.head.getLong(1) == 42L && r.head.getLong(2) == 42L)
    val empty = Seq.empty[(String, Long)].toDF("g", "vm")
    assert(EventAnalytics.exactQuantiles(empty, "g", col("vm"), Seq(0.5 -> "p50"))
      .count() == 0)
  }

  test("approx_percentile stays within its accuracy bound of the exact quantile") {
    import org.apache.spark.sql.functions.{col, expr}
    // the sketch is the 100 TB path for continuous domains; pin that it
    // brackets the exact counting-sort statistic within its rank error
    val n = 10000
    val df = (1 to n).map(v => ("t", v.toLong)).toDF("g", "vm")
    val exact = EventAnalytics.exactQuantiles(df, "g", col("vm"), Seq(0.5 -> "p50"))
      .collect().head.getLong(1)
    val approx = df.agg(expr("approx_percentile(vm, 0.5, 100)")).collect().head.getLong(0)
    // accuracy=100 → rank error <= n/100; values are 1..n so value error
    // tracks rank error directly
    assert(math.abs(approx - exact) <= n / 100 + 1,
      s"approx $approx vs exact $exact exceeds the rank-error bound")
  }

  test("exactQuantiles windows over the histogram, not the raw rows") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 1000).map(v => ("t", (v % 7).toLong)).toDF("g", "vm")
    val plan = EventAnalytics.exactQuantiles(df, "g", col("vm"), Seq(0.5 -> "p50"))
      .queryExecution.executedPlan.toString
    // the aggregate that builds the (group, value) histogram must sit
    // BELOW the window — a window directly over raw events would sort
    // |events| rows on one task for a hot group
    val winIdx = plan.indexOf("Window")
    val aggBelow = plan.indexOf("HashAggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx,
      s"histogram aggregate not below the window:\n$plan")
  }

  test("approxQuantilesReport: verdict holds, is partitioning-invariant, and the bound bites") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(7)
    val df = (1 to 5000).map(_ => rng.nextDouble() * 100.0).toDF("value")
    def verdict(d: org.apache.spark.sql.DataFrame): (Long, Long, Long, Long) =
      EventAnalytics.approxQuantilesReport(d, col("value"),
          qs = Seq(0.1, 0.5, 0.9, 0.99), accuracy = 1000)
        .as[(Long, Long, Long, Long)].head()
    assert(verdict(df) == ((4L, 1L, 0L, 1L)))
    // the sketch is mergeable: the verdict must not depend on how the
    // input is partitioned (map-side partials merge)
    assert(verdict(df.repartition(13)) == ((4L, 1L, 0L, 1L)))
    // the check is not vacuous: at accuracy 1000 the allowed rank slack
    // is n/1000 + 1 = 6 ranks; a sketch answering the WRONG question
    // (here: asked for q=0.99 of a corpus where we hand it only values
    // below the true p50) would violate — simulate by checking a rank
    // far off target fails the same arithmetic
    val n = 5000L
    val bound = n.toDouble / 1000 + 1.0
    assert(math.abs(2500.0 - 0.99 * n) > bound,
      "sanity: a p50-rank answer to a p99 question must exceed the bound")
  }
}
