package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val events = {
    // fixture ts is parquet TIMESTAMP(NANOS); read it as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet("/root/testdata/sf0.01/events.parquet")
      .select($"event_type", $"user_id", $"value")
  }

  test("HLL distinct within 3x rsd of the exact count on fixture data") {
    val exact = events.select(countDistinct($"user_id")).as[Long].head()
    val approx = events.select(Sketches.approxDistinct($"user_id", rsd = 0.05))
      .as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    info(s"exact=$exact approx=$approx relErr=$relErr")
    assert(relErr <= 0.15)
  }

  test("HLL sketch merge: union of partial sketches estimates like the single-pass sketch") {
    // the mergeability contract the sketch-artifact pattern rests on.
    // NOT asserted as bit-equality: DataSketches HLL keeps a sparse
    // mode that unioning may densify, shifting the estimator by a few
    // counts (measured: 2000 vs 2006 on this fixture) — the contract
    // is that both land within the error bound, not that the bytes
    // agree. (The declared events_sketch_merge flag budgets 5% for
    // exactly this reason.)
    val ids = (0L until 2000L).toDF("uid")
    val single = ids.agg(expr("hll_sketch_estimate(hll_sketch_agg(uid, 14))"))
      .head().getLong(0)
    val merged = ids.withColumn("half", col("uid") % 2)
      .groupBy("half").agg(expr("hll_sketch_agg(uid, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
      .head().getLong(0)
    assert(math.abs(merged - single).toDouble / 2000.0 <= 0.01,
      s"merged=$merged single=$single diverge beyond noise")
    assert(math.abs(merged - 2000L).toDouble / 2000.0 <= 0.05)
    assert(math.abs(single - 2000L).toDouble / 2000.0 <= 0.05)
  }

  test("approx quantiles bracket the exact quantiles on fixture data") {
    val vals = events.select($"value").as[Double].collect().sorted
    def exactQ(p: Double): Double = vals(math.min(vals.length - 1, (p * vals.length).toInt))
    val Seq(p50, p95, p99) = events
      .select(Sketches.approxQuantiles($"value", Seq(0.5, 0.95, 0.99)))
      .as[Seq[Double]].head().toList
    assert(math.abs(p50 - exactQ(0.5)) <= 0.05 * math.max(1.0, math.abs(exactQ(0.5))))
    assert(math.abs(p95 - exactQ(0.95)) <= 0.05 * math.max(1.0, math.abs(exactQ(0.95))))
    assert(math.abs(p99 - exactQ(0.99)) <= 0.05 * math.max(1.0, math.abs(exactQ(0.99))))
  }

  test("numericProfile aggregates partially (no collect, one pass per group)") {
    val out = Sketches.numericProfile(events, "event_type", "value", "user_id")
    assert(out.count() == 5)
    val plan = out.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate|HashAggregate|SortAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
  }
}
