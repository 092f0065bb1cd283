package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TopKAggregatorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val corpus = {
    val rng = new scala.util.Random(11)
    (0L until 200L).map(i => (i, Array.fill(8)(rng.nextFloat())))
      .toDF("vec_id", "embedding")
  }

  private lazy val queries = corpus.filter($"vec_id" < 4)
    .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))

  test("knnJoinAgg equals the window-based knnJoin row for row") {
    val viaWindow = VectorSearch.knnJoin(queries, corpus, k = 7)
      .select("query_id", "vec_id", "dist", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val viaAgg = VectorSearch.knnJoinAgg(queries, corpus, k = 7)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(viaAgg == viaWindow)
  }

  test("aggregation is partial (map-side combine) — ObjectHashAggregate x2 in the plan") {
    val plan = VectorSearch.knnJoinAgg(queries, corpus, k = 5)
      .queryExecution.executedPlan.toString
    val nAggs = "ObjectHashAggregate|SortAggregate".r.findAllIn(plan).length
    assert(nAggs >= 2, s"expected partial+final aggregate pair in:\n$plan")
  }

  test("reduce/merge keep the buffer bounded and finish sorts (dist, id)") {
    val agg = new TopKAggregator(3)
    val rows = Seq((5L, 0.5), (1L, 0.1), (2L, 0.1), (9L, 0.9), (4L, 0.4), (3L, 0.3))
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(buf.size <= 3) // heap never exceeds k entries
    val merged = agg.merge(buf, agg.reduce(agg.zero, (0L, 0.05)))
    val out = agg.finish(merged)
    assert(out.toSeq == Seq((0L, 0.05), (1L, 0.1), (2L, 0.1)))
  }

  test("heap buffer matches a reference sort under random fire, including ties") {
    val rng = new scala.util.Random(7)
    (1 to 50).foreach { _ =>
      val k = 1 + rng.nextInt(8)
      val agg = new TopKAggregator(k)
      val n = rng.nextInt(60)
      // coarse dists force (dist, id) tie-breaks regularly
      val rows = Seq.fill(n)((rng.nextLong(100), rng.nextInt(5) / 10.0))
      val split = if (n == 0) 0 else rng.nextInt(n + 1)
      val (r1, r2) = rows.splitAt(split)
      val merged = agg.merge(
        r1.foldLeft(agg.zero)(agg.reduce),
        r2.foldLeft(agg.zero)(agg.reduce))
      val expected = rows.distinct.sortBy { case (id, d) => (d, id) }.take(k)
      // distinct is not applied by the aggregator; emulate duplicates too
      val expectedWithDups = rows.sortBy { case (id, d) => (d, id) }.take(k)
      assert(agg.finish(merged).toSeq == expectedWithDups,
        s"k=$k rows=$rows (distinct-expected $expected)")
    }
  }
}
