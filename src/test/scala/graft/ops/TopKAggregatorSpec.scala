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
    assert(buf.length <= 6) // never exceeds 2k
    val merged = agg.merge(buf, agg.reduce(agg.zero, (0L, 0.05)))
    val out = agg.finish(merged)
    assert(out.toSeq == Seq((0L, 0.05), (1L, 0.1), (2L, 0.1)))
  }
}
