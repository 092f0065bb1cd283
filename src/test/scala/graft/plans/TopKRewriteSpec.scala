package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKWindowRewrite
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.Distances

/** The SURVEY §7.4 custom-Catalyst box: an optimizer rule that rewrites
  * the naive window-rank top-k pattern into the bounded-aggregate form
  * automatically. Proven two ways: the optimized plan contains the
  * row_topk aggregate and no Window, and results equal the window form
  * row for row. */
class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val corpus = {
    val rng = new scala.util.Random(5)
    (0L until 300L).map(i => (i, Array.fill(8)(rng.nextFloat())))
      .toDF("vec_id", "embedding")
  }

  private def naiveTopK(k: Int) = {
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("query_id"), $"embedding".as("q_embedding"))
    val w = Window.partitionBy($"query_id").orderBy($"dist".asc, $"vec_id".asc)
    queries.crossJoin(corpus)
      .withColumn("dist", Distances.l2Sq($"q_embedding", $"embedding"))
      .select("query_id", "vec_id", "dist")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
  }

  private def withRule[A](body: => A): A = {
    TopKWindowRewrite.enable(spark)
    try body
    finally spark.conf.set(TopKWindowRewrite.ConfKey, "false")
  }

  test("the rewrite fires: row_topk aggregate replaces the Window in the plan") {
    val baseline = naiveTopK(5).queryExecution.executedPlan.toString
    assert(baseline.contains("Window") || baseline.contains("WindowGroupLimit"),
      s"expected the naive form to plan a window:\n$baseline")
    withRule {
      val optimized = naiveTopK(5).queryExecution.executedPlan.toString
      assert(optimized.contains("row_topk"), s"rewrite did not fire:\n$optimized")
      assert(!optimized.contains("Window"), s"window survived the rewrite:\n$optimized")
      // partial + final aggregate pair → map-side bounding before the shuffle
      assert("ObjectHashAggregate|SortAggregate".r.findAllIn(optimized).length >= 2,
        s"expected a partial/final aggregate pair:\n$optimized")
    }
  }

  test("rewritten results equal the window form, including rank values") {
    val expected = naiveTopK(7).as[(Long, Long, Double, Int)].collect().toSet
    val got = withRule { naiveTopK(7).as[(Long, Long, Double, Int)].collect().toSet }
    assert(got == expected)
    assert(expected.size == 4 * 7)
  }

  test("patterns the rule must NOT touch are left alone") {
    withRule {
      // rank used with a lower bound — not a top-k pattern
      val w = Window.partitionBy($"query_id").orderBy($"dist".asc)
      val df = corpus.select($"vec_id".as("query_id"), lit(1.0).as("dist"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" > 2)
      assert(df.queryExecution.executedPlan.toString.contains("Window"))
      // rank() (not row_number) keeps its window too
      val df2 = corpus.select($"vec_id".as("query_id"), lit(1.0).as("dist"))
        .withColumn("r", rank().over(w))
        .filter($"r" <= 2)
      assert(df2.queryExecution.executedPlan.toString.contains("Window"))
    }
  }
}
