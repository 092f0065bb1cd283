package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private lazy val pairs = Seq.fill(50) {
    val n = 1 + rng.nextInt(128)
    (Array.fill(n)(rng.nextFloat() * 4 - 2), Array.fill(n)(rng.nextFloat() * 4 - 2))
  }.toDF("a", "b")

  test("codegen l2Sq is bit-identical to the HOF fold on random vectors") {
    val diff = pairs
      .select(Distances.l2Sq($"a", $"b").as("fast"), Distances.l2SqHof($"a", $"b").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("codegen dot is bit-identical to the HOF fold on random vectors") {
    val diff = pairs
      .select(Distances.dot($"a", $"b").as("fast"), Distances.dotHof($"a", $"b").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("length mismatch and null inputs yield null (zip_with padding semantics)") {
    val df = Seq(
      (Array(1f, 2f), Array(1f, 2f, 3f)),       // mismatch
      (null.asInstanceOf[Array[Float]], Array(1f))) // null side
      .toDF("a", "b")
    val out = df.select(Distances.l2Sq($"a", $"b")).as[Option[Double]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("interpreted eval path matches codegen (collect via filter pushes to interpreted)") {
    // force interpreted evaluation by using the expression in a literal fold
    val v = Seq((Array(1f, 2f, 3f), Array(2f, 4f, 6f))).toDF("a", "b")
      .select(Distances.l2Sq($"a", $"b")).as[Double].head()
    assert(v == (1.0 + 4.0 + 9.0))
  }

  test("multiple expression instances plus HOF lambdas coexist in one projection") {
    // regression: generated locals must be fresh-named — two instances
    // inlined into one codegen block previously collided on "i"
    val df = Seq((Array(1f, 2f), Array(2f, 4f))).toDF("a", "b")
    val deq = transform($"a".cast("array<double>"), x => x * 2.0).cast("array<float>")
    val row = df.select(
      Distances.l2Sq($"a", $"b").as("d1"),
      Distances.l2Sq(deq, $"b").as("d2"),
      Distances.dot($"a", $"b").as("d3"))
      .as[(Double, Double, Double)].head()
    assert(row == ((5.0, 0.0, 10.0)))
  }

  test("l2Sq stays inside whole-stage codegen in the kNN plan") {
    // literal data plans as LocalTableScan (never codegens) — use parquet
    val dir = java.nio.file.Files.createTempDirectory("graft_wscg").toString
    pairs.write.mode("overwrite").parquet(dir)
    val plan = spark.read.parquet(dir)
      .select(Distances.l2Sq($"a", $"b").as("dist"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen span
    assert(plan.contains("*(1) Project [l2sq"), s"l2sq not inside a WSCG span:\n$plan")
  }
}
