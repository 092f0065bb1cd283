package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Exact PCA: optimality properties on constructed data, determinism
  * across partitionings, and the distributed-moments ↔ driver-eigen
  * agreement (projected variance equals the eigenvalue). */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // rank-2 structure + tiny noise in 8 dims: PC1/PC2 must capture ~all
  private lazy val lowRank = {
    val rng = new scala.util.Random(5)
    val a = Array.tabulate(8)(j => math.sin(j + 1.0))
    val b = Array.tabulate(8)(j => math.cos(2.0 * j))
    (0L until 400L).map { i =>
      val (wa, wb) = (rng.nextGaussian() * 3, rng.nextGaussian())
      (i, Array.tabulate(8)(j => (a(j) * wa + b(j) * wb + rng.nextGaussian() * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("basis is orthonormal, eigenvalues descend, low-rank data is captured") {
    val m = Pca.fit(lowRank, k = 4)
    for (i <- m.basis.indices; j <- m.basis.indices) {
      val dot = m.basis(i).zip(m.basis(j)).map { case (x, y) => x * y }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"B·Bᵀ[$i][$j] = $dot")
    }
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    val top2 = (m.eigenvalues(0) + m.eigenvalues(1)) / m.totalVariance
    info(f"top-2 variance fraction on rank-2 data: $top2%.5f")
    assert(top2 > 0.99, s"rank-2 structure must dominate: $top2")
  }

  test("fit is deterministic across repartitioning (within float jitter)") {
    val m1 = Pca.fit(lowRank.repartition(1), k = 3)
    val m13 = Pca.fit(lowRank.repartition(13), k = 3)
    m1.basis.zip(m13.basis).foreach { case (u, v) =>
      val diff = u.zip(v).map { case (x, y) => math.abs(x - y) }.max
      assert(diff < 1e-6, s"basis unstable across partitionings: $diff")
    }
  }

  test("projected variance equals the eigenvalue (model matches the data)") {
    val m = Pca.fit(lowRank, k = 3)
    val projected = Pca.project(lowRank, m)
    val vars = projected.agg(
      var_pop(col("pc0")), var_pop(col("pc1")), var_pop(col("pc2"))).head()
    m.eigenvalues.zipWithIndex.foreach { case (ev, i) =>
      val got = vars.getDouble(i)
      assert(math.abs(got - ev) / math.max(ev, 1e-12) < 1e-6,
        s"var(pc$i) = $got but λ = $ev")
    }
  }

  test("PCA captures at least as much variance as the SRP projection at the same k") {
    // SRP's ±1 rows are not orthonormal, so compare through normalized
    // projections: project on each (normalized) SRP direction, sum
    // per-direction variances — PCA's top-k sum is the optimum over
    // any orthonormal set and must dominate any k directions' capture
    val m = Pca.fit(lowRank, k = 2)
    val inDim = 8
    val srpVar = (0 until 2).map { i =>
      val signs = Array.tabulate(inDim)(j => graft.functions.Projections.sign(i, j, inDim).toDouble)
      val norm = math.sqrt(signs.map(s => s * s).sum)
      val colExpr = (0 until inDim)
        .map(j => element_at(col("embedding"), j + 1).cast("double") * lit(signs(j) / norm))
        .reduceLeft(_ + _)
      lowRank.agg(var_pop(colExpr)).head().getDouble(0)
    }.sum
    val pcaVar = m.eigenvalues.sum
    info(f"captured variance at k=2: pca=$pcaVar%.4f srp=$srpVar%.4f")
    assert(pcaVar >= srpVar - 1e-9, "PCA must dominate any linear k-projection")
  }

  test("plan: projection is codegen arithmetic, no shuffle, no UDF") {
    val m = Pca.fit(lowRank, k = 2)
    val plan = Pca.project(lowRank, m).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("pythonudf"))
  }
}
