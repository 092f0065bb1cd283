package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class QuantKMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 4
  private def df(rows: Seq[(Long, Array[Float])]) = rows.toDF("vec_id", "embedding")

  test("hand-checked fit on two obvious clusters, floor-division centroids included") {
    // ids 0,1 near (0,...), ids 2,3 near (1,...); k=2 seeds from ids 0,1
    val d = df(Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.1f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (3L, Array(0.9f, 1.0f, 1.0f, 1.0f))))
    val cents = QuantKMeans.fitCentroids(d, k = 2, iters = 2, dim = dim)
    // round 1: seeds q0=(0,..), q1=(100000,0,0,0): 2,3 join cluster 1;
    // c0=(0,..), c1=mean(q1,q2,q3) = ((100000+1000000+900000)/3, 2000000/3, ...)
    // round 2: re-assign -> 0,1 cluster 0; 2,3 cluster 1 ->
    // c0=(50000,0,0,0), c1=(950000,1000000,1000000,1000000)
    assert(cents(0).toSeq == Seq(50000L, 0L, 0L, 0L))
    assert(cents(1).toSeq == Seq(950000L, 1000000L, 1000000L, 1000000L))
    val assign = QuantKMeans.fitAssign(d, k = 2, iters = 2, dim = dim)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(assign.map(a => a._1 -> a._2).toSeq ==
      Seq(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1))
    // exact integer distance: q0 to c0 = 50000^2
    assert(assign.head._3 == 50000L * 50000L)
  }

  test("bit-identical across partitionings (the quantized-grid property)") {
    val rng = new scala.util.Random(5)
    val rows = (0L until 300L).map(i => (i, Array.fill(dim)(rng.nextFloat() - 0.5f)))
    val a = QuantKMeans.fitAssign(df(rows), k = 4, iters = 3, dim = dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    val b = QuantKMeans.fitAssign(df(rows).repartition(13), k = 4, iters = 3, dim = dim)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("inertia is non-increasing over Lloyd rounds") {
    val rng = new scala.util.Random(11)
    val rows = (0L until 200L).map(i => (i, Array.fill(dim)(rng.nextFloat())))
    val inertias = (1 to 4).map { it =>
      QuantKMeans.fitAssign(df(rows), k = 3, iters = it, dim = dim)
        .agg(sum(col("dist_q"))).head().getLong(0)
    }
    inertias.sliding(2).foreach { case Seq(prev, next) =>
      assert(next <= prev, s"inertia rose: $inertias")
    }
  }

  test("assignment ties break to the lowest cluster index") {
    // identical vectors everywhere -> both centroids identical at every
    // round; every assignment is a pure tie and must pick cluster 0
    val d = df(Seq(
      (0L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (1L, Array(0.5f, 0.5f, 0.5f, 0.5f)),
      (2L, Array(0.5f, 0.5f, 0.5f, 0.5f))))
    val assign = QuantKMeans.fitAssign(d, k = 2, iters = 1, dim = dim)
      .as[(Long, Int, Long)].collect()
    assert(assign.forall(_._2 == 0), s"ties must go to cluster 0: ${assign.toSeq}")
  }

  test("an empty cluster keeps its centroid instead of collapsing") {
    // seed 1 is a far outlier that immediately loses all rows
    val d = df(Seq(
      (0L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(100.0f, 100.0f, 100.0f, 100.0f)),
      (2L, Array(0.1f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(0.2f, 0.0f, 0.0f, 0.0f))))
    // seeds come from the two smallest ids: c0 = id 0 (near the
    // negatives), c1 = id 1 (the far outlier); id 2 joins cluster 0 —
    // this also pins the negative-sum floor-division path
    val neg = df(Seq(
      (0L, Array(-0.3f, -0.3f, -0.3f, -0.3f)),
      (1L, Array(5.0f, 5.0f, 5.0f, 5.0f)),
      (2L, Array(-0.4f, -0.4f, -0.4f, -0.4f))))
    val cents = QuantKMeans.fitCentroids(neg, k = 2, iters = 1, dim = dim)
    // cluster 0 holds ids 0,2: floor((-300000 + -400000)/2) = -350000
    assert(cents(0).toSeq == Seq.fill(dim)(-350000L))
    // cluster 1 holds id 1 alone, its centroid unchanged
    assert(cents(1).toSeq == Seq.fill(dim)(5000000L))
    // floor semantics on an odd negative sum: dim-0 sums to -700001
    val odd = df(Seq(
      (0L, Array(-0.3f, 0f, 0f, 0f)),
      (1L, Array(5.0f, 5f, 5f, 5f)),
      (2L, Array(-0.400001f, 0f, 0f, 0f))))
    val c2 = QuantKMeans.fitCentroids(odd, k = 2, iters = 1, dim = dim)
    assert(c2(0)(0) == Math.floorDiv(-300000L + -400001L, 2L),
      s"negative floor division must floor, not truncate: ${c2(0)(0)}")
  }

  test("outlier cut: farthest-from-own-centroid ranking matches brute force, bounded heap") {
    val rng = new scala.util.Random(11)
    val rows = (0L until 200L).map(i => (i, Array.fill(dim)(rng.nextFloat() - 0.5f)))
    val d = df(rows)
    val all = QuantKMeans.fitAssign(d, k = 3, iters = 2, dim = dim)
    val top = all.orderBy(col("dist_q").desc, col("vec_id").asc).limit(5)
    val expected = all.as[(Long, Int, Long)].collect()
      .sortBy { case (id, _, dist) => (-dist, id) }.take(5).toSeq
    assert(top.as[(Long, Int, Long)].collect().toSeq == expected)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"outlier cut must be the bounded heap:\n$plan")
  }
}
