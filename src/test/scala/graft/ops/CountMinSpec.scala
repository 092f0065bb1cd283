package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Count-Min sketch: structural guarantees (never under-count, εn
  * ceiling), exact linearity of the merge, and partition-order
  * determinism — the properties that make it safe as a shuffle-free
  * per-key frequency estimator at scale. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed key distribution: key i appears (i+1)*7 times, 40 keys
  private lazy val skewed = (0 until 40).flatMap(i => Seq.fill((i + 1) * 7)(s"key_$i"))
    .zipWithIndex.map { case (k, idx) => (idx.toLong, k) }
    .toDF("id", "k")

  test("estimates never under-count and respect the epsilon-n ceiling") {
    val sk = CountMin.sketch(skewed, "k", depth = 4, width = 1024)
    val exact = skewed.groupBy("k").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    val bound = (math.E / 1024 * n).toLong + 1
    exact.foreach { case (k, c) =>
      val est = CountMin.estimate(sk, k, depth = 4, width = 1024)
      assert(est >= c, s"$k under-counted: $est < $c")
      assert(est <= c + bound, s"$k over-counted past εn: $est > $c + $bound")
    }
  }

  test("merge is linear: half + half equals whole, bucket for bucket") {
    val whole = CountMin.sketch(skewed, "k")
    val a = CountMin.sketch(skewed.filter(col("id") % 2 === 0), "k")
    val b = CountMin.sketch(skewed.filter(col("id") % 2 =!= 0), "k")
    assert(whole.indices.forall(i => whole(i) == a(i) + b(i)))
  }

  test("the grid is invariant under repartitioning (merge order irrelevant)") {
    val p1 = CountMin.sketch(skewed.repartition(1), "k")
    val p13 = CountMin.sketch(skewed.repartition(13, col("k")), "k")
    assert(p1.sameElements(p13))
  }

  test("cmsCheck summary holds on the skewed fixture") {
    val row = CountMin.cmsCheck(skewed, "k", col("id") % 2 === 0).head()
    assert(row.getLong(0) == 40L) // n_keys
    assert(row.getLong(1) == 0L)  // underest
    assert(row.getLong(2) == 0L)  // over_bound
    assert(row.getLong(3) == 1L)  // merge_exact
  }

  test("nulls are ignored, not bucketed") {
    val withNulls = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k.orNull) }.toDF("id", "k")
    val sk = CountMin.sketch(withNulls, "k")
    assert(CountMin.estimate(sk, "a") >= 2L)
    assert(sk.sum == 3L * 4, s"3 non-null rows x depth 4 increments, got ${sk.sum}")
  }
}
