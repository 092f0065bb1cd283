package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("MG summary contains every guaranteed heavy hitter across many partitions") {
    // 'hot' is 30% of 1000 rows, 'warm' 15%; with capacity 9 the
    // guarantee threshold is n/10 = 10% — both MUST be in the summary
    // no matter how the 16 partitions merge
    val rows = Seq.fill(300)("hot") ++ Seq.fill(150)("warm") ++
      (0 until 550).map(i => s"tail$i")
    val df = scala.util.Random.shuffle(rows).toDF("k").repartition(16)
    val summary = HeavyHitters.summarize(df, "k", capacity = 9)
    assert(summary.size <= 9)
    assert(summary.contains("hot") && summary.contains("warm"),
      s"guaranteed hitters missing from $summary")
    // undercount bounded by n/(c+1): reported counts never exceed truth
    // and are within 100 of it
    assert(summary("hot") <= 300L && summary("hot") >= 200L)
  }

  test("MG guarantee property on random zipf-ish streams") {
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(77 + seed)
      // zipf-ish: key j drawn with weight ~ 1/(j+1)
      val keys = (0 until 2000).map { _ =>
        var j = 0
        while (j < 19 && rnd.nextDouble() > 0.45) j += 1
        s"k$j"
      }
      val df = keys.toDF("k").repartition(8)
      val cap = 5
      val summary = HeavyHitters.summarize(df, "k", cap)
      val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val threshold = keys.size.toLong / (cap + 1)
      exact.filter(_._2 > threshold).foreach { case (k, _) =>
        assert(summary.contains(k), s"seed $seed: hitter $k missing from $summary")
      }
      summary.foreach { case (k, c) =>
        assert(c <= exact(k), s"seed $seed: $k overcounted: $c > ${exact(k)}")
      }
    }
  }

  test("heavyHitterCheck emits exact counts and a passing flag") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (0 until 20).map(i => s"t$i"))
      .toDF("k")
    val r = HeavyHitters.heavyHitterCheck(df, "k", capacity = 4).collect().head
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == 2L) // a (50) and b (30) exceed 100/5 = 20
    assert(r.getLong(2) == 1L)
  }
}
