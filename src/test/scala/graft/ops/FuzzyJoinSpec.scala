package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent reference: classic Wagner–Fischer DP. */
  private def ed(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("fuzzyLookup k=1 equal-length: blocked result equals brute force (randomized)") {
    val rnd = new Random(42)
    val registry = (0 until 300).map(i => (i.toLong, f"ID${rnd.nextInt(100000)}%05d"))
    val probes = (0 until 40).map { i =>
      val (rid, name) = registry(rnd.nextInt(registry.length))
      val pos = rnd.nextInt(name.length)
      val repl = ('0' + rnd.nextInt(10)).toChar
      (1000L + i, name.updated(pos, repl))
    }
    val regDf = registry.toDF("rid", "rname")
    val prbDf = probes.toDF("pid", "pname")
    val got = FuzzyJoin.fuzzyLookup(regDf, prbDf, "rid", "rname", "pid", "pname", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (pid, pn) <- probes
      (rid, rn) <- registry
      d = ed(pn, rn) if d <= 1
    } yield (pid, rid, d)).toSet
    assert(got == want, s"blocked=${got.size} brute=${want.size}")
  }

  test("fuzzyLookup excludes pairs beyond maxDist and self-handles exact matches at dist 0") {
    val reg = Seq((1L, "ABCDEF"), (2L, "ABCDXX"), (3L, "ZZZZZZ")).toDF("rid", "rname")
    val prb = Seq((10L, "ABCDEF")).toDF("pid", "pname")
    val got = FuzzyJoin.fuzzyLookup(reg, prb, "rid", "rname", "pid", "pname", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 1L, 0)))
  }

  test("fuzzyLookup drops names shorter than the segment count (documented contract)") {
    val reg = Seq((1L, "A"), (2L, "AB")).toDF("rid", "rname")
    val prb = Seq((10L, "A")).toDF("pid", "pname")
    val got = FuzzyJoin.fuzzyLookup(reg, prb, "rid", "rname", "pid", "pname", maxDist = 1)
      .collect()
    assert(got.isEmpty)
  }

  test("fuzzySelfPairs k=1 equal-length: blocked result equals brute force (randomized)") {
    val rnd = new Random(7)
    val names = (0 until 250).map(i => (i.toLong, f"SN${rnd.nextInt(3000)}%04d"))
    val got = FuzzyJoin.fuzzySelfPairs(names.toDF("id", "name"), "id", "name", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (i1, n1) <- names; (i2, n2) <- names if i1 < i2
      d = ed(n1, n2) if d <= 1
    } yield (i1, i2, d)).toSet
    assert(got == want, s"blocked=${got.size} brute=${want.size}")
    assert(want.nonEmpty, "fixture must actually exercise near-pairs")
  }

  test("fuzzyLookup k=2 finds substitution-pair neighbors (heuristic tier)") {
    val reg = Seq((1L, "ABCDEFGHI"), (2L, "XBCDEFGHX"), (3L, "XXXXEFGHI")).toDF("rid", "rname")
    val prb = Seq((10L, "ABCDEFGHI")).toDF("pid", "pname")
    val got = FuzzyJoin.fuzzyLookup(reg, prb, "rid", "rname", "pid", "pname", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // reg 2 shares the middle third "DEF" -> candidate, dist 2 kept;
    // reg 3 shares "GHI" -> candidate, dist 4 filtered by the threshold
    assert(got == Set((10L, 1L, 0), (10L, 2L, 2)))
  }
}
