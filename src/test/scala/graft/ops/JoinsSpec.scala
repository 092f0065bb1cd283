package graft.ops

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("asOfJoin picks the nearest prior right row per key") {
    val quotes = Seq(
      ("A", ts(0), 100.0), ("A", ts(10), 110.0), ("A", ts(20), 120.0),
      ("B", ts(5), 50.0))
      .toDF("sym", "qts", "px")
    val trades = Seq(
      ("A", ts(1), 7L),   // after A@0   → 100.0
      ("A", ts(10), 8L),  // exactly at A@10 (<=) → 110.0
      ("A", ts(25), 9L),  // after A@20  → 120.0
      ("B", ts(4), 1L),   // before any B quote → null
      ("C", ts(9), 2L))   // key with no right rows → null
      .toDF("sym", "tts", "qty")

    val out = Joins.asOfJoin(trades, quotes, key = "sym", leftTs = "tts", rightTs = "qts")
      .select($"sym", $"tts", $"qty", $"px")
      .as[(String, Timestamp, Long, Option[Double])].collect()
      .map { case (s, t, q, px) => (s, t.getTime, q, px) }.toSet

    assert(out == Set(
      ("A", ts(1).getTime, 7L, Some(100.0)),
      ("A", ts(10).getTime, 8L, Some(110.0)),
      ("A", ts(25).getTime, 9L, Some(120.0)),
      ("B", ts(4).getTime, 1L, None),
      ("C", ts(9).getTime, 2L, None)))
  }

  test("asOfJoinSalted equals asOfJoin on a pathologically hot key") {
    // one key owns 95% of both sides, timestamps spread over ~40 buckets
    // (bucketSec=3600), so carry-in must fire across many bucket edges
    val rng = new scala.util.Random(33)
    def t(sec: Int): Timestamp = new Timestamp(1704100000000L + sec * 1000L)
    val right = (1 to 400).map { i =>
      val k = if (rng.nextInt(20) == 0) s"cold${rng.nextInt(5)}" else "hot"
      (k, t(rng.nextInt(140000)), rng.nextDouble())
    }.toDF("k", "rts", "v")
      .dropDuplicates("k", "rts") // exact right-ts ties are documented out of scope
    val left = (1 to 1200).map { i =>
      val k = if (rng.nextInt(20) == 0) s"cold${rng.nextInt(5)}" else "hot"
      (k, t(rng.nextInt(150000)), i.toLong)
    }.toDF("k", "lts", "n")

    val plain = Joins.asOfJoin(left, right, "k", "lts", "rts")
      .as[(String, Timestamp, Long, Option[Timestamp], Option[Double])].collect().toSet
    val salted = Joins.asOfJoinSalted(left, right, "k", "lts", "rts", bucketSec = 3600L)
      .as[(String, Timestamp, Long, Option[Timestamp], Option[Double])].collect().toSet
    assert(salted == plain)
    assert(plain.size == 1200)
  }

  test("rangeJoin matches a brute-force theta join across bin boundaries") {
    val intervals = Seq(
      ("A", ts(0), ts(30), "i1"),   // spans multiple 10-min bins
      ("A", ts(30), ts(40), "i2"),  // adjacent — end exclusive
      ("B", ts(5), ts(6), "i3"))    // sub-bin interval
      .toDF("key", "start", "end", "ival")
    val points = Seq(
      ("A", ts(0), "p0"),   // at i1 start (inclusive)
      ("A", ts(29), "p1"),  // inside i1
      ("A", ts(30), "p2"),  // i1 end (exclusive) = i2 start
      ("A", ts(45), "p3"),  // in no interval
      ("B", ts(5), "p4"))
      .toDF("key", "pts", "pt")

    val got = Joins.rangeJoin(points, intervals, "key", "pts", "start", "end",
        binWidthSec = 600L)
      .select("pt", "ival").as[(String, String)].collect().toSet
    val want = points.as[(String, Timestamp, String)].collect().flatMap { case (k, t, p) =>
      intervals.as[(String, Timestamp, Timestamp, String)].collect().collect {
        case (k2, s, e, i) if k == k2 && !t.before(s) && t.before(e) => (p, i)
      }
    }.toSet
    assert(got == want)
    assert(got == Set(("p0", "i1"), ("p1", "i1"), ("p2", "i2"), ("p4", "i3")))
  }

  test("saltedJoin equals a plain inner join on skewed keys") {
    val rng = new scala.util.Random(5)
    // 90% of rows share one hot key
    val large = (1 to 2000).map { i =>
      (if (rng.nextDouble() < 0.9) "hot" else s"k${rng.nextInt(10)}", i.toLong)
    }.toDF("key", "v")
    val small = (Seq("hot") ++ (0 until 10).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, i * 100) }.toDF("key", "w")

    val plain = large.join(small, "key")
      .select("key", "v", "w").as[(String, Long, Int)].collect().toSet
    val salted = Joins.saltedJoin(large, small, "key", saltFactor = 8)
      .select("key", "v", "w").as[(String, Long, Int)].collect().toSet
    assert(salted == plain)
  }

  test("VectorCrud.deleteAll removes the key set via broadcast anti-join") {
    val df = (1L to 100L).map(i => (i, i * 2)).toDF("id", "v")
    val ids = Seq(3L, 7L, 999L).toDF("id")
    val out = VectorCrud.deleteAll(df, ids)
    assert(out.count() == 98)
    assert(out.filter($"id".isin(3L, 7L)).count() == 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$plan")
  }

  test("saltedJoin output is deterministic across evaluations (hash salt, not rand)") {
    val large = (1 to 100).map(i => ("k", i.toLong)).toDF("key", "v")
    val small = Seq(("k", 1)).toDF("key", "w")
    val j = Joins.saltedJoin(large, small, "key", saltFactor = 4)
    assert(j.count() == j.count() && j.count() == 100)
  }
}
