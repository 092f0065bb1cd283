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

  test("fuzzyLookup covers cross-length and single-char pairs (deletion completeness)") {
    val reg = Seq((1L, "A"), (2L, "AB"), (3L, "XY")).toDF("rid", "rname")
    val prb = Seq((10L, "A")).toDF("pid", "pname")
    val got = FuzzyJoin.fuzzyLookup(reg, prb, "rid", "rname", "pid", "pname", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((10L, 1L, 0), (10L, 2L, 1)))
  }

  test("fuzzy blocking rejects names beyond the maxLen contract loudly") {
    val reg = Seq((1L, "X" * 65)).toDF("rid", "rname")
    val prb = Seq((10L, "XX")).toDF("pid", "pname")
    val ex = intercept[Exception] {
      FuzzyJoin.fuzzyLookup(reg, prb, "rid", "rname", "pid", "pname", maxDist = 1)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("fuzzy blocking contract")),
      s"must fail with the contract message, got: $ex")
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

  test("incrementalFuzzyResolveBatch: store memory across batches, tagged redelivery idempotent") {
    val store = java.nio.file.Files.createTempDirectory("fuzzy_store").toString
    FuzzyJoin.ensureFuzzyStore(spark,
      Seq((1L, "AAAA"), (2L, "BBBB")).toDF("id", "name"), store, "id", "name")
    val b0 = Seq((10L, "AAAB"), (11L, "ZZZZ"), (12L, "ZZZY")).toDF("id", "name")
    val v0 = FuzzyJoin.incrementalFuzzyResolveBatch(
        spark, store, b0, "id", "name", batchTag = Some("t0"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // 10 resolves to registry 1 (dist 1); 11 is novel; 12 resolves to
    // the EARLIER in-batch 11 (dist 1)
    assert(v0 == Set((10L, false, 1L), (11L, true, -1L), (12L, false, 11L)), s"got $v0")
    // batch 1 sees 11's postings (the only NOVEL row appended)
    val v1 = FuzzyJoin.incrementalFuzzyResolveBatch(
        spark, store, Seq((20L, "ZZZZ")).toDF("id", "name"),
        "id", "name", batchTag = Some("t1"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getInt(3))).toSet
    assert(v1 == Set((20L, false, 11L, 0)), s"got $v1")
    val rowsBefore = spark.read.option("recursiveFileLookup", "true").parquet(store).count()
    // redelivery of batch 0 under the SAME tag: identical verdicts
    // (own delta excluded from the store view), store row count flat
    val v0r = FuzzyJoin.incrementalFuzzyResolveBatch(
        spark, store, b0, "id", "name", batchTag = Some("t0"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(v0r == v0, "redelivered batch must reproduce its verdicts")
    val rowsAfter = spark.read.option("recursiveFileLookup", "true").parquet(store).count()
    assert(rowsAfter == rowsBefore,
      s"delta overwrite must keep the store flat: $rowsBefore -> $rowsAfter")
  }

  test("canonicalization closes transitively: A~B~C is one entity though ed(A,C)=2") {
    // AAAA ~ AAAB ~ AABB chain at ed 1 each; ed(AAAA, AABB) = 2
    val reg = Seq((1L, "AAAA"), (2L, "AAAB"), (3L, "AABB"), (9L, "ZZZZ"))
      .toDF("id", "name")
    val pairs = FuzzyJoin.fuzzySelfPairs(reg, "id", "name", maxDist = 1)
      .select(col("id1").as("id_a"), col("id2").as("id_b"))
    val cc = graft.dedup.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"chain must close into one min-id entity, got $cc")
    assert(!cc.contains(9L), "singletons stay out of the pair graph")
  }

  test("fuzzyLookup k=2: 2-deletion neighborhoods find double-substitution pairs") {
    val reg = Seq((1L, "ABCDEFGHI"), (2L, "XBCDEFGHX"), (3L, "XXXXEFGHI")).toDF("rid", "rname")
    val prb = Seq((10L, "ABCDEFGHI")).toDF("pid", "pname")
    val got = FuzzyJoin.fuzzyLookup(reg, prb, "rid", "rname", "pid", "pname", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    // reg 2 shares the 2-deletion variant "BCDEFGH" -> dist 2 kept;
    // reg 3 is ed 4 -> outside the threshold
    assert(got == Set((10L, 1L, 0), (10L, 2L, 2)))
  }

  test("fuzzyLookup k=2 equal to brute force on a randomized short-serial corpus") {
    val rnd = new Random(11)
    val registry = (0 until 120).map(i => (i.toLong, f"K${rnd.nextInt(500)}%03d"))
    val probes = (0 until 25).map { i =>
      val (_, name) = registry(rnd.nextInt(registry.length))
      // perturb with 0-2 random edits (substitution or deletion)
      var s = name
      (0 until rnd.nextInt(3)).foreach { _ =>
        val pos = rnd.nextInt(s.length)
        s = if (rnd.nextBoolean() && s.length > 1) s.take(pos) + s.drop(pos + 1)
        else s.updated(pos, ('0' + rnd.nextInt(10)).toChar)
      }
      (2000L + i, s)
    }
    val got = FuzzyJoin.fuzzyLookup(
        registry.toDF("rid", "rname"), probes.toDF("pid", "pname"),
        "rid", "rname", "pid", "pname", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val want = (for {
      (pid, pn) <- probes; (rid, rn) <- registry
      d = ed(pn, rn) if d <= 2
    } yield (pid, rid, d)).toSet
    assert(got == want, s"blocked=${got.size} brute=${want.size}")
    assert(want.nonEmpty)
  }
}
