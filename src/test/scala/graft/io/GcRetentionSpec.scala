package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.text.InvertedIndex

/** The lagged-GC RETENTION KNOB ([[MutableStore.gcRetention]]): every
  * compaction commit pushes the pre-compaction snapshot's refs onto
  * the sidecar's `priors` list, and GC protects the newest
  * (retention - 1) priors. Proven here on both sidecar styles:
  *
  *  - retention = 1 (default, the historical contract): a probe pinned
  *    across TWO compaction commits LOSES the files its snapshot named
  *    — the documented failure the knob exists to fix;
  *  - retention = 2: the same interleaving serves the wholly-old state
  *    through both commits, including a pinned LIVE DELTA leg;
  *  - the bound is exact: a third commit under retention = 2 collects
  *    the now-unprotected snapshot.
  */
class GcRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def withRetention[A](r: Int)(body: => A): A = {
    val prev = MutableStore.gcRetention
    MutableStore.gcRetention = r
    try body finally MutableStore.gcRetention = prev
  }

  // ------------------------------------------------- fuzzy flat store

  private def fuzzyFixture(name: String): String = {
    import graft.ops.FuzzyJoin
    val dir = tmp(name)
    val registry = (1L to 9L).map(i => (i, f"name-$i%04d")).toDF("id", "name")
    FuzzyJoin.ensureFuzzyStore(spark, registry, dir, "id", "name")
    // first compaction → a versioned base (v1), empty live lists
    FuzzyJoin.incrementalFuzzyResolveBatch(spark, dir,
      Seq((50L, "zzz-unique-zzz")).toDF("id", "name"),
      "id", "name", batchTag = Some("a1")).collect()
    FuzzyJoin.compactFuzzyStore(spark, dir)
    assert(MutableStore.state(dir).v == 1)
    dir
  }

  private def fuzzyCommit(dir: String, id: Long, tag: String): Unit = {
    import graft.ops.FuzzyJoin
    // names pairwise FAR apart (edit distance ≫ 1), or the resolver
    // treats the new row as a near-match and appends nothing
    FuzzyJoin.incrementalFuzzyResolveBatch(spark, dir,
      Seq((id, s"uniq$id" * 3)).toDF("id", "name"),
      "id", "name", batchTag = Some(tag)).collect()
    FuzzyJoin.compactFuzzyStore(spark, dir)
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("store_id").distinct().as[Long].collect().toSet

  test("retention=1 (default): a view pinned across TWO compaction commits loses its files — the documented bound") {
    import graft.ops.FuzzyJoin
    val dir = fuzzyFixture("ret1_fuzzy")
    val wantOld = ids(FuzzyJoin.fuzzyStoreView(spark, dir))
    val pinned = FuzzyJoin.fuzzyStoreView(spark, dir) // pinned at v1

    fuzzyCommit(dir, 60L, "a2") // commit v2 — lagged GC keeps v1
    fuzzyCommit(dir, 61L, "a3") // commit v3 — ITS GC collects v1

    val got = try Some(ids(pinned)) catch { case _: Throwable => None }
    assert(got != Some(wantOld),
      "under retention=1 the v1 snapshot's base must be GONE after two " +
        "commits — surviving would mean the GC window is wider than documented")
  }

  test("retention=2: the same pinned view (base + a LIVE delta leg) survives TWO interleaved commits; a third collects it") {
    import graft.ops.FuzzyJoin
    withRetention(2) {
      val dir = fuzzyFixture("ret2_fuzzy")
      // a live (uncompacted) delta leg joins the pinned snapshot
      FuzzyJoin.incrementalFuzzyResolveBatch(spark, dir,
        Seq((55L, "live-leg-aaa")).toDF("id", "name"),
        "id", "name", batchTag = Some("live1")).collect()
      val wantOld = ids(FuzzyJoin.fuzzyStoreView(spark, dir))
      assert(wantOld.contains(55L), "fixture: the live delta leg is probed")
      val pinned = FuzzyJoin.fuzzyStoreView(spark, dir) // pinned at (v1, live1)

      fuzzyCommit(dir, 60L, "a2") // commit v2 (folds live1 + a2)
      fuzzyCommit(dir, 61L, "a3") // commit v3 — v1 refs still protected

      assert(ids(pinned) == wantOld,
        "retention=2 must keep the pinned snapshot's base AND delta dirs " +
          "readable through two consecutive compaction commits")

      // the bound is exact: the third commit unprotects (v1, live1)
      fuzzyCommit(dir, 62L, "a4")
      val pinnedAgain = try Some(ids(pinned)) catch { case _: Throwable => None }
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "base_v1")),
        "the third commit's GC collects the now-unprotected v1 base")
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "delta_live1")),
        "…and the folded delta leg the expired snapshot pinned")
      // fresh probes keep serving the current state
      assert(ids(FuzzyJoin.fuzzyStoreView(spark, dir))
        == wantOld ++ Set(60L, 61L, 62L))
      pinnedAgain // (result after expiry is undefined — only no-alias matters)
    }
  }

  test("PER-STORE retention policy: a persisted override beats the process default, per store") {
    import graft.ops.FuzzyJoin
    // global default stays 1; THIS store persists a policy of 2
    val dir = fuzzyFixture("retper_fuzzy")
    MutableStore.setGcRetention(dir, Some(2))
    try {
      val wantOld = ids(FuzzyJoin.fuzzyStoreView(spark, dir))
      val pinned = FuzzyJoin.fuzzyStoreView(spark, dir) // pinned at v1
      fuzzyCommit(dir, 60L, "a2")
      fuzzyCommit(dir, 61L, "a3")
      assert(ids(pinned) == wantOld,
        "the store's persisted retention=2 must protect the pinned " +
          "snapshot through two commits even though the process default is 1")
      // a SIBLING store without the policy keeps the default-1 bound
      val other = fuzzyFixture("retper_other")
      val wantO = ids(FuzzyJoin.fuzzyStoreView(spark, other))
      val pinnedO = FuzzyJoin.fuzzyStoreView(spark, other)
      fuzzyCommit(other, 60L, "a2")
      fuzzyCommit(other, 61L, "a3")
      val gotO = try Some(ids(pinnedO)) catch { case _: Throwable => None }
      assert(gotO != Some(wantO), "the un-policied store keeps the default bound")
      // clearing the policy restores the default for the next GC
      MutableStore.setGcRetention(dir, None)
      assert(MutableStore.gcRetentionOf(dir) == MutableStore.gcRetention)
    } finally MutableStore.setGcRetention(dir, None)
  }

  test("TTL retention policy: a long TTL protects across MANY commits; expiry (ttl=0) restores the tight bound") {
    import graft.ops.FuzzyJoin
    val dir = fuzzyFixture("retttl_fuzzy")
    MutableStore.setGcRetentionTtl(dir, 60L * 60L * 1000L) // 1 h
    try {
      val wantOld = ids(FuzzyJoin.fuzzyStoreView(spark, dir))
      val pinned = FuzzyJoin.fuzzyStoreView(spark, dir) // pinned at v1
      // three consecutive commits — far past any count-based default
      fuzzyCommit(dir, 60L, "a2")
      fuzzyCommit(dir, 61L, "a3")
      fuzzyCommit(dir, 62L, "a4")
      assert(ids(pinned) == wantOld,
        "a 1 h TTL must protect the pinned snapshot through every commit " +
          "inside the window, however many land")
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "base_v1")))
      // flip to ttl=0: every prior is past its window → the next
      // compaction collects them all
      MutableStore.setGcRetentionTtl(dir, 0L)
      fuzzyCommit(dir, 63L, "a5")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "base_v1")),
        "at ttl=0 every expired prior's files are collected at the next compaction")
      // fresh views keep serving the current state throughout
      assert(ids(FuzzyJoin.fuzzyStoreView(spark, dir)) ==
        wantOld ++ Set(60L, 61L, 62L, 63L))
    } finally MutableStore.setGcRetention(dir, None)
  }

  // ------------------------------------------------- posting store

  private def postingCommit(
      dir: String, table: String, id: Long, tag: String): Unit = {
    InvertedIndex.appendDelta(spark, dir,
      Seq((id, s"filler$id words")).toDF("doc_id", "text"), tag)
    InvertedIndex.compactDeltas(spark, table, dir, buckets = 4)
  }

  test("posting store, retention=2: a bm25 probe pinned at v1 survives two catalog-swapping commits; retention=1 does not") {
    val docs = Seq(
      (0L, "zebra apple"), (1L, "zebra banana"), (2L, "apple banana")
    ).toDF("doc_id", "text")

    def run(retention: Int, suffix: String): Option[Seq[(Long, Long, Long)]] =
      withRetention(retention) {
        val dir = tmp(s"ret_bm25_$suffix")
        val table = s"ret_bm25_t_$suffix"
        InvertedIndex.ensure(spark, docs, table, dir, buckets = 4)
        postingCommit(dir, table, 10L, "a1") // → v1
        val pinned = InvertedIndex
          .bm25SearchDeltaAware(spark, table, dir, Seq("zebra"))
        postingCommit(dir, table, 11L, "a2") // → v2
        postingCommit(dir, table, 12L, "a3") // → v3
        try Some(pinned.as[(Long, Long, Long)].collect().toSeq)
        catch { case _: Throwable => None }
      }

    val wantOld = Seq((0L, 1L), (1L, 1L)) // zebra docs (scores checked below)
    val surviving = run(2, "r2")
    assert(surviving.isDefined && surviving.get.map(_._1).sorted
      == wantOld.map(_._1),
      s"retention=2: the pinned v1 probe must execute and serve the old " +
        s"state across two commits, got $surviving")
    val dying = run(1, "r1")
    assert(dying != surviving,
      "retention=1: the pinned v1 probe must NOT serve the old state after " +
        "two commits (its base files are collected at the third compaction's start)")
  }
}
