package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.VectorSearch

/** Tombstone deletes + versioned atomic compaction on the SQ8 code
  * store and the binary signature store (r13 VERDICT tasks 1+2). */
class SqDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8
  private lazy val corpus = {
    val rng = new scala.util.Random(73)
    (0L until 200L).map(i => (i, Array.fill(dim)(rng.nextFloat() * 4f - 2f)))
      .toDF("vec_id", "embedding").localCheckpoint()
  }

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def q(id: Long): Array[Float] = corpus.filter(col("vec_id") === id)
    .select(col("embedding")).head().getSeq[Float](0).toArray

  private def topk(dir: String, live: org.apache.spark.sql.DataFrame,
      query: Array[Float]): Seq[(Long, Double)] = {
    val m = Sq.modelFromArtifact(spark, dir)
    Sq.searchRerank(Sq.codesWithDeltas(spark, dir), live, m, query,
        k = 5, shortlist = 60)
      .select("vec_id", "dist").as[(Long, Double)].collect().toSeq
  }

  test("describeStore reports version, live legs, and the probe-consistent code count") {
    val dir = tmp("sqdescr")
    Sq.ensureCodesArtifact(corpus, dir)
    Sq.appendDelta(spark, dir,
      corpus.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 900L).as("vec_id"), col("embedding")), tag = "a1")
    Sq.deleteVectors(spark, dir,
      corpus.filter(col("vec_id").isin(5L, 6L)), tag = "d1")
    def describe(): Map[String, Long] =
      Sq.describeStore(spark, dir).as[(String, Long)].collect().toMap
    val before = describe()
    assert(before("base_version") == 0L && before("live_deltas") == 1L &&
      before("live_tombstones") == 1L)
    assert(before("n_codes") == 200L + 1L - 2L)
    // the described count IS what the probe scans
    assert(before("n_codes") == Sq.codesWithDeltas(spark, dir).count())

    Sq.compactDeltas(spark, dir)
    val after = describe()
    assert(after("base_version") == 1L && after("live_deltas") == 0L &&
      after("live_tombstones") == 0L,
      s"compaction must fold legs and bump the version, got $after")
    assert(after("n_codes") == before("n_codes"),
      "the live code count must be invariant across a compaction")
  }

  test("SQ8 delete masks; re-append revives; compaction drops, versions, and a fresh ensure REUSES") {
    val dir = tmp("sqdel")
    Sq.ensureCodesArtifact(corpus, dir)
    val query = q(3L)
    val exactIds = VectorSearch.knnExact(corpus, query.toSeq, 4)
      .select("vec_id").as[Long].collect().toSeq
    val delIds = exactIds.filter(_ != 3L).take(2)
    Sq.deleteVectors(spark, dir,
      corpus.filter(col("vec_id").isin(delIds: _*)), tag = "t1")
    val live = corpus.filter(!col("vec_id").isin(delIds: _*))
    val got = topk(dir, live, query)
    val want = VectorSearch.knnExact(live, query.toSeq, 5)
      .select("vec_id", "dist").as[(Long, Double)].collect().toSeq
    assert(got == want, s"post-delete SQ8 rerank must equal exact over survivors")
    assert(!got.exists(r => delIds.contains(r._1)))

    // re-append one deleted vector (same id + embedding) — revived
    Sq.appendDelta(spark, dir,
      corpus.filter(col("vec_id") === delIds.head), tag = "t2")
    val live2 = corpus.filter(col("vec_id") =!= delIds(1))
    assert(topk(dir, live2, query) ==
      VectorSearch.knnExact(live2, query.toSeq, 5)
        .select("vec_id", "dist").as[(Long, Double)].collect().toSeq,
      "delete-then-append must revive the vector")

    // compaction: physical drop + versioned swap + consumed terms
    val before = topk(dir, live2, query)
    Sq.compactDeltas(spark, dir)
    assert(topk(dir, live2, query) == before, "probe invariant across compaction")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/codes_v1")))
    // GC is LAGGED: the superseded base survives its own commit (a
    // snapshot-pinned probe may still be reading it) and is collected
    // at the START of the next compaction
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/codes")),
      "superseded base must be RETAINED until the next compaction (lagged GC)")
    assert(spark.read.parquet(Sq.codesPath(dir))
      .filter(col("vec_id") === delIds(1)).count() == 0L,
      "tombstoned row must be physically dropped")
    // a fresh ensure over the post-delete corpus reuses (no rebuild):
    // the codes_v1 files must be untouched afterwards
    val fp = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/codes_v1"))
    Sq.ensureCodesArtifact(live2, dir)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/codes_v1")) &&
      java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(s"$dir/codes_v1")) == fp,
      "fresh ensure over the post-delete corpus must REUSE the compacted store")
    assert(topk(dir, live2, query) == before)

    // the NEXT compaction's lagged GC collects the superseded dirs:
    // after it, the flat v0 base is gone, v1 is retained (the newly
    // superseded version — one more round of retention), v2 committed
    Sq.appendDelta(spark, dir,
      corpus.filter(col("vec_id") === 0L)
        .select((col("vec_id") + 7000L).as("vec_id"), col("embedding")), tag = "t3")
    Sq.compactDeltas(spark, dir)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/codes")),
      "the v0 base must be GC'd by the NEXT compaction")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/codes_v1")),
      "the just-superseded v1 is retained until the following compaction")
    assert(Sq.codesPath(dir) == s"$dir/codes_v2")
  }

  test("SQ8 crash windows: uncommitted version dir invisible; folded delta on disk skipped") {
    val dir = tmp("sqcrash")
    Sq.ensureCodesArtifact(corpus, dir)
    val batch = corpus.filter(col("vec_id") < 3L)
      .select((col("vec_id") + lit(9000L)).as("vec_id"), col("embedding"))
    Sq.appendDelta(spark, dir, batch, tag = "d1")
    val query = q(0L)
    val live = corpus.unionAll(batch)
    val want = topk(dir, live, query)
    // window A: version data written, commit never happened
    val ghost = java.nio.file.Paths.get(s"$dir/codes_v1")
    java.nio.file.Files.createDirectories(ghost)
    java.nio.file.Files.writeString(ghost.resolve("junk.parquet"), "junk")
    assert(topk(dir, live, query) == want, "uncommitted version must be invisible")
    // never-reuse: the compaction skips PAST the debris number (the
    // ghost is GC'd, its version is not recycled) and commits v2
    Sq.compactDeltas(spark, dir)
    assert(Sq.codesPath(dir) == s"$dir/codes_v2",
      "a crashed attempt's version number must never be reused")
    assert(!java.nio.file.Files.exists(ghost), "debris must be GC'd")
    assert(topk(dir, live, query) == want)
    // window B: folded delta resurrected on disk — sidecar must mask it
    Sq.appendDelta(spark, dir, batch, tag = "d1")
    assert(topk(dir, live, query) == want,
      "a sidecar-folded delta dir must not double-count")
  }

  test("binary signature store: delete masks, compaction drops + versions + ensure reuses") {
    val dir = tmp("bindel")
    Binary.ensureSignatureArtifact(corpus, dir, dim)
    val thr = Binary.thresholdsFromArtifact(spark, dir)
    val query = q(5L)
    val full = Binary.hammingTopK(Binary.liveSignatures(spark, dir),
      Binary.signatureOf(query.toSeq, thr), 5)
      .as[(Long, Int)].collect().toSeq
    val delIds = full.map(_._1).filter(_ != 5L).take(2)
    Binary.deleteFromArtifact(spark, dir,
      corpus.filter(col("vec_id").isin(delIds: _*)), tag = "t1")
    val got = Binary.hammingTopK(Binary.liveSignatures(spark, dir),
      Binary.signatureOf(query.toSeq, thr), 5).as[(Long, Int)].collect().toSeq
    assert(!got.exists(r => delIds.contains(r._1)))
    // fresh-build equivalence: signatures over survivors with the SAME
    // thresholds (trained-index contract: deletes never refit)
    val want = Binary.hammingTopK(
      Binary.signatures(corpus.filter(!col("vec_id").isin(delIds: _*)), thr),
      Binary.signatureOf(query.toSeq, thr), 5).as[(Long, Int)].collect().toSeq
    assert(got == want)

    Binary.compactSignatures(spark, dir)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/sigs_v1")))
    // lagged GC: the superseded base is retained until the NEXT
    // compaction (snapshot-pinned probes may still read it)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/sigs")))
    assert(Binary.signaturesFromArtifact(spark, dir)
      .filter(col("vec_id").isin(delIds: _*)).count() == 0L)
    assert(Binary.hammingTopK(Binary.liveSignatures(spark, dir),
      Binary.signatureOf(query.toSeq, thr), 5)
      .as[(Long, Int)].collect().toSeq == want)
    // fresh ensure over the post-delete corpus field-matches and reuses
    val t0 = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/sigs_v1"))
    Binary.ensureSignatureArtifact(
      corpus.filter(!col("vec_id").isin(delIds: _*)), dir, dim)
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$dir/sigs_v1")) == t0,
      "post-compaction sidecar must match a fresh ensure over survivors")
  }
}
