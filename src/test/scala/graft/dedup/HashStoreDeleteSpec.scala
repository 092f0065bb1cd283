package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Takedown on the incremental exact-dedup hash store: a scrubbed
  * document's content hash is derived data and must go too. Covered-leg
  * tombstones on (h, first_id) pairs; content re-crawled AFTER the
  * takedown re-enters; compaction is the engine-wide versioned atomic
  * swap with physical drop. */
class HashStoreDeleteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (0L, "alpha beta gamma"),
    (1L, "delta epsilon zeta"),
    (2L, "alpha beta gamma"), // dup of 0
    (3L, "eta theta iota"),
    (4L, "kappa lambda mu")).toDF("doc_id", "text")

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def verdicts(dir: String, batch: org.apache.spark.sql.DataFrame): Map[Long, (Long, Option[Long])] =
    Dedup.newAgainstStore(spark, dir, batch)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

  test("takedown of a first owner forgets the content; a dup's takedown is a no-op; re-crawl after takedown re-enters") {
    val dir = tmp("hsdel")
    Dedup.ensureHashStore(spark, corpus, dir)
    // delete doc 3 (sole owner of its content) and doc 2 (a DUP of 0 —
    // its (h, 2) pair was never stored, so this must change nothing
    // about content 'alpha beta gamma')
    Dedup.deleteFromHashStore(spark, dir,
      corpus.filter(col("doc_id").isin(2L, 3L)), tag = "t1")
    val probe = Seq(
      (100L, "eta theta iota"),    // deleted owner's content -> novel
      (101L, "alpha beta gamma"),  // owner 0 still live -> dup of 0
      (102L, "totally fresh text") // never seen -> novel
    ).toDF("doc_id", "text")
    val v = verdicts(dir, probe)
    assert(v(100L) == (1L, None), s"takedown must forget doc 3's content: ${v(100L)}")
    assert(v(101L) == (0L, Some(0L)))
    assert(v(102L) == (1L, None))

    // re-crawl of the deleted content via a LATER batch: re-enters the
    // store under the new id (the tombstone covers only prior legs)
    val re = Seq((200L, "eta theta iota")).toDF("doc_id", "text")
    val rv = Dedup.incrementalDedupBatch(spark, dir, re, batchTag = Some("re"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rv(200L) == 1L, "re-crawled content must report novel")
    val v2 = verdicts(dir, Seq((300L, "eta theta iota")).toDF("doc_id", "text"))
    assert(v2(300L) == (0L, Some(200L)),
      s"content re-added after the takedown must dedupe against the new owner: ${v2(300L)}")
  }

  test("compaction: physical drop, versioned swap, probe invariance, crash windows") {
    val dir = tmp("hscomp")
    Dedup.ensureHashStore(spark, corpus, dir)
    Dedup.deleteFromHashStore(spark, dir,
      corpus.filter(col("doc_id") === 3L), tag = "t1")
    Dedup.incrementalDedupBatch(spark, dir,
      Seq((500L, "new stream doc")).toDF("doc_id", "text"), batchTag = Some("b1"))
    val probe = Seq(
      (100L, "eta theta iota"), (101L, "new stream doc"),
      (102L, "delta epsilon zeta")).toDF("doc_id", "text")
    val want = verdicts(dir, probe)
    assert(want(100L) == (1L, None) && want(101L) == (0L, Some(500L)) &&
      want(102L) == (0L, Some(1L)))

    // crash window A1: a half-written _building attempt (possibly
    // unreadable junk) must not even be LISTED by the store read
    val half = java.nio.file.Paths.get(s"$dir/_building_base_v1")
    java.nio.file.Files.createDirectories(half)
    java.nio.file.Files.writeString(half.resolve("junk.parquet"), "junk")
    assert(verdicts(dir, probe) == want)
    // crash window A2: a RENAMED-but-uncommitted base_v1 (valid
    // parquet, duplicate rows) must be row-filtered out at v=0
    spark.read.option("recursiveFileLookup", "true").parquet(dir)
      .where(!input_file_name().rlike("/base_v|/_building|/delta_|/_tomb"))
      .write.mode("overwrite").parquet(s"$dir/base_v1")
    assert(verdicts(dir, probe) == want)

    Dedup.compactHashStore(spark, dir)
    assert(verdicts(dir, probe) == want, "probe invariant across compaction")
    // physical state: one fresh versioned base (v skips past the
    // debris — a version path is written exactly once, so cached file
    // listings of old paths can never alias fresh data), debris and
    // old versions GC'd, no deltas, no tombstones
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/base_v2")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/base_v1")),
      "debris version must be GC'd")
    val baseRows = spark.read.parquet(s"$dir/base_v2")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(baseRows.exists(_._2 == 500L), "folded delta row must be in the new base")
    assert(!baseRows.exists(_._2 == 3L), "tombstoned pair must be dropped")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/delta_b1")))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/_tombstones/t1")))

    // crash window B: a folded delta resurrected on disk is skipped
    Dedup.incrementalDedupBatch(spark, dir,
      Seq((500L, "new stream doc")).toDF("doc_id", "text"), batchTag = Some("b1"))
    assert(verdicts(dir, probe) == want,
      "a state-file-folded delta dir must not double-count")
  }
}
