package graft.dedup

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Batch-vs-store incremental dedup: novelty verdicts, artifact reuse
  * tiers, and the store-never-shuffles plan shape. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_hstore_$tag").toString

  test("planted duplicate, novel, and null-text rows get the right verdicts") {
    val corpus = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha  beta   gamma"), // normalizes to doc 1's content
      (3L, "delta epsilon")).toDF("doc_id", "text")
    val dir = freshDir("verdicts")
    Dedup.ensureHashStore(spark, corpus, dir)
    val batch = Seq(
      (100L, "ALPHA beta gamma"), // case-folds to the group owned by id 1
      (101L, "zeta eta"),         // novel
      (102L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Dedup.newAgainstStore(spark, dir, batch)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq ==
      Seq((100L, 0L, 1L), (101L, 1L, -1L), (102L, 1L, -1L)))
  }

  test("store reuse: unchanged corpus rewrites nothing; changed corpus rebuilds") {
    val corpus = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    val dir = freshDir("reuse")
    Dedup.ensureHashStore(spark, corpus, dir)
    val files1 = Paths.get(dir).toFile.listFiles().map(f => f.getName -> f.lastModified).toMap
    Dedup.ensureHashStore(spark, corpus, dir)
    val files2 = Paths.get(dir).toFile.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(files2 == files1, "unchanged corpus must not rewrite the store")

    val corpus2 = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    Dedup.ensureHashStore(spark, corpus2, dir)
    val n = spark.read.parquet(dir).count()
    assert(n == 3, s"changed corpus must rebuild the store, got $n hashes")
  }

  test("a crashed build (no sidecar) is rebuilt, not trusted") {
    val corpus = Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text")
    val dir = freshDir("crash")
    Dedup.ensureHashStore(spark, corpus, dir)
    Files.delete(Paths.get(dir, "_graft_hashstore_sidecar.json"))
    Dedup.ensureHashStore(spark, corpus, dir)
    assert(Files.exists(Paths.get(dir, "_graft_hashstore_sidecar.json")))
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("the store side joins by broadcast — no shuffle on the big side") {
    val corpus = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("doc text number "), col("id")).as("text"))
    val dir = freshDir("plan")
    Dedup.ensureHashStore(spark, corpus, dir)
    val batch = Seq((9000L, "doc text number 7"), (9001L, "unseen")).toDF("doc_id", "text")
    val plan = Dedup.newAgainstStore(spark, dir, batch)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"store side must not be shuffle-joined:\n$plan")
  }

  test("shingle store: near-dup, novel, and exact-copy verdicts with exact Jaccard") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base),
      (2L, "completely different words about other topics entirely here now")
    ).toDF("doc_id", "text")
    val dir = freshDir("shingle")
    Dedup.ensureShingleStore(spark, corpus, dir)
    val batch = Seq(
      (100L, base + " appended tail tokens"), // near dup of 1
      (101L, base),                           // exact copy → dist 0.0
      (102L, "wholly novel content q7 w8 e9 r0 t1 y2 u3")
    ).toDF("doc_id", "text")
    val out = Dedup.nearDupsAgainstShingleStore(spark, dir, batch)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      ((r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(byId(100L)._1 == 0L && byId(100L)._2 == 1L)
    // 10-token doc: 8 shingles; +3 tokens: 11, inter 8 → 1 - 8/11
    assert(math.abs(byId(100L)._3 - (1.0 - 8.0 / 11.0)) < 1e-12)
    assert(byId(101L) == ((0L, 1L, 0.0)))
    assert(byId(102L)._1 == 1L && byId(102L)._2 == -1L)
  }

  test("shingle store: postings join by broadcast — corpus side never shuffled") {
    val corpus = spark.range(300).select(col("id").as("doc_id"),
      concat(lit("some shared prefix tokens for document number "), col("id"),
        lit(" with trailing filler words here")).as("text"))
    val dir = freshDir("shplan")
    Dedup.ensureShingleStore(spark, corpus, dir)
    val batch = Seq((9000L, "some shared prefix tokens for document number 7 with trailing filler words here extra")).toDF("doc_id", "text")
    val df = Dedup.nearDupsAgainstShingleStore(spark, dir, batch)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"posting side must not be shuffle-joined:\n$plan")
  }

  test("shingle store reuse honors the sidecar fingerprint") {
    val corpus = Seq((1L, "one two three four")).toDF("doc_id", "text")
    val dir = freshDir("shreuse")
    Dedup.ensureShingleStore(spark, corpus, dir)
    val f1 = Paths.get(dir, "sh").toFile.listFiles().map(f => f.getName -> f.lastModified).toMap
    Dedup.ensureShingleStore(spark, corpus, dir)
    val f2 = Paths.get(dir, "sh").toFile.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(f2 == f1, "unchanged corpus must not rewrite the postings")
    // a different shingleN is a DIFFERENT artifact: 4 tokens have two
    // 3-shingles but three 2-shingles — reuse here would silently serve
    // the wrong granularity
    Dedup.ensureShingleStore(spark, corpus, dir, shingleN = 2)
    assert(spark.read.parquet(s"$dir/sh").count() == 3L,
      "changed shingleN must rebuild the posting store")
  }

  test("shingle store: an all-short batch (no shingles) reports every row novel") {
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val dir = freshDir("shortbatch")
    Dedup.ensureShingleStore(spark, corpus, dir)
    val batch = Seq((100L, "just two"), (101L, "one")).toDF("doc_id", "text")
    val out = Dedup.nearDupsAgainstShingleStore(spark, dir, batch)
      .orderBy("doc_id").collect()
    assert(out.length == 2 && out.forall(r => r.getLong(1) == 1L && r.isNullAt(2)))
  }

  test("rejects a batch that already carries an 'h' column") {
    val corpus = Seq((1L, "one")).toDF("doc_id", "text")
    val dir = freshDir("hcol")
    Dedup.ensureHashStore(spark, corpus, dir)
    val batch = Seq((2L, "x", "boom")).toDF("doc_id", "text", "h")
    assertThrows[IllegalArgumentException] {
      Dedup.newAgainstStore(spark, dir, batch)
    }
  }

  test("tagged batch append is idempotent: a redelivered micro-batch rewrites its delta") {
    val corpus = Seq((1L, "seed content here")).toDF("doc_id", "text")
    val dir = freshDir("idem")
    Dedup.ensureHashStore(spark, corpus, dir)
    val batch = Seq((100L, "novel content one"), (101L, "seed content here"))
      .toDF("doc_id", "text")
    def run() = Dedup.incrementalDedupBatch(spark, dir, batch,
        batchTag = Some("b7"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    val first = run()
    assert(first == Seq((100L, 1L, -1L), (101L, 0L, 1L)))
    def storeRows() = spark.read.option("recursiveFileLookup", "true")
      .parquet(dir).count()
    val n1 = storeRows()
    // at-least-once redelivery of the SAME batch id: verdicts must not
    // flip (100 would become a dup of itself under a doubled store row)
    // and the store must not grow
    val second = run()
    assert(second == first,
      "a retried micro-batch must reproduce its verdicts exactly")
    assert(storeRows() == n1, "a retried micro-batch must not grow the store")
    // a genuinely NEW batch id with the same content: now 100's hash is
    // in the store, so the redelivered doc is a dup of batch b7's winner
    val third = Dedup.incrementalDedupBatch(spark, dir,
        Seq((200L, "novel content one")).toDF("doc_id", "text"),
        batchTag = Some("b8"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(third == Seq((200L, 0L, 100L)),
      "the next batch must see the previous batch's appended hash")
  }

  test("incremental near-dup: novel postings are appended, retries are idempotent") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val dir = freshDir("nearinc")
    Dedup.ensureShingleStore(spark, corpus, dir)
    val novel = "wholly new q1 w2 e3 r4 t5 y6 u7 i8 o9 p0 extra tokens"
    val b1 = Dedup.incrementalNearDupBatch(spark, dir,
        Seq((100L, novel)).toDF("doc_id", "text"), batchTag = "b1")
      .collect()
    assert(b1.head.getLong(1) == 1L, "first sight must be novel")
    def postings() = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/sh").count()
    val p1 = postings()
    // redeliver the SAME batch tag: store must not grow (doubled
    // postings would double n_inter for every later verdict)
    Dedup.incrementalNearDupBatch(spark, dir,
      Seq((100L, novel)).toDF("doc_id", "text"), batchTag = "b1").collect()
    assert(postings() == p1, "a retried micro-batch must rewrite, not double, its delta")
    // batch 2: a near-dup of the doc APPENDED by batch 1 — durable
    // cross-batch memory through the posting artifact
    val b2 = Dedup.incrementalNearDupBatch(spark, dir,
        Seq((200L, novel + " tail")).toDF("doc_id", "text"), batchTag = "b2")
      .collect()
    assert(b2.head.getLong(1) == 0L && b2.head.getLong(2) == 100L,
      s"batch 2 must match batch 1's appended doc, got ${b2.toSeq}")
  }

  // ------------------------------------------------ signature store

  test("signature store: verdicts take the minimal (hamming, id) seed match") {
    val dir = freshDir("sig")
    // seed: ids 1 and 2 one bit apart; id 3 far away
    val seed = Seq((1L, 0L), (2L, 1L), (3L, 0x0f0f0f0f0f0f0f0fL))
      .toDF("media_id", "sig")
    Dedup.ensureSigStore(spark, seed, dir)
    val batch = Seq(
      (10L, 1L),                  // hamming 0 vs id 2, 1 vs id 1 → dup of 2
      (11L, 3L),                  // hamming 1 vs id 2 (and 2 vs id 1) → dup of 2
      (12L, 0x7070707070707070L)) // ≥ 4 from everything → novel
      .toDF("media_id", "sig")
    val out = Dedup.incrementalSigDedupBatch(spark, dir, batch, "t1")
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
    assert(out.toSeq == Seq(
      (10L, 0L, 2L, 0), (11L, 0L, 2L, 1), (12L, 1L, -1L, -1)))
    // the novel signature landed as a delta and dedups the NEXT batch
    val b2 = Dedup.incrementalSigDedupBatch(spark, dir,
        Seq((20L, 0x7070707070707071L)).toDF("media_id", "sig"), "t2")
      .collect()
    assert(b2.head.getLong(1) == 0L && b2.head.getLong(2) == 12L &&
      b2.head.getInt(3) == 1, s"batch 2 must match batch 1's delta: ${b2.toSeq}")
  }

  test("signature store: a redelivered tagged batch rewrites its delta, never doubles") {
    val dir = freshDir("sig_retry")
    Dedup.ensureSigStore(spark,
      Seq((1L, 0L)).toDF("media_id", "sig"), dir)
    val batch = Seq((10L, 0xff00ff00ff00ff00L)).toDF("media_id", "sig")
    val first = Dedup.incrementalSigDedupBatch(spark, dir, batch, "tr")
      .collect()
    assert(first.head.getLong(1) == 1L)
    // redelivery of the SAME tag: its own previous delta is excluded
    // from the store view, so the verdict stays novel (not dup-of-self)
    val retry = Dedup.incrementalSigDedupBatch(spark, dir, batch, "tr")
      .collect()
    assert(retry.head.getLong(1) == 1L,
      s"retry must not see its own delta: ${retry.toSeq}")
    // and the store carries exactly one delta row for the tag
    val store = spark.read.option("recursiveFileLookup", "true").parquet(dir)
    assert(store.count() == 2L)
  }
}
