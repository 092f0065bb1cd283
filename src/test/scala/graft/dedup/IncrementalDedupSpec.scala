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

  test("rejects a batch that already carries an 'h' column") {
    val corpus = Seq((1L, "one")).toDF("doc_id", "text")
    val dir = freshDir("hcol")
    Dedup.ensureHashStore(spark, corpus, dir)
    val batch = Seq((2L, "x", "boom")).toDF("doc_id", "text", "h")
    assertThrows[IllegalArgumentException] {
      Dedup.newAgainstStore(spark, dir, batch)
    }
  }
}
