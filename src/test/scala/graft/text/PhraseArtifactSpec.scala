package graft.text

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The persisted phrase-set artifact: rewrite equivalence, sidecar
  * reuse, and parameter invalidation. */
class PhraseArtifactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // enough repetition that ("new", "york") clears minCount and wins PMI
  private lazy val df = (1 to 12).map(i =>
      (i.toLong, s"i flew to new york and new york greeted visitor number v$i"))
    .toDF("doc_id", "text")

  test("artifact-backed rewrite equals the direct rewrite") {
    val dir = Files.createTempDirectory("phr_eq").toString
    TextAnalysis.ensurePhraseArtifact(spark, df, dir,
      minCount = 5L, topK = 5, broadcastUnigrams = true)
    val direct = TextAnalysis.phraseRewrite(df,
        minCount = 5L, topK = 5, broadcastUnigrams = true)
      .orderBy("doc_id").collect().toSeq
    val viaArtifact = TextAnalysis.phraseRewriteWithArtifact(spark, df, dir)
      .orderBy("doc_id").collect().toSeq
    assert(viaArtifact == direct)
    // and the phrase actually fired: fewer tokens after the rewrite
    assert(direct.forall(r => r.getLong(2) < r.getLong(1)),
      "the planted collocation must merge in every doc")
  }

  test("sidecar reuse: unchanged corpus+params rewrite nothing; changed params rebuild") {
    val dir = Files.createTempDirectory("phr_reuse").toString
    TextAnalysis.ensurePhraseArtifact(spark, df, dir, minCount = 5L, topK = 5)
    val f1 = new java.io.File(s"$dir/data").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    TextAnalysis.ensurePhraseArtifact(spark, df, dir, minCount = 5L, topK = 5)
    val f2 = new java.io.File(s"$dir/data").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(f2 == f1, "unchanged inputs must not re-derive the phrase set")
    // a different topK is a DIFFERENT artifact — must re-derive
    TextAnalysis.ensurePhraseArtifact(spark, df, dir, minCount = 5L, topK = 1)
    val n = spark.read.parquet(s"$dir/data").count()
    assert(n == 1L, s"changed topK must rebuild the artifact, got $n phrases")
  }

  test("fused phrase-merge kernel bit-matches the declarative fold") {
    import org.apache.spark.sql.functions._
    // chain case: after "new york" merges, "york times" must NOT fire
    // on the consumed york; a fresh "york times" later must
    val docs = Seq(
      (1L, "i read the new york times in new york york times"),
      (2L, "a a a a"),            // self-run under phrase "a a"
      (3L, "one"),                // single token
      (4L, ""),                   // empty
      (5L, "new york new york times")) // merge then chain boundary
      .toDF("doc_id", "text")
    val phrases = Seq("new york", "york times", "a a")
    val toks = TextAnalysis.tokens(col("text"))
    val both = docs.select(
      org.apache.spark.sql.graft.VectorExpressions.phraseMerge(toks, phrases).as("k"),
      TextAnalysis.phraseMergeHof(toks, phrases).as("h"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"kernel ${r.getSeq[String](0)} != fold ${r.getSeq[String](1)}")
    }
    // and the greedy semantics themselves, pinned
    val d1 = docs.filter(col("doc_id") === 1L).select(
      org.apache.spark.sql.graft.VectorExpressions.phraseMerge(toks, phrases))
      .head().getSeq[String](0)
    assert(d1 == Seq("i", "read", "the", "new_york", "times", "in",
      "new_york", "york_times"), d1.toString)
  }

  test("changed corpus invalidates the artifact") {
    val dir = Files.createTempDirectory("phr_inval").toString
    TextAnalysis.ensurePhraseArtifact(spark, df, dir, minCount = 5L, topK = 5)
    val df2 = (1 to 12).map(i =>
        (i.toLong, s"the hong kong and hong kong phrase repeats here time t$i"))
      .toDF("doc_id", "text")
    TextAnalysis.ensurePhraseArtifact(spark, df2, dir, minCount = 5L, topK = 5)
    val phrases = spark.read.parquet(s"$dir/data")
      .collect().map(r => r.getString(0) + " " + r.getString(1)).toSet
    assert(phrases.contains("hong kong"),
      s"rebuilt artifact must reflect the new corpus, got $phrases")
  }
}
