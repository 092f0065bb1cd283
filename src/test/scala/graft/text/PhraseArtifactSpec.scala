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
