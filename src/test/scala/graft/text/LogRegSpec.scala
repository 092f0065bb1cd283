package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LogRegSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Linearly separable corpus: label 1 docs carry 'alpha', label 0
    * docs carry 'omega'; shared filler tokens everywhere. */
  private def separable(n: Int) = {
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val word = if (pos) "alpha" else "omega"
      val lang = if (pos) "en" else "xx"
      (i.toLong, s"filler common $word common filler tail$i", lang)
    }.toDF("doc_id", "text", "lang")
  }

  test("trainLogistic reaches zero training error on a separable corpus") {
    val d = separable(80)
    val vocab = LogReg.topVocab(d, 8)
    assert(vocab.contains("alpha") && vocab.contains("omega"))
    val feats = LogReg.features(d, vocab, col("lang") === "en")
    val w = LogReg.trainLogistic(feats, vocab.length + 1, iters = 40)
    val wrong = LogReg.scores(feats, w)
      .filter(col("pred") =!= (col("y") === 1.0)).count()
    assert(wrong == 0, s"separable corpus must reach zero training error, got $wrong wrong")
  }

  test("trainLogistic weights are bit-identical across partitionings") {
    val d = separable(60)
    val vocab = LogReg.topVocab(d, 8)
    val f1 = LogReg.features(d.repartition(1), vocab, col("lang") === "en")
    val f7 = LogReg.features(d.repartition(7), vocab, col("lang") === "en")
    val w1 = LogReg.trainLogistic(f1, vocab.length + 1, iters = 15)
    val w7 = LogReg.trainLogistic(f7, vocab.length + 1, iters = 15)
    assert(w1.toSeq == w7.toSeq,
      "integer-quantized gradient reduction must be partitioning-invariant")
  }

  test("ensureModelArtifact trains once and reuses; loadModel round-trips") {
    val d = separable(40)
    val dir = java.nio.file.Files.createTempDirectory("lrspec").toString
    LogReg.ensureModelArtifact(spark, d, dir, labelLang = "en", vocabK = 8, iters = 10)
    val (vocab1, w1) = LogReg.loadModel(spark, dir)
    LogReg.ensureModelArtifact(spark, d, dir, labelLang = "en", vocabK = 8, iters = 10)
    val (vocab2, w2) = LogReg.loadModel(spark, dir)
    assert(vocab1 == vocab2 && w1.toSeq == w2.toSeq)
    assert(vocab1 == LogReg.topVocab(d, 8))
    val feats = LogReg.features(d, vocab1, col("lang") === "en")
    val fresh = LogReg.trainLogistic(feats, vocab1.length + 1, iters = 10)
    assert(w1.toSeq == fresh.toSeq, "artifact weights == a fresh train on the same corpus")
  }

  test("rational sigmoid is monotone, bounded, and exactly 0.5 at z=0") {
    val d = Seq((1L, "a", "en")).toDF("doc_id", "text", "lang")
    val feats = LogReg.features(d, Seq("a"), col("lang") === "en")
    // weights 0 -> z=0 -> score exactly 500000 micro
    val s0 = LogReg.scores(feats, Array(0L, 0L)).select("score_micro").as[Long].head()
    assert(s0 == 500000L)
    val sPos = LogReg.scores(feats, Array(2000000L, 0L)).select("score_micro").as[Long].head()
    val sNeg = LogReg.scores(feats, Array(-2000000L, 0L)).select("score_micro").as[Long].head()
    assert(sPos > 500000L && sPos < 1000000L)
    assert(sNeg < 500000L && sNeg >= 0L)
  }
}
