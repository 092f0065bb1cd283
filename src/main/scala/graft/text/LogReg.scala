package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-engine logistic-regression training — the quality/domain
  * classifier a pretraining pipeline trains over its own corpus (the
  * fastText/DCLM move: label a slice, fit a linear model, score
  * everything), here as DETERMINISTIC full-batch gradient descent
  * under the hash gate:
  *
  *   - the link is the RATIONAL sigmoid σ̃(z) = 0.5 + 0.5·z/(1+|z|)
  *     (Elliott '93's fast-sigmoid family) — +, ×, /, |·| are all
  *     IEEE-754 correctly-rounded, so unlike exp() there is NO libm
  *     variance between engines: every probability is bit-identical;
  *   - per-row gradient contributions quantize to micro-unit Longs
  *     BEFORE the reduction, so the gradient sum is an integer sum —
  *     order-independent and exact across any partitioning (the
  *     distributed-SGD nondeterminism problem solved by integer
  *     reduction rather than by prayer);
  *   - weights live as micro-unit Longs; the update is TRUNCATING
  *     integer division (Scala Long `/`, DuckDB `//` — both round
  *     toward zero), delta_j = (lrNum·Σg_j) / (lrDen·n).
  *
  * 100 TB shape: each GD round is ONE narrow scan of the feature
  * table with a map-side partial aggregate producing dim+1 Longs at
  * the driver; weights re-enter the next round as plan literals
  * (broadcast by value). Rounds are driver-bounded like
  * [[Bpe.learnRounds]]; nothing corpus-sized ever reaches the driver.
  *
  * Features here are the top-`vocabK` corpus tokens' relative
  * frequencies (10·cnt/n, float64, exact-op derivation both engines
  * replay) plus a bias — the hashed-/explicit-BoW family every linear
  * text classifier uses. On this synthetic corpus the lang label is
  * near-noise (documented honestly; the NB classifier query makes the
  * same modest claim) — the OPERATOR under test is the deterministic
  * distributed trainer, and the spec proves convergence to zero
  * training error on a linearly-separable corpus. */
object LogReg {

  /** Top-`k` corpus tokens by (count DESC, token ASC) — the feature
    * vocabulary. Driver-bounded collect of exactly `k` rows. */
  def topVocab(df: DataFrame, k: Int, textCol: String = "text"): Seq[String] = {
    require(k >= 1 && k <= 64, s"vocabK must be in [1,64], got $k")
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc)
      .limit(k)
      .collect().map(_.getString(0)).toSeq
  }

  /** Per-doc feature row: (idCol, y, x00 = bias 1.0,
    * x01..x{k} = (10.0·cnt_j)/n_toks). One narrow map pass — the
    * vocabulary is a plan literal. */
  def features(
      df: DataFrame,
      vocab: Seq[String],
      label: Column,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val n = size(toks).cast("double")
    val xs = lit(1.0).as("x00") +: vocab.zipWithIndex.map { case (v, j) =>
      ((lit(10.0) * size(filter(toks, t => t === lit(v))).cast("double")) / n)
        .as(f"x${j + 1}%02d")
    }
    df.select(col(idCol) +: when(label, lit(1.0)).otherwise(lit(0.0)).as("y") +: xs: _*)
  }

  private def featCols(dim: Int): Seq[String] = (0 until dim).map(j => f"x$j%02d")

  /** z = Σ_j (w_j/1e6)·x_j, accumulated STRICTLY left-to-right in
    * ascending j — the float64 op-order contract the oracle replays. */
  private def zExpr(wMicro: Array[Long]): Column =
    wMicro.zipWithIndex.map { case (w, j) =>
      lit(w.toDouble / 1e6) * col(f"x$j%02d")
    }.reduceLeft(_ + _)

  private def pExpr(z: Column): Column =
    lit(0.5) + (lit(0.5) * (z / (lit(1.0) + abs(z))))

  /** Full-batch GD: `iters` rounds over the (cached) feature table.
    * Returns final weights in micro-units, one per feature column. */
  def trainLogistic(
      feats: DataFrame,
      dim: Int,
      iters: Int,
      lrNum: Long = 2L,
      lrDen: Long = 1L): Array[Long] = {
    require(iters >= 1 && iters <= 200, s"iters must be in [1,200], got $iters")
    require(lrNum >= 1 && lrDen >= 1, s"lr must be positive rational")
    val cached = feats.persist()
    val n = cached.count()
    require(n > 0, "empty training corpus")
    val w = Array.fill(dim)(0L)
    for (_ <- 0 until iters) {
      val p = pExpr(zExpr(w))
      val gs = featCols(dim).map { c =>
        sum(floor(lit(1000000.0) * ((col("y") - p) * col(c)))).as(c)
      }
      val row = cached.agg(gs.head, gs.tail: _*).head()
      for (j <- 0 until dim) {
        val gsum = if (row.isNullAt(j)) 0L else row.getLong(j)
        w(j) += (lrNum * gsum) / (lrDen * n)
      }
    }
    cached.unpersist()
    w
  }

  /** Score a feature table under trained weights: adds
    * score_micro = floor(1e6·σ̃(z)) and pred = (z > 0). */
  def scores(feats: DataFrame, wMicro: Array[Long]): DataFrame = {
    val z = zExpr(wMicro)
    feats.withColumn("score_micro", floor(lit(1000000.0) * pExpr(z)))
      .withColumn("pred", z > lit(0.0))
  }

  private val modelSidecar = "_graft_logreg_sidecar.json"

  /** Idempotently persist (vocab ordering + final weights) behind the
    * fingerprint-sidecar protocol — train once per (corpus, params),
    * probe many. One parquet row per feature:
    * (feat_idx INT, token, weight_micro). feat_idx 0 is the bias
    * (token '<bias>'). */
  def ensureModelArtifact(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      labelLang: String,
      vocabK: Int,
      iters: Int,
      lrNum: Long = 2L,
      lrDen: Long = 1L,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val (nRows, dataHash, hashSum) =
      graft.io.Artifact.hashAgg(df,
        xxhash64(col(textCol), col("lang")))
    graft.io.Artifact.ensure(dir, modelSidecar,
      graft.io.Artifact.fingerprintJson(nRows, dataHash,
        "hsum" -> hashSum, "labelLang" -> labelLang,
        "vocabK" -> vocabK.toString, "iters" -> iters.toString,
        "lrNum" -> lrNum.toString, "lrDen" -> lrDen.toString)) {
      val vocab = topVocab(df, vocabK, textCol)
      val feats = features(df, vocab, col("lang") === labelLang, idCol, textCol)
      val w = trainLogistic(feats, vocab.length + 1, iters, lrNum, lrDen)
      import spark.implicits._
      ("<bias>" +: vocab).zipWithIndex
        .map { case (tok, j) => (j, tok, w(j)) }
        .toDF("feat_idx", "token", "weight_micro")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The persisted model rows ordered by feat_idx. */
  def modelFromArtifact(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/data").orderBy(col("feat_idx"))

  /** (vocab, weights) back from the artifact — bounded read (dim+1
    * rows by construction). */
  def loadModel(spark: SparkSession, dir: String): (Seq[String], Array[Long]) = {
    val rows = modelFromArtifact(spark, dir).collect()
    (rows.toSeq.drop(1).map(_.getString(1)),
      rows.map(_.getLong(2)))
  }
}
