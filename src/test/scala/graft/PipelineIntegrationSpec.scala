package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.index.Ann
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaRecord
import graft.ops.VectorSearch

/** End-to-end pipeline: media bytes → extracted embeddings → ANN index →
  * search and near-dup — the cross-module story a training-data
  * pipeline actually runs.
  */
class PipelineIntegrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("media → features → exact search and SRP near-dup agree on the planted duplicate") {
    val rng = new scala.util.Random(17)
    // real P6 rasters with random pixels: distinct images land around
    // cos ≈ 0.75 (all-positive uniform channels), far from the 0.999 gate
    val blobs = (1L to 30L).map { i =>
      val px = Array.fill(16 * 16 * 3)(rng.nextInt(256))
      MediaRecord(i, "image",
        graft.multimodal.MediaCodecs.ppmBytes(16, 16,
          (x, y) => (px(3 * (y * 16 + x)), px(3 * (y * 16 + x) + 1), px(3 * (y * 16 + x) + 2))),
        s"""{"src": "cam$i"}""")
    }
    // plant: row 31 is a byte-copy of row 1 → identical extracted features
    val media = (blobs :+ blobs.head.copy(media_id = 31L)).toDS()

    val feats = Multimodal.extractFeatures(media, grid = 4)
      .toDF("vec_id", "embedding")

    // exact search with row 1's embedding must return 1 and 31 at dist 0
    val q = feats.filter($"vec_id" === 1L).select($"embedding".as("qe"))
    val top = VectorSearch.knnExactDf(feats, q, k = 2)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSet == Set(1L, 31L))
    assert(top.forall(_._2 == 0.0))

    // SRP near-dup finds exactly the planted pair at cosine >= 0.999
    val dups = Dedup.embeddingNearDups(feats, minCosine = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups == Set((1L, 31L)))

    // and the LSH index built on the features retrieves the duplicate
    val model = Ann.fit(feats)
    val qVec = feats.filter($"vec_id" === 1L)
      .select("embedding").head().getSeq[Float](0).toArray
    val approx = Ann.searchApprox(model, feats, qVec, k = 2)
      .select("vec_id").as[Long].collect().toSet
    assert(approx == Set(1L, 31L))
  }

  test("text → hashed embedding → SRP near-dup finds the near-identical document") {
    // the model-free text-to-vector path: docs 1/2 differ by one word of
    // twelve (hashed vectors nearly parallel); 3-5 are disjoint topics
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy cat near the river"),
      (3L, "simmer onions in butter with thyme until deeply golden brown"),
      (4L, "gradient descent updates parameters along the negative loss slope"),
      (5L, "tectonic plates drift slowly across the viscous upper mantle")
    ).toDF("doc_id", "text")
    val emb = graft.text.TextAnalysis.hashedEmbedding(docs, outDim = 16)
    val feats = emb.select(col("doc_id").as("vec_id"),
      array((1 to 16).map(i => col(emb.columns(i)).cast("float")): _*).as("embedding"))
    val dups = Dedup.embeddingNearDups(feats, minCosine = 0.9,
        bits = 256, rowsPerBand = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups == Set((1L, 2L)), s"expected only the near-identical pair, got $dups")
  }
}
