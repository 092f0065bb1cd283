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

  test("token windows: stride arithmetic covers every token once per overlap; tail kept short") {
    // replicate the declared query's projection over synthetic id rows
    val window = 64; val stride = 48
    val rows = Seq(
      (1L, List.range(1, 201)),  // 200 tokens -> ceil((200-1)/48)+1 = 5 windows
      (2L, List.range(1, 65)),   // exactly one full window + 1 overlap start? (64-1)/48=1 -> 2
      (3L, List.range(1, 11)))   // short doc -> a single short window
      .toDF("doc_id", "token_ids")
    val wins = rows
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), floor((size(col("token_ids")) - 1) / lit(stride)).cast("int")),
        k => slice(col("token_ids"), k * lit(stride) + 1, lit(window))))
        .as(Seq("win_idx", "win")))
      .select("doc_id", "win_idx", "win")
      .as[(Long, Int, Seq[Int])].collect()
      .groupBy(_._1).map { case (d, ws) => (d, ws.sortBy(_._2).map(_._3).toSeq) }
    def expect(ids: Seq[Int]): Seq[Seq[Int]] =
      (0 to (ids.size - 1) / stride).map(k => ids.slice(k * stride, k * stride + window))
    Seq(1L, 2L, 3L).foreach { d =>
      val ids = rows.filter(col("doc_id") === d)
        .select("token_ids").as[Seq[Int]].head()
      assert(wins(d) == expect(ids), s"doc $d windows mismatch")
      // every token appears in at least one window; consecutive
      // windows overlap by exactly window - stride (when both full)
      assert(wins(d).flatten.toSet == ids.toSet)
      wins(d).sliding(2).foreach {
        case Seq(a, b) if a.size == window =>
          assert(a.takeRight(window - stride) == b.take(window - stride))
        case _ =>
      }
    }
    assert(wins(1L).size == 5 && wins(3L) == Seq(List.range(1, 11)))
  }

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
