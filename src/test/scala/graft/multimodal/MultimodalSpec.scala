package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.Multimodal._

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def bytesOf(seed: Int, n: Int): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt().toByte)
  }

  private lazy val media = Seq(
    MediaRecord(1L, "image", bytesOf(1, 512), """{"fmt": "png", "src": "cam1"}"""),
    MediaRecord(2L, "video", bytesOf(2, 4096), """{"fmt": "mp4", "src": "cam2"}"""),
    MediaRecord(3L, "audio", bytesOf(3, 1024), """{"fmt": "wav", "src": "mic1"}""")
  ).toDS()

  test("decode is deterministic and schema-complete") {
    val d1 = decode(media).collect().sortBy(_.media_id)
    val d2 = decode(media).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq)
    assert(d1.forall(d => d.width >= 64 && d.height >= 64 && d.n_frames >= 1))
    assert(d1.map(_.n_bytes).toSeq == Seq(512L, 4096L, 1024L))
    assert(d1.find(_.modality == "image").get.n_frames == 1)
  }

  test("extractFeatures yields unit-norm embeddings usable by the ANN ops") {
    val feats = extractFeatures(media, dim = 16).collect()
    assert(feats.length == 3 && feats.forall(_.embedding.length == 16))
    feats.foreach { f =>
      val n = math.sqrt(f.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
    // deterministic: same content → same embedding
    val again = extractFeatures(media, dim = 16).collect()
    assert(feats.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.embedding.sameElements(b.embedding) })
  }

  test("sampleFrames: videos yield up to maxFrames evenly spaced; others one frame") {
    val frames = sampleFrames(media, maxFrames = 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length == 1 && byId(3L).length == 1)
    assert(byId(2L).length > 1 && byId(2L).length <= 4)
    assert(byId(2L).map(_.frame_idx).distinct.length == byId(2L).length)
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }

  test("withMeta extracts typed JSON metadata fields") {
    val out = withMeta(media.toDF(), Map("fmt" -> "$.fmt", "src" -> "$.src"))
      .select("media_id", "fmt", "src").as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "png", "cam1"), (2L, "mp4", "cam2"), (3L, "wav", "mic1")))
  }

  test("repartitionByBytes sizes partitions from blob bytes") {
    val df = media.toDF()
    val out = repartitionByBytes(df, targetBytes = 2048L)
    // total bytes = 5632 → ceil-ish 2 partitions
    assert(out.rdd.getNumPartitions >= 2)
    assert(out.count() == 3)
  }
}
