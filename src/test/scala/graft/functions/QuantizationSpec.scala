package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.VectorSearch

class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codes are within [0,255] and reconstruction error <= q_scale/2") {
    val out = Quantization.reconstructionError(emb)
    val bad = out.filter(
      exists(col("codes"), c => c < 0 || c > 255) ||
        col("max_abs_err") > col("q_scale") / 2.0 + 1e-12)
    assert(bad.count() == 0)
  }

  test("constant vectors quantize without dividing by zero") {
    val df = Seq((1L, Array(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val q = Quantization.quantize(df).select("codes").as[Seq[Int]].head()
    assert(q == Seq(0, 0, 0))
  }

  test("search over dequantized vectors: recall@10 >= 0.9 vs float32 search") {
    val q10 = Quantization.quantize(emb)
      .select(col("vec_id"),
        Quantization.dequantize(col("codes"), col("q_min"), col("q_scale"))
          .cast("array<float>").as("embedding"))
    val recalls = (0L until 10L).map { qid =>
      val qv = emb.filter(col("vec_id") === qid)
        .head().getAs[scala.collection.Seq[Float]]("embedding").toArray
      val exact = VectorSearch.knnExact(emb, qv.toSeq, 10).collect().map(_.getLong(0)).toSet
      val viaQ = VectorSearch.knnExact(q10, qv.toSeq, 10).collect().map(_.getLong(0)).toSet
      exact.intersect(viaQ).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    info(s"quantized-search mean recall@10 = $mean")
    assert(mean >= 0.9)
  }
}
