package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding columns — the storage-side
  * lever at 100 TB: a float32 64-dim embedding is 256 bytes, its uint8
  * codes 64 bytes plus two floats of scale metadata (≈4× smaller scans,
  * and parquet byte arrays compress further). Per-row min/max scaling
  * keeps the transform embarrassingly parallel (no global statistics
  * pass), and dequantized search preserves neighbor ranking to within
  * the quantization step (recall gate pinned in tests).
  *
  * All arithmetic is float64 with fixed op order (`floor(x + 0.5)`
  * rather than `round`, whose half-way rules differ across engines), so
  * the DuckDB oracle can reproduce the codes bit-for-bit.
  */
object Quantization {

  /** Per-row quantization parameters + codes appended as columns:
    * `q_min`, `q_scale` (doubles), `codes` (array<int> in [0,255]). */
  def quantize(df: DataFrame, embCol: String = "embedding"): DataFrame = {
    val e = col(embCol)
    val mn = array_min(e).cast("double")
    val mx = array_max(e).cast("double")
    // degenerate constant vectors: scale 1.0 keeps codes at 0
    val scale = when(mx > mn, (mx - mn) / 255.0).otherwise(lit(1.0))
    df.withColumn("q_min", mn)
      .withColumn("q_scale", scale)
      .withColumn("codes",
        transform(e, x =>
          least(greatest(
            floor((x.cast("double") - col("q_min")) / col("q_scale") + 0.5), lit(0.0)),
            lit(255.0)).cast("int")))
  }

  /** Reconstructed embedding column from codes + params (float64). */
  def dequantize(codes: Column, qMin: Column, qScale: Column): Column =
    transform(codes, c => qMin + c.cast("double") * qScale)

  /** Max absolute reconstruction error per row — ≤ q_scale/2 by
    * construction; exposed for data-quality assertions. */
  def reconstructionError(df: DataFrame, embCol: String = "embedding"): DataFrame = {
    val deq = dequantize(col("codes"), col("q_min"), col("q_scale"))
    quantize(df, embCol)
      .withColumn("max_abs_err",
        aggregate(
          zip_with(col(embCol).cast("array<double>"), deq, (a, b) => abs(a - b)),
          lit(0.0), (acc, v) => greatest(acc, v)))
  }
}
