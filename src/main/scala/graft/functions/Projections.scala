package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss sign random projection — the cheap
  * dimensionality reduction an embedding pipeline runs before coarse
  * clustering / dedup when the full vectors are overkill (Achlioptas,
  * "Database-friendly random projections", PODS'01: ±1 entries preserve
  * pairwise distances in expectation like Gaussian entries, at integer
  * cost). The sign matrix is a FIXED deterministic function of the
  * (outDim, inDim) index — no RNG state, so a retry, another executor,
  * or another engine derives the identical projection, and the DuckDB
  * oracle replays it from the same baked literals.
  *
  * Scale shape: a narrow per-row projection (whole-stage codegen
  * arithmetic, no UDF, no shuffle) — scan speed at 100 TB.
  */
object Projections {

  /** Deterministic ±1 for (output dim i, input dim j): one bit of a
    * Knuth multiplicative hash of the flat index. */
  def sign(i: Int, j: Int, inDim: Int): Int =
    if ((((i.toLong * inDim + j) * 2654435761L >>> 16) & 1L) == 1L) 1 else -1

  /** Projected output dim `i` as a micro-quantized long:
    * ⌊(Σ_j ±emb[j])·10⁶⌋ with a strictly left-associative float64 fold —
    * additions and subtractions are individually correctly rounded, so
    * the same fold order yields bit-identical sums in any IEEE engine
    * (the [[graft.functions.Distances]] convention). */
  def signProjectMicro(emb: Column, i: Int, inDim: Int): Column = {
    require(inDim >= 1, s"inDim must be positive, got $inDim")
    val sum = (0 until inDim).map { j =>
      val e = element_at(emb, j + 1).cast("double")
      if (sign(i, j, inDim) > 0) e else -e
    }.reduceLeft(_ + _)
    floor(sum * 1e6).cast("long")
  }
}
