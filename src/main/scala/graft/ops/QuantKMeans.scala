package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd k-means on a QUANTIZED integer grid — the
  * clustering operator itself under the engine's bit-exact hash gate
  * (unlike the IVF coarse quantizer, whose ML-fit centroids are only
  * pinned through search invariants). Embeddings quantize to micro
  * units (`floor(x·10⁶ + 0.5)` — the engine's established float→int
  * convention, [[graft.functions.Quantization]]); every distance,
  * argmin and centroid update is then EXACT 64-bit integer arithmetic:
  *
  *  - distances: Σ(qᵢ−cᵢ)² in int64 (≤ ~10¹⁵ at micro scale, d=64 —
  *    no overflow headroom issues);
  *  - assignment ties break to the LOWEST cluster index;
  *  - centroid update: per-dimension floor(Σq / n) computed as
  *    `(s − pmod(s, n)) div n` — floor division written the same way
  *    on both engines, so negative sums can never diverge on
  *    truncate-vs-floor semantics;
  *  - empty clusters keep their previous centroid;
  *  - init: the k vectors of the k smallest ids (deterministic, no
  *    RNG — k-means++ draws would need a cross-engine RNG contract).
  *
  * Integer sums are ORDER-INDEPENDENT, so the fit is bit-identical
  * across partitionings, re-runs, and the DuckDB oracle replaying the
  * same rounds — which is exactly why production reproducible-pipeline
  * clustering quantizes first: float centroid means depend on the
  * reduction order an engine happens to use.
  *
  * Scale shape per iteration: one narrow assignment map (centroids are
  * plan literals — k·d longs), one (cluster, dim)-keyed integer
  * aggregation (map-side partial, k·d result rows to the driver —
  * never corpus-sized). Iterations are a driver loop of `iters` fixed
  * rounds, the [[graft.text.Bpe.learnRounds]] discipline. */
object QuantKMeans {

  /** Micro-unit quantization of the embedding column. */
  def quantized(
      df: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    df.select(col(idCol),
      transform(col(embCol),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long")).as("q"))

  /** Integer squared distance between the quantized column and a
    * centroid literal — 64 staged terms, mirrored by the oracle's list
    * comprehension. */
  private def distTo(q: Column, cent: Array[Long], dim: Int): Column =
    (1 to dim).map { i =>
      val d = element_at(q, i) - lit(cent(i - 1))
      d * d
    }.reduce(_ + _)

  /** One assignment pass: (idCol, q, cluster) with the (dist, cluster)
    * argmin, ties to the lowest index. Distances stage into columns so
    * the argmin fold never duplicates the 64-term sums. */
  private def assign(
      qdf: DataFrame,
      cents: Array[Array[Long]],
      dim: Int,
      idCol: String): DataFrame = {
    val withD = cents.zipWithIndex.foldLeft(qdf) { case (d, (c, i)) =>
      d.withColumn(s"_d$i", distTo(col("q"), c, dim))
    }
    val (bestD, bestC) = cents.indices.tail.foldLeft((col("_d0"), lit(0))) {
      case ((bd, bc), i) =>
        (when(col(s"_d$i") < bd, col(s"_d$i")).otherwise(bd),
          when(col(s"_d$i") < bd, lit(i)).otherwise(bc))
    }
    withD.select(col(idCol), col("q"),
      bestC.as("cluster"), bestD.as("dist_q"))
  }

  /** The fitted centroids after `iters` Lloyd rounds. */
  def fitCentroids(
      df: DataFrame,
      k: Int,
      iters: Int,
      dim: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Array[Array[Long]] = {
    require(k >= 1 && iters >= 1, s"k=$k iters=$iters must be >= 1")
    val qdf = quantized(df, dim, idCol, embCol)
    var cents: Array[Array[Long]] = qdf
      .orderBy(col(idCol)).limit(k)
      .select(col("q")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(cents.length == k, s"need >= $k rows to seed $k clusters")
    var it = 0
    while (it < iters) {
      val sums = assign(qdf, cents, dim, idCol)
        .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .select(col("cluster"), col("pos"),
          expr("(s - pmod(s, n)) div n").as("v"))
        .collect()
      val next = cents.map(_.clone())
      sums.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2)
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Final assignments under the fitted centroids:
    * (idCol, cluster, dist_q), every value exact integer. */
  def fitAssign(
      df: DataFrame,
      k: Int,
      iters: Int,
      dim: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val cents = fitCentroids(df, k, iters, dim, idCol, embCol)
    assign(quantized(df, dim, idCol, embCol), cents, dim, idCol)
      .select(col(idCol), col("cluster"), col("dist_q"))
  }
}
