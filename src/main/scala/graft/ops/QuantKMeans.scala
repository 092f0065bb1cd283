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
    * centroid literal — ONE codegen kernel node per centroid
    * ([[org.apache.spark.sql.graft.L2SqLongLitExpr]]; the inlined
    * k·d-term Catalyst tree costs seconds of analyzer/codegen time per
    * job). Arithmetic mirrored by the oracle's list comprehension. */
  private def distTo(q: Column, cent: Array[Long], dim: Int): Column =
    org.apache.spark.sql.graft.VectorExpressions.l2SqLongLit(q, cent)

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
    val qdf = quantized(df, dim, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitCentroidsOn(qdf, k, iters, dim, idCol)
    finally qdf.unpersist()
  }

  /** [[fitCentroids]] over an already-quantized (and ideally persisted)
    * table — the persist boundary matters: without it Catalyst's
    * projection collapse inlines the 64-element quantize `transform`
    * into every one of the k·d `element_at` references (a d× arithmetic
    * and allocation blow-up per row). */
  private def fitCentroidsOn(
      qdf: DataFrame,
      k: Int,
      iters: Int,
      dim: Int,
      idCol: String): Array[Array[Long]] = {
    require(k >= 1 && iters >= 1, s"k=$k iters=$iters must be >= 1");
    {
      var cents: Array[Array[Long]] = qdf
        .orderBy(col(idCol)).limit(k)
        .select(col("q")).collect()
        .map(_.getSeq[Long](0).toArray)
      require(cents.length == k, s"need >= $k rows to seed $k clusters")
      var it = 0
      while (it < iters) {
        // one hash aggregate with d sum columns — k groups × d cells to
        // the driver, NO per-dimension explode (a d× row blow-up and a
        // corpus-sized shuffle per round at scale). Integer sums are
        // exact; the floor division runs on the driver (Math.floorDiv —
        // the same floor the oracle's (s - pmod)/n formula computes).
        val aggCols = (1 to dim).map(i =>
          sum(element_at(col("q"), i)).as(s"s$i")) :+ count(lit(1)).as("n")
        val rows = assign(qdf, cents, dim, idCol)
          .groupBy(col("cluster"))
          .agg(aggCols.head, aggCols.tail: _*)
          .collect()
        val next = cents.map(_.clone())
        rows.foreach { r =>
          val cl = r.getInt(0)
          val n = r.getLong(dim + 1)
          var i = 0
          while (i < dim) {
            next(cl)(i) = Math.floorDiv(r.getLong(i + 1), n)
            i += 1
          }
        }
        cents = next
        it += 1
      }
      cents
    }
  }

  /** One declarative assignment pass under GIVEN centroids —
    * (idCol, cluster, dist_q). Pure narrow map (centroids are plan
    * literals); the plan-audit surface for the in-loop stage. */
  def assignments(
      df: DataFrame,
      cents: Array[Array[Long]],
      dim: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    assign(quantized(df, dim, idCol, embCol), cents, dim, idCol)
      .select(col(idCol), col("cluster"), col("dist_q"))

  /** Final assignments under the fitted centroids:
    * (idCol, cluster, dist_q), every value exact integer. */
  def fitAssign(
      df: DataFrame,
      k: Int,
      iters: Int,
      dim: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val qdf = quantized(df, dim, idCol, embCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the persisted table serves the training rounds AND the final
    // assignment; unpersist AFTER the result materializes (localCheckpoint
    // cuts the lineage so the returned frame never recomputes qdf)
    try {
      val cents = fitCentroidsOn(qdf, k, iters, dim, idCol)
      assign(qdf, cents, dim, idCol)
        .select(col(idCol), col("cluster"), col("dist_q"))
        .localCheckpoint()
    } finally qdf.unpersist()
  }
}
