package graft.index

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** O6 `rebuild` + approximate O7 `search`, Spark-first.
  *
  * The reference rebuilds an in-memory HNSW graph on every load
  * (`/root/reference/src/vectordb.cpp:82-118,216-217`) — a single-node
  * structure that cannot shard. The Spark-native batch analogue (per
  * BASELINE.json "spark_approach") is an MLlib LSH model: `fit` IS the
  * index build (O6), the model is tiny (random hyperplanes), broadcastable,
  * and persistable via MLlib writers — which also fixes the reference's
  * never-persisted-index gap (`main.cpp:125-126`).
  *
  * Scale: `approxSimilarityJoin` hashes both sides and joins on bucket
  * keys — a shuffle on hash buckets instead of an all-pairs cartesian,
  * which is the only shape that survives 100 TB.
  */
object Ann {

  /** Defaults tuned on embeddings.parquet (unit-norm 64-dim, projection
    * std ≈ 1/√64): bucketLength ≈ 2× projection std keeps buckets
    * selective; more tables = higher recall, linear cost. */
  final case class Params(numHashTables: Int = 6, bucketLength: Double = 0.25)

  /** O6 — index build. `embCol` is `array<float>`; the MLlib boundary
    * needs a `Vector` column (float64 — SURVEY §1.2), added here. */
  def fit(df: DataFrame, embCol: String = "embedding", params: Params = Params()): BucketedRandomProjectionLSHModel = {
    new BucketedRandomProjectionLSH()
      .setInputCol("features")
      .setOutputCol("hashes")
      .setNumHashTables(params.numHashTables)
      .setBucketLength(params.bucketLength)
      .setSeed(42L)
      .fit(withFeatures(df, embCol))
  }

  /** Approximate O7 — single-query ANN top-k. The distance column is
    * recomputed with the engine's codegen l2sq kernel: MLlib reports
    * unsquared L2, and squaring that √ is not bit-identical to the exact
    * path's fold, so results would not line up with exact-path values for
    * the same ids. */
  def searchApprox(
      model: BucketedRandomProjectionLSHModel,
      df: DataFrame,
      query: Array[Float],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val key = Vectors.dense(query.map(_.toDouble))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("dist").asc, col(idCol).asc)
    model
      .approxNearestNeighbors(withFeatures(df, embCol), key, k)
      .select(col(idCol),
        graft.functions.Distances.l2Sq(col(embCol), lit(query)).as("dist"))
      // explicit rank in the output contract (matches the join forms) so
      // an external check can pin the ordering against (dist, id)
      .withColumn("rank", row_number().over(w))
      .orderBy(col("rank").asc)
  }

  /** Approximate all-pairs within `threshold` (L2): the LSH-bucketed
    * near-duplicate / similarity-join path. */
  def similarityJoinApprox(
      model: BucketedRandomProjectionLSHModel,
      a: DataFrame,
      b: DataFrame,
      threshold: Double,
      embCol: String = "embedding"): DataFrame =
    model.approxSimilarityJoin(
      withFeatures(a, embCol), withFeatures(b, embCol), threshold, "dist").toDF()

  /** Batch approximate kNN join: top-k corpus neighbours for EVERY query
    * row, from LSH-bucketed candidates only — the scale path when the
    * query side is too large to broadcast ([[graft.ops.VectorSearch.knnJoin]]'s
    * |Q|×|corpus| product stops being writable). `maxDistance` bounds the
    * candidate search radius (L2); rows with fewer than k in-radius
    * candidates return what was found. Output (query_id, vec_id, dist
    * [squared L2], rank) matches the exact join's schema. */
  def knnJoinApprox(
      model: BucketedRandomProjectionLSHModel,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      maxDistance: Double,
      qIdCol: String = "query_id",
      qEmbCol: String = "q_embedding",
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = model.approxSimilarityJoin(
        withFeatures(queries.withColumnRenamed(qEmbCol, "embedding_q"), "embedding_q"),
        withFeatures(corpus, embCol),
        maxDistance, "l2")
      .select(
        col(s"datasetA.$qIdCol").as(qIdCol),
        col(s"datasetB.$idCol").as(idCol),
        // recompute with the engine's codegen kernel: squaring MLlib's
        // euclidean (√x)² is not bit-identical to the exact join's dist,
        // and the output contract is "same schema AND same values as the
        // exact join for every pair it reports"
        graft.functions.Distances
          .l2Sq(col("datasetA.embedding_q"), col(s"datasetB.$embCol")).as("dist"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("dist").asc, col(idCol).asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col(qIdCol).asc, col("rank").asc)
  }

  /** Persist / restore the fitted index (MLlib writers). */
  def save(model: BucketedRandomProjectionLSHModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): BucketedRandomProjectionLSHModel =
    BucketedRandomProjectionLSHModel.load(path)

  private[index] def withFeatures(df: DataFrame, embCol: String): DataFrame =
    df.withColumn("features", array_to_vector(col(embCol)))
}
