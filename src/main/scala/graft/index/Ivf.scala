package graft.index

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.VectorSearch

/** IVF (inverted-file) ANN — the partition-pruned scale path.
  *
  * Build: a KMeans coarse quantizer (fit on a sample — the model is just
  * `nlist` centroids) assigns every row a `cluster` id; the corpus is
  * written partitioned by that column. Search: centroid distances are
  * computed driver-side (nlist ≪ corpus), the `nprobe` nearest clusters
  * become an `IN` predicate that Spark turns into partition pruning —
  * at 100 TB a probe reads nprobe/nlist of the data instead of all of it.
  * Within the probed clusters, search is the exact TakeOrderedAndProject
  * kernel, so results are exact-within-probed-partitions (standard IVF
  * semantics).
  */
object Ivf {

  final case class Index(model: KMeansModel, nlist: Int)

  /** Build the coarse quantizer. `sampleFraction` bounds driver/ML cost
    * at scale — centroids converge on a sample. */
  def fit(
      df: DataFrame,
      nlist: Int,
      embCol: String = "embedding",
      sampleFraction: Double = 1.0,
      maxIter: Int = 20): Index = {
    val base = Ann.withFeatures(df, embCol)
    val sampled = if (sampleFraction >= 1.0) base else base.sample(sampleFraction, 42L)
    val model = new KMeans()
      .setK(nlist).setSeed(42L).setFeaturesCol("features").setPredictionCol("cluster")
      .setMaxIter(maxIter)
      .fit(sampled)
    Index(model, nlist)
  }

  /** Assign every row its inverted-list id. */
  def assign(index: Index, df: DataFrame, embCol: String = "embedding"): DataFrame =
    index.model.transform(Ann.withFeatures(df, embCol)).drop("features")

  /** Materialize the corpus partitioned by cluster — the layout that
    * makes [[search]]'s cluster predicate a partition-pruning scan. */
  def writePartitioned(index: Index, df: DataFrame, dir: String, embCol: String = "embedding"): Unit =
    assign(index, df, embCol).write.mode("overwrite").partitionBy("cluster").parquet(dir)

  /** Driver-side: the nprobe clusters nearest to the query. */
  def probeClusters(index: Index, query: Array[Float], nprobe: Int): Seq[Int] = {
    val q = query.map(_.toDouble)
    index.model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        var s = 0.0
        var j = 0
        while (j < q.length) { val d = c(j) - q(j); s += d * d; j += 1 }
        (s, i)
      }
      .sortBy(_._1).take(nprobe).map(_._2).toSeq
  }

  /** ANN top-k over an assigned (or partition-pruned parquet) corpus. */
  def search(
      index: Index,
      assigned: DataFrame,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val clusters = probeClusters(index, query, nprobe)
    VectorSearch.knnExact(
      assigned.filter(col("cluster").isin(clusters: _*)),
      query.toSeq, k, idCol, embCol)
  }

  /** Search straight from the partitioned layout: the `cluster IN (...)`
    * filter prunes parquet partitions before any IO. */
  def searchPartitioned(
      spark: SparkSession,
      index: Index,
      dir: String,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    search(index, spark.read.parquet(dir), query, k, nprobe, idCol, embCol)
}
