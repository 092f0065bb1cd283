package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.index.Ivf
import graft.ops.VectorSearch

/** Plan-shape audits: the properties that make these operators survive a
  * 100 TB corpus are pinned here as assertions on the physical plan, so
  * a refactor that silently un-pushes a filter or turns a broadcast into
  * a shuffle fails the build.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  test("hybrid search pushes the metadata predicate into the parquet scan") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val query = corpus.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val plan = VectorSearch.knnExactDf(corpus.filter(col("label") === 3), query, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]"),
      s"label predicate not pushed to scan:\n$plan")
  }

  test("point lookup pushes the id predicate into the parquet scan") {
    val plan = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") === 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(vec_id,42)"), s"id predicate not pushed:\n$plan")
  }

  test("exact kNN plans as TakeOrderedAndProject (bounded per-partition heap, no global sort)") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val plan = VectorSearch.knnExact(corpus, Seq.fill(64)(0.1f), k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not bounded:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"), s"global sort crept in:\n$plan")
  }

  test("kNN join broadcasts the query side, never shuffles the corpus for the join") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val plan = VectorSearch.knnJoin(queries, corpus, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query side not broadcast:\n$plan")
  }

  test("IVF partitioned layout turns cluster probes into partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_plan").toString
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val layout = Ivf.buildLayout(spark, corpus, dir, nlist = 4)
    val query = Array.fill(64)(0.1f)
    // the persisted-layout probe path (what the declared queries use)
    val df = Ivf.searchLayout(spark, layout, query, k = 5, nprobe = 1)
    val scan = df.queryExecution.executedPlan.toString
    // the cluster IN (...) predicate must land in PartitionFilters, not a
    // post-scan Filter — that is what makes a probe read nprobe/nlist of
    // the data
    assert(scan.contains("PartitionFilters: [isnotnull(cluster") ||
           scan.contains("PartitionFilters: [cluster"),
      s"cluster predicate not pruning partitions:\n$scan")
  }

  test("distance expressions stay codegen (no BatchEvalPython/interpreted eval markers)") {
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val query = corpus.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val plan = VectorSearch.knnExactDf(corpus, query, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("l2sq"), s"codegen distance missing:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF crept into the hot path:\n$plan")
  }
}
