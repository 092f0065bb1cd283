package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.VectorSearch

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 registers a `queries` entry;
  * SQL-expressible ones also register a DuckDB `oracleSql` entry with
  * IDENTICAL column names and deterministic ordering. Float policy:
  * distances are computed in float64 with strictly left-to-right
  * accumulation on both sides (Spark `aggregate` fold ≡ left-associative
  * SQL `+` chain), so hashes match bit-for-bit.
  */
object SparkEntry {

  /** Embedding dimensionality of the driver fixtures
    * (embeddings.parquet under /root/testdata, FIXTURES.md §B1). */
  val EmbDim = 64

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Left-associative squared-L2 sum over explicit 1-based SQL array
    * indexes — bit-identical to Distances.l2Sq's fold. */
  private def l2SqSql(a: String, b: String, dim: Int = EmbDim): String =
    (1 to dim)
      .map(i => s"(CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE)) * (CAST($a[$i] AS DOUBLE) - CAST($b[$i] AS DOUBLE))")
      .mkString(" + ")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val corpus = emb(spark, dir)
    val query = corpus.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    VectorSearch.knnExactDf(corpus, query, k = 10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O7 search (exact path): k-NN top-k by squared L2, nearest-first,
    // tie-break by id (SURVEY §2.3; reference vectordb.cpp:120-156).
    "knn_exact_top10" -> ((s, dir) => {
      val corpus = emb(s, dir)
      val query = corpus.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      VectorSearch.knnExactDf(corpus, query, k = 10)
    }),

    // Extension: batch k-NN similarity join (3 query vectors × corpus,
    // broadcast query side, per-query windowed top-k).
    "knn_join_top5" -> ((s, dir) => {
      val corpus = emb(s, dir)
      val queries = corpus
        .filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      VectorSearch.knnJoin(queries, corpus, k = 5)
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_exact_top10" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id AS vec_id, ${l2SqSql("e.embedding", "q.qe")} AS dist
         |FROM embeddings e CROSS JOIN q
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

    "knn_join_top5" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3),
         |d AS (SELECT q.query_id, e.vec_id, ${l2SqSql("e.embedding", "q.qe")} AS dist
         |      FROM embeddings e CROSS JOIN q),
         |r AS (SELECT query_id, vec_id, dist,
         |             CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank
         |      FROM d)
         |SELECT query_id, vec_id, dist, rank FROM r WHERE rank <= 5
         |ORDER BY query_id ASC, rank ASC""".stripMargin
  )
}
