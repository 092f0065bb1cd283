package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.VectorRecord
import graft.io.Envelope
import graft.ops.{VectorCrud, VectorSearch, VectorStore}

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
    }),

    // O3 get: point lookup by id (reference vectordb.cpp:54-59) — the
    // filter pushes to the parquet scan.
    "vec_get" -> ((s, dir) => {
      VectorCrud.get(emb(s, dir), 42, idCol = "vec_id")
        .select(col("vec_id"), col("label"), size(col("embedding")).cast("long").as("dim"))
    }),

    // O5 delete: anti-filter by id (vectordb.cpp:74-80); checksum output.
    "vec_delete" -> ((s, dir) => {
      VectorCrud.delete(emb(s, dir), 42, idCol = "vec_id")
        .agg(count(lit(1)).as("n_rows"), sum(col("vec_id")).as("id_sum"))
    }),

    // O2 add: append a row with id = max+1 (the reference's nextId
    // contract, vectordb.cpp:38-52); checksum output.
    "vec_add" -> ((s, dir) => {
      val e = emb(s, dir)
      val newRow = e.agg((max(col("vec_id")) + 1).as("vec_id"))
        .withColumn("embedding", array_repeat(lit(0.0f), EmbDim))
        .withColumn("label", lit(-1))
      VectorCrud.add(e, newRow)
        .agg(count(lit(1)).as("n_rows"), max(col("vec_id")).as("max_id"))
    }),

    // O4 update: in-place replace by id via when/otherwise projection
    // (vectordb.cpp:61-72); window of ids around the change.
    "vec_update" -> ((s, dir) => {
      val updated = VectorCrud.update(
        emb(s, dir), 42,
        Map("embedding" -> array_repeat(lit(1.0f), EmbDim)),
        idCol = "vec_id")
      updated
        .filter(col("vec_id").between(40, 44))
        .select(col("vec_id"), element_at(col("embedding"), 1).cast("double").as("e0"))
        .orderBy(col("vec_id"))
    }),

    // O1 init: create an empty fixed-dim database (vectordb.cpp:23-36),
    // reload it, report its observable state.
    "vec_init" -> ((s, _) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_init").toString
      val store = VectorStore.init(s, s"$tmp/db.json", EmbDim)
      val reloaded = VectorStore.load(s, s"$tmp/db.json")
      import s.implicits._
      Seq((reloaded.getDimensions.toLong, reloaded.toDF.count()))
        .toDF("dim", "n_vectors")
    }),

    // O10 getDimensions: schema introspection over the corpus
    // (vectordb.cpp:220-222).
    "vec_dims" -> ((s, dir) => {
      emb(s, dir).agg(max(size(col("embedding"))).as("dim"))
    }),

    // O8+O9 save/load: full envelope round-trip — corpus → reference
    // JSON envelope → back, then join against the original and count
    // any id/embedding mismatches (must be 0: float32→double→float32
    // widening is lossless).
    "envelope_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val orig = emb(s, dir)
        .select(col("vec_id").as("id"), col("embedding"),
          concat(lit("{\"label\": "), col("label"), lit("}")).as("metadata"))
        .as[VectorRecord]
      val tmp = java.nio.file.Files.createTempDirectory("graft_env").toString
      Envelope.saveDataset(EmbDim, orig.count() + 1, orig, s"$tmp/db.json")
      val (_, _, loaded) = Envelope.loadDataset(s, s"$tmp/db.json").get
      val joined = loaded.toDF("id", "embedding2", "metadata2")
        .join(orig.toDF(), "id")
      joined.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("embedding") =!= col("embedding2"), 1L).otherwise(0L)).as("n_mismatch"))
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
         |ORDER BY query_id ASC, rank ASC""".stripMargin,

    "vec_get" ->
      "SELECT vec_id, label, len(embedding) AS dim FROM embeddings WHERE vec_id = 42",

    "vec_delete" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(vec_id) AS BIGINT) AS id_sum
        |FROM embeddings WHERE vec_id <> 42""".stripMargin,

    "vec_add" ->
      """WITH added AS (SELECT vec_id FROM embeddings
        |               UNION ALL SELECT max(vec_id) + 1 FROM embeddings)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows, max(vec_id) AS max_id FROM added""".stripMargin,

    "vec_update" ->
      """SELECT vec_id,
        |       CASE WHEN vec_id = 42 THEN CAST(1.0 AS DOUBLE)
        |            ELSE CAST(embedding[1] AS DOUBLE) END AS e0
        |FROM embeddings WHERE vec_id BETWEEN 40 AND 44 ORDER BY vec_id""".stripMargin,

    "vec_init" ->
      "SELECT CAST(64 AS BIGINT) AS dim, CAST(0 AS BIGINT) AS n_vectors",

    "vec_dims" ->
      "SELECT CAST(max(len(embedding)) AS INTEGER) AS dim FROM embeddings",

    "envelope_roundtrip" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_mismatch
        |FROM embeddings""".stripMargin
  )
}
