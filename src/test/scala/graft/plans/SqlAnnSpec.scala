package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.index.{Ivf, Sq}
import graft.ops.VectorSearch

/** The SQL route to the persisted ANN layouts (SURVEY §2.4 / r13
  * VERDICT task 3): one spark.sql statement must probe the SQ8 code
  * artifact through the registered `sq8_adc` codegen kernel and the
  * IVF layout through partition pruning — bit-equal to the API paths,
  * with the plan shapes pinned. */
class SqlAnnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 8
  private lazy val corpus = {
    val rng = new scala.util.Random(101)
    (0L until 300L).map(i => (i, Array.fill(dim)(rng.nextFloat() * 4f - 2f)))
      .toDF("vec_id", "embedding")
      .localCheckpoint()
  }

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def dArr(a: Array[Double]): String =
    a.map(v => s"${v}D").mkString("array(", ",", ")")

  test("sq8_adc SQL kernel is bit-identical to the API ADC scan and reranks to exact top-k") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val dir = tmpDir("sqlann_sq8")
    Sq.ensureCodesArtifact(corpus, dir)
    val m = Sq.modelFromArtifact(spark, dir)
    val q = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    Sq.codesWithDeltas(spark, dir).createOrReplaceTempView("sq8_spec_codes_v")
    corpus.createOrReplaceTempView("sq8_spec_emb_v")

    val lo = dArr(m.vmin.map(_.toDouble))
    val hi = dArr(m.vmax.map(_.toDouble))
    val qd = dArr(q.map(_.toDouble))
    val sqlAdc = spark.sql(
      s"""SELECT vec_id, sq8_adc(codes, $lo, $hi, $qd) AS dist
         |FROM sq8_spec_codes_v ORDER BY dist ASC, vec_id ASC LIMIT 25""".stripMargin)
    // plan pin: the registered kernel, no interpreted UDF anywhere
    val plan = sqlAdc.queryExecution.executedPlan.toString
    assert(plan.contains("pq_adc"), s"expected the pq_adc codegen kernel in:\n$plan")
    assert(!plan.contains("ScalaUDF"), "SQL ADC route must not fall back to a UDF")

    val apiAdc = Sq.search(Sq.codesWithDeltas(spark, dir), m, q, 25)
    assert(sqlAdc.as[(Long, Double)].collect().toSeq ==
      apiAdc.as[(Long, Double)].collect().toSeq,
      "SQL sq8_adc distances must be bit-identical to the API ADC scan")

    // the full one-statement shortlist + rerank equals exact top-k
    val full = spark.sql(
      s"""WITH short AS (
         |  SELECT vec_id FROM sq8_spec_codes_v
         |  ORDER BY sq8_adc(codes, $lo, $hi, $qd) ASC, vec_id ASC LIMIT 60)
         |SELECT e.vec_id AS vec_id, l2sq(e.embedding, q.qe) AS dist
         |FROM sq8_spec_emb_v e
         |JOIN short USING (vec_id)
         |CROSS JOIN (SELECT embedding AS qe FROM sq8_spec_emb_v WHERE vec_id = 3) q
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin)
    val exact = VectorSearch.knnExact(corpus, q.toSeq, 10)
      .select("vec_id", "dist").as[(Long, Double)].collect().toSeq
    assert(full.as[(Long, Double)].collect().toSeq == exact)
  }

  test("pq_adc SQL kernel is bit-identical to the API ADC scan and reranks to exact top-k") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    import graft.index.Pq
    val cb = Pq.fit(corpus, m = 4, k = 16, maxSample = 256)
    val enc = Pq.encode(corpus, cb)
    val q = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    enc.createOrReplaceTempView("pq_spec_codes_v")
    corpus.createOrReplaceTempView("pq_spec_emb_v")
    // exact float-widened doubles round-trip losslessly through literals
    def fArr(a: Array[Float]): String =
      a.map(v => s"${v.toDouble}D").mkString("array(", ",", ")")
    val flat = fArr(Pq.flatCentroids(cb))
    val qd = fArr(q)

    val sqlAdc = spark.sql(
      s"""SELECT vec_id, pq_adc(codes, $flat, $qd, 4) AS dist
         |FROM pq_spec_codes_v ORDER BY dist ASC, vec_id ASC LIMIT 25""".stripMargin)
    val plan = sqlAdc.queryExecution.executedPlan.toString
    assert(plan.contains("pq_adc"), s"expected the pq_adc codegen kernel in:\n$plan")
    assert(!plan.contains("ScalaUDF"), "SQL PQ route must not fall back to a UDF")
    val apiAdc = Pq.search(enc, cb, q, 25)
    assert(sqlAdc.as[(Long, Double)].collect().toSeq ==
      apiAdc.as[(Long, Double)].collect().toSeq,
      "SQL pq_adc distances must be bit-identical to the API ADC scan")

    // one-statement shortlist + exact rerank equals exact top-k (the
    // shortlist covers the tiny corpus entirely, so equality is exact
    // regardless of ADC recall)
    val full = spark.sql(
      s"""WITH short AS (
         |  SELECT vec_id FROM pq_spec_codes_v
         |  ORDER BY pq_adc(codes, $flat, $qd, 4) ASC, vec_id ASC LIMIT 300)
         |SELECT e.vec_id AS vec_id, l2sq(e.embedding, q.qe) AS dist
         |FROM pq_spec_emb_v e
         |JOIN short USING (vec_id)
         |CROSS JOIN (SELECT embedding AS qe FROM pq_spec_emb_v WHERE vec_id = 3) q
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin)
    val exact = VectorSearch.knnExact(corpus, q.toSeq, 10)
      .select("vec_id", "dist").as[(Long, Double)].collect().toSeq
    assert(full.as[(Long, Double)].collect().toSeq == exact)
  }

  test("sq8_adc rejects non-foldable and mis-typed arguments loudly") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    corpus.createOrReplaceTempView("sq8_spec_emb_v")
    val dir = tmpDir("sqlann_sq8b")
    Sq.ensureCodesArtifact(corpus, dir)
    Sq.codesWithDeltas(spark, dir).createOrReplaceTempView("sq8_spec_codes_v")
    val e = intercept[Exception] {
      // embedding is a per-row column — not foldable
      spark.sql(
        """SELECT c.vec_id, sq8_adc(c.codes, e.embedding, e.embedding, e.embedding)
          |FROM sq8_spec_codes_v c JOIN sq8_spec_emb_v e USING (vec_id)""".stripMargin)
        .collect()
    }
    assert(e.getMessage.contains("foldable") ||
      Option(e.getCause).exists(_.getMessage.contains("foldable")))
  }

  test("sql_ivf_topk shape: cluster IN lands in PartitionFilters and equals exact top-k") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val dir = tmpDir("sqlann_ivf")
    val layout = Ivf.buildLayout(spark, corpus, dir, nlist = 4, maxIter = 3)
    val q = corpus.filter(col("vec_id") === 3L)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    // probe ALL clusters -> the pruned union is the whole corpus, so the
    // statement must equal exact top-k while STILL planning the IN as a
    // partition filter
    val clusters = Ivf.probeClustersOf(layout.centroids, q, 4)
    spark.read.parquet(dir).createOrReplaceTempView("ivf_spec_layout_v")
    corpus.createOrReplaceTempView("ivf_spec_emb_v")
    val df = spark.sql(
      s"""SELECT t.vec_id AS vec_id, l2sq(t.embedding, q.qe) AS dist
         |FROM ivf_spec_layout_v t
         |CROSS JOIN (SELECT embedding AS qe FROM ivf_spec_emb_v WHERE vec_id = 3) q
         |WHERE t.cluster IN (${clusters.mkString(", ")})
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cluster"),
      s"cluster IN must be a partition filter, got:\n$plan")
    assert(!plan.contains("ScalaUDF"))
    val exact = VectorSearch.knnExact(corpus, q.toSeq, 10)
      .select("vec_id", "dist").as[(Long, Double)].collect().toSeq
    assert(df.as[(Long, Double)].collect().toSeq == exact)

    // and a REAL pruned probe (nprobe=1) reads strictly fewer partitions:
    // the self vector lives in its own top-1 cluster, so it must surface
    val one = Ivf.probeClustersOf(layout.centroids, q, 1)
    val pruned = spark.sql(
      s"""SELECT t.vec_id AS vec_id, l2sq(t.embedding, q.qe) AS dist
         |FROM ivf_spec_layout_v t
         |CROSS JOIN (SELECT embedding AS qe FROM ivf_spec_emb_v WHERE vec_id = 3) q
         |WHERE t.cluster IN (${one.mkString(", ")})
         |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin)
    val rows = pruned.as[(Long, Double)].collect()
    assert(rows.head._1 == 3L && rows.head._2 == 0.0,
      "self-query must rank first in its own probed cluster")
  }
}
