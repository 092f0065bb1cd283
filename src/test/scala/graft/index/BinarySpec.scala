package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.VectorSearch

class BinarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dim = 64
  private lazy val corpus = {
    val rng = new scala.util.Random(12)
    (0L until 300L).map(i => (i, Array.fill(dim)(rng.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
  }

  private def refSig(v: Array[Float], thr: Array[Double]): Long = {
    var s = 0L
    for (i <- v.indices) if (v(i).toDouble > thr(i)) s |= (1L << i)
    s
  }

  test("thresholds are per-dimension midrange and partitioning-invariant") {
    val thr = Binary.fitThresholds(corpus, dim)
    assert(thr.length == dim)
    val rows = corpus.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    for (i <- 0 until dim) {
      val xs = rows.map(_(i).toDouble)
      assert(thr(i) == (xs.min + xs.max) / 2.0, s"dim $i")
    }
    // re-fit under a different partitioning: bit-identical (min/max are
    // order-independent — the property the midrange choice exists for)
    val thr2 = Binary.fitThresholds(corpus.repartition(7), dim)
    assert(thr.sameElements(thr2))
  }

  test("signature expression equals the driver-side reference, bit 63 included") {
    val thr = Binary.fitThresholds(corpus, dim)
    val sigs = Binary.signatures(corpus, thr)
      .as[(Long, Long)].collect().toMap
    val vecs = corpus.as[(Long, Array[Float])].collect().toMap
    vecs.foreach { case (id, v) =>
      assert(sigs(id) == refSig(v, thr), s"vec $id")
      assert(sigs(id) == Binary.signatureOf(v.toSeq, thr), s"vec $id driver twin")
    }
    // some vector exercises the sign bit (dim 64 -> Long.MinValue term)
    assert(sigs.values.exists(_ < 0L), "no signature with bit 63 set — dim-64 coverage hole")
  }

  test("hamming top-k: self-query at distance 0, ties to ascending id, k rows") {
    val thr = Binary.fitThresholds(corpus, dim)
    val sigs = Binary.signatures(corpus, thr)
    val q = corpus.filter(col("vec_id") === 5L)
      .select(col("embedding")).head().getSeq[Float](0)
    val top = Binary.hammingTopK(sigs, Binary.signatureOf(q, thr), 10).collect()
    assert(top.length == 10)
    assert(top.head.getLong(0) == 5L && top.head.getInt(1) == 0)
    assert(top.map(_.getInt(1)).toSeq == top.map(_.getInt(1)).toSeq.sorted)
    // verify against a full driver-side recompute
    val all = Binary.signatures(corpus, thr).as[(Long, Long)].collect()
      .map { case (id, s) =>
        (java.lang.Long.bitCount(s ^ refSig(q.toArray, thr)), id) }
      .sorted.take(10)
    assert(top.map(r => (r.getInt(1), r.getLong(0))).toSeq == all.toSeq)
  }

  test("batched hamming probe equals per-query singles, one signature scan") {
    val thr = Binary.fitThresholds(corpus, dim)
    val sigs = Binary.signatures(corpus, thr)
    val queries = (0L until 3L).map { qid =>
      val v = corpus.filter(col("vec_id") === qid)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      qid -> refSig(v, thr)
    }
    val got = Binary.hammingTopKBatch(sigs, queries, k = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = queries.flatMap { case (qid, qsig) =>
      Binary.hammingTopK(sigs, qsig, k = 7)
        .collect().map(r => (qid, r.getLong(0), r.getInt(1)))
    }
    assert(got == want, "batch hamming rows must equal the single probes")
  }

  test("wave compositor: a 100-wide hamming batch equals per-query singles (width cap internalized)") {
    val thr = Binary.fitThresholds(corpus, dim)
    val sigs = Binary.signatures(corpus, thr).localCheckpoint()
    // 100 queries > maxBatchWidth=64 → two waves under the hood
    val queries = (0L until 100L).map { qid =>
      val v = corpus.filter(col("vec_id") === qid % 20L)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      qid -> (refSig(v, thr) ^ qid) // perturb so queries differ
    }
    intercept[IllegalArgumentException] {
      Binary.hammingTopKBatch(sigs, queries, k = 5) // the raw cap stays loud
    }
    val got = Binary.hammingTopKBatchWaved(sigs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val want = queries.flatMap { case (qid, qsig) =>
      Binary.hammingTopK(sigs, qsig, k = 5)
        .collect().map(r => (qid, r.getLong(0), r.getInt(1)))
    }
    assert(got == want, "waved batch rows must equal the single probes")
  }

  test("two-stage rescore: exact distances on the shortlist; shortlist>=n degenerates to exact") {
    val thr = Binary.fitThresholds(corpus, dim)
    val sigs = Binary.signatures(corpus, thr)
    val q = corpus.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    // with the shortlist covering the whole corpus, two-stage == exact
    val full = Binary.hammingRescoreTopK(corpus, sigs, q, thr, k = 10, shortlist = 300)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = VectorSearch.knnExact(corpus, q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq == exact.toSeq)
    // with a 50-shortlist, results are the exact rescore OF that shortlist
    val ids = Binary.hammingTopK(sigs, Binary.signatureOf(q, thr), 50)
      .collect().map(_.getLong(0)).toSet
    val two = Binary.hammingRescoreTopK(corpus, sigs, q, thr, k = 10, shortlist = 50)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(two.forall { case (id, _) => ids(id) })
    val expect = VectorSearch.knnExact(
      corpus.filter(col("vec_id").isin(ids.toSeq: _*)), q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(two.toSeq == expect.toSeq)
  }

  test("signature artifact: equals the live build, reuses, invalidates on data change") {
    val dir = java.nio.file.Files.createTempDirectory("bin_art").toString
    Binary.ensureSignatureArtifact(corpus, dir, dim)
    val thrArt = Binary.thresholdsFromArtifact(spark, dir)
    val thrLive = Binary.fitThresholds(corpus, dim)
    assert(thrArt.sameElements(thrLive))
    val sigsArt = Binary.signaturesFromArtifact(spark, dir)
      .as[(Long, Long)].collect().toMap
    val sigsLive = Binary.signatures(corpus, thrLive)
      .as[(Long, Long)].collect().toMap
    assert(sigsArt == sigsLive)
    // reuse: second ensure must not rewrite
    val sigFiles = new java.io.File(s"$dir/sigs").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val mtimes = sigFiles.map(f => (f.getName, f.lastModified())).toMap
    Binary.ensureSignatureArtifact(corpus, dir, dim)
    sigFiles.foreach(f =>
      assert(f.lastModified() == mtimes(f.getName), "must reuse, not rebuild"))
    // data change invalidates: one more row -> fresh fingerprint -> rebuild
    val extended = corpus.unionAll(
      Seq((999L, Array.fill(dim)(0.25f))).toDF("vec_id", "embedding"))
    Binary.ensureSignatureArtifact(extended, dir, dim)
    assert(Binary.signaturesFromArtifact(spark, dir).count() == 301)
  }

  test("rescore stage pushes the shortlist ids into the scan (In filter, no second full scan)") {
    // parquet-backed corpus so PushedFilters is observable
    val dirF = java.nio.file.Files.createTempDirectory("bin_resc").toString
    corpus.write.mode("overwrite").parquet(dirF)
    val pq = spark.read.parquet(dirF)
    val thr = Binary.fitThresholds(pq, dim)
    val sigs = Binary.signatures(pq, thr)
    val q = pq.filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0)
    val plan = Binary.hammingRescoreTopK(pq, sigs, q, thr, k = 10, shortlist = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(vec_id"),
      s"shortlist must reach the parquet scan as a pushed In filter:\n$plan")
  }
}
