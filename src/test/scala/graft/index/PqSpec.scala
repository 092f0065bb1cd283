package graft.index

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.VectorSearch

class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val corpus = {
    val rng = new scala.util.Random(21)
    (0L until 500L).map(i => (i, Array.fill(16)(rng.nextFloat())))
      .toDF("vec_id", "embedding")
  }

  test("codes are m bytes per row and deterministic") {
    val cb = Pq.fit(corpus, m = 4, k = 16)
    val enc = Pq.encode(corpus, cb).as[(Long, Array[Byte])].collect().toMap
    assert(enc.size == 500)
    assert(enc.values.forall(_.length == 4))
    val enc2 = Pq.encode(corpus, cb).as[(Long, Array[Byte])].collect().toMap
    assert(enc.keys.forall(k => enc(k).sameElements(enc2(k))))
  }

  test("ADC distance equals the sum of subspace centroid distances (brute force)") {
    val cb = Pq.fit(corpus, m = 4, k = 16)
    val enc = Pq.encode(corpus, cb)
    val query = Array.fill(16)(0.5f)
    val table = Pq.adcTable(cb, query)
    val viaExpr = Pq.search(enc, cb, query, k = 500).as[(Long, Double)].collect().toMap
    val codes = enc.as[(Long, Array[Byte])].collect()
    codes.foreach { case (id, cs) =>
      val expect = cs.zipWithIndex.map { case (c, s) => table(s * cb.k + (c & 0xFF)) }.sum
      assert(math.abs(viaExpr(id) - expect) < 1e-12, s"id $id")
    }
  }

  test("PQ top-10 recalls most of the exact top-10; re-ranking recovers exact order") {
    val cb = Pq.fit(corpus, m = 8, k = 32)
    val enc = Pq.encode(corpus, cb)
    val query = corpus.filter($"vec_id" === 7L).select($"embedding")
      .head().getSeq[Float](0).toArray
    val exact = VectorSearch.knnExact(corpus, query.toSeq, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val pq = Pq.search(enc, cb, query, k = 10).select("vec_id").as[Long].collect().toSet
    val recall = exact.intersect(pq).size
    info(s"PQ recall@10 = $recall/10")
    assert(recall >= 5, s"PQ recall collapsed: $recall/10")
    // exact re-rank of a 100-candidate shortlist must contain the true
    // top-10 whenever the shortlist does; with 500 rows and shortlist 100
    // the reranked top-10 should match exact almost always — require ≥9
    val reranked = Pq.searchRerank(enc, corpus, cb, query, k = 10, shortlist = 100)
      .select("vec_id").as[Long].collect().toSet
    assert(exact.intersect(reranked).size >= 9)
  }

  test("IVF-PQ: pruned code scan + exact re-rank recovers the exact top-10") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq").toString
    val cb = Pq.fit(corpus, m = 8, k = 32)
    val ivf = Ivf.fit(corpus, nlist = 4, maxIter = 5)
    Pq.writeIvfPqCodes(ivf, cb, corpus, dir)
    // plant the query as its own best match: its cluster contains it, so
    // the pruned probe must surface it even at nprobe=1
    val query = corpus.filter($"vec_id" === 3L).select($"embedding")
      .head().getSeq[Float](0).toArray
    val shortlist = Pq.searchIvfPq(spark, dir, ivf, cb, query, shortlist = 100, nprobe = 2)
    val plan = shortlist.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cluster") ||
           plan.contains("PartitionFilters: [cluster"),
      s"cluster probe not pruning partitions:\n$plan")
    val reranked = Pq.rerankShortlist(shortlist, corpus, query, k = 10)
      .select("vec_id").as[Long].collect()
    assert(reranked.head == 3L) // the query itself at dist 0
    val exact = VectorSearch.knnExact(corpus, query.toSeq, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(exact.intersect(reranked.toSet).size >= 6,
      s"pruned recall collapsed: ${exact.intersect(reranked.toSet).size}/10")
  }

  test("the ADC scan plans as TakeOrderedAndProject with codegen (no UDF)") {
    val cb = Pq.fit(corpus, m = 4, k = 16)
    val enc = Pq.encode(corpus, cb)
    val plan = Pq.search(enc, cb, Array.fill(16)(0.1f), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"not bounded:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("pythonudf"))
  }
}
