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

  // Correlated fixture for OPQ: low-rank structure + noise, so energy is
  // unevenly spread across the natural axes — the regime the learned
  // rotation exists for. Seeded, deterministic.
  private lazy val correlated = {
    val rng = new scala.util.Random(99)
    val basis = Array.fill(3, 16)(rng.nextGaussian().toFloat)
    (0L until 600L).map { i =>
      val w = Array.fill(3)(rng.nextGaussian().toFloat * 2f)
      val v = Array.tabulate(16) { j =>
        basis(0)(j) * w(0) + basis(1)(j) * w(1) + basis(2)(j) * w(2) +
          rng.nextGaussian().toFloat * 0.05f
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  test("OPQ rotation is orthogonal and distance-preserving") {
    val model = Pq.fitOpq(correlated, m = 4, k = 16, opqIters = 4)
    val r = model.rotation
    val d = r.length
    // R·Rᵀ ≈ I
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => r(i)(t).toDouble * r(j)(t)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-4, s"RRᵀ[$i][$j] = $dot")
    }
    // rotating both sides preserves the true distance
    val x = Array.tabulate(16)(i => (i * 0.1f) - 0.8f)
    val q = Array.tabulate(16)(i => 0.3f - i * 0.05f)
    def l2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (u, v) => (u - v).toDouble * (u - v) }.sum
    val rx = Pq.rotateOne(r, x); val rq = Pq.rotateOne(r, q)
    assert(math.abs(l2(x, q) - l2(rx, rq)) < 1e-3)
  }

  test("OPQ ADC recall beats plain PQ ADC on correlated data") {
    val cb = Pq.fit(correlated, m = 4, k = 16)
    val enc = Pq.encode(correlated, cb)
    val opq = Pq.fitOpq(correlated, m = 4, k = 16, opqIters = 6)
    val encO = Pq.encodeOpq(correlated, opq)
    val recalls = (0L until 10L).map { qid =>
      val q = correlated.filter($"vec_id" === qid).select($"embedding")
        .head().getSeq[Float](0).toArray
      val exact = VectorSearch.knnExact(correlated, q.toSeq, k = 10)
        .select("vec_id").as[Long].collect().toSet
      val p = Pq.search(enc, cb, q, k = 10).select("vec_id").as[Long].collect().toSet
      val o = Pq.searchOpq(encO, opq, q, k = 10).select("vec_id").as[Long].collect().toSet
      (exact.intersect(p).size / 10.0, exact.intersect(o).size / 10.0)
    }
    val (pqMean, opqMean) = (recalls.map(_._1).sum / 10, recalls.map(_._2).sum / 10)
    info(f"ADC recall@10 on correlated data: pq=$pqMean%.2f opq=$opqMean%.2f")
    assert(opqMean >= pqMean,
      f"rotation must not lose recall: opq $opqMean%.2f < pq $pqMean%.2f")
    assert(opqMean >= 0.5, f"OPQ recall floor: $opqMean%.2f")
  }

  test("OPQ codes feed the same rerank pipeline: rerank recovers exact top-10") {
    val opq = Pq.fitOpq(corpus, m = 8, k = 32, opqIters = 4)
    val encO = Pq.encodeOpq(corpus, opq)
    val query = corpus.filter($"vec_id" === 11L).select($"embedding")
      .head().getSeq[Float](0).toArray
    val shortlist = Pq.searchOpq(encO, opq, query, k = 100)
    val reranked = Pq.rerankShortlist(shortlist, corpus, query, k = 10)
      .select("vec_id").as[Long].collect().toSet
    val exact = VectorSearch.knnExact(corpus, query.toSeq, k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(exact.intersect(reranked).size >= 9)
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
