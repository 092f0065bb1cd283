package graft.ops

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** ScalaCheck properties from SURVEY §5: results sorted ascending,
  * ids ⊆ table, |results| = min(k,n), exact-kNN ≡ brute-force oracle;
  * knnJoin ≡ per-query knnExact. Generators are driven manually
  * (seeded Gen.apply) — the scalatestplus bridge isn't a declared dep. */
class VectorSearchSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen(org.scalacheck.Gen.Parameters.default, Seed(42L + i))
        .foreach(body)
    }

  private lazy val spark = SparkTestSession.spark

  private def l2sqRef(a: Array[Float], b: Array[Float]): Double =
    a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum

  private val corpusGen = for {
    dim <- Gen.choose(1, 8)
    n <- Gen.choose(0, 30)
    rows <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-10.0f, 10.0f)))
    q <- Gen.listOfN(dim, Gen.choose(-10.0f, 10.0f))
    k <- Gen.choose(1, 40)
  } yield (rows.map(_.toArray), q.toArray, k)

  test("knnExact matches a driver-side brute-force oracle") {
    import spark.implicits._
    forAll(corpusGen, 15) { case (rows, q, k) =>
      val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = VectorSearch.knnExact(df, q.toSeq, k).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      val want = rows.zipWithIndex
        .map { case (v, i) => (i.toLong, l2sqRef(v, q)) }
        .sortBy { case (id, d) => (d, id) }
        .take(k)
      assert(got.length == math.min(k, rows.length))
      assert(got.map(_._1).toSeq == want.map(_._1).toSeq)
      got.zip(want).foreach { case ((_, gd), (_, wd)) =>
        assert(math.abs(gd - wd) < 1e-9)
      }
      // sorted ascending, ids ⊆ table
      assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
      assert(got.map(_._1).toSet.subsetOf(rows.indices.map(_.toLong).toSet))
    }
  }

  test("knnJoin equals per-query knnExact") {
    import spark.implicits._
    val dim = 4
    val rnd = new scala.util.Random(7)
    val rows = (0L until 50L).map(i => (i, Array.fill(dim)(rnd.nextFloat() * 10)))
    val corpus = rows.toDF("vec_id", "embedding")
    val queries = rows.take(3)
      .map { case (i, v) => (i, v) }.toDF("query_id", "q_embedding")
    val joined = VectorSearch.knnJoin(queries, corpus, k = 5).collect()
      .groupBy(_.getLong(0))
    rows.take(3).foreach { case (qid, qv) =>
      val expect = VectorSearch.knnExact(corpus, qv.toSeq, 5).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = joined(qid).sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(got == expect)
    }
  }

  test("cosineTopK: nearest by cosine is the vector itself") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 20L).map(i => (i, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    val corpus = rows.toDF("vec_id", "embedding")
    val res = VectorSearch.cosineTopK(corpus, rows(7)._2.toSeq, 1).collect()
    assert(res.head.getLong(0) == 7L)
    assert(math.abs(res.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("knnClassify majority-votes neighbor labels with deterministic tie-break") {
    import spark.implicits._
    // two tight clusters around (0,0) label 1 and (10,10) label 2, plus
    // one mislabeled point inside cluster A — k=5 must out-vote it
    val clusterA = (0L until 6L).map(i => (i, Array(0.1f * i, 0.1f), if (i == 0) 2 else 1))
    val clusterB = (10L until 16L).map(i => (i, Array(10f + 0.1f * (i - 10), 10f), 2))
    val corpus = (clusterA ++ clusterB).toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (100L, Array(0.05f, 0.1f)),   // inside cluster A
      (101L, Array(10.2f, 10.0f))   // inside cluster B
    ).toDF("query_id", "q_embedding")
    val out = VectorSearch.knnClassify(queries, corpus, k = 5).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(100L)._1 == 1, s"mislabeled neighbor must be out-voted: $out")
    assert(out(100L)._2 >= 4L && out(100L)._3 == 5L)
    assert(out(101L) == ((2, 5L, 5L)))

    // exact tie on votes → smallest label wins: k=2 over one point of
    // each label equidistant from the query
    val tieCorpus = Seq(
      (1L, Array(1.0f, 0.0f), 7),
      (2L, Array(-1.0f, 0.0f), 3)).toDF("vec_id", "embedding", "label")
    val tieQ = Seq((200L, Array(0.0f, 0.0f))).toDF("query_id", "q_embedding")
    val tie = VectorSearch.knnClassify(tieQ, tieCorpus, k = 2).collect().head
    assert(tie.getInt(1) == 3 && tie.getLong(2) == 1L && tie.getLong(3) == 2L)
  }

  test("hardNegatives: nearest different-label rows, filter under the top-k") {
    import spark.implicits._
    // anchor at origin with label 1; same-label rows crowd the front —
    // a post-filter over the unconstrained top-2 would return nothing
    val corpus = Seq(
      (0L, Array(0.0f, 0.0f), 1),
      (1L, Array(0.1f, 0.0f), 1),
      (2L, Array(0.2f, 0.0f), 1),
      (3L, Array(0.3f, 0.0f), 2), // nearest negatives
      (4L, Array(0.4f, 0.0f), 2),
      (5L, Array(5.0f, 0.0f), 3)).toDF("vec_id", "embedding", "label")
    val anchors = Seq((100L, Array(0.0f, 0.0f), 1)).toDF("query_id", "q_embedding", "q_label")
    val got = VectorSearch.hardNegatives(anchors, corpus, k = 2).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(3L, 4L),
      s"expected the near-miss negatives, got ${got.toSeq}")
    assert(got.forall(_.getLong(0) == 100L))
    // ranks are contiguous from 1 within the filtered set
    assert(got.map(_.getInt(3)).toSeq == Seq(1, 2))
    // and the unfiltered join agg still behaves (no regression from the
    // pairPredicate refactor): top-2 are the same-label nearest rows
    val plain = VectorSearch.knnJoinAgg(
      anchors.select($"query_id", $"q_embedding"), corpus, k = 2).collect()
    assert(plain.map(_.getLong(1)).toSeq == Seq(0L, 1L))
  }

  test("hybridRrfRetrieve fuses keyword and cosine ranks; corpus never shuffle-joined") {
    import spark.implicits._
    // doc 1: strong keyword match AND embedding aligned with query 0
    // doc 2: keyword-only; doc 3: embedding-only (not a BM25 candidate
    // since it lacks the terms → must not appear at all)
    val docs = Seq(
      (0L, "anchor row spark join"),
      (1L, "spark join spark join merge window"),
      (2L, "spark join merge window filler words here"),
      (3L, "nothing relevant textually")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = VectorSearch.hybridRrfRetrieve(docs, emb,
      terms = Seq("spark", "join", "merge", "window"), kCandidates = 3, k = 3)
    val rows = out.collect()
    val ids = rows.map(_.getLong(0)).toSeq
    assert(!ids.contains(3L), "non-candidates must not enter the fused list")
    // RRF arithmetic replayed by hand from the returned ranks
    rows.foreach { r =>
      val expected = math.floor(1e6 / (60 + r.getLong(1))).toLong +
        math.floor(1e6 / (60 + r.getLong(2))).toLong
      assert(r.getLong(3) == expected)
    }
    // doc 1 leads both rankings among candidates → must be first
    assert(ids.head == 1L)
    // plan: the embedding side joins by broadcast, never sort-merge
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      s"embedding fetch must be a broadcast semi join:\n$plan")
  }

  test("dimViolations flags wrong-length rows") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(1.0f))).toDF("vec_id", "embedding")
    val bad = VectorSearch.dimViolations(df, 2, "embedding").collect()
    assert(bad.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("knnPrefixRescore: full-dim prefix degenerates to exact; shortlist ids honor prefix ranking") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val corpus = (0L until 200L).map(i => (i, Array.fill(16)(rng.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val q = corpus.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    // prefixDim == dim and shortlist >= n: identical to knnExact
    val full = VectorSearch.knnPrefixRescore(corpus, q, prefixDim = 16, k = 10, shortlist = 200)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = VectorSearch.knnExact(corpus, q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq == exact.toSeq)
    // truncated stage: results are the exact rescore OF the prefix
    // shortlist (driver recompute of stage 1)
    val vecs = corpus.as[(Long, Array[Float])].collect().toMap
    val shortRef = vecs.toSeq.map { case (id, v) =>
      (l2sqRef(v.take(4), q.take(4).toArray), id) }.sorted.take(30).map(_._2).toSet
    val two = VectorSearch.knnPrefixRescore(corpus, q, prefixDim = 4, k = 10, shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(two.forall { case (id, _) => shortRef(id) })
    val expect = vecs.filter { case (id, _) => shortRef(id) }
      .map { case (id, v) => (l2sqRef(v, q.toArray), id) }
      .toSeq.sorted.take(10).map { case (d, id) => (id, d) }
    assert(two.toSeq == expect)
  }

  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i).toDouble * y(i).toDouble; i += 1 }
      s
    }
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("knnMmr: zero diversity weight degenerates to cosine top-k") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val corpus = (0L until 150L).map(i => (i, Array.fill(8)(rng.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val q = corpus.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val mmr = VectorSearch.knnMmr(corpus, q, k = 6, shortlist = 20,
      relWeight = 1.0, divWeight = 0.0)
      .collect().map(r => r.getLong(1))
    val top = VectorSearch.cosineTopK(corpus, q, 6).collect().map(_.getLong(0))
    assert(mmr.toSeq == top.toSeq)
  }

  test("knnMmr: a near-duplicate of the first pick is deferred for diversity") {
    import spark.implicits._
    // query axis e0; id 1 ≈ id 2 (near-identical, both highly relevant),
    // id 3 orthogonal-ish but still relevant — MMR must pick 3 before 2
    val rows = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.1f, 0f, 0f)),
      (2L, Array(0.98f, 0.11f, 0f, 0f)),
      (3L, Array(0.6f, 0f, 0.8f, 0f)),
      (4L, Array(0.5f, 0f, 0f, 0.86f))
    ).toDF("vec_id", "embedding")
    val q = Seq(1f, 0f, 0f, 0f)
    // equal weights: the near-dup's ~1.0 self-similarity penalty
    // outweighs its relevance edge over the orthogonal candidate
    val picks = VectorSearch.knnMmr(rows, q, k = 4, shortlist = 5,
        relWeight = 0.5, divWeight = 0.5)
      .collect().map(r => r.getLong(1)).toSeq
    assert(picks.head == 0L)
    assert(picks.contains(3L) &&
      (!picks.contains(2L) || picks.indexOf(3L) < picks.indexOf(2L)),
      s"diverse id 3 must beat the near-dup id 2: $picks")
    // relevance-only ranking would put 2 before 3 — pin the contrast
    val relOnly = VectorSearch.cosineTopK(rows, q, 4).collect().map(_.getLong(0)).toSeq
    assert(relOnly.indexOf(2L) < relOnly.indexOf(3L))
  }

  test("rangeSearch: exactly the epsilon-ball, nearest-first, radius 0 returns the query itself") {
    import spark.implicits._
    val rng = new scala.util.Random(53)
    val corpus = (0L until 200L).map(i => (i, Array.fill(8)(rng.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val q = corpus.filter(org.apache.spark.sql.functions.col("vec_id") === 7L)
      .collect().head.getSeq[Float](1)
    val r = 0.3
    val got = VectorSearch.rangeSearch(corpus, q, r)
      .as[(Long, Double)].collect().toSeq
    // reference: full distance table, filter, sort
    val all = corpus.as[(Long, Array[Float])].collect().map { case (id, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { val d = v(i).toDouble - q(i).toDouble; s += d * d; i += 1 }
      (id, s)
    }
    val want = all.filter(_._2 <= r).sortBy(t => (t._2, t._1)).toSeq
    assert(got == want, s"epsilon-ball mismatch: $got vs $want")
    assert(got.head._1 == 7L && got.head._2 == 0.0)
    val self = VectorSearch.rangeSearch(corpus, q, 0.0).as[(Long, Double)].collect().toSeq
    assert(self == Seq((7L, 0.0)))
  }

  test("knnMmr: zero-norm embeddings (NaN cosine) are excluded, never crash the greedy loop") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    // NaN relevance sorts GREATEST under DESC — without the shortlist
    // filter the zero vector enters first and every score comparison
    // goes false (bestIdx = -1 crash). It must simply be absent.
    val rows = ((0L until 20L).map(i => (i, Array.fill(8)(rng.nextFloat() - 0.5f))) :+
      (99L, Array.fill(8)(0f))).toDF("vec_id", "embedding")
    val q = rows.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .collect().head.getSeq[Float](1)
    val picks = VectorSearch.knnMmr(rows, q, k = 5, shortlist = 21)
      .collect().map(_.getLong(1)).toSeq
    assert(picks.length == 5)
    assert(!picks.contains(99L), s"zero-norm vector in picks: $picks")
  }

  test("knnMmr matches an independent greedy reference on random vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val vecs = (0L until 120L).map(i => (i, Array.fill(12)(rng.nextFloat() - 0.5f)))
    val corpus = vecs.toDF("vec_id", "embedding")
    val q = vecs.head._2.toSeq
    val got = VectorSearch.knnMmr(corpus, q, k = 7, shortlist = 25)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // reference greedy
    val qa = q.toArray
    val rel = vecs.map { case (id, v) => id -> cosRef(v, qa) }.toMap
    val byId = vecs.toMap
    val cand = rel.toSeq.sortBy { case (id, r) => (-r, id) }.take(25).map(_._1)
    val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
    val expect = (1 to 7).map { rank =>
      val scored = cand.filterNot(sel.contains).map { c =>
        val ms = if (sel.isEmpty) 0.0
          else sel.map(s => cosRef(byId(c), byId(s))).max
        (c, 0.7 * rel(c) - 0.3 * ms)
      }
      val (pick, score) = scored.minBy { case (id, sc) => (-sc, id) }
      sel += pick
      (rank, pick, rel(pick), score)
    }
    assert(got.toSeq == expect)
  }
}
