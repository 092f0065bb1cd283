package graft.index

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.VectorSearch

/** The recall-targeted selector: measured frontier, cheapest-config
  * selection, and the end-to-end guarantee that a selected config
  * actually delivers its measured recall on held-out queries. */
class AnnSelectorSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding").cache()
  private lazy val built = AnnSelector.build(emb, nQueries = 10, k = 10, nlist = 8)

  override def afterAll(): Unit = {
    built.release(); emb.unpersist(blocking = true); super.afterAll()
  }

  test("frontier: sane, measured, sorted by cost, exact endpoint present") {
    val f = built.frontier
    info(f.map(p => f"${p.name}:r=${p.recall}%.2f,c=${p.scanFrac}%.3f").mkString(" "))
    assert(f.map(_.scanFrac) == f.map(_.scanFrac).sorted, "frontier must sort by cost")
    assert(f.exists(_.name == "exact") && f.last.name == "exact")
    assert(f.forall(p => p.recall >= 0.0 && p.recall <= 1.0))
    assert(f.forall(p => p.scanFrac > 0.0 && p.scanFrac <= 1.0))
    // pruned probes must cost less than the exact scan
    val np1 = f.find(_.name == "ivf_np1").get
    assert(np1.scanFrac < 0.7, s"nprobe=1 of 8 lists should be far under a full scan: $np1")
    // spill-2 at the same nprobe scans more rows than plain IVF but
    // must not exceed ~2x (spill factor bounds it)
    val i2 = f.find(_.name == "ivf_np2").get
    val s2 = f.find(_.name == "spill2_np2").get
    assert(s2.scanFrac >= i2.scanFrac && s2.scanFrac <= 2.5 * i2.scanFrac)
    assert(s2.recall >= i2.recall - 1e-9, "spill-2 recall cannot fall below plain IVF")
  }

  test("select: cheapest config meeting the target; falls back to exact") {
    val p9 = AnnSelector.select(built, 0.9)
    info(s"target 0.9 -> $p9")
    assert(p9.recall >= 0.9)
    assert(p9.scanFrac < 1.0, s"a sub-exact config must exist at 0.9 on this corpus: $p9")
    // every cheaper config on the frontier must miss the target
    built.frontier.filter(_.scanFrac < p9.scanFrac)
      .foreach(p => assert(p.recall < 0.9, s"$p is cheaper and meets target — selection not minimal"))
    // an impossible target (above every approximate config) → exact
    val pImpossible = AnnSelector.select(built, 1.01)
    assert(pImpossible.name == "exact")
  }

  test("searchAtRecall: selected config delivers the target on held-out queries") {
    val point = AnnSelector.select(built, 0.9)
    // held-out probes: vec_id in [10, 30) — NOT the frontier's probe set
    val holdout = (10L until 30L).map { qid =>
      val q = emb.filter(col("vec_id") === qid).head().getSeq[Float](1).toArray
      val got = AnnSelector.search(built, emb, point, q, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = VectorSearch.knnExact(emb, q.toSeq, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      exact.intersect(got).size / 10.0
    }
    val mean = holdout.sum / holdout.size
    info(f"holdout recall@10 under ${point.name} = $mean%.3f (measured ${point.recall}%.3f)")
    assert(mean >= 0.85, f"held-out recall $mean%.3f collapsed vs measured ${point.recall}%.3f")
  }

  test("search dispatch: every frontier config returns k self-top rows") {
    val q = emb.filter(col("vec_id") === 0L).head().getSeq[Float](1).toArray
    built.frontier.foreach { p =>
      val rows = AnnSelector.search(built, emb, p, q, 5).collect()
      assert(rows.length == 5, s"${p.name} returned ${rows.length} rows")
      // the query is a corpus vector: by construction (identical hashes /
      // nearest-centroid assignment) every config surfaces it at rank 1
      assert(rows.head.getLong(0) == 0L, s"${p.name} top-1 was ${rows.head.getLong(0)}")
    }
  }

  test("searchBatch: per-query results equal the single-query path, every config") {
    import spark.implicits._
    val qids = Seq(0L, 5L, 17L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    built.frontier.foreach { p =>
      val batch = AnnSelector.searchBatch(built, emb, p, queries, 5)
        .select("query_id", "vec_id", "rank")
        .as[(Long, Long, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
      qids.foreach { qid =>
        val q = emb.filter(col("vec_id") === qid).head().getSeq[Float](1).toArray
        val single = AnnSelector.search(built, emb, p, q, 5)
          .collect().map(_.getLong(0)).toSeq
        assert(batch(qid) == single,
          s"${p.name} qid=$qid: batch ${batch(qid)} != single $single")
      }
    }
  }

  test("searchBatch plan: probe side broadcasts; the corpus is never shuffle-joined") {
    val queries = emb.orderBy(col("vec_id").asc).limit(10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val point = AnnSelector.select(built, 0.9)
    val df = AnnSelector.searchBatch(built, emb, point, queries, 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus/assignment side must not be shuffle-joined:\n$plan")
  }
}
