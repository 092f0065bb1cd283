package graft.index

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.VectorSearch

/** LSH (O6 rebuild + approx O7) and IVF recall gates vs the exact path,
  * on the driver fixture embeddings.parquet (SURVEY §5). */
class AnnSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  // The cache is keyed by canonical plan in the session-wide CacheManager,
  // so leaving it behind would serve later suites' reads of the same path
  // from an InMemoryRelation — hiding the parquet PushedFilters that
  // PlanAuditSpec asserts on. Drop it when this suite finishes.
  override def afterAll(): Unit = { emb.unpersist(blocking = true); super.afterAll() }

  private def queryVec(id: Long): Array[Float] =
    emb.filter(org.apache.spark.sql.functions.col("vec_id") === id)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray

  private def exactIds(q: Array[Float], k: Int): Set[Long] =
    VectorSearch.knnExact(emb, q.toSeq, k).collect().map(_.getLong(0)).toSet

  test("LSH approx search: recall@10 >= 0.9 over 20 queries") {
    val model = Ann.fit(emb)
    val recalls = (0L until 20L).map { qid =>
      val q = queryVec(qid)
      val approx = Ann.searchApprox(model, emb, q, 10).collect().map(_.getLong(0)).toSet
      val exact = exactIds(q, 10)
      exact.intersect(approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    info(s"LSH mean recall@10 = $mean")
    assert(mean >= 0.9, s"recall $mean below gate; recalls=$recalls")
  }

  test("knnJoinApprox: per-query recall@5 >= 0.8 vs the exact join") {
    import org.apache.spark.sql.functions.col
    val model = Ann.fit(emb)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    // fixture vectors are unit-norm: sq-L2 ∈ [0, 4]; radius 2.0 keeps
    // all plausible neighbours in range
    val approx = Ann.knnJoinApprox(model, queries, emb, k = 5, maxDistance = 2.0)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = VectorSearch.knnJoin(queries, emb, k = 5)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.map { case (qid, ids) =>
      ids.intersect(approx.getOrElse(qid, Set.empty)).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    info(s"knnJoinApprox mean recall@5 = $mean")
    assert(mean >= 0.8)
  }

  test("LSH approx distances are squared-L2, ascending") {
    val model = Ann.fit(emb)
    val q = queryVec(0)
    val rows = Ann.searchApprox(model, emb, q, 5).collect()
    assert(rows.nonEmpty)
    val dists = rows.map(_.getDouble(1)).toSeq
    assert(dists == dists.sorted)
    // nearest to a corpus vector is itself at dist 0
    assert(rows.head.getLong(0) == 0L && math.abs(rows.head.getDouble(1)) < 1e-9)
  }

  test("LSH model save/load round-trips (fixes the reference's never-persisted index)") {
    val model = Ann.fit(emb)
    val dir = java.nio.file.Files.createTempDirectory("lsh").toString + "/model"
    Ann.save(model, dir)
    val back = Ann.load(dir)
    val q = queryVec(3)
    val a = Ann.searchApprox(model, emb, q, 5).collect().map(_.getLong(0)).toSeq
    val b = Ann.searchApprox(back, emb, q, 5).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("IVF: exhaustive probe (nprobe = nlist) equals exact search") {
    val index = Ivf.fit(emb, nlist = 8)
    val assigned = Ivf.assign(index, emb).cache()
    val q = queryVec(5)
    val ivf = Ivf.search(index, assigned, q, 10, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = VectorSearch.knnExact(emb, q.toSeq, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == exact)
  }

  test("IVF: recall@10 rises with nprobe and clears 0.75 at half the lists") {
    val index = Ivf.fit(emb, nlist = 10)
    val assigned = Ivf.assign(index, emb).cache()
    def meanRecall(nprobe: Int): Double = {
      val recalls = (0L until 20L).map { qid =>
        val q = queryVec(qid)
        val got = Ivf.search(index, assigned, q, 10, nprobe).collect().map(_.getLong(0)).toSet
        val exact = exactIds(q, 10)
        exact.intersect(got).size.toDouble / exact.size
      }
      recalls.sum / recalls.size
    }
    val r2 = meanRecall(2); val r5 = meanRecall(5); val r8 = meanRecall(8)
    info(s"IVF mean recall@10: nprobe=2 → $r2, nprobe=5 → $r5, nprobe=8 → $r8")
    // The fixture's 10 planted clusters overlap heavily at k=10, so recall
    // is probe-bounded; the contract is monotone improvement + a floor.
    assert(r2 <= r5 + 0.05 && r5 <= r8 + 0.05, "recall must not degrade with more probes")
    assert(r5 >= 0.75, s"recall $r5 below gate at nprobe=5")
    assert(r8 >= 0.9, s"recall $r8 below gate at nprobe=8")
  }

  test("IVF partitioned layout prunes and searches correctly") {
    val index = Ivf.fit(emb, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/corpus"
    Ivf.writePartitioned(index, emb, dir)
    val q = queryVec(7)
    val got = Ivf.searchPartitioned(spark, index, dir, q, 10, nprobe = 8).collect()
      .map(_.getLong(0)).toSeq
    val exact = VectorSearch.knnExact(emb, q.toSeq, 10).collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }

  test("IVF hybrid probe: the filter sits UNDER the top-k, not over it") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("ivfhyb").toString + "/corpus"
    val layout = Ivf.buildLayout(spark, emb, dir, nlist = 4, maxIter = 3)
    val q = queryVec(3)
    val got = Ivf.searchLayoutWhere(spark, layout, q, k = 10, nprobe = 4,
      col("label") === 3).collect()
    // exhaustive probe + filter-under-top-k ≡ exact filtered search
    val exact = VectorSearch.knnExact(emb.filter(col("label") === 3), q.toSeq, 10)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == exact.map(_.getLong(0)).toSeq)
    assert(got.length == 10,
      "filtered probe must return k label-matching rows; a post-filter " +
        s"over the unfiltered top-k would return fewer (got ${got.length})")
  }

  test("IVF appendToLayout: incremental add probes correctly, fingerprint stays honest") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString + "/corpus"
    val layout = Ivf.buildLayout(spark, emb, dir, nlist = 8, maxIter = 3)
    val q = queryVec(2)
    val planted = emb.filter(col("vec_id") === 2)
      .crossJoin(spark.range(5))
      .select((col("id") + lit(5000000L)).as("vec_id"), col("embedding"), col("label"))
    Ivf.appendToLayout(layout, planted)
    // appendByCentroids shares the probe's arithmetic, so the five exact
    // copies + the original row are the nprobe=1 dist-0 set
    val got = Ivf.searchLayout(spark, layout, q, k = 6, nprobe = 1).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 5000000L, 5000001L, 5000002L, 5000003L, 5000004L))
    // the compositional fingerprint matches the appended state: a build
    // over corpus ∪ planted is a cache HIT (sidecar untouched)...
    val sidecar = java.nio.file.Paths.get(dir, "_centroids.json")
    val mtime = java.nio.file.Files.getLastModifiedTime(sidecar)
    val union = emb.select(col("vec_id"), col("embedding"), col("label")).union(planted)
    Ivf.buildLayout(spark, union, dir, nlist = 8, maxIter = 3)
    assert(java.nio.file.Files.getLastModifiedTime(sidecar) == mtime,
      "matching fingerprint must reuse the layout without rebuilding")
    // ...while a build over the ORIGINAL corpus detects the drift and
    // refits, discarding the appended rows
    val layout2 = Ivf.buildLayout(spark, emb, dir, nlist = 8, maxIter = 3)
    val after = Ivf.searchLayout(spark, layout2, q, k = 6, nprobe = 8).collect()
      .map(_.getLong(0)).toSet
    assert(!after.contains(5000000L),
      "rebuild over the original corpus must discard appended rows")
  }

  test("assignSpilled: spill rows per id, distinct lists, top-1 list unchanged") {
    val corpus = emb.select("vec_id", "embedding")
    val index = Ivf.fit(corpus, nlist = 4, maxIter = 3)
    val spilled = Ivf.assignSpilled(index, corpus, spill = 2)
      .select("vec_id", "cluster").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).toSeq).toMap
    // compare against assignByCentroids — bit-identical arithmetic and
    // tie-break (model.transform could differ by float ulps on ties)
    val top1 = Ivf.assignByCentroids(
        Ivf.Layout("unused", index.model.clusterCenters.map(_.toArray)), corpus)
      .select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    spilled.foreach { case (id, cs) =>
      assert(cs.length == 2 && cs.distinct.length == 2,
        s"id $id not in exactly 2 distinct lists: $cs")
      // the first (nearest) assigned list is the plain top-1 assignment
      assert(cs.head == top1(id),
        s"id $id: spilled head ${cs.head} != top-1 ${top1(id)}")
    }
  }

  test("ivfCurve: ivf monotone to exactly 1.0 at full width, ivfsq bounded by ivf, selection cheapest-meeting") {
    val curve = Recall.ivfCurve(emb.select("vec_id", "embedding"),
      nQueries = 10, k = 10, nlist = 8, probes = Seq(1, 2, 4, 8))
    assert(curve.size == 8)
    val ivf = curve.filter(_.family == "ivf").sortBy(_.nprobe)
    val ivfsq = curve.filter(_.family == "ivfsq").sortBy(_.nprobe)
    info(ivf.map(p => f"ivf_np${p.nprobe}=${p.recall}%.3f@${p.costFrac}%.3f").mkString(" "))
    info(ivfsq.map(p => f"ivfsq_np${p.nprobe}=${p.recall}%.3f@${p.costFrac}%.3f").mkString(" "))
    // probed lists are rank-prefixes: candidates at larger nprobe are a
    // superset and a true-top-k member always survives the exact cut
    assert(ivf.zip(ivf.drop(1)).forall { case (a, b) => a.recall <= b.recall },
      s"ivf curve not monotone: $ivf")
    assert(ivf.last.recall == 1.0, "nprobe = nlist probes everything — exact")
    // same pruned candidates ranked by ADC can only LOSE true neighbors
    assert(ivf.zip(ivfsq).forall { case (a, b) => b.recall <= a.recall },
      s"ivfsq exceeded ivf somewhere: $ivfsq vs $ivf")
    // cost units are honest: both families READ the same rows at a
    // width (scanFrac identical; full width reads everything), the
    // ivfsq BYTE cost is exactly a quarter (4x-compressed codes)
    assert(ivf.zip(ivfsq).forall { case (a, b) => a.scanFrac == b.scanFrac })
    assert(ivf.last.scanFrac == 1.0 && ivfsq.last.scanFrac == 1.0)
    assert(ivf.last.costFrac == 1.0 && ivfsq.last.costFrac == 0.25)
    assert(ivfsq.forall(p => p.costFrac == p.scanFrac / 4.0))
    // selection: cheapest (by byte cost) point meeting the target,
    // replayable from the recorded curve values alone
    val chosen = Recall.selectFromCurve(curve, 0.9).get
    assert(chosen.recall >= 0.9)
    assert(!curve.exists(p => p.recall >= 0.9 && p.costFrac < chosen.costFrac),
      s"a cheaper meeting point exists: chose $chosen of $curve")
    // an impossible target falls through to the caller's exact fallback
    assert(Recall.selectFromCurve(curve, 1.1).isEmpty)
    // synthetic replay: the same selection from recorded values only
    val recorded = curve.map(p =>
      Recall.CurvePoint(p.family, p.nprobe, p.recall, p.scanFrac, p.costFrac))
    assert(Recall.selectFromCurve(recorded, 0.9) == Some(chosen))
  }

  test("Recall.measure: seeded LSH/pruned-IVF recall@10 floors hold") {
    val r = Recall.measure(emb.select("vec_id", "embedding"),
      nQueries = 10, k = 10, nlist = 8, nprobe = 2)
    info(f"recall@10: lsh=${r.lsh}%.3f ivf(nprobe=2/8)=${r.ivf}%.3f spill2=${r.ivfSpill}%.3f pq=${r.pq}%.3f opq=${r.opq}%.3f")
    assert(r.nQueries == 10 && r.k == 10)
    assert(r.lsh >= 0.90, s"LSH recall degraded: ${r.lsh}")
    assert(r.ivf >= 0.25, s"pruned-IVF recall degraded: ${r.ivf}")
    // raw 8-byte-code ADC order recalls only ~0.37 of the exact top-10
    // (32x compression is lossy by design) — the measured reason the
    // rerank shortlist must be generous (1000 codes) for
    // rerank-equals-exact to hold
    assert(r.pq >= 0.30 && r.pq <= 1.0, s"PQ ADC recall out of band: ${r.pq}")
    // the learned OPQ rotation must buy recall at identical code size
    // and scan cost (floor set from the measured sf0.001/sf0.1 values)
    assert(r.opq >= 0.50, s"OPQ ADC recall degraded: ${r.opq}")
    assert(r.opq >= r.pq - 0.05,
      s"OPQ ${r.opq} fell below plain PQ ${r.pq}: rotation is hurting")
    // spill-2 probes the same lists over a superset assignment: recall
    // can only improve (a top-1-assigned row is still in its list)
    assert(r.ivfSpill >= r.ivf,
      s"spilled recall ${r.ivfSpill} fell below plain IVF ${r.ivf}")
    // the HNSW efSearch frontier: at the build defaults the ef=64 beam
    // must recall essentially everything (the knn_hnsw_check invariant
    // measured as a rate), and widening the beam never loses recall
    info(f"hnsw@10: ef16=${r.hnswEf16}%.3f ef32=${r.hnswEf32}%.3f ef64=${r.hnsw}%.3f")
    assert(r.hnsw >= 0.90, s"HNSW ef=64 recall degraded: ${r.hnsw}")
    assert(r.hnswEf16 >= 0.60, s"HNSW ef=16 recall out of band: ${r.hnswEf16}")
    assert(r.hnsw >= r.hnswEf32 - 0.05 && r.hnswEf32 >= r.hnswEf16 - 0.05,
      s"efSearch frontier not monotone-ish: ${r.hnswEf16}/${r.hnswEf32}/${r.hnsw}")
    assert(r.lsh <= 1.0 && r.ivf <= 1.0 && r.ivfSpill <= 1.0)
    // the IVF-SQ8 composition probes the SAME clusters as the ivf row,
    // so its recall is bounded above by ivf (a global-top-k member in a
    // probed list always ranks into the exact within-list top-k) and
    // can fall below it only by SQ8's ADC distortion — which is small
    // (sq8_adc ~0.98 measured), hence the tight lower band
    info(f"ivfsq(nprobe=2/8)@10=${r.ivfSq}%.3f (ivf=${r.ivf}%.3f, sq8=${r.sq8}%.3f)")
    assert(r.ivfSq <= r.ivf + 1e-9,
      s"IVF-SQ8 recall ${r.ivfSq} exceeds its pruning ceiling ${r.ivf}")
    assert(r.ivfSq >= r.ivf - 0.10,
      s"IVF-SQ8 recall ${r.ivfSq} fell more than ADC distortion below IVF ${r.ivf}")
    // the report line Bench embeds must be a valid JSON fragment
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(s"{${r.json}}")
    assert(node.get("recall").get("lsh_at10").asDouble() == (r.lsh * 1000).round / 1000.0)
    assert(node.get("recall").get("ivf_spill_at10").asDouble() ==
      (r.ivfSpill * 1000).round / 1000.0)
    assert(node.get("recall").get("ivfsq_at10").asDouble() ==
      (r.ivfSq * 1000).round / 1000.0)
  }
}
