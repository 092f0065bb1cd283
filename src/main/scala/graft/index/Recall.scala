package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.VectorSearch

/** Measured recall@k of the approximate search family against the exact
  * scan — the accuracy half of the accuracy/cost trade-off that the
  * reference's HNSW build parameters embody implicitly (M=16,
  * M_max0=200, `/root/reference/lib/hnsw/hnsw.h`): an approximate index
  * is only as useful as its measured recall at its measured speedup.
  * [[graft.Bench]] emits these numbers per round alongside the timings;
  * RecallSpec pins floors so a quietly-degraded index fails tests, not
  * production.
  *
  * Fully distributed: ground truth is ONE batch [[VectorSearch.knnJoinAgg]]
  * (bounded TopKAggregator shuffle), each method's candidates are a
  * single unioned plan of bounded per-query top-k branches, and the hit
  * counts come back from one join + aggregate. The only driver-side data
  * are the `nQueries` probe vectors (needed to build probe predicates
  * and ADC tables — tiny by construction) and the final count rows, so
  * the report itself scales with the corpus.
  */
object Recall {

  final case class Report(lsh: Double, ivf: Double, ivfSpill: Double,
      pq: Double, opq: Double, nQueries: Int, k: Int, nprobe: Int,
      hnsw: Double = 0.0, hnswEf16: Double = 0.0, hnswEf32: Double = 0.0,
      sq8: Double = 0.0, ivfSq: Double = 0.0,
      ivfCurve: Seq[(Int, Double)] = Seq.empty,
      ivfSqCurve: Seq[(Int, Double)] = Seq.empty) {
    private def curveJson(c: Seq[(Int, Double)]): String =
      c.map { case (np, r) => f""""np$np":$r%.3f""" }.mkString("{", ",", "}")
    def json: String =
      f""""recall":{"lsh_at$k":$lsh%.3f,"ivf_at$k":$ivf%.3f,"ivf_spill_at$k":$ivfSpill%.3f,"pq_adc_at$k":$pq%.3f,"opq_adc_at$k":$opq%.3f,"sq8_adc_at$k":$sq8%.3f,"ivfsq_at$k":$ivfSq%.3f,"hnsw_at$k":$hnsw%.3f,"hnsw_ef16_at$k":$hnswEf16%.3f,"hnsw_ef32_at$k":$hnswEf32%.3f,"ivf_curve_at$k":${curveJson(ivfCurve)},"ivfsq_curve_at$k":${curveJson(ivfSqCurve)},"n_queries":$nQueries,"nprobe":$nprobe}"""
  }

  /** One operating point of the nprobe RECALL CURVE: an index family
    * at a probe width, its measured recall@k, and its measured cost —
    * split into the two honest units: `scanFrac` = expected fraction
    * of corpus ROWS the probe reads (identical for ivf and ivfsq: the
    * SQ8 leg scans codes of the same probed lists), and `costFrac` =
    * the BYTE-cost proxy the selection trades recall against (the
    * ivfsq leg's rows are 4×-compressed codes, so its byte cost is a
    * quarter of the exact leg's at equal scanFrac). */
  final case class CurvePoint(
      family: String, nprobe: Int, recall: Double,
      scanFrac: Double, costFrac: Double)

  /** The IVF / IVF-SQ8 nprobe recall curve — recall@`k` and measured
    * scan fraction at every `probes` width, for both the exact-distance
    * pruned family (ivf) and the 4×-compressed ADC composition (ivfsq).
    * This is the curve a user sizes `nprobe` by (a single operating
    * point hides the knee): candidates at larger nprobe are a SUPERSET
    * (probed lists are rank-prefixes), so ivf recall is monotone in
    * nprobe and reaches 1.0 at nprobe = nlist; ivfsq ranks the same
    * pruned candidates by ADC, so its recall can only lose true
    * neighbors relative to ivf at the same width (ivfsq ≤ ivf,
    * pointwise). One ground-truth batch kNN + ONE unioned candidate
    * plan over every (family, nprobe, query) branch — the
    * [[measure]]/[[AnnSelector.build]] discipline. */
  def ivfCurve(
      corpus: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nlist: Int = 8,
      probes: Seq[Int] = Seq(1, 2, 4, 8)): Seq[CurvePoint] = {
    require(probes.nonEmpty && probes.forall(p => p >= 1 && p <= nlist),
      s"probe widths must be in [1, nlist=$nlist], got $probes")
    val n = corpus.count().toDouble
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    val qs: Array[(Long, Array[Float])] = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qs.nonEmpty, "no probe queries below vec_id < nQueries")
    val gt = VectorSearch.knnJoinAgg(queries, corpus, k)
      .select(col("query_id"), col("vec_id")).persist()
    gt.count()
    val ivfIndex = Ivf.fit(corpus, nlist = nlist, maxIter = 3)
    val assigned = Ivf.assign(ivfIndex, corpus)
      .select("vec_id", "embedding", "cluster").persist()
    val sqModel = Sq.fit(corpus)
    val sqAssigned = assigned.select(col("vec_id"), col("cluster"))
      .join(Sq.encode(corpus, sqModel), "vec_id").persist()
    def withQid(qid: Long, df: DataFrame): DataFrame =
      df.select(lit(qid).as("query_id"), col("vec_id"))
    def tagged(name: String, branches: Seq[DataFrame]): DataFrame =
      branches.reduce(_ union _).select(lit(name).as("method"),
        col("query_id"), col("vec_id"))
    val candidates = (
      probes.map { p =>
        tagged(s"ivf_np$p", qs.toSeq.map { case (qid, q) =>
          withQid(qid, Ivf.search(ivfIndex, assigned, q, k, p)) })
      } ++
      probes.map { p =>
        tagged(s"ivfsq_np$p", qs.toSeq.map { case (qid, q) =>
          val probed = Ivf.probeClusters(ivfIndex, q, p)
          withQid(qid, Sq.search(
            sqAssigned.filter(col("cluster").isin(probed: _*)), sqModel, q, k)) })
      }).reduce(_ union _)
    val hits =
      try candidates.join(gt, Seq("query_id", "vec_id"))
        .groupBy("method").agg(count(lit(1)).as("hits"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      finally gt.unpersist()
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assigned.unpersist(); sqAssigned.unpersist()
    val denom = (qs.length * k).toDouble
    def fracOf(p: Int): Double =
      qs.map { case (_, q) =>
        Ivf.probeClusters(ivfIndex, q, p).map(c => sizes.getOrElse(c, 0L)).sum / n
      }.sum / qs.length
    probes.flatMap { p =>
      val frac = fracOf(p)
      Seq(
        CurvePoint("ivf", p, hits.getOrElse(s"ivf_np$p", 0L) / denom, frac, frac),
        // the SQ8 leg scans the SAME rows (codes of the same probed
        // lists) — its byte cost is what shrinks 4×
        CurvePoint("ivfsq", p, hits.getOrElse(s"ivfsq_np$p", 0L) / denom,
          frac, frac / 4.0))
    }
  }

  /** The cheapest curve point meeting `targetRecall` — cheapest by
    * `costFrac`, the byte-cost proxy (ties to the smaller nprobe, then
    * family name) — the recall-target loop closed over the RECORDED
    * curve, so an operator can replay the selection from the bench
    * record. None when no point clears the target (the caller's
    * fallback is the exact scan at recall 1, cost 1). */
  def selectFromCurve(
      curve: Seq[CurvePoint], targetRecall: Double): Option[CurvePoint] =
    curve.filter(_.recall >= targetRecall)
      .sortBy(p => (p.costFrac, p.nprobe, p.family))
      .headOption

  /** recall@`k` of LSH (seeded BRP, the [[Ann]] defaults), pruned-IVF
    * (`nprobe` of `nlist` lists), spill-2 pruned-IVF ([[Ivf.assignSpilled]]
    * — same nprobe, 2× storage), raw PQ ADC, and OPQ ADC (same code size,
    * learned rotation) search, averaged over the `nQueries` lowest-id
    * corpus vectors as self-queries. Everything is seeded, so the numbers
    * are reproducible run to run; the tuple quantifies the accuracy side
    * of each index's accuracy/cost position at identical probe cost. */
  def measure(corpus: DataFrame, nQueries: Int = 10, k: Int = 10,
      nlist: Int = 8, nprobe: Int = 2,
      curveProbes: Seq[Int] = Seq(1, 2, 4, 8)): Report = {
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    // bounded collect: nQueries rows, needed driver-side for probe-cluster
    // ranking and per-query ADC tables (both are driver arithmetic anyway)
    val qs: Array[(Long, Array[Float])] = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qs.nonEmpty, "no probe queries below vec_id < nQueries")

    // ground truth: one distributed batch kNN join
    val gt = VectorSearch.knnJoinAgg(queries, corpus, k)
      .select(col("query_id"), col("vec_id")).persist()
    gt.count() // pin before the candidate plans reuse the query side

    val lshModel = Ann.fit(corpus)
    val ivfIndex = Ivf.fit(corpus, nlist = nlist, maxIter = 3)
    val assigned = Ivf.assign(ivfIndex, corpus).select("vec_id", "embedding", "cluster")
      .persist()
    val spilled = Ivf.assignSpilled(ivfIndex, corpus, spill = 2)
      .select("vec_id", "embedding", "cluster").persist()
    // PQ / OPQ: the ADC top-k BEFORE any exact re-rank — the number the
    // rerank shortlist has to recover from (the sf0.1 sweep showed a
    // too-small shortlist silently breaking rerank-equals-exact)
    val cb = Pq.fit(corpus, m = 8, k = 64, maxSample = 8192)
    val codes = Pq.encode(corpus, cb).persist()
    val opqModel = Pq.fitOpq(corpus, m = 8, k = 64, maxSample = 8192)
    val opqCodes = Pq.encodeOpq(corpus, opqModel).persist()
    // SQ8: raw ADC top-k at 4× compression — the ladder rung between
    // OPQ and exact whose measured recall sizes its rerank shortlist
    val sqModel = Sq.fit(corpus)
    val sqCodes = Sq.encode(corpus, sqModel).persist()
    // IVF-SQ8 composition (the FAISS IndexIVFScalarQuantizer shape) at
    // the SAME nprobe as the ivf row: its recall compounds list pruning
    // × ADC distortion — the nprobe-dependent operating point a user
    // sizes the composition by (the declared knn_ivfsq_rerank query
    // runs at nprobe = nlist, i.e. unpruned/exact mode)
    val sqAssigned = assigned.select(col("vec_id"), col("cluster"))
      .join(sqCodes, "vec_id").persist()
    // HNSW: the efSearch frontier (16/32/64) at the engine's build
    // defaults — the recall-vs-beam-width curve a user must size, now
    // measured per round like every other index family. The sharded
    // graphs are built once and probed per-ef; each probe's per-shard
    // candidates reduce to the global top-k with a per-query window.
    val dim = qs.head._2.length
    val hnswP = Hnsw.Params(m = 8, efConstruction = 64,
      parts = Hnsw.autoParts(corpus.count(), dim))
    val hnswLayout = Hnsw.build(corpus, hnswP, embCol = "embedding").persist()
    hnswLayout.count()
    def hnswTopK(ef: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("dist").asc, col("vec_id").asc)
      Hnsw.searchCandidates(hnswLayout, qs.toSeq, k, hnswP, efSearch = ef)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("q_id").as("query_id"), col("vec_id"))
    }

    // one unioned plan per method: each branch is a bounded top-k
    def tagged(name: String, branches: Seq[DataFrame]): DataFrame =
      branches.reduce(_ union _).select(lit(name).as("method"),
        col("query_id"), col("vec_id"))
    def withQid(qid: Long, df: DataFrame): DataFrame =
      df.select(lit(qid).as("query_id"), col("vec_id"))
    val candidates = Seq(
      tagged("lsh", qs.toSeq.map { case (qid, q) =>
        withQid(qid, Ann.searchApprox(lshModel, corpus, q, k)) }),
      tagged("ivf", qs.toSeq.map { case (qid, q) =>
        withQid(qid, Ivf.search(ivfIndex, assigned, q, k, nprobe)) }),
      tagged("spill", qs.toSeq.map { case (qid, q) =>
        withQid(qid, Ivf.searchSpilled(ivfIndex, spilled, q, k, nprobe)) }),
      tagged("pq", qs.toSeq.map { case (qid, q) =>
        withQid(qid, Pq.search(codes, cb, q, k)) }),
      tagged("opq", qs.toSeq.map { case (qid, q) =>
        withQid(qid, Pq.searchOpq(opqCodes, opqModel, q, k)) }),
      tagged("sq8", qs.toSeq.map { case (qid, q) =>
        withQid(qid, Sq.search(sqCodes, sqModel, q, k)) }),
      tagged("ivfsq", qs.toSeq.map { case (qid, q) =>
        val probed = Ivf.probeClusters(ivfIndex, q, nprobe)
        withQid(qid, Sq.search(
          sqAssigned.filter(col("cluster").isin(probed: _*)), sqModel, q, k)) }),
      // the nprobe RECALL CURVE for both pruned families — the numbers
      // a user sizes nprobe by (one operating point hides the knee)
      curveProbes.map { p =>
        tagged(s"ivfc_np$p", qs.toSeq.map { case (qid, q) =>
          withQid(qid, Ivf.search(ivfIndex, assigned, q, k, p)) })
      }.reduce(_ union _),
      curveProbes.map { p =>
        tagged(s"ivfsqc_np$p", qs.toSeq.map { case (qid, q) =>
          val probed = Ivf.probeClusters(ivfIndex, q, p)
          withQid(qid, Sq.search(
            sqAssigned.filter(col("cluster").isin(probed: _*)), sqModel, q, k)) })
      }.reduce(_ union _),
      Seq(16, 32, 64).map(ef =>
        hnswTopK(ef).select(lit(s"hnsw_ef$ef").as("method"),
          col("query_id"), col("vec_id"))).reduce(_ union _)
    ).reduce(_ union _)

    val hits =
      try {
        candidates.join(gt, Seq("query_id", "vec_id"))
          .groupBy("method").agg(count(lit(1)).as("hits"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      } finally {
        gt.unpersist(); assigned.unpersist(); spilled.unpersist()
        codes.unpersist(); opqCodes.unpersist(); sqCodes.unpersist()
        sqAssigned.unpersist(); hnswLayout.unpersist()
      }
    val denom = (qs.length * k).toDouble
    def of(m: String): Double = hits.getOrElse(m, 0L) / denom
    Report(of("lsh"), of("ivf"), of("spill"), of("pq"), of("opq"),
      qs.length, k, nprobe,
      hnsw = of("hnsw_ef64"), hnswEf16 = of("hnsw_ef16"), hnswEf32 = of("hnsw_ef32"),
      sq8 = of("sq8"), ivfSq = of("ivfsq"),
      ivfCurve = curveProbes.map(p => p -> of(s"ivfc_np$p")),
      ivfSqCurve = curveProbes.map(p => p -> of(s"ivfsqc_np$p")))
  }
}
