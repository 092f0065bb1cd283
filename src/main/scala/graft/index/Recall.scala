package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured recall@k of the approximate search family against the exact
  * scan — the accuracy half of the accuracy/cost trade-off that the
  * reference's HNSW build parameters embody implicitly (M=16,
  * M_max0=200, `/root/reference/lib/hnsw/hnsw.h`): an approximate index
  * is only as useful as its measured recall at its measured speedup.
  * [[graft.Bench]] emits these numbers per round alongside the timings;
  * RecallSpec pins floors so a quietly-degraded index fails tests, not
  * production.
  *
  * Driver-side loops here are bounded by `nQueries` (each iteration
  * collects ≤ k ids) — the measurement harness is not a scale path.
  */
object Recall {

  final case class Report(lsh: Double, ivf: Double, ivfSpill: Double,
      pq: Double, nQueries: Int, k: Int, nprobe: Int) {
    def json: String =
      f""""recall":{"lsh_at$k":$lsh%.3f,"ivf_at$k":$ivf%.3f,"ivf_spill_at$k":$ivfSpill%.3f,"pq_adc_at$k":$pq%.3f,"n_queries":$nQueries,"nprobe":$nprobe}"""
  }

  /** recall@`k` of LSH (seeded BRP, the [[Ann]] defaults), pruned-IVF
    * (`nprobe` of `nlist` lists), and spill-2 pruned-IVF
    * ([[Ivf.assignSpilled]] — same nprobe, 2× storage) search, averaged
    * over the `nQueries` lowest-id corpus vectors as self-queries.
    * Everything is seeded, so the numbers are reproducible run to run;
    * the lsh/ivf/ivfSpill triple quantifies the accuracy side of each
    * index's accuracy/cost position at identical probe cost. */
  def measure(corpus: DataFrame, nQueries: Int = 10, k: Int = 10,
      nlist: Int = 8, nprobe: Int = 2): Report = {
    val qs = corpus.filter(col("vec_id") < nQueries)
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray)
    val lshModel = Ann.fit(corpus)
    val ivfIndex = Ivf.fit(corpus, nlist = nlist, maxIter = 3)
    val assigned = Ivf.assign(ivfIndex, corpus).select("vec_id", "embedding", "cluster")
      .persist()
    val spilled = Ivf.assignSpilled(ivfIndex, corpus, spill = 2)
      .select("vec_id", "embedding", "cluster").persist()
    // PQ: the ADC top-k BEFORE any exact re-rank — the number the
    // rerank shortlist has to recover from (the sf0.1 sweep showed a
    // too-small shortlist silently breaking rerank-equals-exact)
    val cb = Pq.fit(corpus, m = 8, k = 64, maxSample = 8192)
    val codes = Pq.encode(corpus, cb).persist()
    var lshHits, ivfHits, spillHits, pqHits = 0
    try {
      qs.foreach { q =>
        val exact = graft.ops.VectorSearch.knnExact(corpus, q.toSeq, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val lsh = Ann.searchApprox(lshModel, corpus, q, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val ivf = Ivf.search(ivfIndex, assigned, q, k, nprobe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val spill = Ivf.searchSpilled(ivfIndex, spilled, q, k, nprobe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val pq = Pq.search(codes, cb, q, k)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        lshHits += (exact & lsh).size
        ivfHits += (exact & ivf).size
        spillHits += (exact & spill).size
        pqHits += (exact & pq).size
      }
    } finally { assigned.unpersist(); spilled.unpersist(); codes.unpersist() }
    val denom = (qs.length * k).toDouble
    Report(lshHits / denom, ivfHits / denom, spillHits / denom, pqHits / denom,
      qs.length, k, nprobe)
  }
}
