package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.VectorSearch

/** Recall-targeted index selection: "give me ≥ target recall@k at
  * minimum probe cost".
  *
  * The reference's HNSW build parameters (M=16, M_max0=200, ef=200 —
  * `/root/reference/lib/hnsw/hnsw.h:104-132`) hand its users a fixed,
  * implicitly near-exact accuracy envelope. This engine instead exposes a
  * whole family of approximate paths (LSH, pruned IVF at any nprobe,
  * spill-2 IVF) whose recall differs by 30+ points at the same k — so a
  * migrating user needs the selection the reference never had to make.
  * [[build]] MEASURES each config's recall@k (against a distributed
  * exact ground truth) and its scan cost (fraction of corpus rows scored
  * per query — candidate rows for LSH, probed-list rows for IVF), and
  * [[select]] walks that measured frontier: the cheapest config whose
  * measured recall clears the target, falling back to the exact scan
  * (recall 1.0, cost 1.0) when nothing does. Nothing here guesses from
  * formulas — every point on the frontier is a measurement on the
  * corpus at hand, so the answer tracks the data distribution.
  */
object AnnSelector {

  /** One measured operating point: `scanFrac` is the measured fraction
    * of corpus rows scored per query under this config. */
  final case class Point(name: String, recall: Double, scanFrac: Double)

  /** The built artifacts plus the measured frontier. `assigned` and
    * `spilled` stay persisted until [[release]]. */
  final case class Built(
      lshModel: org.apache.spark.ml.feature.BucketedRandomProjectionLSHModel,
      ivfIndex: Ivf.Index,
      assigned: DataFrame,
      spilled: DataFrame,
      frontier: Seq[Point],
      nQueries: Int,
      k: Int) {
    def release(): Unit = { assigned.unpersist(); spilled.unpersist() }
  }

  /** Measure the frontier on the `nQueries` lowest-id corpus vectors as
    * probe queries (same protocol as [[Recall.measure]]): one batch
    * ground truth, one unioned candidate plan across every config, one
    * join+aggregate for hits — plus one tiny cluster-size aggregate for
    * the IVF scan costs and a bucket-collision count for LSH's. */
  def build(
      corpus: DataFrame,
      nQueries: Int = 10,
      k: Int = 10,
      nlist: Int = 8,
      probes: Seq[Int] = Seq(1, 2, 3, 4, 6)): Built = {
    val n = corpus.count().toDouble
    require(n > 0, "cannot build a selector over an empty corpus")
    // probe queries = the nQueries LOWEST ids (a bounded TakeOrdered),
    // not `id < nQueries`: a store whose low ids were deleted (CLI
    // `search --approx` after churn) must still measure a frontier
    val queries = corpus
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
      .orderBy(col("query_id").asc)
      .limit(nQueries)
    val qs: Array[(Long, Array[Float])] = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qs.nonEmpty, "no probe queries available")

    val gt = VectorSearch.knnJoinAgg(queries, corpus, k)
      .select(col("query_id"), col("vec_id")).persist()
    gt.count()

    val lshModel = Ann.fit(corpus)
    val ivfIndex = Ivf.fit(corpus, nlist = nlist, maxIter = 3)
    val assigned = Ivf.assign(ivfIndex, corpus)
      .select("vec_id", "embedding", "cluster").persist()
    val spilled = Ivf.assignSpilled(ivfIndex, corpus, spill = 2)
      .select("vec_id", "embedding", "cluster").persist()

    val validProbes = probes.filter(p => p >= 1 && p < nlist)

    // ---- recall: one unioned plan over every (config, query) branch
    def withQid(qid: Long, df: DataFrame): DataFrame =
      df.select(lit(qid).as("query_id"), col("vec_id"))
    def tagged(name: String, branches: Seq[DataFrame]): DataFrame =
      branches.reduce(_ union _)
        .select(lit(name).as("method"), col("query_id"), col("vec_id"))
    val candidateSets =
      tagged("lsh", qs.toSeq.map { case (qid, q) =>
        withQid(qid, Ann.searchApprox(lshModel, corpus, q, k)) }) +:
      validProbes.map { p =>
        tagged(s"ivf_np$p", qs.toSeq.map { case (qid, q) =>
          withQid(qid, Ivf.search(ivfIndex, assigned, q, k, p)) })
      } ++:
      validProbes.map { p =>
        tagged(s"spill2_np$p", qs.toSeq.map { case (qid, q) =>
          withQid(qid, Ivf.searchSpilled(ivfIndex, spilled, q, k, p)) })
      }
    val hits = candidateSets.reduce(_ union _)
      .join(gt, Seq("query_id", "vec_id"))
      .groupBy("method").agg(count(lit(1)).as("hits"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    gt.unpersist()
    val denom = (qs.length * k).toDouble
    def recallOf(m: String): Double = hits.getOrElse(m, 0L) / denom

    // ---- scan cost, measured
    // IVF: rows living in the probed lists, from the (nlist-row) size map
    val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val spillSizes = spilled.groupBy("cluster").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def probedFrac(szs: Map[Int, Long], p: Int): Double =
      qs.map { case (_, q) =>
        Ivf.probeClusters(ivfIndex, q, p).map(c => szs.getOrElse(c, 0L)).sum / n
      }.sum / qs.length
    // LSH single-probe: candidate rows = corpus rows sharing ≥1 hash
    // bucket with the query, counted through the model's own hashes
    import org.apache.spark.ml.functions.vector_to_array
    val corpusHashes = lshModel
      .transform(Ann.withFeatures(corpus, "embedding"))
      .select(col("vec_id"), posexplode(col("hashes")).as(Seq("table", "h")))
      // BRP hashes are 1-element vectors; a scalar join key keeps the
      // bucket join in codegen (UDT columns are not joinable)
      .select(col("vec_id"), col("table"), vector_to_array(col("h")).getItem(0).as("bucket"))
      .persist()
    val queryHashes = lshModel
      .transform(Ann.withFeatures(queries
        .select(col("query_id"), col("q_embedding").as("embedding")), "embedding"))
      .select(col("query_id"), posexplode(col("hashes")).as(Seq("table", "h")))
      .select(col("query_id"), col("table"), vector_to_array(col("h")).getItem(0).as("bucket"))
    val lshCand = corpusHashes
      .join(broadcast(queryHashes), Seq("table", "bucket"))
      .select("query_id", "vec_id").distinct()
      .groupBy("query_id").agg(count(lit(1)).as("c"))
      .agg(sum(col("c"))).head().getLong(0)
    corpusHashes.unpersist()
    val lshFrac = lshCand / (n * qs.length)

    val measured =
      Point("lsh", recallOf("lsh"), lshFrac) +:
        validProbes.map(p => Point(s"ivf_np$p", recallOf(s"ivf_np$p"), probedFrac(sizes, p))) ++:
        validProbes.map(p => Point(s"spill2_np$p", recallOf(s"spill2_np$p"), probedFrac(spillSizes, p)))
    // a config at least as costly as the exact scan is strictly dominated
    // (exact has recall 1.0 at cost 1.0) — e.g. spill-2 at high nprobe
    // re-reads the doubled assignment; keep the frontier selectable-only
    val frontier = (measured.filter(_.scanFrac < 1.0) :+ Point("exact", 1.0, 1.0))
      .sortBy(p => (p.scanFrac, p.name))
    Built(lshModel, ivfIndex, assigned, spilled, frontier, qs.length, k)
  }

  /** Reassemble a [[Built]] from its session-free parts (the seeded
    * models and the measured frontier — what a process-level memo can
    * hold) plus lazily re-derived assignment plans over `corpus`. The
    * assignments are NOT persisted here: a single search executes only
    * the selected config's branch, so caching every branch's input
    * would cost more than it saves. Callers running many searches
    * should persist `assigned`/`spilled` themselves. */
  def fromParts(
      corpus: DataFrame,
      lshModel: org.apache.spark.ml.feature.BucketedRandomProjectionLSHModel,
      ivfIndex: Ivf.Index,
      frontier: Seq[Point],
      nQueries: Int = 10,
      k: Int = 10): Built =
    Built(lshModel, ivfIndex,
      Ivf.assign(ivfIndex, corpus).select("vec_id", "embedding", "cluster"),
      Ivf.assignSpilled(ivfIndex, corpus, spill = 2)
        .select("vec_id", "embedding", "cluster"),
      frontier, nQueries, k)

  /** The cheapest measured config clearing `targetRecall`; the exact
    * scan (always on the frontier at recall 1.0, cost 1.0) is the
    * fallback, so selection never silently under-delivers. */
  def select(built: Built, targetRecall: Double): Point = {
    val meeting = built.frontier.filter(_.recall >= targetRecall)
    if (meeting.isEmpty) built.frontier.find(_.name == "exact").get
    else meeting.minBy(p => (p.scanFrac, p.name))
  }

  /** Run a top-k search under a selected config. */
  def search(
      built: Built,
      corpus: DataFrame,
      point: Point,
      query: Array[Float],
      k: Int): DataFrame = point.name match {
    case "lsh" => Ann.searchApprox(built.lshModel, corpus, query, k)
      .select(col("vec_id"), col("dist"))
    case "exact" => VectorSearch.knnExact(corpus, query.toSeq, k)
    case ivf if ivf.startsWith("ivf_np") =>
      Ivf.search(built.ivfIndex, built.assigned, query, k, ivf.stripPrefix("ivf_np").toInt)
    case sp if sp.startsWith("spill2_np") =>
      Ivf.searchSpilled(built.ivfIndex, built.spilled, query, k, sp.stripPrefix("spill2_np").toInt)
    case other => throw new IllegalArgumentException(s"unknown config: $other")
  }

  /** Batch form of [[search]]: bounded top-k for EVERY row of a query
    * TABLE (query_id, q_embedding) under one selected config — the
    * recall-targeted path composed with `knnJoinAgg`'s shuffle cap.
    * The corpus/assignment side is NEVER shuffled in any branch:
    *
    *  - ivf/spill2: per-query probe clusters come from a |Q|×nlist
    *    distance rank against a broadcast centroid table (bounded,
    *    query-side); the (query_id, cluster, q_embedding) probe table
    *    then broadcasts INTO the assignment scan, and candidates run
    *    through the bounded [[graft.ops.TopKAggregator]] (shuffle ≤
    *    partitions×|Q|×k rows). Spilled assignments collapse
    *    multi-probed rows per query BEFORE the heap.
    *  - lsh: the corpus hash table joins the broadcast query hashes on
    *    (table, bucket) — the single-probe candidate set of
    *    `approxNearestNeighbors`, batched — then the same bounded agg.
    *  - exact: [[VectorSearch.knnJoinAgg]] unchanged.
    *
    * Output: (query_id, vec_id, dist, rank), rank 1..≤k per query. */
  def searchBatch(
      built: Built,
      corpus: DataFrame,
      point: Point,
      queries: DataFrame,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import graft.functions.Distances
    import graft.ops.TopKAggregator

    // (query_id, vec_id, dist) candidates → bounded per-query top-k
    def boundedTopK(cands: DataFrame): DataFrame =
      cands
        .select(col("query_id").cast("long"), col("vec_id").cast("long"),
          col("dist").cast("double"))
        .as[(Long, Long, Double)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3))
        .agg(new TopKAggregator(k).toColumn.name("topk"))
        .flatMap { case (qid, arr) =>
          arr.iterator.zipWithIndex.map { case ((id, d), i) => (qid, id, d, i + 1) }
        }
        .toDF("query_id", "vec_id", "dist", "rank")
        .orderBy(col("query_id").asc, col("rank").asc)

    def ivfBatch(assigned: DataFrame, nprobe: Int, dedupe: Boolean): DataFrame = {
      // DOUBLE centroids + the l2SqHof fold = exactly probeClusters'
      // driver arithmetic (and assignByCentroids'), so the batch path
      // probes the very clusters the single-query path would
      val centers = built.ivfIndex.model.clusterCenters.map(_.toArray.toSeq)
      val centersDf = spark.createDataFrame(centers.toSeq.zipWithIndex.map(_.swap))
        .toDF("cluster", "c_embedding")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("c_dist").asc, col("cluster").asc)
      val probes = queries
        .select(col("query_id"), col("q_embedding"))
        .crossJoin(broadcast(centersDf))
        .select(col("query_id"), col("q_embedding"), col("cluster"),
          Distances.l2SqHof(col("q_embedding"), col("c_embedding")).as("c_dist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= nprobe)
        .select("query_id", "q_embedding", "cluster")
      val joined = assigned.join(broadcast(probes), "cluster")
      // a spill-assigned row probed via two of a query's clusters must
      // count once for that query (the searchSpilled contract)
      val once =
        if (dedupe) joined.dropDuplicates("query_id", "vec_id") else joined
      boundedTopK(once.select(col("query_id"), col("vec_id"),
        Distances.l2Sq(col("embedding"), col("q_embedding")).as("dist")))
    }

    def lshBatch(): DataFrame = {
      import org.apache.spark.ml.functions.vector_to_array
      def hashed(df: DataFrame, idCol: String, embCol: String): DataFrame =
        built.lshModel.transform(Ann.withFeatures(df, embCol))
          .select(col(idCol), col(embCol),
            posexplode(col("hashes")).as(Seq("table", "h")))
          .select(col(idCol), col(embCol), col("table"),
            vector_to_array(col("h")).getItem(0).as("bucket"))
      val qh = hashed(
        queries.select(col("query_id"), col("q_embedding").as("embedding")),
        "query_id", "embedding")
        .select(col("query_id"), col("embedding").as("q_embedding"),
          col("table"), col("bucket"))
      val cands = hashed(corpus, "vec_id", "embedding")
        .join(broadcast(qh), Seq("table", "bucket"))
        .dropDuplicates("query_id", "vec_id")
      boundedTopK(cands.select(col("query_id"), col("vec_id"),
        Distances.l2Sq(col("embedding"), col("q_embedding")).as("dist")))
    }

    point.name match {
      case "exact" => VectorSearch.knnJoinAgg(queries, corpus, k)
      case "lsh" => lshBatch()
      case ivf if ivf.startsWith("ivf_np") =>
        ivfBatch(built.assigned, ivf.stripPrefix("ivf_np").toInt, dedupe = false)
      case sp if sp.startsWith("spill2_np") =>
        ivfBatch(built.spilled, sp.stripPrefix("spill2_np").toInt, dedupe = true)
      case other => throw new IllegalArgumentException(s"unknown config: $other")
    }
  }

  /** One-call form: measure, select for `targetRecall`, search. Returns
    * the chosen point alongside the results so callers can log/audit
    * what the selector committed to. */
  def searchAtRecall(
      corpus: DataFrame,
      query: Array[Float],
      k: Int,
      targetRecall: Double,
      nQueries: Int = 10,
      nlist: Int = 8): (Point, DataFrame) = {
    val built = build(corpus, nQueries, k, nlist)
    try {
      val point = select(built, targetRecall)
      // materialize the (≤ k)-row result before releasing the cached
      // assignment artifacts the plan reads from
      (point, search(built, corpus, point, query, k).localCheckpoint())
    } finally built.release()
  }
}
