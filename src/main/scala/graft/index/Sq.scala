package graft.index

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) — the simplest rung of the ANN
  * compression ladder (the FAISS `ScalarQuantizer` QT_8bit idea,
  * Jégou et al.'s uniform-quantizer baseline): each dimension is
  * linearly mapped to one unsigned byte between its corpus-wide min
  * and max, so a d-dim float32 vector (4·d bytes) becomes d bytes — a
  * 4× compression with far lower distortion than PQ's 32× (the codes
  * keep per-dimension resolution instead of sharing a centroid per
  * subspace). The family completes the engine's quantization ladder:
  * 1-bit signatures (64× — [[Binary]]) < PQ/OPQ (32× — [[Pq]]) <
  * SQ8 (4× — this) < exact float32.
  *
  * Where it fits at 100 TB: SQ8 is the right choice when the codes
  * must fit in cluster memory but recall matters more than maximal
  * compression — its ADC top-k is usually exact-or-nearly-exact
  * (measured per round in the bench recall dict: `sq8_adc_at10`),
  * so the rerank shortlist can be small.
  *
  * Search uses asymmetric distance computation exactly like PQ: one
  * per-query table with 256 entries per dimension
  * (`t[d·256 + c] = (recon_d(c) − q_d)²`), then the per-row scan is d
  * byte-indexed lookups — which is precisely [[Pq]]'s ADC shape with
  * m = dim subspaces of k = 256, so the scan reuses the SAME codegen
  * kernel ([[org.apache.spark.sql.graft.VectorExpressions.pqAdc]]):
  * no new expression, no new plan shape, same bounded
  * TakeOrderedAndProject.
  *
  * The trainer is one distributed aggregation (per-dimension min/max
  * — exact, no sampling, no seed), so fits are bit-reproducible by
  * construction and the model is 2·d floats.
  */
object Sq {

  /** Hard cap on [[searchRerankBatch]]'s width — the documented safe
    * range for one wave (N ADC columns in one codegen select + N
    * TakeOrdered cuts over the checkpointed frame). Callers with more
    * queries compose waves. */
  val maxBatchWidth = 64

  /** Per-dimension quantization bounds: codes map [vmin(d), vmax(d)]
    * linearly onto [0, 255]. */
  final case class SqModel(dim: Int, vmin: Array[Float], vmax: Array[Float]) {
    require(vmin.length == dim && vmax.length == dim,
      s"bounds arrays must have length $dim")
  }

  /** Exact per-dimension min/max over the corpus: posexplode to
    * (dim, value) pairs, then ONE partial-aggregated groupBy — the
    * map-side combine reduces every task to ≤ dim rows before the
    * (dim-row) shuffle, so the explode never materializes. The collect
    * is dim-bounded. */
  def fit(df: DataFrame, embCol: String = "embedding"): SqModel = {
    val rows = df
      .select(posexplode(col(embCol)).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()
    require(rows.nonEmpty, "cannot fit SQ8 on an empty corpus")
    val dim = rows.length
    // dim is inferred as the distinct-position count, so ragged or
    // sparse-dim input (a position with no coverage) must fail loudly
    // here — not as a bare ArrayIndexOutOfBounds below, or worse,
    // silent 0.0f bounds for an uncovered dimension
    val seen = rows.map(_.getInt(0)).sorted
    require(seen.sameElements(0 until dim),
      s"SQ8 fit needs every dimension 0..${dim - 1} covered; the corpus has " +
        s"ragged embedding lengths (observed positions: ${seen.mkString(",")})")
    val vmin = new Array[Float](dim)
    val vmax = new Array[Float](dim)
    rows.foreach { r =>
      val d = r.getInt(0)
      vmin(d) = r.getFloat(1)
      vmax(d) = r.getFloat(2)
    }
    SqModel(dim, vmin, vmax)
  }

  /** One dimension's byte code: round-to-nearest on the linear map to
    * [0, 255], clamped (query-time vectors may exceed the training
    * range); a degenerate dimension (vmin == vmax) codes to 0. All
    * arithmetic in float64 with an explicit floor(x + 0.5) so encode
    * is deterministic across JVMs. */
  private def codeOf(x: Float, lo: Float, hi: Float): Byte = {
    if (hi <= lo) 0.toByte
    else {
      val t = (x.toDouble - lo) * 255.0 / (hi.toDouble - lo)
      val c = math.floor(t + 0.5)
      (if (c < 0.0) 0 else if (c > 255.0) 255 else c.toInt).toByte
    }
  }

  /** Encode every row to `dim` one-byte codes (build step; broadcast
    * model, per-partition amortized — [[Pq.encode]]'s shape). Output:
    * (idCol, codes binary). */
  def encode(
      df: DataFrame,
      model: SqModel,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val ds: Dataset[(Long, Array[Float])] =
      df.select(col(idCol).cast("long"), col(embCol)).as[(Long, Array[Float])]
    ds.mapPartitions { it =>
      val m = bc.value
      it.map { case (id, v) =>
        require(v.length == m.dim, s"vector dim ${v.length} != model dim ${m.dim}")
        val codes = new Array[Byte](m.dim)
        var d = 0
        while (d < m.dim) { codes(d) = codeOf(v(d), m.vmin(d), m.vmax(d)); d += 1 }
        (id, codes)
      }
    }.toDF(idCol, "codes")
  }

  /** ADC lookup table for one query: `t[d·256 + c] = (recon_d(c) − q_d)²`
    * — dim·256 doubles (32 KB at dim 16), embedded per query like the
    * PQ table. */
  def adcTable(model: SqModel, query: Array[Float]): Array[Double] =
    adcTableD(model.vmin.map(_.toDouble), model.vmax.map(_.toDouble),
      query.map(_.toDouble))

  /** The double-typed ADC-table core — the float entry point above and
    * the SQL surface's `sq8_adc` function
    * ([[org.apache.spark.sql.graft.GraftFunctions]]) both route here,
    * so the two paths can never diverge bit-wise (float→double
    * conversion is exact, and every op below runs in float64 on both
    * routes). */
  def adcTableD(lo: Array[Double], hi: Array[Double], q: Array[Double]): Array[Double] = {
    require(lo.length == hi.length && lo.length == q.length,
      s"sq8_adc: lo/hi/query lengths must agree, got ${lo.length}/${hi.length}/${q.length}")
    require(lo.nonEmpty, "sq8_adc: empty bounds")
    val dim = lo.length
    val table = new Array[Double](dim * 256)
    var d = 0
    while (d < dim) {
      val l = lo(d)
      val h = hi(d)
      var c = 0
      while (c < 256) {
        val recon = if (h <= l) l else l + c * (h - l) / 255.0
        val diff = recon - q(d)
        table(d * 256 + c) = diff * diff
        c += 1
      }
      d += 1
    }
    table
  }

  /** Approximate top-k by SQ8 ADC over the encoded corpus — the same
    * codegen table-lookup scan and bounded TakeOrderedAndProject as
    * [[Pq.search]] (it IS that kernel, at m = dim, k = 256). */
  def search(
      encoded: DataFrame,
      model: SqModel,
      query: Array[Float],
      k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val table = adcTable(model, query)
    encoded
      .select(col(idCol),
        org.apache.spark.sql.graft.VectorExpressions
          .pqAdc(col("codes"), table, 256).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** SQ8 ADC shortlist + exact re-rank — the standard compressed-scan
    * pipeline, sharing [[Pq.rerankShortlist]]. With SQ8's low
    * distortion the true neighbors sit inside a modest shortlist, so
    * the result equals exact top-k (oracle-verified at every SF). */
  def searchRerank(
      encoded: DataFrame,
      corpus: DataFrame,
      model: SqModel,
      query: Array[Float],
      k: Int,
      shortlist: Int = 100,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    Pq.rerankShortlist(search(encoded, model, query, shortlist, idCol),
      corpus, query, k, idCol, embCol)

  /** BATCH SQ8 probe — N queries served by ONE pass over the codes:
    * the scan computes N codegen ADC columns (each query's plan-time
    * table rides its own PqAdcExpr) into a NARROW (id, N dists) frame
    * materialized once (`localCheckpoint` — 8·(N+1) bytes/row, about
    * one extra codes-copy at N=8, spillable; bound the batch width and
    * compose waves for very large N), then N codegen TakeOrdered
    * passes cut the per-query shortlists from that frame — every stage
    * whole-stage codegen, no row-by-row tuple serialization (a
    * stack+aggregator unpivot was measured SLOWER than N single probes
    * at 400k codes: the generator + Dataset encode cost on |corpus|·N
    * rows dominates). Each shortlist's (adist, id) order is IDENTICAL
    * to the single-query [[search]] order; the exact rerank joins the
    * true vectors once for ALL queries. N separate probes scan the
    * codes N times; this scans them once. Returns (query_id, vec_id,
    * dist, rank) with dist the exact float64 distance. */
  def searchRerankBatch(
      encoded: DataFrame,
      corpus: DataFrame,
      model: SqModel,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      shortlist: Int = 100,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.size <= maxBatchWidth,
      s"batch width ${queries.size} exceeds $maxBatchWidth: each query adds one " +
        "codegen ADC column (dim·256 doubles of plan constants) and one TakeOrdered " +
        "cut — wider batches degrade the plan; compose waves of ≤" +
        s"$maxBatchWidth queries instead")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query ids in the batch (per-query columns are id-keyed)")
    val spark = encoded.sparkSession
    import spark.implicits._
    val adcCols = queries.map { case (qid, q) =>
      org.apache.spark.sql.graft.VectorExpressions
        .pqAdc(col("codes"), adcTable(model, q), 256).as(s"_adc_$qid") }
    val scored = encoded
      .select((col(idCol) +: adcCols): _*)
      .localCheckpoint() // ONE codes scan feeds all N shortlist cuts
    val short = queries.map { case (qid, _) =>
      scored.select(lit(qid).as("query_id"), col(idCol),
          col(s"_adc_$qid").as("adist"))
        .orderBy(col("adist").asc, col(idCol).asc)
        .limit(shortlist)
    }.reduce(_ unionAll _).select(col("query_id"), col(idCol))
    val qDf = queries.map { case (qid, q) => (qid, q.toSeq) }
      .toDF("query_id", "q_embedding")
    val wFinal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("dist").asc, col(idCol).asc)
    corpus.select(col(idCol), col(embCol))
      .join(broadcast(short), Seq(idCol))
      .join(broadcast(qDf), Seq("query_id"))
      .select(col("query_id"), col(idCol),
        graft.functions.Distances.l2Sq(col(embCol), col("q_embedding")).as("dist"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[searchRerankBatch]] for ANY batch width: N > [[maxBatchWidth]]
    * queries are composed as ceil(N / width) WAVES of ≤ width, each
    * wave one bounded batch plan, results unioned — the loud width
    * `require` becomes an implementation detail. Per-wave cost is the
    * measured batch shape (one codes scan + ≤64 codegen cuts); total
    * cost is waves × that, the same asymptote as one huge batch
    * without the plan-width cliff. Results are EXACTLY per-query
    * singles (each wave already is). */
  def searchRerankBatchWaved(
      encoded: DataFrame,
      corpus: DataFrame,
      model: SqModel,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      shortlist: Int = 100,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query ids in the batch (per-query columns are id-keyed)")
    queries.grouped(maxBatchWidth).toSeq
      .map(w => searchRerankBatch(encoded, corpus, model, w, k, shortlist,
        idCol, embCol))
      .reduce(_ unionAll _)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-SQ8: the FAISS IndexIVFScalarQuantizer composition — SQ8
    * codes written partitioned by the IVF cluster id, so a probe
    * prunes to nprobe/nlist of the (already 4×-compressed) codes
    * before the ADC scan; IO shrinks multiplicatively, and the codes
    * keep per-dimension resolution where IVF-PQ shares centroids.
    * Returns nothing; probe via [[searchIvfSq]]. */
  def writeIvfSqCodes(
      ivf: Ivf.Index,
      model: SqModel,
      df: DataFrame,
      dir: String,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Unit = {
    // carry the cluster through the encode pass (re-joining by id
    // would rerun assignment plus a full shuffle — Pq.writeIvfPqCodes'
    // contract)
    val assigned = Ivf.assign(ivf, df, embCol)
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    assigned.select(col(idCol).cast("long"), col(embCol), col("cluster"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, v, cluster) =>
          require(v.length == m.dim, s"vector dim ${v.length} != model dim ${m.dim}")
          val codes = new Array[Byte](m.dim)
          var d = 0
          while (d < m.dim) { codes(d) = codeOf(v(d), m.vmin(d), m.vmax(d)); d += 1 }
          (id, codes, cluster)
        }
      }
      .toDF(idCol, "codes", "cluster")
      .write.mode("overwrite").partitionBy("cluster").parquet(dir)
  }

  /** Partition-pruned ADC shortlist over the IVF-SQ8 layout — follow
    * with [[Pq.rerankShortlist]] for the exact stage. */
  def searchIvfSq(
      spark: org.apache.spark.sql.SparkSession,
      layoutDir: String,
      ivf: Ivf.Index,
      model: SqModel,
      query: Array[Float],
      shortlist: Int,
      nprobe: Int,
      idCol: String = "vec_id"): DataFrame = {
    val clusters = Ivf.probeClusters(ivf, query, nprobe)
    val codes = spark.read.parquet(layoutDir)
      .filter(col("cluster").isin(clusters: _*))
    search(codes, model, query, shortlist, idCol)
  }

  // --------------------------------------------------- persisted index

  private val codesSidecar = "_sq8_codes.json"
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def sidecarNodeOf(dir: String): Option[com.fasterxml.jackson.databind.JsonNode] = {
    val p = java.nio.file.Paths.get(dir, codesSidecar)
    if (java.nio.file.Files.exists(p))
      Some(mapper.readTree(java.nio.file.Files.readString(p)))
    else None
  }

  private def jsonStringSet(
      node: com.fasterxml.jackson.databind.JsonNode, key: String): Set[String] =
    if (node == null || !node.has(key)) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      node.get(key).elements().asScala.map(_.asText()).toSet
    }

  private def foldedTags(dir: String): Set[String] =
    sidecarNodeOf(dir).map(jsonStringSet(_, "folded")).getOrElse(Set.empty)

  private def deadTombTags(dir: String): Set[String] =
    sidecarNodeOf(dir).map(jsonStringSet(_, "deadTombs")).getOrElse(Set.empty)

  /** One committed-state SNAPSHOT of the code store, resolved from a
    * SINGLE sidecar read plus the immutable per-tag stats jsons it
    * names — the concurrent-reader contract: a probe built from one
    * snapshot serves wholly the state some commit left behind, never a
    * torn mix (directory listings can interleave with a compaction
    * commit; one atomic sidecar read cannot). Data dirs named by a
    * snapshot stay readable through ONE subsequent compaction commit —
    * compaction GC is LAGGED (a commit's superseded dirs are collected
    * at the START of the next compaction, not at its own end), so a
    * probe outlives at most one concurrent commit by construction.
    * Sidecars written before the committed-live-leg protocol carry no
    * `live`/`liveTombs` fields; the snapshot then falls back to the
    * legacy listing resolution (single-writer stores only). */
  private final case class Snap(
      node: Option[com.fasterxml.jackson.databind.JsonNode],
      v: Int,
      live: Seq[String],
      tombs: Seq[Tomb]) {
    def codesPathOf(dir: String): String =
      if (v > 0) s"$dir/codes_v$v" else s"$dir/codes"
    def folded: Set[String] = node.map(jsonStringSet(_, "folded")).getOrElse(Set.empty)
    def dead: Set[String] = node.map(jsonStringSet(_, "deadTombs")).getOrElse(Set.empty)
  }

  private def snapOf(dir: String): Snap = {
    val node = sidecarNodeOf(dir)
    val v = node.filter(_.hasNonNull("v")).map(_.get("v").asInt()).getOrElse(0)
    val folded = node.map(jsonStringSet(_, "folded")).getOrElse(Set.empty)
    val dead = node.map(jsonStringSet(_, "deadTombs")).getOrElse(Set.empty)
    val live = graft.io.MutableStore.optStringSeq(node, "live")
      .getOrElse(listedDeltaTags(dir).filterNot(folded))
    val tombTags = graft.io.MutableStore.optStringSeq(node, "liveTombs")
      .getOrElse(listedTombTags(dir).filterNot(dead))
    Snap(node, v, live, tombTags.map(readTomb(dir, _)))
  }

  private def sidecarPath(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(dir, codesSidecar)

  /** The current BASE codes location: `codes` for a never-compacted
    * artifact, the sidecar's committed `codes_v<N>` after a
    * compaction (the versioned-swap protocol — see [[compactDeltas]]). */
  def codesPath(dir: String): String = {
    val v = sidecarNodeOf(dir).filter(_.hasNonNull("v"))
      .map(_.get("v").asInt()).getOrElse(0)
    if (v > 0) s"$dir/codes_v$v" else s"$dir/codes"
  }

  /** Operational introspection of the SQ8 code store — the vector-side
    * twin of [[graft.text.InvertedIndex.describeStore]]: one row per
    * metric over the committed state and the live mutation legs.
    * `n_codes` is the delta-aware live count (sidecar base count +
    * delta counts − live tombstone counts — the rows the next probe
    * will actually scan), so the output ties to the corpus definition
    * and an oracle can recompute it. Json reads only, no data
    * touched. */
  def describeStore(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = snapOf(dir) // ONE committed-state read — the report is torn-proof
    val baseCount = s.node.map(_.get("count").asLong()).getOrElse(0L)
    val deltaCount = s.live.map { t =>
      mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, s"delta_$t", "_stats.json")))
        .get("count").asLong()
    }.sum
    Seq(
      ("base_version", s.v.toLong),
      ("live_deltas", s.live.size.toLong),
      ("live_tombstones", s.tombs.size.toLong),
      ("n_codes", baseCount + deltaCount - s.tombs.map(_.count).sum)
    ).toDF("metric", "value")
  }

  /** Persist the model bounds + codes behind the fingerprint-sidecar
    * protocol — the build-once/probe-many shape of every other index
    * family. The sidecar's (count, hash, hsum) terms are MERGEABLE,
    * so [[compactDeltas]] can fold appended batches without rescanning
    * the source corpus — and the match is FIELD-SUBSET
    * ([[graft.io.Artifact.ensureJson]]), so a compacted sidecar (which
    * additionally carries the version pointer and folded lists) still
    * matches a fresh ensure over the same post-delete corpus and is
    * reused, never rebuilt. */
  def ensureCodesArtifact(
      df: DataFrame,
      dir: String,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Unit = {
    val (nRows, dataHash, hashSum) = graft.io.Artifact.hashAgg(
      df, xxhash64(col(idCol), col(embCol).cast("array<double>")))
    graft.io.Artifact.ensureJson(dir, codesSidecar, Seq(
      "count" -> nRows.toString,
      "hash" -> dataHash.toString,
      "hsum" -> graft.io.Artifact.jsonStr(hashSum),
      "family" -> graft.io.Artifact.jsonStr("sq8_minmax"))) {
      val model = fit(df, embCol)
      df.sparkSession.createDataFrame(
          (0 until model.dim).map(d => (d, model.vmin(d), model.vmax(d))))
        .toDF("pos", "lo", "hi")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/bounds")
      encode(df, model, idCol, embCol)
        .write.mode("overwrite").parquet(s"$dir/codes")
      // a REBUILD means the corpus changed: stale version dirs, deltas
      // and tombstones belong to the old corpus (the fresh build's own
      // `codes` dir matches none of these prefixes)
      Seq("codes_v", "delta_", "tomb_").foreach { prefix =>
        listDirs(dir).filter(_.startsWith(prefix))
          .foreach(n => deleteRecursively(java.nio.file.Paths.get(dir, n)))
      }
    }
  }

  private def listDirs(dir: String): Seq[String] = {
    val root = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(root)) return Seq.empty
    val s = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(java.nio.file.Files.isDirectory(_))
        .map(_.getFileName.toString).toSeq
    } finally s.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(p)) return
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally walk.close()
  }

  /** The persisted artifact's quantization model (dim rows). */
  def modelFromArtifact(
      spark: org.apache.spark.sql.SparkSession, dir: String): SqModel = {
    val rows = spark.read.parquet(s"$dir/bounds").collect()
    val vmin = new Array[Float](rows.length)
    val vmax = new Array[Float](rows.length)
    rows.foreach { r =>
      vmin(r.getInt(0)) = r.getFloat(1); vmax(r.getInt(0)) = r.getFloat(2)
    }
    SqModel(rows.length, vmin, vmax)
  }

  /** Live delta tags per the COMMITTED state (one sidecar read). */
  private def deltaTags(dir: String): Seq[String] = snapOf(dir).live

  /** Legacy (pre-protocol) listing resolution — also the build-time
    * inventory for ensure's stale-dir cleanup. */
  private def listedDeltaTags(dir: String): Seq[String] =
    listDirs(dir)
      .filter(n => n.startsWith("delta_") &&
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, n, "_stats.json")))
      .map(_.stripPrefix("delta_"))
      .sorted

  private def listedTombTags(dir: String): Seq[String] =
    listDirs(dir)
      .filter(n => n.startsWith("tomb_") &&
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, n, "_stats.json")))
      .map(_.stripPrefix("tomb_"))
      .sorted

  /** One live tombstone batch: deleted ids + the legs it covers + the
    * batch's mergeable fingerprint terms (see [[deleteVectors]]). */
  private final case class Tomb(tag: String, covered: Set[String],
      count: Long, hash: Long, hsum: BigInt)

  private def readTomb(dir: String, tag: String): Tomb = {
    val n = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, s"tomb_$tag", "_stats.json")))
    Tomb(tag, jsonStringSet(n, "covered"),
      n.get("count").asLong(), n.get("hash").asLong(),
      BigInt(n.get("hsum").asText()))
  }

  private def liveTombs(dir: String): Seq[Tomb] = snapOf(dir).tombs

  /** DELETE a batch of vectors from the code store — the HNSW/IVF
    * tombstone pattern applied to the SQ8 artifact. The batch must be
    * the vectors' FULL rows (id + embedding: delete is the inverse of
    * append, and the embedding re-derives the mergeable fingerprint
    * terms), and each row must be LIVE — present exactly once across
    * base ∪ current deltas, not already tombstoned. Tag-keyed
    * OVERWRITE (idempotent under redelivery); the tombstone records
    * the legs it COVERS (base + live delta tags now), so a vector
    * re-appended later under a new tag is served again. Probes
    * anti-join each leg with only its covering tombstones; compaction
    * physically drops the rows and subtracts the terms.
    *
    * `excludeCovered`: delta tags the tombstone must NOT cover — a
    * CDC mutation batch passes its OWN tag so (a) a same-batch
    * delete+re-add leaves the re-add live (adds win within a batch)
    * and (b) an at-least-once redelivery, where the crashed attempt's
    * append delta for this tag already sits on disk, cannot record it
    * as covered and mask the batch's own appends. */
  def deleteVectors(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      batch: DataFrame,
      tag: String,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      excludeCovered: Set[String] = Set.empty): Unit =
      graft.io.MutableStore.withWriterLock(dir, "deleteVectors") {
    val (nRows, dataHash, hashSum) = graft.io.Artifact.hashAgg(
      batch, xxhash64(col(idCol), col(embCol).cast("array<double>")))
    val s = snapOf(dir)
    val covered = ("base" +: s.live.filterNot(excludeCovered))
      .map(t => "\"" + t + "\"").mkString("[", ",", "]")
    batch.select(col(idCol).cast("long").as(idCol)).distinct()
      .write.mode("overwrite").parquet(s"$dir/tomb_$tag/ids")
    graft.io.Artifact.writeAtomic(
      java.nio.file.Paths.get(dir, s"tomb_$tag", "_stats.json"),
      s"""{"count":$nRows,"hash":$dataHash,"hsum":"$hashSum","covered":$covered}""")
    // COMMIT the mutation: the tombstone is live once the state names
    // it. A tag the state already CONSUMED (deadTombs) is a redelivered
    // batch whose terms were already subtracted — debris, never
    // re-committed (double-subtract at the next consumption)
    if (!s.dead.contains(tag))
      graft.io.MutableStore.patchStringArrays(sidecarPath(dir),
        "liveTombs" -> (s.tombs.map(_.tag) :+ tag).distinct)
  }

  /** Drop every delta and tombstone dir, returning the store to the
    * BASE snapshot its sidecar attests — the replay helper mirroring
    * [[graft.text.InvertedIndex.dropMutations]]. */
  def dropMutations(dir: String): Unit =
      graft.io.MutableStore.withWriterLock(dir, "dropMutations") {
    listDirs(dir).filter(n => n.startsWith("delta_") || n.startsWith("tomb_"))
      .foreach(n => deleteRecursively(java.nio.file.Paths.get(dir, n)))
    // the committed state must agree with the wiped disk (folded/dead
    // debris went with the rest; GC at the next compaction sees none)
    graft.io.MutableStore.patchStringArrays(sidecarPath(dir),
      "live" -> Seq.empty, "liveTombs" -> Seq.empty,
      "folded" -> Seq.empty, "deadTombs" -> Seq.empty)
  }

  private def maskFor(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      tombs: Seq[Tomb], leg: String, idCol: String): Option[DataFrame] = {
    val covering = tombs.filter(_.covered.contains(leg))
    if (covering.isEmpty) None
    else Some(covering.map(t =>
        spark.read.parquet(s"$dir/tomb_${t.tag}/ids"))
      .reduce(_ unionAll _).distinct()
      .select(col(idCol)))
  }

  private def applyMask(df: DataFrame, mask: Option[DataFrame], idCol: String): DataFrame =
    // re-select in the input's column order: a USING join fronts the
    // join key, and the leg union downstream is POSITIONAL
    mask.fold(df)(m => df.join(broadcast(m), Seq(idCol), "left_anti")
      .select(df.columns.map(col).toIndexedSeq: _*))

  /** Codes over (base ∪ live deltas) − covering tombstones — the
    * probe's input. Each leg anti-joins only the (broadcast, tiny)
    * tombstones covering it, so a vector re-appended after its delete
    * is live again. SNAPSHOT-PINNED: the whole leg set (base version
    * path, live delta tags, covering tombstones) resolves from ONE
    * committed sidecar read, and lagged GC keeps every named dir
    * readable through one subsequent compaction commit — a probe built
    * here serves wholly the pinned state even if a compaction commits
    * before it executes (spec: SnapshotPinSpec). */
  def codesWithDeltas(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String = "vec_id"): DataFrame = {
    val s = snapOf(dir)
    val base = spark.read.parquet(s.codesPathOf(dir))
    val baseLeg = applyMask(base, maskFor(spark, dir, s.tombs, "base", idCol), idCol)
    s.live.foldLeft(baseLeg) { (acc, tag) =>
      acc.unionAll(applyMask(
        spark.read.schema(base.schema).parquet(s"$dir/delta_$tag/codes"),
        maskFor(spark, dir, s.tombs, tag, idCol), idCol))
    }
  }

  /** Base/delta byte sizes for the size-ratio compaction policy. */
  def baseBytes(dir: String): Long = duBytes(codesPath(dir))
  def deltaBytes(dir: String): Long =
    deltaTags(dir).map(t => duBytes(s"$dir/delta_$t")).sum

  private def duBytes(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return 0L
    val walk = java.nio.file.Files.walk(p)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size(_)).sum
    } finally walk.close()
  }

  /** Append a batch of new vectors ENCODED UNDER THE PERSISTED MODEL
    * (the FAISS trained-index contract: adding vectors never retrains
    * the quantizer — out-of-range values clamp, the re-rank stage
    * absorbs any extra distortion). Tag-keyed overwrite: idempotent
    * under at-least-once redelivery. The delta's stats json carries
    * the batch's mergeable fingerprint terms for [[compactDeltas]]. */
  def appendDelta(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      batch: DataFrame,
      tag: String,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Unit =
      graft.io.MutableStore.withWriterLock(dir, "appendDelta") {
    val (nRows, dataHash, hashSum) = graft.io.Artifact.hashAgg(
      batch, xxhash64(col(idCol), col(embCol).cast("array<double>")))
    val model = modelFromArtifact(spark, dir)
    encode(batch, model, idCol, embCol)
      .write.mode("overwrite").parquet(s"$dir/delta_$tag/codes")
    graft.io.Artifact.writeAtomic(
      java.nio.file.Paths.get(dir, s"delta_$tag", "_stats.json"),
      s"""{"count":$nRows,"hash":$dataHash,"hsum":"$hashSum"}""")
    // COMMIT the mutation: the delta is live once the state names it.
    // A tag the committed state already FOLDED is a redelivered batch
    // whose rows are in the base — the rewritten dir is debris (GC'd
    // at the next compaction), never re-committed (double-count)
    val s = snapOf(dir)
    if (!s.folded.contains(tag))
      graft.io.MutableStore.patchStringArrays(sidecarPath(dir),
        "live" -> (s.live :+ tag).distinct)
  }

  def deltaDirCount(dir: String): Int = deltaTags(dir).size

  /** LAGGED GC of the dirs the PREVIOUS commit superseded (its state
    * already excludes them) plus crashed-attempt debris — runs at the
    * START of each compaction, never at its own end, so every dir the
    * current committed state names survives until the NEXT compaction
    * and a snapshot-pinned probe outlives one concurrent commit. */
  private def gcPrior(dir: String, s: Snap,
      protectedRefs: Seq[graft.io.MutableStore.SnapRef] = Seq.empty): Unit = {
    // retention-aware: anything the CURRENT snapshot or a protected
    // prior still names survives (gcRetention = 1 → historical window)
    def baseOf(v: Int) = if (v > 0) s"codes_v$v" else "codes"
    val keepBases = (Set(s.v) ++ protectedRefs.map(_.v)).map(baseOf)
    val keepDelta = s.live.toSet ++ protectedRefs.flatMap(_.live)
    val keepTombs = s.tombs.map(_.tag).toSet ++ protectedRefs.flatMap(_.tombs)
    listDirs(dir).foreach { n =>
      val p = java.nio.file.Paths.get(dir, n)
      if (n.startsWith("_building_")) deleteRecursively(p)
      else if ((n.matches("codes_v\\d+") || n == "codes") && !keepBases.contains(n))
        deleteRecursively(p)
      else if (n.startsWith("delta_") && s.folded.contains(n.stripPrefix("delta_")) &&
          !keepDelta.contains(n.stripPrefix("delta_")))
        deleteRecursively(p)
      else if (n.startsWith("tomb_") && s.dead.contains(n.stripPrefix("tomb_")) &&
          !keepTombs.contains(n.stripPrefix("tomb_")))
        deleteRecursively(p)
    }
  }

  /** Fold live deltas (minus `excludeTags` — redelivery safety) and
    * tombstones into a NEW base codes version: per-leg tombstone
    * anti-joins drop deleted rows physically, the folded codes are
    * BUILT UNDER AN UNDERSCORE TEMP (invisible to recursive listings
    * even half-written), renamed into a `codes_v<N>` path that is
    * NEVER REUSED ([[graft.io.MutableStore.maxOnDiskVersion]] skips
    * past crashed-attempt debris), and the COMMIT is one atomic
    * sidecar replace carrying the merged fingerprint + version pointer
    * + folded/consumed lists + the surviving live legs. Tombstones
    * whose covered legs all folded are CONSUMED (terms subtracted), so
    * a later [[ensureCodesArtifact]] over the post-delete union corpus
    * reuses instead of rebuilding. The MODEL is untouched
    * (trained-index contract). GC is LAGGED ([[gcPrior]]): this
    * commit's superseded dirs survive until the next compaction, so a
    * snapshot-pinned probe built before this commit still serves its
    * wholly-old state. Single-writer (one compactor at a time);
    * concurrent PROBES are safe — the snapshot contract. */
  def compactDeltas(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      excludeTags: Set[String] = Set.empty,
      idCol: String = "vec_id"): Unit =
      graft.io.MutableStore.withWriterLock(dir, "compactDeltas") {
    val s = snapOf(dir)
    val tags = s.live.filterNot(excludeTags)
    val tombs = s.tombs
    if (tags.isEmpty && tombs.isEmpty) return
    // never-reuse allocation BEFORE debris GC: a crashed attempt's
    // renamed-but-uncommitted codes_v<X> must still bump the counter
    val vNew = math.max(s.v,
      graft.io.MutableStore.maxOnDiskVersion(dir, Seq("codes_v"))) + 1
    val (protectedRefs, _) = graft.io.MutableStore.splitPriors(dir,
      s.node.map(jsonStringSet(_, "priors")).getOrElse(Set.empty).toSeq)
    gcPrior(dir, s, protectedRefs)
    val sidecar = sidecarPath(dir)
    val node = s.node.getOrElse(
      throw new IllegalStateException(s"no $codesSidecar under $dir"))
    var cnt = node.get("count").asLong()
    var hsh = node.get("hash").asLong()
    var hsum = BigInt(node.get("hsum").asText())
    tags.foreach { tag =>
      val d = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, s"delta_$tag", "_stats.json")))
      cnt += d.get("count").asLong()
      hsh ^= d.get("hash").asLong()
      hsum += BigInt(d.get("hsum").asText())
    }
    val consumed = tombs.filter(_.covered.forall(c =>
      c == "base" || tags.contains(c) || !s.live.contains(c)))
    consumed.foreach { t =>
      cnt -= t.count
      hsh ^= t.hash
      hsum -= t.hsum
    }
    val base = spark.read.parquet(s.codesPathOf(dir))
    val union = (
      applyMask(base, maskFor(spark, dir, tombs, "base", idCol), idCol) +:
        tags.map(t => applyMask(
          spark.read.schema(base.schema).parquet(s"$dir/delta_$t/codes"),
          maskFor(spark, dir, tombs, t, idCol), idCol))
      ).reduce(_ unionAll _)
    val building = java.nio.file.Paths.get(dir, s"_building_codes_v$vNew")
    deleteRecursively(building)
    union.write.mode("overwrite").parquet(building.toString)
    java.nio.file.Files.move(building,
      java.nio.file.Paths.get(dir, s"codes_v$vNew"))
    // ---- COMMIT: one atomic sidecar replace ----
    def onDisk(prefix: String)(t: String): Boolean =
      java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s"$prefix$t"))
    val folded = (s.folded.filter(onDisk("delta_")) ++ tags).toSeq.sorted
    val dead = (s.dead.filter(onDisk("tomb_")) ++
      consumed.map(_.tag)).toSeq.sorted
    val liveLeft = s.live.filterNot(tags.contains(_)).sorted
    val tombsLeft = tombs.map(_.tag).filterNot(consumed.map(_.tag).contains(_)).sorted
    def arr(x: Seq[String]) = x.map("\"" + _ + "\"").mkString("[", ",", "]")
    val priors = graft.io.MutableStore.pushPrior(dir, protectedRefs,
      graft.io.MutableStore.SnapRef(s.v, s.live, tombs.map(_.tag)))
    graft.io.Artifact.writeAtomic(sidecar,
      s"""{"count":$cnt,"hash":$hsh,"hsum":"$hsum","family":"sq8_minmax","v":$vNew,"folded":${arr(folded)},"deadTombs":${arr(dead)},"live":${arr(liveLeft)},"liveTombs":${arr(tombsLeft)},"priors":${arr(priors)}}""")
    // NO GC here — lagged to the next compaction's gcPrior, so probes
    // pinned on the pre-commit snapshot keep every dir they named
  }
}
