package graft.index

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.VectorSearch

/** IVF (inverted-file) ANN — the partition-pruned scale path.
  *
  * Build: a KMeans coarse quantizer (fit on a sample — the model is just
  * `nlist` centroids) assigns every row a `cluster` id; the corpus is
  * written partitioned by that column. Search: centroid distances are
  * computed driver-side (nlist ≪ corpus), the `nprobe` nearest clusters
  * become an `IN` predicate that Spark turns into partition pruning —
  * at 100 TB a probe reads nprobe/nlist of the data instead of all of it.
  * Within the probed clusters, search is the exact TakeOrderedAndProject
  * kernel, so results are exact-within-probed-partitions (standard IVF
  * semantics).
  */
object Ivf {

  final case class Index(model: KMeansModel, nlist: Int)

  /** Build the coarse quantizer. `sampleFraction` bounds driver/ML cost
    * at scale — centroids converge on a sample. */
  def fit(
      df: DataFrame,
      nlist: Int,
      embCol: String = "embedding",
      sampleFraction: Double = 1.0,
      maxIter: Int = 20): Index = {
    val base = Ann.withFeatures(df, embCol)
    val sampled = if (sampleFraction >= 1.0) base else base.sample(sampleFraction, 42L)
    val model = new KMeans()
      .setK(nlist).setSeed(42L).setFeaturesCol("features").setPredictionCol("cluster")
      .setMaxIter(maxIter)
      .fit(sampled)
    Index(model, nlist)
  }

  /** Assign every row its inverted-list id. */
  def assign(index: Index, df: DataFrame, embCol: String = "embedding"): DataFrame =
    index.model.transform(Ann.withFeatures(df, embCol)).drop("features")

  /** Materialize the corpus partitioned by cluster — the layout that
    * makes [[search]]'s cluster predicate a partition-pruning scan. */
  def writePartitioned(index: Index, df: DataFrame, dir: String, embCol: String = "embedding"): Unit =
    assign(index, df, embCol).write.mode("overwrite").partitionBy("cluster").parquet(dir)

  /** Driver-side: the nprobe clusters nearest to the query. */
  def probeClusters(index: Index, query: Array[Float], nprobe: Int): Seq[Int] =
    probeClustersOf(index.model.clusterCenters.map(_.toArray), query, nprobe)

  /** ANN top-k over an assigned (or partition-pruned parquet) corpus. */
  def search(
      index: Index,
      assigned: DataFrame,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val clusters = probeClusters(index, query, nprobe)
    VectorSearch.knnExact(
      assigned.filter(col("cluster").isin(clusters: _*)),
      query.toSeq, k, idCol, embCol)
  }

  /** Search straight from the partitioned layout: the `cluster IN (...)`
    * filter prunes parquet partitions before any IO. */
  def searchPartitioned(
      spark: SparkSession,
      index: Index,
      dir: String,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    search(index, spark.read.parquet(dir), query, k, nprobe, idCol, embCol)

  // ------------------------------------------------- persisted layout

  /** The searchable on-disk form of an IVF index: the cluster-partitioned
    * parquet plus a centroid sidecar. Probing only needs the centroids —
    * not the fitted KMeansModel — so a layout loads without any ML state
    * and a long-lived service never re-fits (the reference rebuilds its
    * whole index on every query, vectordb.cpp:216-217 — the exact
    * anti-pattern this split exists to avoid). */
  final case class Layout(dir: String, centroids: Array[Array[Double]])

  private val centroidFile = "_centroids.json"

  /** Cheap content fingerprint of the corpus: row count plus an
    * order-independent hash of the embedding column. One narrow scan —
    * the price of never probing a stale cached layout after the input
    * data changes under the same path. */
  private def fingerprint(df: DataFrame, embCol: String): (Long, Long, String) =
    // bit_xor (order-independent, ANSI-safe) + duplicate-robust
    // decimal sum — the shared sidecar hash ([[graft.io.Artifact.hashAgg]])
    graft.io.Artifact.hashAgg(df, xxhash64(col(embCol)))

  /** Fit (if needed) and persist the partitioned layout + sidecar.
    * Idempotent across processes: an existing layout is reused only when
    * its recorded corpus fingerprint matches the current input — a
    * regenerated fixture or a hash-collided cache dir forces a rebuild
    * instead of silently probing stale data. The sidecar is written LAST,
    * so a crashed build never looks complete. */
  def buildLayout(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      nlist: Int,
      maxIter: Int = 20,
      sampleFraction: Double = 1.0,
      embCol: String = "embedding"): Layout = {
    val sidecar = java.nio.file.Paths.get(dir, centroidFile)
    val (nRows, dataHash, hashSum) = fingerprint(df, embCol)
    if (java.nio.file.Files.exists(sidecar)) {
      val (layout, storedCount, storedHash, storedSum) = loadLayoutWithFingerprint(dir)
      // nlist is structural: a caller asking for a different list count
      // must get a rebuild, not a silent reuse of the old partitioning
      // (the stored centroid count IS the built nlist)
      if (storedCount == nRows && storedHash == dataHash && storedSum == hashSum &&
          layout.centroids.length == nlist) return layout
    }
    val index = fit(df, nlist, embCol, sampleFraction, maxIter)
    writePartitioned(index, df, dir, embCol)
    val centroids = index.model.clusterCenters.map(_.toArray)
    val centroidJson = centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    graft.io.Artifact.writeAtomic(sidecar,
      s"""{"count":$nRows,"hash":$dataHash,"hsum":"$hashSum","centroids":$centroidJson}""")
    Layout(dir, centroids)
  }

  def loadLayout(dir: String): Layout = loadLayoutWithFingerprint(dir)._1

  private def loadLayoutWithFingerprint(dir: String): (Layout, Long, Long, String) = {
    val json = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, centroidFile))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    import scala.jdk.CollectionConverters._
    val centroids = node.get("centroids").elements().asScala
      .map(row => row.elements().asScala.map(_.asDouble()).toArray).toArray
    (Layout(dir, centroids), node.get("count").asLong(), node.get("hash").asLong(),
      if (node.hasNonNull("hsum")) node.get("hsum").asText() else "")
  }

  private[graft] def probeClustersOf(centroids: Array[Array[Double]], query: Array[Float], nprobe: Int): Seq[Int] = {
    val q = query.map(_.toDouble)
    centroids.zipWithIndex
      .map { case (c, i) =>
        var s = 0.0
        var j = 0
        while (j < q.length) { val d = c(j) - q(j); s += d * d; j += 1 }
        (s, i)
      }
      .sortBy(_._1).take(nprobe).map(_._2).toSeq
  }

  /** Assign rows to inverted lists using only the sidecar centroids (no
    * ML state), with EXACTLY [[probeClustersOf]]'s double arithmetic
    * (left-to-right fold over the dimension index — [[graft.functions.Distances.l2SqHof]]
    * is the same op sequence) and its tie-break (lexicographic
    * (dist, cluster)): a row whose embedding equals a probe query
    * provably lands in that probe's top-1 cluster. */
  def assignByCentroids(layout: Layout, df: DataFrame, embCol: String = "embedding"): DataFrame = {
    val members = layout.centroids.zipWithIndex.map { case (c, i) =>
      struct(
        graft.functions.Distances.l2SqHof(col(embCol), lit(c)).as("d"),
        lit(i).as("c"))
    }
    df.withColumn("cluster", array_min(array(members.toIndexedSeq: _*)).getField("c"))
  }

  /** Spilled (multi-)assignment, ScaNN-style: each row lands in its
    * `spill` nearest inverted lists — same per-centroid arithmetic and
    * lexicographic (dist, cluster) tie-break as [[assignByCentroids]],
    * so the top-1 assignment is unchanged. Storage grows spill×, and a
    * query whose true neighbors sit just across a Voronoi boundary
    * finds them in an already-probed list: recall at FIXED nprobe
    * rises without reading more clusters at query time (quantified in
    * [[Recall.measure]]). That trades write-side space for read-side
    * recall — the right direction at 100 TB, where probe IO dominates
    * and the layout is written once. */
  def assignSpilled(
      index: Index,
      df: DataFrame,
      spill: Int,
      embCol: String = "embedding"): DataFrame = {
    val centroids = index.model.clusterCenters.map(_.toArray)
    require(spill >= 1 && spill <= centroids.length,
      s"spill must be in [1, ${centroids.length}], got $spill")
    val members = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        graft.functions.Distances.l2SqHof(col(embCol), lit(c)).as("d"),
        lit(i).as("c"))
    }
    df.withColumn("cluster",
      explode(slice(array_sort(array(members.toIndexedSeq: _*)), 1, spill)
        .getField("c")))
  }

  /** Probe a spilled assignment: identical cluster ranking; rows probed
    * through more than one list collapse BEFORE the top-k heap (a
    * multi-assigned row must count once). The dedup shuffles only the
    * probed subset — nprobe/nlist of the spilled rows. */
  def searchSpilled(
      index: Index,
      assignedSpilled: DataFrame,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val clusters = probeClusters(index, query, nprobe)
    VectorSearch.knnExact(
      assignedSpilled.filter(col("cluster").isin(clusters: _*))
        .dropDuplicates(idCol),
      query.toSeq, k, idCol, embCol)
  }

  /** O2 `add` at the index level: incremental layout maintenance. New
    * rows are assigned by [[assignByCentroids]] and APPENDED to the
    * partitioned parquet — no rebuild, no rewrite of existing inverted
    * lists (the reference rewrites its whole database file on every add,
    * `vectordb.cpp:158-178`, and refits the index per query). The
    * sidecar fingerprint updates compositionally (counts add, xxhash64
    * xors — the fingerprint aggregate is xor exactly so this works), so
    * no rescan of the layout is needed; it is rewritten AFTER the data
    * append, so a crash in between leaves a mismatched fingerprint that
    * [[buildLayout]] treats as "rebuild" — never a silently stale probe.
    * Standard IVF caveat: heavy appends under distribution drift skew
    * the inverted lists; rebuild when drift matters. */
  /** LOUD GUARD shared by both append paths: an appended id that is
    * currently tombstoned would be SILENTLY MASKED by every probe's
    * global anti-join — and naively clearing its tombstone instead
    * would resurrect the old base row next to the new one (duplicate).
    * The layout's tombstones are a global id mask (unlike the
    * posting/SQ8 stores' covered-leg tombstones, under which re-adds
    * revive); the supported revival path here is [[compactLayout]]
    * (physical drop + tombstone clear), THEN re-add. Batch-sized
    * semi-join against the small broadcast tombstone table. */
  private def requireNotTombstoned(layout: Layout, rows: DataFrame, idCol: String): Unit = {
    val tombPath = new java.io.File(layout.dir, tombstoneDirName)
    if (!tombPath.exists()) return
    val spark = rows.sparkSession
    val clash = rows.select(col(idCol).cast("long").as(idCol)).distinct()
      .join(broadcast(spark.read.parquet(tombPath.toString)
        .select(col(idCol)).distinct()), Seq(idCol), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"append: id ${clash.headOption.map(_.getLong(0)).getOrElse(-1L)} is tombstoned in " +
        s"${layout.dir} — a global-mask probe would silently hide the re-add; run " +
        "compactLayout to physically reclaim deleted rows, then re-add")
  }

  def appendToLayout(
      layout: Layout,
      rows: DataFrame,
      embCol: String = "embedding"): Layout = {
    requireNotTombstoned(layout, rows, "vec_id")
    // pin the batch ONCE: writing and fingerprinting from two separate
    // evaluations of `rows` would let a nondeterministic input store one
    // dataset while the sidecar attests another — exactly the silent
    // staleness the fingerprint exists to rule out
    val assigned = assignByCentroids(layout, rows, embCol).localCheckpoint()
    assigned.write.mode("append").partitionBy("cluster").parquet(layout.dir)
    val (nNew, hNew, sNew) = fingerprint(assigned, embCol)
    val sidecar = java.nio.file.Paths.get(layout.dir, centroidFile)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readString(sidecar))
    val count = node.get("count").asLong() + nNew
    val hash = node.get("hash").asLong() ^ hNew
    // xor and sum are both order-independent, so the sidecar fingerprint
    // stays maintainable incrementally: xor toggles, sum adds
    val hsum = storedHsum(node).add(new java.math.BigInteger(sNew))
    graft.io.Artifact.writeAtomic(sidecar,
      s"""{"count":$count,"hash":$hash,"hsum":"$hsum","centroids":${node.get("centroids").toString}}""")
    layout
  }

  private def storedHsum(node: com.fasterxml.jackson.databind.JsonNode): java.math.BigInteger =
    if (node.hasNonNull("hsum")) new java.math.BigInteger(node.get("hsum").asText())
    else java.math.BigInteger.ZERO

  private val tombstoneDirName = "_tombstones"
  private val deltaDirPrefix = "_delta_"

  /** Batch-keyed IDEMPOTENT append — the streaming-side O2 for the
    * partitioned index: the batch's rows, assigned to their nearest
    * centroid with the probe's own double arithmetic
    * ([[assignByCentroids]]), land in an OVERWRITE-mode
    * `_delta_<tag>` subdirectory of the layout, cluster-partitioned
    * like the base data. foreachBatch is at-least-once, so the delta
    * protocol from the incremental dedup stores applies verbatim: a
    * retried micro-batch REWRITES its own delta instead of
    * double-appending into the base layout (which `mode("append")` +
    * a sidecar increment would corrupt twice over). The underscore
    * prefix keeps deltas invisible to the base `parquet(layout.dir)`
    * scan; delta-aware probes ([[searchLayoutDeltaAware]]) read them
    * explicitly with the same cluster pruning. The sidecar is NOT
    * touched — it attests the base corpus only, so [[buildLayout]]
    * reuse semantics stay exact; fold deltas into the base with a
    * batch [[appendToLayout]] + delta cleanup when compaction is due.
    * Returns the number of rows written. */
  def appendDelta(
      layout: Layout,
      rows: DataFrame,
      tag: String,
      embCol: String = "embedding"): Long = {
    requireNotTombstoned(layout, rows, "vec_id") // see the guard's doc
    val assigned = assignByCentroids(layout, rows, embCol).localCheckpoint()
    assigned.write.mode("overwrite").partitionBy("cluster")
      .parquet(s"${layout.dir}/$deltaDirPrefix$tag")
    assigned.count()
  }

  /** Number of pending `_delta_<tag>` directories — what a probe's
    * union width grows with, and the quantity the streaming
    * auto-compaction policy bounds. */
  def deltaDirCount(layout: Layout): Int =
    Option(new java.io.File(layout.dir).listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith(deltaDirPrefix))

  private def duBytesOf(f: java.io.File): Long =
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else Option(f.listFiles()).getOrElse(Array.empty).map(duBytesOf).sum

  /** Bytes of the live delta dirs / of the base inverted lists — the
    * size-ratio compaction policy's inputs (IVF's fold is O(delta)
    * file moves either way; the ratio trigger just amortizes the
    * per-fold fixed cost over proportionally more appended bytes). */
  def deltaBytes(layout: Layout): Long =
    Option(new java.io.File(layout.dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(deltaDirPrefix))
      .map(duBytesOf).sum

  def baseBytes(layout: Layout): Long =
    Option(new java.io.File(layout.dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
      .map(duBytesOf).sum

  /** All delta rows of a layout (None when no delta dirs exist). Each
    * delta dir is its own cluster-partitioned table, so they are read
    * per-dir and unioned — a single multi-root read would trip
    * partition discovery ("conflicting directory structures"). */
  def deltaRows(spark: SparkSession, layout: Layout): Option[DataFrame] = {
    val dirs = Option(new java.io.File(layout.dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(deltaDirPrefix))
      .sortBy(_.getName)
    if (dirs.isEmpty) None
    else Some(dirs.map(d => spark.read.parquet(d.getPath))
      .reduce(_ unionByName _))
  }

  /** Fold streamed deltas into the base layout — the compaction leg of
    * the streaming-append protocol, for when delta-dir count grows
    * past listing comfort. Mechanics: per-cluster part FILES are
    * MOVED (atomic rename, unique target names) from each
    * `_delta_<tag>/cluster=N/` into the base `cluster=N/`, so at every
    * instant each row lives in exactly one place — a crash mid-fold
    * leaves some rows served from base and the rest from their delta,
    * never both. The sidecar then updates compositionally (count adds,
    * xor toggles, sum adds — fingerprinted BEFORE the moves from the
    * same files); a crash between moves and sidecar write leaves the
    * reuse check conservative (mismatch → rebuild), probes correct.
    *
    * CONCURRENCY: this fold (and [[compactLayout]]'s in-place partition
    * overwrite) is the engine's ONE stop-the-world maintenance op —
    * single-writer AND no concurrent probes, unlike every other store
    * family (those serve snapshot-pinned probes through their
    * compactions). The exactly-one-place crash invariant above is WHY:
    * moves have no single commit point a reader could pin, and the
    * alternatives trade it away (copy+commit double-serves rows in the
    * crash window; a versioned base makes each fold O(base), killing
    * the O(delta) move advantage). The multi-reader path at 100 TB is
    * a manifest-file layout (Iceberg-style per-snapshot file lists)
    * rather than directory listings — out of scope here; schedule this
    * fold in a maintenance window, as deployments do for partition
    * rewrites.
    * `excludeTags` skips named deltas — the streaming auto-compaction
    * hook passes the IN-FLIGHT batch's tag, because folding an
    * uncommitted (possibly crashed-attempt) delta into the base and
    * then redelivering its batch would re-add the folded rows; deltas
    * of COMMITTED batches never redeliver and fold safely.
    *
    * CONCURRENCY CONTRACT (single-writer, no concurrent probe): the
    * crash-safety argument above covers a fold that DIES, not one that
    * races a live reader. A [[searchLayoutDeltaAware]] in another
    * session that listed the delta dirs before the fold can hit
    * FileNotFoundException (files moved out from under its scan) or a
    * partial view mid-fold. Run compaction from the single maintenance
    * writer (the [[graft.streaming.StreamingIngest.streamingIvfAppend]]
    * hook runs it inside the micro-batch, where Structured Streaming
    * already serializes it against that stream's own probes) and quiesce
    * external probes around a manual fold; a reader that does race it
    * should treat missing-file failures as transient and re-issue the
    * probe (the re-listed view is consistent — every row lives in
    * exactly one place at every instant).
    * Returns the number of delta directories folded. */
  def compactDeltas(
      spark: SparkSession,
      layout: Layout,
      embCol: String = "embedding",
      idCol: String = "vec_id",
      excludeTags: Set[String] = Set.empty): Int = {
    val excluded = excludeTags.map(deltaDirPrefix + _)
    val dirs = Option(new java.io.File(layout.dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(deltaDirPrefix) &&
        !excluded(f.getName))
      .sortBy(_.getName)
    if (dirs.isEmpty) return 0
    val rows = dirs.map(d => spark.read.parquet(d.getPath)).reduce(_ unionByName _)
    // fingerprint only LIVE delta rows: a delta row deleted via
    // [[deleteFromLayout]] never entered the sidecar arithmetic (delta
    // deletes write tombstones only), so folding it into the count/
    // hash/hsum here would make the sidecar attest a corpus containing
    // deleted rows — every later [[buildLayout]] against the true live
    // corpus would mismatch and silently full-rebuild. The tombstones
    // themselves are kept (the moved files still contain the dead rows;
    // probes keep anti-joining them until [[compactLayout]] rewrites).
    val (nNew, hNew, sNew) = fingerprint(liveRows(spark, layout, rows, idCol), embCol)
    dirs.foreach { d =>
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(c => c.isDirectory && c.getName.startsWith("cluster="))
        .foreach { c =>
          val target = java.nio.file.Paths.get(layout.dir, c.getName)
          java.nio.file.Files.createDirectories(target)
          Option(c.listFiles()).getOrElse(Array.empty)
            .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
            .foreach { f =>
              java.nio.file.Files.move(f.toPath,
                target.resolve(s"${d.getName.stripPrefix("_")}_${f.getName}"))
            }
        }
      // the emptied delta dir (and its marker files) goes last
      val walk = java.nio.file.Files.walk(d.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
    val sidecar = java.nio.file.Paths.get(layout.dir, centroidFile)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readString(sidecar))
    val hsum = storedHsum(node).add(new java.math.BigInteger(sNew))
    graft.io.Artifact.writeAtomic(sidecar,
      s"""{"count":${node.get("count").asLong() + nNew},"hash":${node.get("hash").asLong() ^ hNew},"hsum":"$hsum","centroids":${node.get("centroids").toString}}""")
    dirs.length
  }

  /** [[searchLayout]] over base ∪ streamed deltas: both sides prune to
    * the probed clusters (partition pruning on the base scan AND on
    * every delta dir — they share the cluster-partitioned disk
    * layout), and the tombstone anti-join applies to the UNION, so a
    * delete of a delta-appended id is honored ([[deleteFromLayout]]
    * writes tombstones for delta rows too). */
  def searchLayoutDeltaAware(
      spark: SparkSession,
      layout: Layout,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val clusters = probeClustersOf(layout.centroids, query, nprobe)
    val base = spark.read.parquet(layout.dir)
      .filter(col("cluster").isin(clusters: _*))
    val scan = deltaRows(spark, layout) match {
      case Some(d) =>
        base.unionByName(d.filter(col("cluster").isin(clusters: _*))
          .select(base.columns.map(col).toIndexedSeq: _*))
      case None => base
    }
    VectorSearch.knnExact(
      liveRows(spark, layout, scan, idCol), query.toSeq, k, idCol, embCol)
  }

  /** Logical delete from a persisted layout (the reference's O5 for the
    * partitioned index — with the CORRECT post-delete search the
    * reference lacks: its HNSW keeps serving deleted ids until a manual
    * rebuild, `vectordb.cpp:62-73` + SURVEY §5). Ids are appended as a
    * TOMBSTONE table under the layout (`_tombstones/`, invisible to the
    * data scan — Spark skips underscore paths), so a delete is one tiny
    * write, never a partition rewrite; every probe anti-joins the
    * (small, broadcast) tombstone set. The sidecar fingerprint is
    * xor-updated with the removed rows' contribution, so a later
    * [[buildLayout]] against the ORIGINAL corpus sees a mismatch and
    * rebuilds rather than silently reusing the shrunken layout.
    * Already-tombstoned and never-present ids are ignored (delete is
    * idempotent; the fingerprint is never double-xored). Tombstones are
    * written BEFORE the sidecar: a crash in between leaves probes
    * correct and only the reuse check conservative. Returns the number
    * of newly deleted rows. */
  def deleteFromLayout(
      layout: Layout,
      ids: DataFrame,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Long = {
    val spark = ids.sparkSession
    val tombPath = s"${layout.dir}/$tombstoneDirName"
    val requested = ids.select(col(idCol).cast("long").as(idCol)).distinct()
    val affected = liveRows(spark, layout, spark.read.parquet(layout.dir), idCol)
      .join(broadcast(requested), Seq(idCol), "left_semi")
      .localCheckpoint() // one evaluation feeds both the write and the xor
    // delta-appended rows are tombstoned too (the streaming-append
    // interplay), but NEVER enter the sidecar arithmetic — the sidecar
    // attests only the base corpus, and delta rows were never added to
    // it. The overlap exclusion (an id deleted via the base leg must
    // not re-count here) anti-joins against `affected` — the
    // batch-bounded requested∩live-in-base set — NOT against all base
    // ids, which would broadcast a corpus-sized id table at scale.
    val deltaAffected = deltaRows(spark, layout).map(
      _.join(broadcast(requested), Seq(idCol), "left_semi")
        .join(broadcast(affected.select(col(idCol))), Seq(idCol), "left_anti")
        .select(col(idCol)).distinct().localCheckpoint())
    val (nDel, hDel, sDel) = fingerprint(affected, embCol)
    val nDeltaDel = deltaAffected.map { d =>
      val live = liveRows(spark, layout, d, idCol).localCheckpoint()
      val n = live.count()
      if (n > 0L) live.write.mode("append").parquet(tombPath)
      n
    }.getOrElse(0L)
    if (nDel == 0L) return nDeltaDel
    affected.select(col(idCol)).write.mode("append").parquet(tombPath)
    val sidecar = java.nio.file.Paths.get(layout.dir, centroidFile)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(java.nio.file.Files.readString(sidecar))
    val hsum = storedHsum(node).subtract(new java.math.BigInteger(sDel))
    graft.io.Artifact.writeAtomic(sidecar,
      s"""{"count":${node.get("count").asLong() - nDel},"hash":${node.get("hash").asLong() ^ hDel},"hsum":"$hsum","centroids":${node.get("centroids").toString}}""")
    nDel + nDeltaDel
  }

  /** Physically remove tombstoned rows once they exceed
    * `maxTombstoneFraction` of the layout: ONLY the clusters that
    * contain a tombstoned row are rewritten (dynamic partition
    * overwrite), then the tombstone table is dropped. Probes are
    * correct through every crash window — an already-compacted
    * tombstone anti-joins to nothing. Returns true when a compaction
    * ran. */
  def compactLayout(
      spark: SparkSession,
      layout: Layout,
      maxTombstoneFraction: Double = 0.1,
      idCol: String = "vec_id"): Boolean = {
    val tombPath = s"${layout.dir}/$tombstoneDirName"
    if (!new java.io.File(tombPath).exists()) return false
    // fold pending streamed deltas into the base FIRST: the rewrite
    // below scans only base partitions (underscore-prefixed _delta_*
    // dirs are invisible to it), so dropping the tombstone table while
    // a tombstoned row's data file still lives in a delta dir would
    // RESURRECT that row on the next delta-aware probe. After the fold
    // every live row is base-resident and the final tombstone drop is
    // safe.
    compactDeltas(spark, layout, idCol = idCol)
    val tomb = spark.read.parquet(tombPath).select(col(idCol)).distinct()
    val data = spark.read.parquet(layout.dir)
    val nTomb = tomb.count()
    if (nTomb == 0L || nTomb.toDouble / math.max(data.count(), 1L) <= maxTombstoneFraction)
      return false
    val affectedClusters = data.join(broadcast(tomb), Seq(idCol), "left_semi")
      .select("cluster").distinct().collect().map(_.getInt(0))
    val survivors = data
      .filter(col("cluster").isin(affectedClusters.toIndexedSeq: _*))
      .join(broadcast(tomb), Seq(idCol), "left_anti")
      .localCheckpoint() // pin before the overwrite reads-under-write
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try survivors.write.mode("overwrite").partitionBy("cluster").parquet(layout.dir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    // tombstones drop LAST: a crash above re-runs compaction harmlessly
    val dirFile = new java.io.File(tombPath)
    dirFile.listFiles().foreach(_.delete())
    dirFile.delete()
    true
  }

  /** Anti-join the tombstone set (if any) — the small side broadcasts;
    * the layout scan itself is never reshuffled. */
  private def liveRows(
      spark: SparkSession,
      layout: Layout,
      df: DataFrame,
      idCol: String): DataFrame = {
    val tombPath = new java.io.File(layout.dir, tombstoneDirName)
    if (!tombPath.exists()) df
    else df.join(
      broadcast(spark.read.parquet(tombPath.toString).select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")
  }

  /** BATCH probe of a persisted layout — a query table served by ONE
    * partition-pruned scan: each query's probed clusters are ranked
    * driver-side (the query table is a batch, not a corpus — bounded
    * collect), the scan reads the UNION of everyone's clusters once
    * (`cluster IN` partition pruning), a broadcast pair-predicate
    * restricts each query's candidates to its OWN probed clusters, and
    * per-query top-k runs through the bounded TopKAggregator (map-side
    * partial: shuffle is |partitions|·|Q|·k, never |scan|·|Q|). At
    * scale this amortizes the probe IO across the batch — N separate
    * probes re-read every shared cluster N times; this reads each
    * exactly once. Returns (query_id, vec_id, dist, rank).
    *
    * DELTA-AWARE like the single-query probe: streamed `_delta_*` legs
    * join the scan pruned by the same union of probed clusters (they
    * share the cluster-partitioned disk layout), and the tombstone
    * anti-join applies to the whole union — a vector appended by the
    * last micro-batch is batch-probeable immediately. */
  def searchLayoutBatch(
      spark: SparkSession,
      layout: Layout,
      queries: DataFrame,
      k: Int,
      nprobe: Int,
      qIdCol: String = "query_id",
      qEmbCol: String = "q_embedding",
      idCol: String = "vec_id"): DataFrame = {
    import spark.implicits._
    val qRows = queries.select(col(qIdCol).cast("long"), col(qEmbCol)).collect()
    require(qRows.map(_.getLong(0)).distinct.length == qRows.length,
      "duplicate query ids in the batch")
    val probed: Seq[(Long, Seq[Float], Seq[Int])] = qRows.toIndexedSeq.map { r =>
      val emb = r.getSeq[Float](1)
      (r.getLong(0), emb, probeClustersOf(layout.centroids, emb.toArray, nprobe))
    }
    val union = probed.flatMap(_._3).distinct
    val basePruned = spark.read.parquet(layout.dir)
      .filter(col("cluster").isin(union: _*))
    val raw = deltaRows(spark, layout) match {
      case Some(d) =>
        basePruned.unionByName(d.filter(col("cluster").isin(union: _*))
          .select(basePruned.columns.map(col).toIndexedSeq: _*))
      case None => basePruned
    }
    val scan = liveRows(spark, layout, raw, idCol)
    val qDf = probed.toDF(qIdCol, qEmbCol, "q_clusters")
    graft.ops.VectorSearch.knnJoinAgg(qDf, scan, k,
      qIdCol = qIdCol, qEmbCol = qEmbCol, idCol = idCol,
      pairPredicate = Some(array_contains(col("q_clusters"), col("cluster"))))
  }

  /** Probe a persisted layout: centroid ranking driver-side, `cluster IN`
    * partition pruning, exact kernel within the probed inverted lists
    * (tombstoned rows excluded — see [[deleteFromLayout]]). */
  def searchLayout(
      spark: SparkSession,
      layout: Layout,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val clusters = probeClustersOf(layout.centroids, query, nprobe)
    VectorSearch.knnExact(
      liveRows(spark, layout,
        spark.read.parquet(layout.dir).filter(col("cluster").isin(clusters: _*)), idCol),
      query.toSeq, k, idCol, embCol)
  }

  /** Per-JVM coarse-quantizer graphs, keyed by (layout dir, centroid
    * content) — centroids are immutable per build, so a rebuilt layout
    * keys differently; bounded by wholesale clear. */
  private val coarseGraphs =
    new java.util.concurrent.ConcurrentHashMap[String, graft.index.Hnsw.SmallGraph]()

  /** Cluster probe via an HNSW graph over the CENTROIDS — the FAISS
    * `IVF*_HNSW` composition: [[probeClustersOf]]'s linear centroid
    * argmin is fine at nlist = 8, but a production coarse quantizer at
    * nlist ~10⁶ (the 100 TB setting: √n lists over 10¹² vectors) needs
    * sublinear centroid search, and this is exactly how FAISS does it.
    * The graph builds once per layout (driver-side, nlist nodes) and
    * caches; search is the deterministic beam walk with the same
    * (dist, index) tie-break as the exact argmin. With ef ≥ nlist the
    * walk visits every (connected) centroid, so the choice matches
    * [[probeClustersOf]] up to the float32 cast of the stored double
    * centroids — an argmin flip needs two centroids within float
    * epsilon of the query, which k-means separation rules out in
    * practice and the hash gate pins per dataset. */
  def probeClustersHnsw(
      layout: Layout,
      query: Array[Float],
      nprobe: Int,
      hp: graft.index.Hnsw.Params = graft.index.Hnsw.Params(m = 8, efConstruction = 64, parts = 1),
      efSearch: Int = 64): Seq[Int] = {
    val key = layout.dir + "#" +
      java.util.Arrays.deepHashCode(layout.centroids.asInstanceOf[Array[AnyRef]])
    var g = coarseGraphs.get(key)
    if (g == null) {
      g = graft.index.Hnsw.smallGraph(
        layout.centroids.zipWithIndex
          .map { case (c, i) => (i.toLong, c.map(_.toFloat)) }.toSeq, hp)
      if (coarseGraphs.size >= 64) coarseGraphs.clear()
      coarseGraphs.put(key, g)
    }
    g.searchKnn(query, nprobe, efSearch).map(_._2.toInt)
  }

  /** [[searchLayout]] with the HNSW coarse quantizer choosing the
    * probed clusters — the data scan is the identical partition-pruned
    * path. */
  def searchLayoutHnswCoarse(
      spark: SparkSession,
      layout: Layout,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val clusters = probeClustersHnsw(layout, query, nprobe)
    VectorSearch.knnExact(
      liveRows(spark, layout,
        spark.read.parquet(layout.dir).filter(col("cluster").isin(clusters: _*)), idCol),
      query.toSeq, k, idCol, embCol)
  }

  /** Hybrid (filtered) probe of a partitioned layout: the metadata
    * predicate rides the SAME scan as the cluster probe, so IO is
    * multiplicative — `nprobe/nlist` of the partitions (partition
    * pruning) × the predicate's row-group selectivity (parquet
    * `PushedFilters`). The reference has no filtered search at all; a
    * post-filter over [[searchLayout]]'s top-k would be WRONG (it
    * returns fewer than k survivors), so the filter must sit under the
    * top-k, where Catalyst pushes it into the scan. */
  def searchLayoutWhere(
      spark: SparkSession,
      layout: Layout,
      query: Array[Float],
      k: Int,
      nprobe: Int,
      predicate: Column,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val clusters = probeClustersOf(layout.centroids, query, nprobe)
    VectorSearch.knnExact(
      liveRows(spark, layout,
        spark.read.parquet(layout.dir)
          .filter(col("cluster").isin(clusters: _*) && predicate), idCol),
      query.toSeq, k, idCol, embCol)
  }
}
