package graft.index

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ops.VectorSearch

/** Product quantization (PQ) — the memory-side scale path for ANN
  * (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011; the compression scheme behind FAISS's IVF-PQ).
  *
  * The embedding is split into `m` subvectors; each subspace gets its own
  * `k`-centroid codebook (Lloyd's iterations on a driver-side sample — the
  * codebooks are m×k×(dim/m) floats, tiny), and a vector is stored as `m`
  * one-byte codes: 64 float32 dims (256 B) become 8 bytes, a 32×
  * compression that decides whether a 100 TB corpus's codes fit in
  * cluster memory. Search uses asymmetric distance computation (ADC): one
  * m×k lookup table per query, then a distance is `m` table lookups —
  * evaluated by a codegen expression, no per-row decode.
  *
  * Encoding is a build step (like the quantizer fit itself) and runs as
  * `mapPartitions` with the broadcast codebooks; queries stay in
  * whole-stage codegen via [[org.apache.spark.sql.graft.VectorExpressions.pqAdc]].
  */
object Pq {

  /** m subspace codebooks: centroids(s)(c) is the c-th centroid of
    * subspace s, each of length dim/m. */
  final case class Codebooks(m: Int, k: Int, dim: Int, centroids: Array[Array[Array[Float]]])

  /** Fit per-subspace codebooks with Lloyd's iterations over a sampled,
    * driver-collected slice of the corpus (PQ codebooks converge on small
    * samples; the sample bound caps driver memory). */
  def fit(
      df: DataFrame,
      m: Int = 8,
      k: Int = 256,
      embCol: String = "embedding",
      maxSample: Int = 1 << 16,
      iters: Int = 10,
      seed: Long = 42L): Codebooks = {
    require(k >= 1 && k <= 256, s"k must be in [1, 256] (codes are one byte), got $k")
    val dim = df.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    // a seeded random sample, not limit(): the first N physical rows of a
    // clustered/replicated corpus would give degenerate codebooks
    val n = df.count()
    val fraction = math.min(1.0, maxSample * 1.2 / math.max(1L, n))
    val sample = df.select(col(embCol))
      .sample(withReplacement = false, fraction, seed)
      .limit(maxSample)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "cannot fit PQ on an empty corpus")
    val rnd = new scala.util.Random(seed)
    val centroids = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      lloyd(sub, math.min(k, sub.length), iters, rnd)
    }
    Codebooks(m, k, dim, centroids)
  }

  /** Plain Lloyd's iterations with random-point init; deterministic for a
    * seeded Random. Empty clusters keep their previous centroid. */
  private def lloyd(points: Array[Array[Float]], k: Int, iters: Int,
      rnd: scala.util.Random): Array[Array[Float]] = {
    val d = points(0).length
    val centroids = Array.tabulate(k)(i => points(rnd.nextInt(points.length)).clone())
    val sums = Array.ofDim[Double](k, d)
    val counts = new Array[Long](k)
    var it = 0
    while (it < iters) {
      java.util.Arrays.fill(counts, 0L)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      points.foreach { p =>
        val c = nearest(centroids, p)
        counts(c) += 1
        var j = 0
        while (j < d) { sums(c)(j) += p(j); j += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < d) { centroids(c)(j) = (sums(c)(j) / counts(c)).toFloat; j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  private def nearest(centroids: Array[Array[Float]], p: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var s = 0.0
      var j = 0
      val cen = centroids(c)
      while (j < p.length) { val diff = cen(j) - p(j); s += diff * diff; j += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  private def encodeOne(books: Codebooks, v: Array[Float]): Array[Byte] = {
    val dsub = books.dim / books.m
    val codes = new Array[Byte](books.m)
    var s = 0
    while (s < books.m) {
      val sub = java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub)
      codes(s) = nearest(books.centroids(s), sub).toByte
      s += 1
    }
    codes
  }

  /** Encode every row to `m` one-byte codes (build step; broadcast
    * codebooks, per-partition amortized). Output: (idCol, codes binary). */
  def encode(
      df: DataFrame,
      cb: Codebooks,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    val ds: Dataset[(Long, Array[Float])] =
      df.select(col(idCol).cast("long"), col(embCol)).as[(Long, Array[Float])]
    ds.mapPartitions { it =>
      val books = bc.value
      it.map { case (id, v) => (id, encodeOne(books, v)) }
    }.toDF(idCol, "codes")
  }

  /** ADC lookup table for one query: table(s*k + c) = squared L2 between
    * the query's s-th subvector and centroid c of subspace s. */
  def adcTable(cb: Codebooks, query: Array[Float]): Array[Double] = {
    require(query.length == cb.dim, s"query dim ${query.length} != ${cb.dim}")
    adcTableFlat(flatCentroids(cb), cb.m, cb.k, query)
  }

  /** The codebooks flattened subspace-major — centroid j of code c of
    * subspace s at `flat((s*k + c)*dsub + j)` — the literal-array form
    * the SQL route ships into a `pq_adc(...)` statement. */
  def flatCentroids(cb: Codebooks): Array[Float] = {
    val dsub = cb.dim / cb.m
    val flat = new Array[Float](cb.m * cb.k * dsub)
    var s = 0
    while (s < cb.m) {
      var c = 0
      while (c < cb.centroids(s).length) {
        System.arraycopy(cb.centroids(s)(c), 0, flat, (s * cb.k + c) * dsub, dsub)
        c += 1
      }
      s += 1
    }
    flat
  }

  /** The ADC table from a FLATTENED codebook — the ONE float arithmetic
    * core shared by the API path ([[adcTable]]) and the SQL route's
    * plan-time builder (`pq_adc`, GraftFunctions), so both paths are
    * bit-identical by construction: float subtract, float square,
    * float64 accumulate, exactly the per-centroid order of the original
    * loop. */
  def adcTableFlat(flat: Array[Float], m: Int, k: Int, query: Array[Float]): Array[Double] = {
    val dsub = query.length / m
    require(dsub * m == query.length,
      s"pq_adc: query dim ${query.length} is not a multiple of m=$m")
    require(flat.length == m * k * dsub,
      s"pq_adc: flat codebook length ${flat.length} != m*k*dsub = ${m * k * dsub}")
    val table = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        var sum = 0.0
        var j = 0
        val off = (s * k + c) * dsub
        while (j < dsub) { val d = flat(off + j) - query(s * dsub + j); sum += d * d; j += 1 }
        table(s * k + c) = sum
        c += 1
      }
      s += 1
    }
    table
  }

  /** Approximate top-k by ADC over the encoded corpus: the per-row cost
    * is m byte-indexed lookups in a broadcast table (codegen expression),
    * and the plan is the same bounded TakeOrderedAndProject as exact
    * search — over 8-byte codes instead of 256-byte vectors. */
  def search(
      encoded: DataFrame,
      cb: Codebooks,
      query: Array[Float],
      k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val table = adcTable(cb, query)
    encoded
      .select(col(idCol),
        org.apache.spark.sql.graft.VectorExpressions.pqAdc(col("codes"), table, cb.k).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-PQ: the FAISS-style composition of both index structures. The
    * codes are written partitioned by the IVF cluster id, so a probe
    * prunes to nprobe/nlist of the (already 32×-compressed) codes before
    * the ADC scan — IO shrinks multiplicatively. Returns the PQ-ranked
    * shortlist; follow with [[searchRerank]]'s exact pass via
    * `rerankShortlist`. */
  def writeIvfPqCodes(
      ivf: Ivf.Index,
      cb: Codebooks,
      df: DataFrame,
      dir: String,
      idCol: String = "vec_id",
      embCol: String = "embedding"): Unit = {
    // carry the cluster through the encode pass: re-joining it by id
    // would run the assignment pipeline twice plus a full shuffle
    val assigned = Ivf.assign(ivf, df, embCol)
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    assigned.select(col(idCol).cast("long"), col(embCol), col("cluster"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        val books = bc.value
        it.map { case (id, v, cluster) => (id, encodeOne(books, v), cluster) }
      }
      .toDF(idCol, "codes", "cluster")
      .write.mode("overwrite").partitionBy("cluster").parquet(dir)
  }

  def searchIvfPq(
      spark: org.apache.spark.sql.SparkSession,
      layoutDir: String,
      ivf: Ivf.Index,
      cb: Codebooks,
      query: Array[Float],
      shortlist: Int,
      nprobe: Int,
      idCol: String = "vec_id"): DataFrame = {
    val clusters = Ivf.probeClusters(ivf, query, nprobe)
    val codes = spark.read.parquet(layoutDir)
      .filter(col("cluster").isin(clusters: _*))
    search(codes, cb, query, shortlist, idCol)
  }

  /** Exact re-rank of any candidate id set against the full-precision
    * corpus (broadcast-join by id, then the exact kernel). */
  def rerankShortlist(
      candidates: DataFrame,
      corpus: DataFrame,
      query: Array[Float],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    VectorSearch.knnExact(
      corpus.join(broadcast(candidates.select(col(idCol))), idCol),
      query.toSeq, k, idCol, embCol)

  // ------------------------------------------------------------- OPQ

  /** An orthogonal rotation learned to minimize PQ quantization error
    * (Ge, He, Ke & Sun, "Optimized Product Quantization", CVPR 2013 /
    * TPAMI 2014 — the OPQ_NP alternating solver), plus the codebooks fit
    * in the rotated space. `rotation` is row-major d×d: y = R·x. Because
    * R is orthogonal, ‖Rx − Rq‖ = ‖x − q‖ — rotating both corpus (at
    * encode time) and query (at table-build time) leaves true distances
    * untouched while re-balancing variance across the m subspaces, which
    * is exactly what lifts ADC recall on clustered/correlated embeddings
    * at UNCHANGED code size and probe cost. */
  final case class OpqModel(rotation: Array[Array[Float]], cb: Codebooks)

  private[index] def rotateOne(r: Array[Array[Float]], v: Array[Float]): Array[Float] = {
    val d = r.length
    val out = new Array[Float](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      val row = r(i)
      var j = 0
      while (j < d) { s += row(j) * v(j); j += 1 }
      out(i) = s.toFloat
      i += 1
    }
    out
  }

  /** Fit OPQ by alternating minimization on a seeded driver-side sample
    * (same sampling contract as [[fit]]): hold R, fit per-subspace
    * codebooks on the rotated sample; hold the codebooks, solve the
    * orthogonal Procrustes problem min_R ‖XRᵀ − X̂‖_F via one SVD of the
    * d×d cross-covariance (Breeze — on Spark's classpath). Initialized
    * with a seeded random rotation (QR of a Gaussian matrix), as the
    * identity is a stationary point when the data axes are already
    * subspace-aligned. Everything is O(sample·d²) driver work; the model
    * is d² floats + the codebooks — broadcastable like [[Codebooks]]. */
  def fitOpq(
      df: DataFrame,
      m: Int = 8,
      k: Int = 256,
      embCol: String = "embedding",
      maxSample: Int = 1 << 16,
      iters: Int = 10,
      opqIters: Int = 8,
      seed: Long = 42L): OpqModel = {
    import breeze.linalg.{qr, svd, DenseMatrix}
    require(k >= 1 && k <= 256, s"k must be in [1, 256] (codes are one byte), got $k")
    val dim = df.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val n = df.count()
    val fraction = math.min(1.0, maxSample * 1.2 / math.max(1L, n))
    val sample = df.select(col(embCol))
      .sample(withReplacement = false, fraction, seed)
      .limit(maxSample)
      .collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "cannot fit OPQ on an empty corpus")
    val rnd = new scala.util.Random(seed)
    // seeded random orthogonal init (QR of Gaussian)
    val g = DenseMatrix.tabulate(dim, dim)((_, _) => rnd.nextGaussian())
    var rot: DenseMatrix[Double] = qr(g).q
    var books: Codebooks = null
    var it = 0
    while (it < opqIters) {
      // rotate the sample: y = R x
      val rotated = sample.map { v =>
        val y = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          var s = 0.0
          var j = 0
          while (j < dim) { s += rot(i, j) * v(j); j += 1 }
          y(i) = s.toFloat
          i += 1
        }
        y
      }
      // codebook step: per-subspace Lloyd on the rotated sample
      val dsub = dim / m
      val lloydRnd = new scala.util.Random(seed + it)
      val centroids = Array.tabulate(m) { s =>
        val sub = rotated.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
        lloyd(sub, math.min(k, sub.length), iters, lloydRnd)
      }
      books = Codebooks(m, k, dim, centroids)
      // rotation step: X̂ = decode(encode(Y)); R = U Vᵀ of svd(X̂ Xᵀ)
      // (solves min_R ‖R X − X̂‖_F over orthogonal R, columns = vectors:
      // maximize tr(R·X·X̂ᵀ) → R = U Vᵀ for U Σ Vᵀ = X̂ Xᵀ)
      if (it < opqIters - 1) {
        val cross = DenseMatrix.zeros[Double](dim, dim)
        var si = 0
        while (si < sample.length) {
          val y = rotated(si)
          val codes = encodeOne(books, y)
          // reconstruction of y from its codes
          val rec = new Array[Double](dim)
          var s = 0
          while (s < m) {
            val cen = books.centroids(s)(codes(s) & 0xFF)
            var j = 0
            while (j < dsub) { rec(s * dsub + j) = cen(j); j += 1 }
            s += 1
          }
          val x = sample(si)
          var i = 0
          while (i < dim) {
            var j = 0
            while (j < dim) { cross(i, j) += rec(i) * x(j); j += 1 }
            i += 1
          }
          si += 1
        }
        val decomp = svd(cross)
        rot = decomp.U * decomp.Vt
      }
      it += 1
    }
    val rotF = Array.tabulate(dim, dim)((i, j) => rot(i, j).toFloat)
    OpqModel(rotF, books)
  }

  /** Encode every row in the rotated space — same broadcast-codebook
    * `mapPartitions` shape and output schema as [[encode]]. */
  def encodeOpq(
      df: DataFrame,
      model: OpqModel,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val ds: Dataset[(Long, Array[Float])] =
      df.select(col(idCol).cast("long"), col(embCol)).as[(Long, Array[Float])]
    ds.mapPartitions { it =>
      val mdl = bc.value
      it.map { case (id, v) => (id, encodeOne(mdl.cb, rotateOne(mdl.rotation, v))) }
    }.toDF(idCol, "codes")
  }

  /** The model's learned rotation applied to one query vector — the
    * driver-side step a SQL-route caller runs before shipping the
    * rotated query literal into a `pq_adc(...)` statement (the API
    * path's [[searchOpq]] does exactly this). */
  def rotateQuery(model: OpqModel, query: Array[Float]): Array[Float] =
    rotateOne(model.rotation, query)

  /** ADC top-k over OPQ codes: rotate the query, then the identical
    * codegen table-lookup scan as [[search]] — same cost, higher recall. */
  def searchOpq(
      encoded: DataFrame,
      model: OpqModel,
      query: Array[Float],
      k: Int,
      idCol: String = "vec_id"): DataFrame =
    search(encoded, model.cb, rotateOne(model.rotation, query), k, idCol)

  /** Exact re-ranking of a PQ candidate set: fetch the true vectors for
    * the shortlist only (broadcast-join by id) and re-score with the
    * exact kernel — the standard PQ + re-rank pipeline. */
  def searchRerank(
      encoded: DataFrame,
      corpus: DataFrame,
      cb: Codebooks,
      query: Array[Float],
      k: Int,
      shortlist: Int = 100,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame =
    rerankShortlist(search(encoded, cb, query, shortlist, idCol),
      corpus, query, k, idCol, embCol)
}
