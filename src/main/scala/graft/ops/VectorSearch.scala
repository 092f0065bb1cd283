package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Distances

/** Spark-native k-NN search — the analogue of the reference's `search`
  * (`/root/reference/src/vectordb.cpp:120-156`).
  *
  * Exact path: distance column + `orderBy(dist, id).limit(k)`. Catalyst
  * plans this as `TakeOrderedAndProject`: each partition keeps a bounded
  * k-row heap, the driver merges ≤ k rows per partition — no global sort,
  * no full shuffle, scales linearly with corpus size at any cluster width.
  *
  * Semantics preserved from the reference (SURVEY §2.3): squared-L2
  * metric, nearest-first, k > n truncates to n, dimension mismatch is an
  * error (here: a validation helper), empty corpus → empty result. Ties
  * are broken by ascending id (the reference's tie order is incidental
  * heap order; we impose determinism — SURVEY §7.5 risk 2).
  */
object VectorSearch {

  /** Exact k-NN of a literal query vector against `corpus`.
    * Returns (idCol, dist) nearest-first, dist = squared L2 in float64. */
  def knnExact(
      corpus: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val q = lit(queryVec.toArray)
    corpus
      .select(col(idCol), Distances.l2Sq(col(embCol), q).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** RANGE (radius) search — the FAISS `range_search` shape: every
    * vector within squared-L2 ≤ `radiusSq` of the query,
    * nearest-first, (dist, id) ties. Unlike top-k there is no result
    * bound by construction — output scales with the radius's
    * selectivity, which IS the operator's contract (duplicate
    * detection, recall harvesting, epsilon-ball joins). 100 TB shape:
    * one narrow codegen scan (kernel + comparison, both
    * whole-stage-codegen) and the only exchange is the presentation
    * sort over the selectivity-bounded matches — the corpus itself is
    * never shuffled. */
  def rangeSearch(
      corpus: DataFrame,
      queryVec: Seq[Float],
      radiusSq: Double,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(radiusSq >= 0.0, s"radiusSq must be >= 0, got $radiusSq")
    val q = lit(queryVec.toArray)
    corpus
      .select(col(idCol), Distances.l2Sq(col(embCol), q).as("dist"))
      .filter(col("dist") <= lit(radiusSq))
      .orderBy(col("dist").asc, col(idCol).asc)
  }

  /** Exact k-NN where the query vector itself comes from a (1-row)
    * DataFrame — broadcast the query side, never the corpus. */
  def knnExactDf(
      corpus: DataFrame,
      query: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      qEmbCol: String = "qe"): DataFrame = {
    corpus
      .crossJoin(broadcast(query))
      .select(col(idCol), Distances.l2Sq(col(embCol), col(qEmbCol)).as("dist"))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** Batch k-NN similarity join: for every row of `queries`, the top-k
    * nearest rows of `corpus`. The small query side is broadcast
    * (broadcast nested-loop join — no shuffle of the corpus), then per-query
    * top-k via window `row_number`. At 100 TB the corpus streams through
    * once; per-query state is bounded by the window's sort within each
    * (queryId) group after a single shuffle of the (|Q| × k)-bounded
    * candidate set — to keep that shuffle small we pre-reduce per partition
    * is unnecessary because the shuffle input is |corpus|×|Q| rows only
    * conceptually; physically we project just (qid, id, dist). For large
    * |Q| use the LSH path in [[graft.index.Ann]].
    */
  def knnJoin(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      qIdCol: String = "query_id",
      qEmbCol: String = "q_embedding",
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val joined = corpus
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qEmbCol))))
      .select(
        col(qIdCol),
        col(idCol),
        Distances.l2Sq(col(embCol), col(qEmbCol)).as("dist"))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("dist").asc, col(idCol).asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy(col(qIdCol).asc, col("rank").asc)
  }

  /** Brute-force cosine top-k over an embedding column — baseline for the
    * ANN paths; same TakeOrderedAndProject shape as [[knnExact]]. */
  def cosineTopK(
      corpus: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val q = lit(queryVec.toArray)
    corpus
      .select(col(idCol), Distances.cosine(col(embCol), q).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** [[knnJoin]] via the bounded [[TopKAggregator]] instead of a window:
    * map-side partial aggregation caps the shuffle at
    * |partitions|×|Q|×k rows instead of |corpus|×|Q| — the form to use
    * when the corpus is large relative to the cluster. Output is
    * identical to [[knnJoin]] (equivalence is test-pinned). */
  def knnJoinAgg(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      qIdCol: String = "query_id",
      qEmbCol: String = "q_embedding",
      idCol: String = "vec_id",
      embCol: String = "embedding",
      pairPredicate: Option[Column] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // without a predicate only (qid, qemb) broadcast; with one, the
    // caller's extra query columns ride along for it to reference
    val qSide = if (pairPredicate.isEmpty) queries.select(col(qIdCol), col(qEmbCol)) else queries
    val paired = corpus.crossJoin(broadcast(qSide))
    val scored = pairPredicate.fold(paired)(paired.filter)
      .select(
        col(qIdCol).cast("long"),
        col(idCol).cast("long"),
        Distances.l2Sq(col(embCol), col(qEmbCol)).as("dist"))
      .as[(Long, Long, Double)]
    scored
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .flatMap { case (qid, arr) =>
        arr.iterator.zipWithIndex.map { case ((id, d), i) => (qid, id, d, i + 1) }
      }
      .toDF(qIdCol, idCol, "dist", "rank")
      .orderBy(col(qIdCol).asc, col("rank").asc)
  }

  /** Cosine top-k where the query vector comes from a (1-row) DataFrame —
    * broadcast the query side; same shape as [[knnExactDf]]. */
  def cosineTopKDf(
      corpus: DataFrame,
      query: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding",
      qEmbCol: String = "qe"): DataFrame =
    corpus
      .crossJoin(broadcast(query))
      .select(col(idCol), Distances.cosine(col(embCol), col(qEmbCol)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .limit(k)

  /** k-NN majority-vote classification over a labeled corpus: the
    * classic label-propagation read path a vector store serves (tag
    * suggestion, weak labeling of new embeddings from an annotated
    * seed set). Neighbors come from [[knnJoinAgg]] — the bounded
    * TopKAggregator shape whose shuffle is capped at |parts|×|Q|×k —
    * and the k×|Q|-row neighbor table (tiny by construction) BROADCASTS
    * back onto the corpus to pick up labels, so the full corpus is
    * never shuffled. Vote tie-break is deterministic: highest count,
    * then smallest label. Output: (query_id, pred_label, votes,
    * n_neighbors). */
  def knnClassify(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      qIdCol: String = "query_id",
      qEmbCol: String = "q_embedding",
      idCol: String = "vec_id",
      embCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val nn = knnJoinAgg(queries, corpus.select(col(idCol), col(embCol)), k,
      qIdCol, qEmbCol, idCol, embCol)
    val labeled = corpus.select(col(idCol).cast("long").as(idCol), col(labelCol))
      .join(broadcast(nn.select(col(qIdCol), col(idCol))), Seq(idCol))
    val votes = labeled.groupBy(col(qIdCol), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("votes").desc, col(labelCol).asc)
    votes
      .withColumn("rn", row_number().over(w))
      .withColumn("n_neighbors",
        sum(col("votes")).over(Window.partitionBy(col(qIdCol))))
      .filter(col("rn") === 1)
      .select(col(qIdCol), col(labelCol).as("pred_label"),
        col("votes"), col("n_neighbors"))
  }

  /** Hard-negative mining for contrastive/metric training (the
    * in-batch-negatives upgrade every embedding-training pipeline
    * eventually needs — e.g. Xiong et al., "Approximate Nearest
    * Neighbor Negative Contrastive Learning", ICLR 2021): for every
    * anchor query, the k NEAREST corpus rows carrying a DIFFERENT
    * label — near-misses that teach the boundary, not random noise.
    * The label predicate sits UNDER the bounded top-k aggregation (a
    * post-filter over an unconstrained top-k would return fewer than k
    * negatives whenever same-label rows crowd the front), and the
    * shuffle stays capped at |parts|×|Q|×k by the TopKAggregator. */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      qIdCol: String = "query_id",
      qEmbCol: String = "q_embedding",
      qLabelCol: String = "q_label",
      idCol: String = "vec_id",
      embCol: String = "embedding",
      labelCol: String = "label"): DataFrame =
    knnJoinAgg(
      queries.select(col(qIdCol), col(qEmbCol), col(qLabelCol)),
      corpus, k, qIdCol, qEmbCol, idCol, embCol,
      pairPredicate = Some(col(labelCol) =!= col(qLabelCol)))

  /** Dimension-check validation (the reference enforces dim at every
    * mutation/query — `/root/reference/src/vectordb.cpp:39-41,124-126`).
    * Spark array types don't encode length, so this is an explicit
    * operator: rows whose embedding size ≠ `dim`. */
  def dimViolations(df: DataFrame, dim: Int, embCol: String = "embedding"): DataFrame =
    df.filter(size(col(embCol)) =!= dim)

  /** Hybrid sparse+dense retrieval with reciprocal-rank fusion
    * (Cormack et al. SIGIR'09 RRF; the standard RAG first-stage):
    * BM25 selects `kCandidates` keyword candidates, their embeddings
    * are cosine-ranked against the query vector, and the two rankings
    * fuse as Σ 1/(rrfK + rank) — quantized to micro-units so the
    * fused score is integer-exact on both engines.
    *
    * 100 TB shape: BM25 candidate generation is the corpus-scale part
    * and keeps `bm25TopDocs`'s shape (term-filtered occurrences,
    * broadcast stats, TakeOrdered). Everything after operates on the
    * ≤kCandidates-row set: the candidate ids broadcast INTO the
    * embedding scan (map-side semi join — the corpus embedding table
    * is never shuffled), and the two row_number windows run over the
    * bounded candidate set only. The query embedding rides a 1-row
    * broadcast. */
  def hybridRrfRetrieve(
      docs: DataFrame,
      emb: DataFrame,
      terms: Seq[String],
      queryVecId: Long = 0L,
      kCandidates: Int = 50,
      k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    val bm = graft.text.TextAnalysis.bm25TopDocs(docs, terms, topN = kCandidates)
    val wBm = Window.orderBy(col("bm25_micro").desc, col("doc_id").asc)
    val bmRanked = bm
      .withColumn("r_bm25", row_number().over(wBm).cast("long"))
      .select(col("doc_id"), col("r_bm25"))
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("qe"))
    val cand = emb
      .join(broadcast(bmRanked), emb("vec_id") === bmRanked("doc_id"))
      .crossJoin(broadcast(q))
      .select(col("doc_id"), col("r_bm25"),
        Distances.cosine(col("embedding"), col("qe")).as("cos_sim"))
    val wCos = Window.orderBy(col("cos_sim").desc, col("doc_id").asc)
    cand
      .withColumn("r_cos", row_number().over(wCos).cast("long"))
      .withColumn("rrf_micro",
        (floor(lit(1e6) / (lit(rrfK.toLong) + col("r_bm25"))) +
          floor(lit(1e6) / (lit(rrfK.toLong) + col("r_cos")))).cast("long"))
      .select(col("doc_id"), col("r_bm25"), col("r_cos"), col("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Two-stage retrieval by DIMENSIONAL TRUNCATION (the Matryoshka
    * shape — Kusupati et al., NeurIPS 2022: nested representations
    * where a PREFIX of the embedding is itself a usable embedding):
    * stage 1 ranks by exact L2 over only the first `prefixDim`
    * coordinates, stage 2 rescores the `shortlist` survivors at full
    * dimension. The ladder's cheapest float stage — a d/prefixDim
    * scan-cost cut with NO codebook, threshold, or training artifact.
    *
    * At 100 TB the prefix lives as its own (narrow) column or table —
    * a parquet scan of prefixDim floats per row, pruning the wide
    * column entirely; the rescore touches `shortlist` rows via the
    * pushed id filter, exactly the [[graft.index.Binary]] two-stage
    * shape. The shortlist id set is bounded (≤ `shortlist`) so the
    * driver hop is O(shortlist), never corpus-sized. */
  def knnPrefixRescore(
      corpus: DataFrame,
      queryVec: Seq[Float],
      prefixDim: Int,
      k: Int,
      shortlist: Int,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(prefixDim > 0 && prefixDim <= queryVec.length,
      s"prefixDim $prefixDim out of range for dim ${queryVec.length}")
    val qPrefix = lit(queryVec.take(prefixDim).toArray)
    val ids = corpus
      .select(col(idCol),
        Distances.l2Sq(slice(col(embCol), 1, prefixDim), qPrefix).as("pdist"))
      .orderBy(col("pdist").asc, col(idCol).asc)
      .limit(shortlist)
      .collect().map(_.getLong(0))
    knnExact(corpus.filter(col(idCol).isin(ids.toIndexedSeq: _*)),
      queryVec, k, idCol, embCol)
  }

  /** MAXIMAL MARGINAL RELEVANCE diversified top-k (Carbonell & Goldstein
    * SIGIR'98) — the RAG-retrieval de-redundancy step: greedily pick the
    * candidate maximizing `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`, so
    * each pick trades query relevance against similarity to what is
    * ALREADY selected (near-duplicate passages stop crowding out
    * coverage). Two stages with the two right cost shapes: the
    * corpus-sized work — cosine relevance + shortlist cut — is the
    * distributed TakeOrderedAndProject every kNN query uses; the greedy
    * loop is inherently sequential and runs on the driver over the
    * BOUNDED shortlist (O(shortlist·k) float64 ops on ≤`shortlist`
    * collected rows — the [[graft.index.AnnSelector]] discipline), so
    * nothing corpus-sized ever reaches the driver. The first pick's
    * max-sim term is 0 (empty selection); ties break to the smaller id.
    * All float64 arithmetic is left-associative and mirrored exactly by
    * the unrolled relational oracle layers. */
  def knnMmr(
      corpus: DataFrame,
      queryVec: Seq[Float],
      k: Int,
      shortlist: Int,
      relWeight: Double = 0.7,
      divWeight: Double = 0.3,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    require(k >= 1 && shortlist >= k, s"need shortlist >= k >= 1, got $k/$shortlist")
    // BOTH weights are explicit literals rather than λ / 1−λ: a SQL
    // oracle folds (1.0 - 0.7) in exact decimal to 0.3 while float64
    // gives 0.30000000000000004 — the two must quote the same literal
    require(relWeight >= 0.0 && divWeight >= 0.0,
      s"weights must be non-negative, got $relWeight/$divWeight")
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = lit(queryVec.toArray)
    // a zero-norm embedding (or query) has no defined cosine: under
    // ANSI it's a DIVIDE_BY_ZERO crash, under non-ANSI a NaN that
    // sorts GREATEST in the DESC ordering, enters the shortlist, and
    // poisons every greedy comparison (score > best is false for NaN
    // — bestIdx stays -1 and the loop crashes). Guard the division
    // and drop the undefined rows up front; same arithmetic as
    // Distances.cosine wherever the denominator is nonzero.
    val denom = Distances.norm(col(embCol)) * Distances.norm(q)
    val cand = corpus
      .select(col(idCol).cast("long"), col(embCol),
        when(denom =!= lit(0.0), Distances.dot(col(embCol), q) / denom).as("rel"))
      .filter(col("rel").isNotNull && !isnan(col("rel")))
      .orderBy(col("rel").desc, col(idCol).asc)
      .limit(shortlist)
      .collect()
    val ids = cand.map(_.getLong(0))
    val embs = cand.map(_.getSeq[Float](1).toArray)
    val rel = cand.map(_.getDouble(2))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val norms = embs.map(e => math.sqrt(dot(e, e)))
    def sim(i: Int, j: Int): Double = dot(embs(i), embs(j)) / (norms(i) * norms(j))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    val inSel = new Array[Boolean](cand.length)
    while (selected.length < math.min(k, cand.length)) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < cand.length) {
        if (!inSel(c)) {
          // TRUE max over the selected set (cosine can be negative);
          // empty selection (the first pick) contributes 0
          var ms = if (selected.isEmpty) 0.0 else Double.NegativeInfinity
          selected.foreach { case (s, _) =>
            val v = sim(c, s); if (v > ms) ms = v
          }
          val score = relWeight * rel(c) - divWeight * ms
          if (score > bestScore || (score == bestScore && bestIdx >= 0 && ids(c) < ids(bestIdx))) {
            bestIdx = c; bestScore = score
          }
        }
        c += 1
      }
      require(bestIdx >= 0,
        "knnMmr: no selectable candidate (all scores non-comparable) — " +
          "the shortlist filter should have made this impossible")
      inSel(bestIdx) = true
      selected += ((bestIdx, bestScore))
    }
    selected.toSeq.zipWithIndex
      .map { case ((c, score), r) => (r + 1, ids(c), rel(c), score) }
      .toDF("rank", idCol, "rel", "mmr_score")
  }
}
