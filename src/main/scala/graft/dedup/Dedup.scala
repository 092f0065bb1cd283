package graft.dedup

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, MinHashLSHModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.Ann
import graft.text.TextAnalysis._

/** Deduplication operators for LLM training-data pipelines.
  *
  * Five methods, each with a 100 TB-safe shape — every candidate-pair
  * generator is bucketed (hash groupBy, LSH band join, shared-shingle
  * join, LSH bucket join); nothing here is an all-pairs cartesian:
  *
  *  - exact:      md5/sha2 of normalized text, hash groupBy
  *  - MinHash:    word shingles → HashingTF → MinHashLSH banded join
  *  - SimHash:    64-bit signature, 4×16-bit band join, hamming filter
  *  - n-gram Jaccard: exact Jaccard restricted to pairs sharing a shingle
  *  - embedding:  cosine near-dup via the LSH bucket join in [[Ann]]
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Groups of byte-identical documents (after normalization): one row
    * per duplicated hash with its member count and ids. */
  def exactDupGroups(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    df.select(col(idCol), fingerprintMd5(col(textCol)).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_docs"), sort_array(collect_list(col(idCol))).as("ids"))
      .filter(col("n_docs") > 1)

  /** Exact dedup: keep the lowest-id representative of every hash group.
    * One shuffle on the 16-byte hash; skew-free (hashes are uniform). */
  def dedupExact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col(idCol).asc)
    df.withColumn("content_hash", fingerprintMd5(col(textCol)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "content_hash")
  }

  // -------------------------------------------------------------- MinHash

  /** Shingle → sparse-vector featurization shared by fit and query paths.
    * numFeatures fixes the MinHash universe; 2^18 keeps collision noise
    * below the Jaccard thresholds we filter at. */
  private def featurize(df: DataFrame, textCol: String, shingleN: Int, numFeatures: Int): DataFrame = {
    val withShingles = df.withColumn("shingles", wordShingles(col(textCol), shingleN))
    new HashingTF()
      .setInputCol("shingles").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
      .transform(withShingles)
      // MinHashLSH requires at least one non-zero entry per row
      .filter(size(col("shingles")) > 0)
  }

  /** Fit the MinHash index (the dedup analogue of O6 rebuild). */
  def fitMinHash(
      df: DataFrame,
      textCol: String = "text",
      shingleN: Int = 3,
      numHashTables: Int = 5,
      numFeatures: Int = 1 << 18): MinHashLSHModel =
    new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(numHashTables).setSeed(42L)
      .fit(featurize(df, textCol, shingleN, numFeatures))

  /** Near-duplicate pairs by MinHash LSH: banded bucket join, then exact
    * Jaccard-distance filter at `maxJaccardDist`. Returns (id_a, id_b,
    * jaccard_dist) with id_a < id_b. The join is on hash bands — at scale
    * the shuffle key is the band value, never an all-pairs product. */
  def minHashNearDups(
      df: DataFrame,
      maxJaccardDist: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleN: Int = 3,
      numHashTables: Int = 5): DataFrame = {
    val model = fitMinHash(df, textCol, shingleN, numHashTables)
    val feats = featurize(df, textCol, shingleN, 1 << 18)
    model.approxSimilarityJoin(feats, feats, maxJaccardDist, "jaccard_dist")
      .select(
        col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        col("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the whitespace tokens of normalized text: each
    * token hashed once (xxhash64), a ±1 vote per bit, sign → bit pack.
    * Narrow per-row compute, no shuffle. Written as a SQL expression
    * because Spark's Scala `shiftleft` only accepts a literal shift
    * amount, while the per-bit loop needs a column. */
  def simHashCol(textCol: String): Column = expr(
    s"""aggregate(
       |  transform(split(lower(regexp_replace(trim($textCol), '\\\\s+', ' ')), ' '), t -> xxhash64(t)),
       |  transform(sequence(0, 63), j -> 0L),
       |  (acc, h) -> zip_with(acc,
       |                       transform(sequence(0, 63),
       |                                 j -> IF((h & shiftleft(1L, j)) != 0, 1L, -1L)),
       |                       (a, b) -> a + b),
       |  acc -> aggregate(zip_with(acc, sequence(0, 63), (v, j) -> IF(v > 0, shiftleft(1L, j), 0L)),
       |                   0L, (s, b) -> s | b)
       |)""".stripMargin)

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** SimHash near-dup pairs: signatures are banded into 4×16-bit keys;
    * candidate pairs share at least one band (pigeonhole: any pair with
    * hamming ≤ 3 over 4 bands must agree on one band exactly), then the
    * exact hamming filter runs on candidates only. Shuffle key = band
    * value — bucketed, never all-pairs. */
  def simHashNearDups(
      df: DataFrame,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sigs = df.select(col(idCol), simHashCol(textCol).as("sig"))
    val banded = sigs.select(
      col(idCol), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), 16 * b).bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("bk"))
      .select(col(idCol), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("key"), col(idCol).as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact n-gram Jaccard similarity for every pair of documents sharing
    * at least one shingle. The shared-shingle join IS the candidate
    * pruning: shuffle key = shingle hash. At 100 TB, drop ultra-frequent
    * shingles first (`maxShingleDf`) so no hot key explodes the join —
    * the standard "stopword shingle" guard. */
  def ngramJaccardPairs(
      df: DataFrame,
      n: Int = 3,
      minJaccard: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxShingleDf: Long = 1000L): DataFrame = {
    val shingled = df
      .select(col(idCol), explode(wordShingles(col(textCol), n)).as("shingle"))
    val rare = shingled
      .groupBy("shingle").agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") <= maxShingleDf)
      .select("shingle")
    val pruned = shingled.join(rare, "shingle")
    val sizes = pruned.groupBy(col(idCol)).agg(count(lit(1)).as("set_size"))
    val a = pruned.select(col("shingle"), col(idCol).as("id_a"))
    val b = pruned.select(col("shingle"), col(idCol).as("id_b"))
    val inter = a.join(b, "shingle")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    val sizesA = sizes.select(col(idCol).as("id_a"), col("set_size").as("size_a"))
    val sizesB = sizes.select(col(idCol).as("id_b"), col("set_size").as("size_b"))
    inter
      .join(sizesA, "id_a")
      .join(sizesB, "id_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("size_a") + col("size_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  // ------------------------------------------------- embedding near-dups

  /** Embedding-cosine near-duplicates: for unit-norm embeddings,
    * cosine ≥ t  ⇔  L2² ≤ 2(1−t), so the L2 LSH bucket join in [[Ann]]
    * answers cosine near-dup directly. Returns (id_a, id_b, cos_sim). */
  def embeddingNearDups(
      df: DataFrame,
      minCosine: Double = 0.95,
      idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val l2Threshold = math.sqrt(2.0 * (1.0 - minCosine))
    val model = Ann.fit(df, embCol)
    Ann.similarityJoinApprox(model, df, df, l2Threshold, embCol)
      .select(
        col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        round(lit(1.0) - col("dist") * col("dist") / 2.0, 6).as("cos_sim"))
      .filter(col("id_a") < col("id_b"))
  }
}
