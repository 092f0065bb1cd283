package graft.text

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** The THIRD production tokenizer family — BERT's WordPiece (Schuster &
  * Nakajima, ICASSP 2012; Wu et al. 2016 §3.2; the released BERT
  * `tokenization.py`), completing the matrix next to the BPE family
  * ([[Bpe]]/[[ByteLevel]]) and the SentencePiece unigram family
  * ([[Unigram]]). Two halves, as published:
  *
  *  - TRAINING is BPE-shaped — iteratively merge the best adjacent
  *    symbol pair over the distinct-word table — but scored by
  *    LIKELIHOOD GAIN rather than raw frequency: pick the pair
  *    maximizing `count(a,b) / (count(a) * count(b))` (the
  *    HuggingFace WordPiece trainer's published score; merging the
  *    pair maximizes the corpus unigram-LM likelihood increase).
  *    Continuation symbols carry the `##` prefix (BERT's
  *    `continuing_subword_prefix`), so `u + ##n → un` and
  *    `##u + ##n → ##un` — the marker belongs to the POSITION and is
  *    dropped from the right operand on merge.
  *  - INFERENCE is NOT merge replay: the released WordpieceTokenizer
  *    greedily takes the longest vocabulary piece at each position
  *    (longest-match-first), `##`-prefixing candidates at
  *    continuation positions; if some position matches nothing, the
  *    WHOLE word becomes `[UNK]` (the is_bad semantics). One codegen
  *    kernel per DISTINCT word
  *    ([[org.apache.spark.sql.graft.WordPieceExpr]]).
  *
  * Scale shape (the 100 TB discipline shared with the other two
  * families): training is ONE corpus-sized word count, then every
  * round is vocab-bounded (pair/single counts + a 1-row argmax +
  * one fold over the distinct-word table); apply is the word cache +
  * positional rejoin — greedy runs once per DISTINCT word, documents
  * join a broadcast (word → pieces) table; vocabulary size costs only
  * a hashed reference-object set, never per-token work. */
object WordPiece {

  val UnkToken = "[UNK]"
  val ContPrefix = "##"

  /** BERT's reserved specials, at the ids this engine's vocab
    * convention assigns (specials first, the released vocab.txt
    * discipline): `[PAD]`=0, `[UNK]`=1, `[CLS]`=2, `[SEP]`=3,
    * `[MASK]`=4; trained pieces follow from 5. */
  val Specials: Seq[String] = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")
  val PadId = 0
  val UnkId = 1
  val ClsId = 2
  val SepId = 3
  val MaskId = 4

  /** The released WordpieceTokenizer's max_input_chars_per_word: a
    * longer word is `[UNK]` outright (guards the O(n²) greedy probe
    * against pathological unbroken runs). */
  val MaxInputChars = 100

  /** WordPiece symbolization: first character plain, every
    * continuation character `##`-prefixed. */
  private def symbolize(word: Column): Column = {
    val chars = split(word, "")
    concat(
      slice(chars, lit(1), lit(1)),
      transform(slice(chars, lit(2), size(chars) - 1),
        c => concat(lit(ContPrefix), c)))
  }

  /** The shared round-0 word table: (syms, cnt), WordPiece-marked. */
  private[text] def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(symbolize(col("word")).as("syms"), col("cnt"))

  /** Merged output of pair (a, b): the `##` marker belongs to the
    * position, so the right operand's marker is dropped —
    * `u + ##n → un`, `##u + ##n → ##un`. */
  private[text] def mergedSym(a: String, b: String): String =
    a + (if (b.startsWith(ContPrefix)) b.substring(ContPrefix.length) else b)

  /** Greedy left-to-right single-merge fold — [[Bpe]]'s apply shape
    * with the WordPiece merged-symbol rule. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      slice(syms, lit(2), size(syms) - 1),
      array(element_at(syms, 1)),
      (acc, x) => when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(mergedSym(a, b)))))
        .otherwise(concat(acc, array(x))))

  /** Learn `numMerges` WordPiece merges, one per round (the
    * published trainer picks a single best pair per iteration — there
    * is no disjoint-batch amortization in the WordPiece literature,
    * and the likelihood score CHANGES after every merge, so batching
    * would alter semantics). Selection: maximize
    * `score = count(pair) / (count(lhs) * count(rhs))` over the
    * current word table's weighted adjacent-pair and symbol-occurrence
    * counts, ties broken by (lhs, rhs) — the determinism pin this
    * engine adds (the reference implementations leave ties to hash
    * order). All three counts are vocab-bounded aggregates; the score
    * is computed in float64 on BOTH engines (n, n_lhs·n_rhs each cast
    * to double first — at the 100 TB regime the Long product would
    * overflow), so the argmax ordering is bit-identical to the
    * oracle's replay.
    * Returns (merge_rank, lhs, rhs, pair_count, score). */
  def learnMerges(
      df: DataFrame,
      textCol: String = "text",
      numMerges: Int = 20): DataFrame = {
    val spark = df.sparkSession
    var words = wordTable(df, textCol).localCheckpoint()
    val merges = ArrayBuffer.empty[(Int, String, String, Long, Double)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val pairs = words
        .select(col("cnt"), explode(Bpe.adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
      val singles = words
        .select(col("cnt"), explode(col("syms")).as("s"))
        .groupBy("s").agg(sum(col("cnt")).as("ns"))
      val top = pairs
        .join(singles.select(col("s").as("a"), col("ns").as("na")), "a")
        .join(singles.select(col("s").as("b"), col("ns").as("nb")), "b")
        .select(col("a"), col("b"), col("n"),
          (col("n").cast("double") /
            (col("na").cast("double") * col("nb").cast("double"))).as("score"))
        .orderBy(col("score").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n, s) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2), top(0).getDouble(3))
        merges += ((r, a, b, n, s))
        words = words
          .select(applyMerge(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint()
        r += 1
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "lhs", "rhs", "pair_count", "score")
      .orderBy("merge_rank")
  }

  /** UTF-8 byte order (unsigned) — the order Spark's UTF8String
    * comparison AND DuckDB's VARCHAR collation use. Driver-side string
    * sorts must use THIS, not Scala's default UTF-16 `Ordering[String]`
    * (the two disagree above the BMP: surrogate pairs sort below
    * U+E000..U+FFFF in UTF-16, above in UTF-8). */
  private[text] val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(x: String, y: String): Int = {
      val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
  }

  /** The corpus ALPHABET — distinct round-0 symbols (first-position
    * characters plus their `##` continuations), sorted in UTF-8 byte
    * order (the oracle's collation). Vocab-bounded collect. */
  def alphabetOf(df: DataFrame, textCol: String = "text"): Seq[String] =
    wordTable(df, textCol)
      .select(explode(col("syms")).as("s")).distinct()
      .collect().map(_.getString(0)).sorted(utf8Order).toSeq

  /** The vocab.txt a trained WordPiece tokenizer ships, as
    * (piece, id): specials at 0–4 ([[Specials]]), the alphabet sorted
    * from 5, then merge outputs in rank order. An output an earlier
    * entry already produced keeps its first id (set-insertion
    * semantics — two merge chains can produce the same string). */
  def vocabWithIds(
      alphabet: Seq[String], merges: Seq[(String, String)]): Seq[(String, Int)] = {
    val out = ArrayBuffer.empty[String]
    val seen = scala.collection.mutable.Set.empty[String]
    (Specials ++ alphabet.sorted(utf8Order) ++
        merges.map { case (a, b) => mergedSym(a, b) })
      .foreach { p => if (!seen(p)) { out += p; seen += p } }
    out.toSeq.zipWithIndex
  }

  /** The greedy-matchable piece set: everything but the bracketed
    * specials (which the lowercased corpus can never contain — but
    * excluding them keeps the kernel's vocabulary exactly the
    * published subword inventory). */
  def matchPieces(vocabIds: Seq[(String, Int)]): Seq[String] =
    vocabIds.map(_._1).filterNot(Specials.contains)

  /** The matchable set for an EXTERNAL vocabulary: every
    * `[bracketed]` entry is control ([PAD], [unusedN], [UNK], …) and
    * never a greedy candidate — the released tokenizer's
    * never_split/special handling. */
  def matchPiecesExternal(vocabIds: Seq[(String, Int)]): Seq[String] =
    vocabIds.map(_._1)
      .filterNot(p => p.startsWith("[") && p.endsWith("]"))

  private def idOf(vocabIds: Seq[(String, Int)], piece: String): Int =
    vocabIds.collectFirst { case (p, i) if p == piece => i }
      .getOrElse(throw new IllegalArgumentException(
        s"vocabulary has no '$piece' entry"))

  /** Parse a released `vocab.txt` (BERT layout: one piece per line,
    * the LINE NUMBER is the id; blank trailing lines ignored). */
  def parseVocabTxt(lines: Iterator[String]): Seq[(String, Int)] = {
    val pieces = lines.map(_.stripLineEnd).filter(_.nonEmpty).toSeq
    require(pieces.nonEmpty, "empty vocab.txt")
    require(pieces.distinct.length == pieces.length,
      "duplicate piece in vocab.txt — ids would be ambiguous")
    pieces.zipWithIndex
  }

  /** Load a `vocab.txt` from disk — the bring-your-own-tokenizer
    * entry point (bert-base ships exactly this file). */
  def loadVocabTxt(path: String): Seq[(String, Int)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseVocabTxt(src.getLines()) finally src.close()
  }

  /** The shipped external vocab.txt fixture (bert-base layout:
    * [PAD], [unused0..9], [UNK]/[CLS]/[SEP]/[MASK] at 11–14, alphabet,
    * ranked merge outputs), generated deterministically by
    * `graft.tools.GenWpVocab` (a spec re-runs the generator and
    * byte-compares — reproducible provenance). */
  def externalFixtureVocab(): Seq[(String, Int)] = {
    val in = getClass.getResourceAsStream("/graft/wp/ext_vocab.txt")
    require(in != null, "fixture resource graft/wp/ext_vocab.txt not on classpath")
    try parseVocabTxt(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** The shared word cache: distinct words, each segmented ONCE. */
  private def wordCache(df: DataFrame, textCol: String)(
      seg: Column => Column): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .select(col("word"), seg(split(col("word"), "")).as("syms"))

  /** Tokenize to WordPiece SUBWORD STRINGS: greedy longest-match per
    * DISTINCT word (one kernel invocation), positional rejoin.
    * Output: (idCol, wp_tokens). */
  def tokenize(
      df: DataFrame,
      pieces: Seq[String],
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastVocab: Boolean = true): DataFrame = {
    val cache = wordCache(df, textCol)(chars =>
      VectorExpressions.wordPieceGreedy(
        chars, pieces, UnkToken, ContPrefix, MaxInputChars))
    Bpe.joinBackBySubwords(df, cache, idCol, textCol, broadcastVocab)
      .withColumnRenamed("bpe_tokens", "wp_tokens")
  }

  /** Tokenize to TOKEN IDS under the BERT conventions: greedy
    * segmentation AND the hashed piece→id probe both run inside the
    * word cache; `[UNK]` carries its own id; `addSpecials` frames each
    * document as `[CLS] … [SEP]` (the single-sequence encoding every
    * BERT-family model consumes). Output: (idCol, token_ids). */
  def tokenIds(
      df: DataFrame,
      vocabIds: Seq[(String, Int)],
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastVocab: Boolean = true,
      addSpecials: Boolean = true): DataFrame =
    tokenIdsWith(df, vocabIds, matchPieces(vocabIds),
      unkId = UnkId, clsId = ClsId, sepId = SepId,
      idCol, textCol, broadcastVocab, addSpecials)

  /** [[tokenIds]] with every convention taken from the VOCABULARY
    * rather than this engine's training constants — the entry point
    * for a released external `vocab.txt`, where `[UNK]`/`[CLS]`/
    * `[SEP]` sit at whatever line the file puts them (bert-base:
    * 100–102, after the `[unusedN]` block). */
  def tokenIdsExternal(
      df: DataFrame,
      vocabIds: Seq[(String, Int)],
      idCol: String = "doc_id",
      textCol: String = "text",
      broadcastVocab: Boolean = true,
      addSpecials: Boolean = true): DataFrame =
    tokenIdsWith(df, vocabIds, matchPiecesExternal(vocabIds),
      unkId = idOf(vocabIds, UnkToken),
      clsId = idOf(vocabIds, "[CLS]"), sepId = idOf(vocabIds, "[SEP]"),
      idCol, textCol, broadcastVocab, addSpecials)

  private def tokenIdsWith(
      df: DataFrame,
      vocabIds: Seq[(String, Int)],
      pieces: Seq[String],
      unkId: Int, clsId: Int, sepId: Int,
      idCol: String, textCol: String,
      broadcastVocab: Boolean, addSpecials: Boolean): DataFrame = {
    val cache = wordCache(df, textCol)(chars => transform(
      VectorExpressions.vocabIds(
        VectorExpressions.wordPieceGreedy(
          chars, pieces, UnkToken, ContPrefix, MaxInputChars),
        vocabIds),
      x => coalesce(x, lit(unkId))))
    val base = Bpe.joinBackBySubwords(df, cache, idCol, textCol, broadcastVocab)
      .withColumnRenamed("bpe_tokens", "token_ids")
    if (addSpecials)
      base.withColumn("token_ids",
        concat(array(lit(clsId)), col("token_ids"), array(lit(sepId))))
    else base
  }

  /** Decode token ids back to text ([[org.apache.spark.sql.graft.WordPieceDecodeExpr]]):
    * control ids ([PAD]/[CLS]/[SEP]/[MASK]) contribute nothing, `##`
    * pieces glue to the previous word, everything else (the `[UNK]`
    * literal included) starts a whitespace-separated word. Exactly
    * inverse to [[tokenIds]] wherever no `[UNK]` fired (spec-pinned);
    * an `[UNK]` is the honest lossy marker BERT decoding carries. */
  def decodeIds(ids: Column, vocabIds: Seq[(String, Int)]): Column =
    VectorExpressions.wordPieceDecode(ids, vocabIds, ContPrefix,
      Seq(PadId, ClsId, SepId, MaskId))

  private val mergeSidecar = "_wordpiece_merges.json"

  /** Persist the trained merge table AND the corpus alphabet behind
    * the shared fingerprint-sidecar protocol ([[graft.io.Artifact]]) —
    * corpus content hash + every training parameter; repeat
    * invocations read, never retrain. The alphabet rides along because
    * every apply-side caller needs [[vocabWithIds]], and recomputing
    * [[alphabetOf]] is a corpus-wide distinct-symbol scan per
    * invocation — exactly the repeated work the artifact exists to
    * absorb (measured ~1 s per query at sf0.1). */
  def ensureMergeArtifact(
      spark: SparkSession,
      df: DataFrame,
      dir: String,
      textCol: String = "text",
      numMerges: Int = 20): Unit = {
    val (nRows, dataHash, hashSum) =
      graft.io.Artifact.hashAgg(df, xxhash64(col(textCol)))
    graft.io.Artifact.ensure(dir, mergeSidecar,
      graft.io.Artifact.fingerprintJson(nRows, dataHash,
        "hsum" -> hashSum,
        "textCol" -> textCol, "numMerges" -> numMerges.toString,
        "family" -> "wordpiece", "fmt" -> "2")) {
      learnMerges(df, textCol, numMerges)
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/data")
      import spark.implicits._
      alphabetOf(df, textCol).toDF("sym")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/alphabet")
    }
  }

  /** The persisted merge artifact: (merge_rank, lhs, rhs, pair_count,
    * score), rank-ordered. */
  def mergesFromArtifact(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/data").orderBy("merge_rank")

  /** The artifact's merge pairs, rank-ordered (vocab-bounded read). */
  def loadMergePairs(spark: SparkSession, dir: String): Seq[(String, String)] =
    mergesFromArtifact(spark, dir)
      .select("merge_rank", "lhs", "rhs")
      .collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** The artifact's persisted alphabet, UTF-8-byte-sorted
    * (vocab-bounded read; identical to a live [[alphabetOf]] over the
    * training corpus — spec-pinned). */
  def alphabetFromArtifact(spark: SparkSession, dir: String): Seq[String] =
    spark.read.parquet(s"$dir/alphabet")
      .collect().map(_.getString(0)).sorted(utf8Order).toSeq

  /** The full trained (piece, id) vocabulary from the artifact alone —
    * the apply-side entry point: no corpus scan, two vocab-bounded
    * parquet reads. */
  def vocabFromArtifact(spark: SparkSession, dir: String): Seq[(String, Int)] =
    vocabWithIds(alphabetFromArtifact(spark, dir), loadMergePairs(spark, dir))
}
