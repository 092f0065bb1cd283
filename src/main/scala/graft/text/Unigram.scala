package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** Unigram-LM tokenizer training + Viterbi segmentation (Kudo ACL'18,
  * arXiv:1804.10959 — the SentencePiece model family; the OTHER
  * production tokenizer besides BPE). A vocabulary of PIECES carries
  * probabilities; a word tokenizes to its maximum-likelihood
  * segmentation (Viterbi over the piece lattice). Training here is the
  * deterministic hard-EM (Viterbi-EM) variant of Kudo's lattice EM:
  *
  *  - SEED: all substrings of length 1..`maxPieceLen` of the weighted
  *    distinct-word table, counted per occurrence; every single
  *    character is kept (coverage), plus the top `topMulti` multi-char
  *    substrings by (count desc, piece asc).
  *  - EM ROUND: counts → quantized integer costs
  *    (−floor(10⁶·ln(count/total)) — integers so the Viterbi DP is
  *    exact arithmetic end-to-end and the SQL oracle replays it with
  *    no float drift inside the DP); Viterbi-segment every distinct
  *    word under those costs ([[org.apache.spark.sql.graft.UnigramViterbiExpr]]);
  *    new counts = weighted piece occurrences over the segmentations.
  *    Pieces that stop being used fall out of the vocabulary (the
  *    pruning that concentrates mass on useful pieces); segmentation
  *    stays total through the single-char `unkCost` fallback.
  *
  * Work shape at 100 TB: ONE corpus-sized aggregation builds the
  * weighted distinct-word table; every EM round and the final
  * tokenize are vocab-bounded (the word table is orders of magnitude
  * smaller than the corpus, the piece table is driver-bounded by
  * construction, and the Viterbi kernel runs once per DISTINCT word
  * with the costs as a task-broadcast hash map). Documents re-
  * assemble through the shared positional join
  * ([[Bpe.joinBackBySubwords]]) — the identical scaling discipline as
  * the BPE family.
  */
object Unigram {

  /** Quantized-cost fallback for a single character absent from the
    * vocabulary: large enough that any in-vocabulary split is
    * preferred, small enough that sums never approach overflow. */
  val UnkCost = 100000000L

  /** SentencePiece's word-boundary marker U+2581 (LOWER ONE EIGHTH
    * BLOCK): with `marker = true` every word enters training and
    * segmentation prefixed with it, so the flattened token stream
    * retains word boundaries and decode can restore spacing — the
    * upstream `add_dummy_prefix`/whitespace-escape convention every
    * shipped SentencePiece model uses. */
  val SpMarker = "\u2581"

  /** Cost quantization: −floor(10⁶ · ln(count/total)) as a Long (floor,
    * not round: `floor` has one definition everywhere, while
    * round-half tie rules differ between Java and SQL engines). The
    * one transcendental evaluation per PIECE (vocab-sized, not
    * corpus-sized); identical formula in the SQL oracle. */
  def costsFrom(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val total = counts.map(_._2).sum.toDouble
    counts.map { case (p, c) =>
      (p, (-Math.floor(1e6 * Math.log(c.toDouble / total))).toLong)
    }
  }

  /** The weighted distinct-word table (word, cnt) — the one
    * corpus-sized aggregation, shared with the BPE trainer's shape. */
  private def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Prefix the word table with [[SpMarker]] when `marker` is on —
    * applied AFTER the corpus-sized aggregation, so marking costs one
    * narrow map over the vocab-sized word table. */
  private def markWords(words: DataFrame, marker: Boolean): DataFrame =
    if (marker) words.withColumn("word", concat(lit(SpMarker), col("word")))
    else words

  /** Seed vocabulary: substring occurrence counts over the word table.
    * Single chars up to `coveragePermyriad`/10000 of character mass
    * (at the default 10000 the whole corpus alphabet) + the top
    * `topMulti` multi-char substrings by (count desc, piece asc).
    * Bounded driver artifact by construction. */
  def seedVocab(
      words: DataFrame,
      maxPieceLen: Int = 4,
      topMulti: Int = 150,
      coveragePermyriad: Int = 10000): Seq[(String, Long)] = {
    require(coveragePermyriad > 0 && coveragePermyriad <= 10000,
      "coverage is a permyriad in (0, 10000]")
    val syms = split(col("word"), "")
    // every (start, len) substring window, counted cnt× per occurrence
    val subs = words
      .select(col("cnt"), syms.as("s"))
      .select(col("cnt"), explode(
        flatten(transform(sequence(lit(1), size(col("s"))), i =>
          transform(
            sequence(lit(1), least(lit(maxPieceLen), size(col("s")) - i + 1)),
            l => array_join(slice(col("s"), i, l), ""))))).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("n"))
    // character coverage (SentencePiece --character_coverage, here an
    // integer PERMYRIAD so both sides of the oracle compare in exact
    // Long arithmetic): walk the alphabet by (count desc, piece) and
    // keep a char while the mass accumulated BEFORE it is still short
    // of coverage — the most frequent chars that cover the requested
    // fraction; the excluded tail is what byte fallback exists for.
    // The alphabet is bounded, so this is driver-side arithmetic.
    val singlesAll = subs.filter(length(col("piece")) === 1)
      .orderBy(col("n").desc, col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val total = singlesAll.map(_._2).sum
    // exact comparison in 128-bit arithmetic: at the 100 TB regime the
    // total character mass can exceed Long.MaxValue/10000 (~9.2e14), so
    // the naive Long products would overflow and silently mis-cut the
    // alphabet tail. The loop is alphabet-bounded driver arithmetic, so
    // BigInt costs nothing; the semantics (and the oracle's replay in
    // DuckDB's native 128-bit HUGEINT products) are unchanged.
    var cumBefore = 0L
    val covTotal = BigInt(coveragePermyriad) * BigInt(total)
    val singles = singlesAll.filter { case (_, n) =>
      val keep = BigInt(cumBefore) * BigInt(10000) < covTotal
      cumBefore += n
      keep
    }
    // a multi-char piece may not smuggle an excluded char back in:
    // under coverage < 1 the excluded tail must be unreachable in ANY
    // piece (byte fallback owns it) — filtered BEFORE the top-K cut,
    // with the covered alphabet as a literal predicate (it is small)
    val multisDf = subs.filter(length(col("piece")) > 1)
    val multisEligible =
      if (coveragePermyriad == 10000) multisDf
      else multisDf.filter(forall(split(col("piece"), ""),
        c => c.isin(singles.map(_._1): _*)))
    val multis = multisEligible
      .orderBy(col("n").desc, col("piece")).limit(topMulti)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    (singles ++ multis).sortBy { case (p, n) => (-n, p) }
  }

  /** One Viterbi-EM round: segment every distinct word under the
    * current counts' costs; return the new weighted piece counts
    * (unused pieces drop out; unknown single chars emitted by the
    * fallback enter with their counts). */
  def emRound(
      words: DataFrame,
      vocabCounts: Seq[(String, Long)],
      maxPieceLen: Int = 4,
      admitUnk: Boolean = true): Seq[(String, Long)] = {
    val counts = words
      .select(col("cnt"), VectorExpressions.unigramViterbi(
        split(col("word"), ""), costsFrom(vocabCounts), maxPieceLen, UnkCost).as("ps"))
      .select(col("cnt"), explode(col("ps")).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("piece"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // under character coverage the excluded chars must STAY excluded:
    // UNK-fallback emissions do not re-enter the vocabulary (the
    // SentencePiece behavior — required_chars are fixed at seed time);
    // without coverage they enter with their counts (the permissive
    // default every earlier round shipped with)
    if (admitUnk) counts
    else {
      val prev = vocabCounts.map(_._1).toSet
      counts.filter { case (p, _) => prev(p) }
    }
  }

  /** Train: seed → `rounds` Viterbi-EM rounds → the final piece table
    * as a DataFrame (piece, n_count), ordered (count desc, piece) —
    * the artifact a unigram tokenizer ships (SentencePiece's model
    * file enumerates exactly piece → logprob). */
  def trainVocab(
      df: DataFrame,
      textCol: String = "text",
      rounds: Int = 2,
      maxPieceLen: Int = 4,
      topMulti: Int = 150,
      marker: Boolean = false,
      coveragePermyriad: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    val admitUnk = coveragePermyriad == 10000
    val words = markWords(wordCounts(df, textCol), marker).localCheckpoint()
    var vocab = seedVocab(words, maxPieceLen, topMulti, coveragePermyriad)
    for (_ <- 1 to rounds) vocab = emRound(words, vocab, maxPieceLen, admitUnk)
    spark.createDataFrame(vocab).toDF("piece", "n_count")
      .orderBy(col("n_count").desc, col("piece"))
  }

  /** SentencePiece's reserved control ids (the upstream defaults every
    * exported model carries): `<unk>`=0, `<s>`=1, `</s>`=2; trained
    * pieces follow from 3 in score order. */
  val UnkId = 0
  val BosId = 1
  val EosId = 2

  /** The id table a trained unigram vocabulary induces — SentencePiece
    * conventions: specials take ids 0–2 ([[UnkId]]/[[BosId]]/[[EosId]]),
    * trained pieces get 3 + rank in (count desc, piece) order — the
    * same deterministic order the artifact persists, enforced here
    * rather than assumed. The single-char UNK fallback pieces the
    * Viterbi kernel can emit for out-of-vocabulary characters have no
    * row: they map to [[UnkId]] at probe time. */
  def pieceIds(vocabCounts: Seq[(String, Long)]): Seq[(String, Int)] =
    vocabCounts.sortBy { case (p, n) => (-n, p) }
      .zipWithIndex.map { case ((p, _), i) => (p, 3 + i) }

  /** The shared word cache of the tokenize family: distinct words of
    * `df`, each carrying `syms(chars)` where `chars` is the word's
    * character array — prefixed with [[SpMarker]] when `marker` is on
    * (the DP then runs over the marked string while the JOIN KEY stays
    * the raw word, so the positional rejoin is marker-agnostic). */
  private def wordCache(df: DataFrame, textCol: String, marker: Boolean)(
      syms: Column => Column): DataFrame = {
    val chars =
      if (marker) split(concat(lit(SpMarker), col("word")), "")
      else split(col("word"), "")
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .select(col("word"), syms(chars).as("syms"))
  }

  /** Tokenize to TOKEN IDS — the tensor a model consumes, the unigram
    * twin of [[ByteLevel.tokenIds]]: Viterbi segmentation AND the
    * hashed piece→id probe ([[org.apache.spark.sql.graft.VectorExpressions.vocabIds]],
    * O(1) per piece at any vocabulary size) both run INSIDE the word
    * cache — once per DISTINCT word, never per document token — with
    * out-of-vocabulary fallback pieces coalesced to [[UnkId]] (the
    * SentencePiece `<unk>` semantics). Documents join the
    * (word → id list) cache and flatten positionally; `appendEos`
    * terminates each document with [[EosId]] (one array append per
    * DOCUMENT), the separator a packed pretraining corpus carries.
    * Output: (idCol, token_ids). */
  def tokenIds(
      df: DataFrame,
      vocabCounts: Seq[(String, Long)],
      idCol: String = "doc_id",
      textCol: String = "text",
      maxPieceLen: Int = 4,
      broadcastVocab: Boolean = true,
      appendEos: Boolean = true,
      marker: Boolean = false): DataFrame = {
    val ids = pieceIds(vocabCounts)
    val vocab = wordCache(df, textCol, marker)(chars => transform(
      VectorExpressions.vocabIds(
        VectorExpressions.unigramViterbi(
          chars, costsFrom(vocabCounts), maxPieceLen, UnkCost),
        ids),
      x => coalesce(x, lit(UnkId))))
    val base = Bpe.joinBackBySubwords(df, vocab, idCol, textCol, broadcastVocab)
      .withColumnRenamed("bpe_tokens", "token_ids")
    if (appendEos)
      base.withColumn("token_ids", concat(col("token_ids"), array(lit(EosId))))
    else base
  }

  /** Byte-fallback id layout (SentencePiece `--byte_fallback`, the
    * Llama-family convention): after the three control ids, the 256
    * byte pieces `<0x00>`..`<0xFF>` occupy ids 3..258; trained pieces
    * follow from 259 in score order. */
  val ByteBase = 3
  val BytePieces = 256

  /** The byte-fallback id table: trained pieces at 259 + rank. */
  def pieceIdsByteFallback(vocabCounts: Seq[(String, Long)]): Seq[(String, Int)] =
    vocabCounts.sortBy { case (p, n) => (-n, p) }
      .zipWithIndex.map { case ((p, _), i) => (p, ByteBase + BytePieces + i) }

  /** Tokenize to ids with BYTE FALLBACK — segmentation-by-ids made
    * TOTAL over arbitrary text: a character the training corpus never
    * saw does not collapse to `<unk>` (which loses the text); it
    * expands to its UTF-8 bytes as `<0xXX>` pieces, ids 3..258 — the
    * SentencePiece `--byte_fallback` behavior the Llama tokenizers
    * ship. This is the apply-to-NEW-text path: `df` may contain
    * characters `vocabCounts`' corpus never saw, which is exactly when
    * the fallback fires. Viterbi + the hashed probe-or-expand
    * ([[org.apache.spark.sql.graft.ByteFallbackIdsExpr]]) run inside
    * the word cache, once per DISTINCT word. */
  def tokenIdsByteFallback(
      df: DataFrame,
      vocabCounts: Seq[(String, Long)],
      idCol: String = "doc_id",
      textCol: String = "text",
      maxPieceLen: Int = 4,
      broadcastVocab: Boolean = true,
      appendEos: Boolean = true,
      marker: Boolean = false): DataFrame = {
    val ids = pieceIdsByteFallback(vocabCounts)
    val vocab = wordCache(df, textCol, marker)(chars =>
      VectorExpressions.byteFallbackIds(
        VectorExpressions.unigramViterbi(
          chars, costsFrom(vocabCounts), maxPieceLen, UnkCost),
        ids, ByteBase))
    val base = Bpe.joinBackBySubwords(df, vocab, idCol, textCol, broadcastVocab)
      .withColumnRenamed("bpe_tokens", "token_ids")
    if (appendEos)
      base.withColumn("token_ids", concat(col("token_ids"), array(lit(EosId))))
    else base
  }

  /** Decode [[tokenIdsByteFallback]] output back to text — the reverse
    * direction of the ▁-marked pipeline: one codegen kernel
    * ([[org.apache.spark.sql.graft.UnigramDecodeExpr]]) assembles
    * piece/byte UTF-8 bytes per id (control ids contribute nothing),
    * then markers become spaces and the leading dummy-prefix space is
    * trimmed — with `marker = true` tokenization this reproduces the
    * NORMALIZED text exactly (lower + collapsed whitespace: the
    * pretokenizer's own normalization), byte-fallback chars included.
    * Adds `text_rt` next to `idsCol`. */
  def detokenize(
      ids: DataFrame,
      vocabCounts: Seq[(String, Long)],
      idsCol: String = "token_ids"): DataFrame =
    ids.withColumn("text_rt", ltrim(translate(
      VectorExpressions.unigramDecode(col(idsCol),
        pieceIdsByteFallback(vocabCounts), ByteBase, BytePieces),
      SpMarker, " ")))

  /** One row of a SentencePiece `ModelProto` pieces list: the piece
    * string, its score (log-probability), and the piece type
    * (proto enum: NORMAL=1, UNKNOWN=2, CONTROL=3, BYTE=6 are the ones
    * a Llama-family model carries). The row's position in the file IS
    * its id. */
  final case class SpPiece(piece: String, score: Float, ptype: Int)

  val SpNormal = 1
  val SpUnknown = 2
  val SpControl = 3
  val SpByte = 6

  /** Score → integer lattice cost: round(−10⁶ · score). The model's
    * float32 scores quantize to the same micro-log units the trainer
    * uses, so the external-model apply rides the identical
    * exact-integer Viterbi kernel; rounding (not floor) makes the
    * recovered cost stable against float32 representation error for
    * scores that are 10⁻⁶ multiples. */
  def modelCostMicros(score: Float): Long = Math.round(-score.toDouble * 1e6)

  /** Parse a SentencePiece `.model` file (the `ModelProto` wire
    * format, public spec `sentencepiece_model.proto`) — the entry
    * point for a user bringing a PUBLISHED unigram tokenizer: every
    * Llama-family model ships exactly this file. A minimal proto2
    * reader: repeated field 1 = `SentencePiece` submessages (field 1
    * piece string, field 2 float32 score, field 3 type varint with
    * the proto2 default NORMAL when absent); every other top-level
    * field (trainer spec, normalizer spec, ...) is skipped by wire
    * type. Row order is preserved — index = id. */
  def parseModelProto(b: Array[Byte]): Seq[SpPiece] = {
    var i = 0
    def varint(): Long = {
      var shift = 0; var v = 0L; var cont = true
      while (cont) {
        require(i < b.length, "truncated varint in model proto")
        val x = b(i) & 0xff; i += 1
        v |= (x & 0x7fL) << shift; shift += 7; cont = (x & 0x80) != 0
      }
      v
    }
    def skip(wire: Int): Unit = {
      (wire: @unchecked) match {
        case 0 => varint()
        case 1 => i += 8
        case 2 => val l = varint().toInt; require(l >= 0, "negative length in model proto"); i += l
        case 5 => i += 4
        case w => throw new IllegalArgumentException(s"unsupported wire type $w in model proto")
      }
      require(i <= b.length, "truncated skipped field in model proto")
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[SpPiece]
    while (i < b.length) {
      val tag = varint(); val field = (tag >>> 3).toInt; val wire = (tag & 7).toInt
      if (field == 1 && wire == 2) {
        val len = varint().toInt
        val end = i + len
        require(end <= b.length, "truncated piece submessage in model proto")
        var piece = ""; var score = 0.0f; var ptype = SpNormal
        while (i < end) {
          val t2 = varint(); val f2 = (t2 >>> 3).toInt; val w2 = (t2 & 7).toInt
          (f2, w2) match {
            case (1, 2) =>
              val l = varint().toInt
              require(l >= 0 && i + l <= end, "truncated piece string in model proto")
              piece = new String(b, i, l, "UTF-8"); i += l
            case (2, 5) =>
              require(i + 4 <= end, "truncated piece score in model proto")
              val bits = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
                ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
              score = java.lang.Float.intBitsToFloat(bits); i += 4
            case (3, 0) => ptype = varint().toInt
            case _ => skip(w2)
          }
        }
        require(i == end, "malformed piece submessage in model proto")
        out += SpPiece(piece, score, ptype)
      } else skip(wire)
    }
    out.toSeq
  }

  /** Load a `.model` file from disk. */
  def loadModelProto(path: String): Seq[SpPiece] =
    parseModelProto(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  /** The shipped external SentencePiece model fixture (Llama layout:
    * `<unk>`, `<s>`, `</s>`, 256 BYTE pieces, ▁-marked normal pieces
    * in score order), generated deterministically by
    * `graft.tools.GenSpModel` (a spec re-runs the generator and
    * byte-compares — reproducible provenance). */
  def externalFixtureModel(): Seq[SpPiece] = {
    val in = getClass.getResourceAsStream("/graft/sp/ext_unigram.model")
    require(in != null, "fixture resource graft/sp/ext_unigram.model not on classpath")
    try parseModelProto(in.readAllBytes()) finally in.close()
  }

  /** Tokenize to ids under an EXTERNAL SentencePiece model — the
    * apply path for a model the user brings ([[loadModelProto]])
    * rather than one this engine trained: NORMAL pieces form the
    * Viterbi lattice at their quantized score costs
    * ([[modelCostMicros]]) with the ids the MODEL assigns (file
    * position), the BYTE block backs the out-of-vocabulary fallback
    * (validated contiguous `<0x00>`..`<0xFF>`, the `--byte_fallback`
    * layout every Llama model carries), `</s>` terminates each
    * document, and the ▁ marker convention applies throughout. Rides
    * the identical word-cache kernels as the self-trained path. */
  def tokenIdsFromModel(
      df: DataFrame,
      model: Seq[SpPiece],
      idCol: String = "doc_id",
      textCol: String = "text",
      maxPieceLen: Int = 4,
      broadcastVocab: Boolean = true,
      appendEos: Boolean = true): DataFrame = {
    val idx = model.zipWithIndex
    val normal = idx.filter(_._1.ptype == SpNormal)
    require(normal.nonEmpty, "model carries no normal pieces")
    require(normal.forall { case (p, _) =>
      p.piece.codePointCount(0, p.piece.length) <= maxPieceLen },
      s"normal pieces longer than maxPieceLen=$maxPieceLen would silently never match")
    val costs = normal.map { case (p, _) => (p.piece, modelCostMicros(p.score)) }
    val ids = normal.map { case (p, i) => (p.piece, i) }
    val bytes = idx.filter(_._1.ptype == SpByte)
    require(bytes.size == 256,
      s"byte-fallback model must carry 256 BYTE pieces, got ${bytes.size}")
    val byteBase = bytes.head._2
    bytes.zipWithIndex.foreach { case ((p, id), b) =>
      require(id == byteBase + b && p.piece == f"<0x$b%02X>",
        s"BYTE pieces must be contiguous <0x00>..<0xFF>: saw '${p.piece}' at id $id")
    }
    val eosId = model.indexWhere(p => p.ptype == SpControl && p.piece == "</s>")
    require(eosId >= 0, "model must carry a </s> control piece")
    val vocab = wordCache(df, textCol, marker = true)(chars =>
      VectorExpressions.byteFallbackIds(
        VectorExpressions.unigramViterbi(chars, costs, maxPieceLen, UnkCost),
        ids, byteBase))
    val base = Bpe.joinBackBySubwords(df, vocab, idCol, textCol, broadcastVocab)
      .withColumnRenamed("bpe_tokens", "token_ids")
    if (appendEos)
      base.withColumn("token_ids", concat(col("token_ids"), array(lit(eosId))))
    else base
  }

  private val vocabSidecar = "_graft_unigram_sidecar.json"

  /** Idempotently persist the trained piece table at `dir` behind the
    * fingerprint-sidecar protocol ([[graft.io.Artifact.ensure]]): one
    * parquet row per piece, (piece, n_count) — the model file a
    * unigram tokenizer ships (SentencePiece's `.model` enumerates
    * exactly piece → logprob), built once per (corpus, params) and
    * probed by every later tokenize run. The same discipline as the
    * BPE merge artifact ([[Bpe.ensureMergeArtifact]]): fingerprint
    * covers the corpus text content (count + xor + duplicate-robust
    * sum of per-row hashes) AND every training parameter, so a stale
    * model can never be silently reused and an unchanged corpus never
    * retrains. */
  def ensureVocabArtifact(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      dir: String,
      textCol: String = "text",
      rounds: Int = 2,
      maxPieceLen: Int = 4,
      topMulti: Int = 150,
      marker: Boolean = false,
      coveragePermyriad: Int = 10000): Unit = {
    val (nRows, dataHash, hashSum) =
      graft.io.Artifact.hashAgg(df, xxhash64(col(textCol)))
    graft.io.Artifact.ensure(dir, vocabSidecar,
      graft.io.Artifact.fingerprintJson(nRows, dataHash,
        "hsum" -> hashSum,
        "textCol" -> textCol, "rounds" -> rounds.toString,
        "maxPieceLen" -> maxPieceLen.toString,
        "topMulti" -> topMulti.toString,
        "marker" -> marker.toString,
        "coverage" -> coveragePermyriad.toString)) {
      trainVocab(df, textCol, rounds, maxPieceLen, topMulti, marker, coveragePermyriad)
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/data")
    }
  }

  /** The persisted piece table in the trainer's output shape:
    * (piece, n_count) ordered (count desc, piece) — equals
    * [[trainVocab]] on the same corpus/params (spec-pinned). */
  def vocabFromArtifact(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/data")
      .orderBy(col("n_count").desc, col("piece"))

  /** The persisted artifact as the (piece, count) list [[tokenize]]
    * consumes. Bounded read: the piece table is driver-bounded by
    * construction (singles + topMulti). */
  def loadVocabCounts(
      spark: org.apache.spark.sql.SparkSession, dir: String): Seq[(String, Long)] =
    vocabFromArtifact(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Tokenize through the word cache: Viterbi once per DISTINCT word
    * under the given piece counts' costs, positional rejoin
    * ([[Bpe.joinBackBySubwords]]). Output: (idCol, bpe_tokens) — the
    * shared tokenizer output shape. */
  def tokenize(
      df: DataFrame,
      vocabCounts: Seq[(String, Long)],
      idCol: String = "doc_id",
      textCol: String = "text",
      maxPieceLen: Int = 4,
      broadcastVocab: Boolean = true,
      marker: Boolean = false): DataFrame = {
    val vocab = wordCache(df, textCol, marker)(chars =>
      VectorExpressions.unigramViterbi(
        chars, costsFrom(vocabCounts), maxPieceLen, UnkCost))
    Bpe.joinBackBySubwords(df, vocab, idCol, textCol, broadcastVocab)
  }
}
