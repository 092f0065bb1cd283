package graft.text

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** The unigram-LM tokenizer family ([[Unigram]] + the
  * `UnigramViterbiExpr` kernel): Viterbi semantics against an
  * independent reference implementation, the pinned tie-break and UNK
  * fallback, quantized-cost arithmetic, EM-round behavior, and the
  * oracle's unroll-bound contract. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def segment(words: Seq[String], vocab: Seq[(String, Long)],
      maxPieceLen: Int = 4): Seq[Seq[String]] = {
    val df = words.zipWithIndex.map { case (w, i) => (i, w) }.toDF("i", "word")
    df.select(col("i"),
        org.apache.spark.sql.graft.VectorExpressions.unigramViterbi(
          split(col("word"), ""), vocab, maxPieceLen, Unigram.UnkCost).as("ps"))
      .orderBy("i").collect().map(_.getSeq[String](1).toSeq).toSeq
  }

  /** Independent reference: recursive memoized minimum-cost
    * segmentation (deliberately not the kernel's iterative DP), same
    * tie rule — among equal-cost splits prefer the SMALLEST start j
    * (the longest last piece). */
  private def refSegment(word: String, costs: Map[String, Long],
      maxPieceLen: Int): Seq[String] = {
    val memo = scala.collection.mutable.Map.empty[Int, (Long, Seq[String])]
    def best(i: Int): (Long, Seq[String]) = {
      if (i == 0) return (0L, Nil)
      memo.getOrElseUpdate(i, {
        var r: (Long, Seq[String]) = (Long.MaxValue, Nil)
        for (j <- math.max(0, i - maxPieceLen) until i) {
          val piece = word.substring(j, i)
          val c: Option[Long] =
            costs.get(piece).orElse(if (i - j == 1) Some(Unigram.UnkCost) else None)
          c.foreach { pc =>
            val (cj, sj) = best(j)
            if (cj + pc < r._1) r = (cj + pc, sj :+ piece)
          }
        }
        r
      })
    }
    best(word.length)._2
  }

  test("kernel matches the reference DP on randomized words and vocabularies") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcde"
    val pieces = (1 to 80).map { _ =>
      Seq.fill(1 + rnd.nextInt(4))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct.map(p => (p, 50L + rnd.nextInt(5000).toLong))
    val costs = Unigram.costsFrom(pieces)
    val words = (1 to 300).map(_ =>
      Seq.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = segment(words, costs)
    words.zip(got).foreach { case (w, g) =>
      assert(g == refSegment(w, costs.toMap, 4), s"mismatch on '$w'")
      assert(g.mkString == w, s"pieces must reassemble '$w', got $g")
    }
  }

  test("ties break to the longest last piece; UNK fallback keeps segmentation total") {
    // equal costs: 'ab'+'cd' vs 'abc'+'d' vs ... pin with explicit costs
    val vocab = Seq(("ab", 10L), ("cd", 10L), ("abc", 10L), ("d", 10L), ("a", 10L), ("b", 10L), ("c", 10L))
    // "abcd": [ab, cd] cost 20 vs [abc, d] cost 20 — tie at the final
    // prefix: j=2 ('cd') vs j=3 ('d'); smallest j wins → ['ab','cd']
    assert(segment(Seq("abcd"), vocab) == Seq(Seq("ab", "cd")))
    // chars absent from the vocab segment as single-char UNK pieces
    assert(segment(Seq("zzq"), vocab) == Seq(Seq("z", "z", "q")))
    // a cheap long piece beats per-char splits
    val v2 = Seq(("hell", 5L), ("o", 5L), ("h", 100L), ("e", 100L), ("l", 100L))
    assert(segment(Seq("hello"), v2) == Seq(Seq("hell", "o")))
  }

  test("quantized costs: -floor(1e6 ln p), integers, identical formula as the oracle") {
    val costs = Unigram.costsFrom(Seq(("a", 3L), ("b", 1L))).toMap
    // p(a)=3/4 → -floor(1e6*ln .75) = -floor(-287682.07...) = 287683
    assert(costs("a") == 287683L)
    assert(costs("b") == (-Math.floor(1e6 * Math.log(0.25))).toLong)
  }

  test("EM rounds concentrate mass and stay deterministic") {
    val df = Seq.tabulate(40)(i => (i.toLong, "fast scan fast scan join"))
      .toDF("doc_id", "text")
    val v1 = Unigram.trainVocab(df, rounds = 2, maxPieceLen = 4, topMulti = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val v2 = Unigram.trainVocab(df, rounds = 2, maxPieceLen = 4, topMulti = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v1 == v2, "training must be deterministic")
    assert(v1.nonEmpty && v1.forall(_._2 > 0))
    // frequent substrings of the repeated words must surface as pieces
    val ps = v1.map(_._1).toSet
    assert(ps.exists(_.length > 1), s"multi-char pieces must survive EM: $v1")
    // tokenize through the trained vocab reassembles every word
    val toks = Unigram.tokenize(df, v1)
      .select(concat_ws(" ", col("bpe_tokens"))).head().getString(0)
    assert(toks.replace(" ", "") == "fastscanfastscanjoin")
  }

  test("token ids: SentencePiece conventions — unk=0, pieces 3+rank, </s> appended") {
    val df = Seq((1L, "scan merge zzz"), (2L, "merge scan")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(df, rounds = 2, maxPieceLen = 4, topMulti = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // id table: 3 + rank in (count desc, piece) order, defensively re-sorted
    val ids = Unigram.pieceIds(vocab).toMap
    assert(Unigram.pieceIds(vocab).map(_._2) == (3 until 3 + vocab.size))
    assert(Unigram.pieceIds(scala.util.Random.shuffle(vocab)) == Unigram.pieceIds(vocab),
      "id assignment must not depend on input order")
    // tokenIds == tokenize mapped through the id table + EOS, per doc
    val toks = Unigram.tokenize(df, vocab)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    val got = Unigram.tokenIds(df, vocab)
      .select("doc_id", "token_ids").as[(Long, Seq[Int])].collect().toMap
    assert(got.keySet == toks.keySet)
    toks.foreach { case (d, ps) =>
      val expect = ps.map(p => ids.getOrElse(p, Unigram.UnkId)) :+ Unigram.EosId
      assert(got(d) == expect, s"doc $d: ${got(d)} vs $expect")
      assert(got(d).last == Unigram.EosId)
    }
    // a document containing only characters the vocab never saw:
    // every char either falls back to <unk>=0 or is a trained single
    val oov = Unigram.tokenIds(Seq((9L, "qqq")).toDF("doc_id", "text"), vocab)
      .select("token_ids").as[Seq[Int]].head()
    assert(oov == Seq(Unigram.UnkId, Unigram.UnkId, Unigram.UnkId, Unigram.EosId),
      s"OOV chars must map to <unk>: $oov")
    // appendEos=false drops exactly the terminator
    val noEos = Unigram.tokenIds(df, vocab, appendEos = false)
      .select("doc_id", "token_ids").as[(Long, Seq[Int])].collect().toMap
    got.foreach { case (d, v) => assert(noEos(d) == v.dropRight(1)) }
  }

  test("byte fallback: OOV chars expand to UTF-8 byte ids, never <unk>; in-vocab pieces unchanged") {
    val train = Seq((1L, "scan merge scan merge")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(train, rounds = 2, maxPieceLen = 4, topMulti = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val ids = Unigram.pieceIdsByteFallback(vocab).toMap
    // trained pieces sit after the 256 byte pieces
    assert(Unigram.pieceIdsByteFallback(vocab).map(_._2) ==
      (Unigram.ByteBase + Unigram.BytePieces until
       Unigram.ByteBase + Unigram.BytePieces + vocab.size))
    // apply to NEW text with chars the training corpus never saw:
    // ASCII 'q' (1 byte), 'é' (2 bytes), '你' (3 bytes), emoji (4 bytes)
    val apply = Seq((1L, "scan qé 你 🌍")).toDF("doc_id", "text")
    val got = Unigram.tokenIdsByteFallback(apply, vocab)
      .select("token_ids").as[Seq[Int]].head()
    def bytes(s: String): Seq[Int] =
      s.getBytes("UTF-8").map(b => Unigram.ByteBase + (b & 0xff)).toSeq
    // 'scan' segments fully in-vocab (trained on it); the OOV words
    // expand per char — every id in [3, 258], 1/2/3/4 bytes resp.
    val scanIds = Unigram.tokenize(apply, vocab)
      .select("bpe_tokens").as[Seq[String]].head()
      .takeWhile(p => ids.contains(p)).map(ids)
    assert(got.startsWith(scanIds) && scanIds.nonEmpty)
    assert(got.endsWith(bytes("qé") ++ bytes("你") ++ bytes("🌍") :+ Unigram.EosId),
      s"OOV must byte-expand: $got")
    assert(bytes("🌍").size == 4 && bytes("你").size == 3 && bytes("qé").size == 3)
    // totality: no <unk>, no nulls — every id in a defined range
    assert(got.forall(i => i == Unigram.EosId ||
      (i >= Unigram.ByteBase && i < Unigram.ByteBase + Unigram.BytePieces + vocab.size)))
  }

  test("byte fallback: a null token element fails with a clear message, not NPE") {
    // the declared input type (array<string> with nullable elements) is
    // wider than what UnigramViterbiExpr produces — a direct caller
    // feeding a null element must get the expression's own error
    val df = Seq(Tuple1(Seq[String]("scan", null, "x"))).toDF("toks")
    val e = intercept[Exception] {
      df.select(org.apache.spark.sql.graft.VectorExpressions.byteFallbackIds(
        col("toks"), Seq(("scan", 300)), Unigram.ByteBase)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("null token")),
      s"expected the byte_fallback_ids null-token error, got: $e")
  }

  test("▁-marked pipeline round-trips: decode(tokenIds(text)) == normalize(text), byte fallback included") {
    val train = Seq((1L, "Scan merge scan"), (2L, "merge  join   scan")).toDF("doc_id", "text")
    val vocab = Unigram.trainVocab(train, rounds = 2, maxPieceLen = 4, topMulti = 30, marker = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // every trained piece either starts with the marker or is word-internal
    assert(vocab.exists(_._1.startsWith(Unigram.SpMarker)),
      s"marked training must produce ▁-prefixed pieces: $vocab")
    // apply to NEW text with spacing, case, and chars training never saw
    val apply = Seq(
      (1L, "  Scan   MERGE  join "),          // spacing + case normalize
      (2L, "scan qé 你 🌍 merge"),             // byte fallback mid-document
      (3L, "supercalifragilistic scan")       // word longer than any piece
    ).toDF("doc_id", "text")
    val ids = Unigram.tokenIdsByteFallback(apply, vocab, marker = true)
    val got = Unigram.detokenize(ids, vocab)
      .join(apply, "doc_id")
      .select(col("doc_id"), col("text_rt"),
        TextAnalysis.normalizeText(col("text")).as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    got.foreach { case (d, rt, norm) =>
      assert(rt == norm, s"doc $d: '$rt' != '$norm'")
    }
    assert(got.length == 3)
    // decode pins: control ids contribute nothing; byte ids assemble
    // multi-byte chars; a foreign id nulls the whole decode
    val spark2 = spark
    import spark2.implicits._
    val pid = Unigram.pieceIdsByteFallback(vocab)
    def dec(xs: Seq[Int]): Option[String] =
      Seq(Tuple1(xs)).toDF("ids")
        .select(org.apache.spark.sql.graft.VectorExpressions.unigramDecode(
          col("ids"), pid, Unigram.ByteBase, Unigram.BytePieces).as("t"))
        .collect().headOption.flatMap(r => Option(r.getString(0)))
    val emoji = "🌍".getBytes("UTF-8").map(b => Unigram.ByteBase + (b & 0xff)).toSeq
    assert(dec(Seq(Unigram.BosId) ++ emoji ++ Seq(Unigram.EosId)) == Some("🌍"))
    assert(dec(Seq(pid.map(_._2).max + 1000)) == None, "foreign id must null the decode")
    assert(dec(pid.headOption.map(_._2).toSeq) == pid.headOption.map(_._1))
  }

  test("character coverage: rare chars excluded, kept out through EM, byte-fallback owns them") {
    // char mass: e-heavy with a rare 'z' tail — 98% cuts 'z' out
    val df = Seq.tabulate(50)(i =>
      (i.toLong, if (i == 0) "zeta scan" else "scan merge scan")).toDF("doc_id", "text")
    val full = Unigram.trainVocab(df, rounds = 2, maxPieceLen = 4, topMulti = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val cov = Unigram.trainVocab(df, rounds = 2, maxPieceLen = 4, topMulti = 20,
        coveragePermyriad = 9800)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val covChars = cov.flatMap(_._1.toSeq).toSet
    // full coverage: 'z' reachable through SOME piece (possibly a
    // multi-char one — EM may drop the single when a multi covers it)
    assert(full.exists(_._1.contains('z')),
      s"full coverage must keep the rare char reachable: $full")
    assert(!covChars.contains('z'),
      s"98% coverage must exclude the rare char from EVERY piece: $cov")
    // seed semantics: coverage walks (count desc, piece); the kept
    // alphabet equals the prefix of chars whose prior mass < 98%
    val words = df.select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0).groupBy("word").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val charMass = words.flatMap { case (w, c) => w.map(ch => (ch, c)) }
      .groupBy(_._1).map { case (ch, xs) => (ch, xs.map(_._2).sum) }.toSeq
      .sortBy { case (ch, n) => (-n, ch) }
    val total = charMass.map(_._2).sum
    var cum = 0L
    val expectKept = charMass.filter { case (_, n) =>
      val k = cum * 10000L < 9800L * total; cum += n; k
    }.map(_._1).toSet
    val seedSingles = Unigram.trainVocab(df, rounds = 0, maxPieceLen = 4,
        topMulti = 0, coveragePermyriad = 9800)
      .collect().map(_.getString(0)).filter(_.length == 1).toSet
    assert(seedSingles == expectKept.map(_.toString),
      s"seed alphabet must match the coverage walk: $seedSingles vs $expectKept")
    // tokenizing the SAME corpus now byte-falls-back on the excluded char
    val ids = Unigram.tokenIdsByteFallback(df.filter(col("doc_id") === 0), cov)
      .select("token_ids").as[Seq[Int]].head()
    val zByte = Unigram.ByteBase + ("z".getBytes("UTF-8")(0) & 0xff)
    assert(ids.contains(zByte), s"excluded char must surface as its byte id: $ids")
  }

  test("vocab artifact: equals the live trainer, reuses, and invalidates on params") {
    val df = Seq.tabulate(30)(i => (i.toLong, "pack merge pack merge scan"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("unigram_art").toString
    Unigram.ensureVocabArtifact(spark, df, dir, rounds = 2, maxPieceLen = 4, topMulti = 20)
    val live = Unigram.trainVocab(df, rounds = 2, maxPieceLen = 4, topMulti = 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val art = Unigram.vocabFromArtifact(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(art == live, "artifact read must equal the live trainer")
    assert(Unigram.loadVocabCounts(spark, dir) == live)
    // unchanged corpus+params: no rewrite
    val f1 = new java.io.File(s"$dir/data").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    Unigram.ensureVocabArtifact(spark, df, dir, rounds = 2, maxPieceLen = 4, topMulti = 20)
    val f2 = new java.io.File(s"$dir/data").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(f2 == f1, "unchanged corpus+params must not retrain")
    // changed topMulti: different artifact → rebuild
    Unigram.ensureVocabArtifact(spark, df, dir, rounds = 2, maxPieceLen = 4, topMulti = 5)
    val rebuilt = Unigram.loadVocabCounts(spark, dir)
    val live5 = Unigram.trainVocab(df, rounds = 2, maxPieceLen = 4, topMulti = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rebuilt == live5, "changed params must rebuild the artifact")
    // tokenize through the artifact equals tokenize through the live vocab
    val viaArt = Unigram.tokenize(df, rebuilt)
      .select(concat_ws(" ", col("bpe_tokens"))).head().getString(0)
    val viaLive = Unigram.tokenize(df, live5)
      .select(concat_ws(" ", col("bpe_tokens"))).head().getString(0)
    assert(viaArt == viaLive)
  }

  test("oracle unroll bound covers the corpus: no word longer than 12 chars") {
    val maxLen = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .agg(max(length(col("word")))).head().getInt(0)
    assert(maxLen <= 12,
      s"unigram oracles unroll 12 Viterbi layers; corpus words reach $maxLen")
  }
}
