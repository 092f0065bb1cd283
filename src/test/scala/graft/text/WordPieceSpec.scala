package graft.text

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** The WordPiece (BERT-family) tokenizer: the greedy longest-match
  * kernel against an independent reference implementation, the
  * published is_bad / max_input_chars semantics, the likelihood-score
  * trainer, the vocab.txt id conventions, and the decode round-trip. */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent reference: greedy longest-match-first over code
    * points (deliberately a plain-String implementation, not the
    * kernel's UTF8String walk). */
  private def refGreedy(word: String, vocab: Set[String]): Seq[String] = {
    val cps = word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    if (cps.length > WordPiece.MaxInputChars) return Seq(WordPiece.UnkToken)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < cps.length) {
      var end = cps.length
      var found: Option[String] = None
      while (end > start && found.isEmpty) {
        val sub = cps.slice(start, end).mkString
        val cand = if (start > 0) WordPiece.ContPrefix + sub else sub
        if (vocab(cand)) found = Some(cand) else end -= 1
      }
      found match {
        case None => return Seq(WordPiece.UnkToken)
        case Some(p) => out += p; start = end
      }
    }
    out.toSeq
  }

  private def kernel(words: Seq[String], vocab: Seq[String]): Seq[Seq[String]] = {
    val df = words.zipWithIndex.map { case (w, i) => (i, w) }.toDF("i", "word")
    df.select(col("i"),
        org.apache.spark.sql.graft.VectorExpressions.wordPieceGreedy(
          split(col("word"), ""), vocab, WordPiece.UnkToken,
          WordPiece.ContPrefix, WordPiece.MaxInputChars).as("ps"))
      .orderBy("i").collect().map(_.getSeq[String](1).toSeq).toSeq
  }

  test("kernel matches the reference greedy on randomized words and vocabularies") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcde"
    (1 to 30).foreach { _ =>
      val vocabPieces = scala.collection.mutable.Set.empty[String]
      // always some single chars (not necessarily all — missing ones force is_bad)
      alphabet.foreach { c =>
        if (rnd.nextInt(10) < 8) vocabPieces += c.toString
        if (rnd.nextInt(10) < 8) vocabPieces += (WordPiece.ContPrefix + c)
      }
      (1 to 12).foreach { _ =>
        val len = 2 + rnd.nextInt(3)
        val s = (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        vocabPieces += (if (rnd.nextBoolean()) s else WordPiece.ContPrefix + s)
      }
      val vocab = vocabPieces.toSeq.sorted
      val words = (1 to 40).map(_ =>
        (1 to (1 + rnd.nextInt(10))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val got = kernel(words, vocab)
      val want = words.map(w => refGreedy(w, vocab.toSet))
      assert(got == want, s"vocab=$vocab words=$words")
    }
  }

  test("longest match wins; is_bad turns the WHOLE word into [UNK]; long words are [UNK]") {
    val vocab = Seq("a", "ab", "##b", "##c")
    // longest-first: "abc" -> [ab, ##c], NOT [a, ##b, ##c]
    assert(kernel(Seq("abc"), vocab) == Seq(Seq("ab", "##c")))
    // 'd' matches nothing mid-word: whole word [UNK], not partial output
    assert(kernel(Seq("abd"), vocab) == Seq(Seq("[UNK]")))
    // first-position failure too ('b' alone only exists as ##b)
    assert(kernel(Seq("bc"), vocab) == Seq(Seq("[UNK]")))
    // the max_input_chars_per_word guard
    val long = "a" * (WordPiece.MaxInputChars + 1)
    assert(kernel(Seq(long), Seq("a", "##a")) == Seq(Seq("[UNK]")))
    val okLong = "a" * WordPiece.MaxInputChars
    assert(kernel(Seq(okLong), Seq("a", "##a")).head.length == WordPiece.MaxInputChars)
  }

  test("kernel is code-point faithful: surrogate-pair chars segment as single units") {
    val vocab = Seq("🌍", "##🌍", "x", "##x")
    assert(kernel(Seq("🌍x", "x🌍🌍"), vocab) ==
      Seq(Seq("🌍", "##x"), Seq("x", "##🌍", "##🌍")))
  }

  test("trainer: likelihood score, not raw frequency; ## merge rule; determinism") {
    // corpus: 'aab' x3, 'ab' x2, 'cc' x4  (whitespace tokens)
    val df = Seq((1L, "aab aab aab ab ab cc cc cc cc")).toDF("doc_id", "text")
    // round-0 symbols: aab -> [a,##a,##b] x3 ; ab -> [a,##b] x2 ; cc -> [c,##c] x4
    // pair counts: (a,##a)=3 (##a,##b)=3 (a,##b)=2 (c,##c)=4
    // single counts: a=5 ##a=3 ##b=5 c=4 ##c=4
    // scores: (a,##a)=3/15=0.2  (##a,##b)=3/15=0.2  (a,##b)=2/25=0.08  (c,##c)=4/16=0.25
    // argmax: (c,##c) 0.25 -> merged 'cc' — frequency alone would tie it
    // with nothing; raw-count BPE would pick (c,##c)=4 too, so round 2
    // separates the scores: after merge, (a,##a)=0.2 vs (##a,##b)=0.2
    // tie broken by (lhs, rhs): '##a' < 'a' lexicographically
    val m = WordPiece.learnMerges(df, numMerges = 2).collect()
    assert(m.length == 2)
    assert((m(0).getString(1), m(0).getString(2)) == ("c", "##c"))
    assert(m(0).getLong(3) == 4L && math.abs(m(0).getDouble(4) - 0.25) < 1e-12)
    assert((m(1).getString(1), m(1).getString(2)) == ("##a", "##b"),
      s"tie must break to (lhs, rhs) order, got ${m(1)}")
    // merged symbol drops the right ## marker: ##a + ##b -> ##ab
    assert(WordPiece.mergedSym("##a", "##b") == "##ab")
    assert(WordPiece.mergedSym("u", "##n") == "un")
    assert(WordPiece.mergedSym("u", "n") == "un")
    // deterministic: re-run equals
    val m2 = WordPiece.learnMerges(df, numMerges = 2).collect()
    assert(m.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
  }

  test("vocabWithIds: specials 0-4, alphabet sorted from 5, merges ranked, first id wins") {
    val v = WordPiece.vocabWithIds(Seq("b", "a", "##x"), Seq(("a", "##x"), ("b", "##x")))
    assert(v.take(5) == WordPiece.Specials.zipWithIndex)
    assert(v.drop(5).take(3) == Seq(("##x", 5), ("a", 6), ("b", 7)))
    assert(v.drop(8) == Seq(("ax", 8), ("bx", 9)))
    // duplicate merge output keeps its first id
    val dup = WordPiece.vocabWithIds(Seq("a", "##b"), Seq(("a", "##b"), ("a", "##b")))
    assert(dup.count(_._1 == "ab") == 1)
  }

  test("tokenIds + decode round-trips exactly where no [UNK] fired; [UNK] is the honest loss") {
    val train = Seq((1L, "scan merge scan merge join group")).toDF("doc_id", "text")
    val merges = WordPiece.learnMerges(train, numMerges = 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = WordPiece.vocabWithIds(WordPiece.alphabetOf(train), merges)
    val apply = Seq(
      (1L, "scan merge join"),      // fully covered
      (2L, "scan Qé merge")         // 'qé' lowercased has OOV chars -> [UNK]
    ).toDF("doc_id", "text")
    val got = WordPiece.tokenIds(apply, vocab)
      .select(col("doc_id"), col("token_ids"),
        WordPiece.decodeIds(col("token_ids"), vocab).as("rt"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq, r.getString(2))).toSeq
      .sortBy(_._1)
    // framing: [CLS] ... [SEP]
    got.foreach { case (_, ids, _) =>
      assert(ids.head == WordPiece.ClsId && ids.last == WordPiece.SepId)
    }
    assert(got(0)._3 == "scan merge join", s"lossless where covered: ${got(0)}")
    assert(!got(0)._2.contains(WordPiece.UnkId))
    assert(got(1)._2.contains(WordPiece.UnkId))
    assert(got(1)._3 == "scan [UNK] merge", s"[UNK] surfaces in decode: ${got(1)}")
  }

  test("merge artifact: equals the live trainer, reuses, invalidates on params") {
    val dir = java.nio.file.Files.createTempDirectory("wp_art").toString
    val df = Seq((1L, "scan merge scan merge join")).toDF("doc_id", "text")
    WordPiece.ensureMergeArtifact(spark, df, dir, numMerges = 4)
    val fromArt = WordPiece.mergesFromArtifact(spark, dir).collect().map(_.toSeq).toSeq
    val live = WordPiece.learnMerges(df, numMerges = 4).collect().map(_.toSeq).toSeq
    assert(fromArt == live)
    // reuse: second ensure must not rewrite (data file mtimes unchanged)
    val dataFiles = new java.io.File(s"$dir/data").listFiles().filter(_.getName.endsWith(".parquet"))
    val mtimes = dataFiles.map(f => (f.getName, f.lastModified())).toMap
    WordPiece.ensureMergeArtifact(spark, df, dir, numMerges = 4)
    dataFiles.foreach(f => assert(f.lastModified() == mtimes(f.getName), "must reuse, not retrain"))
    // param change invalidates
    WordPiece.ensureMergeArtifact(spark, df, dir, numMerges = 5)
    assert(WordPiece.mergesFromArtifact(spark, dir).count() == 5)
  }

  test("artifact alphabet + vocab equal the live corpus-scan path") {
    val dir = java.nio.file.Files.createTempDirectory("wp_art2").toString
    val df = Seq((1L, "scan merge scan merge join zoo")).toDF("doc_id", "text")
    WordPiece.ensureMergeArtifact(spark, df, dir, numMerges = 3)
    assert(WordPiece.alphabetFromArtifact(spark, dir) ==
      WordPiece.alphabetOf(df))
    assert(WordPiece.vocabFromArtifact(spark, dir) ==
      WordPiece.vocabWithIds(WordPiece.alphabetOf(df),
        WordPiece.learnMerges(df, numMerges = 3).collect()
          .map(r => (r.getString(1), r.getString(2))).toSeq))
  }

  test("ext vocab fixture regenerates byte-identical from its committed generator") {
    val resource = {
      val in = getClass.getResourceAsStream("/graft/wp/ext_vocab.txt")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(resource == graft.tools.GenWpVocab.fixtureText(),
      "fixture drifted from its generator — rerun graft.tools.GenWpVocab")
  }

  test("in-memory fixture trainer equals the Spark trainer on the same corpus") {
    val texts = Seq(
      "scan merge scan merge join group", "filter scan join merge order")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sparkMerges = WordPiece.learnMerges(df, numMerges = 10)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val wc = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }.toSeq
    assert(graft.tools.GenWpVocab.sequentialWordPiece(wc, 10) == sparkMerges,
      "the fixture generator's trainer must be the spec-pinned likelihood trainer")
  }

  test("tokenIdsExternal: ids come from the FILE's layout, not the training constants") {
    val vocab = WordPiece.externalFixtureVocab()
    // the fixture deliberately parks [UNK]/[CLS]/[SEP] at 11/12/13
    assert(vocab.collectFirst { case ("[UNK]", i) => i }.get == 11)
    assert(vocab.collectFirst { case ("[CLS]", i) => i }.get == 12)
    assert(vocab.collectFirst { case ("[SEP]", i) => i }.get == 13)
    val df = Seq((1L, "scan merge zzz")).toDF("doc_id", "text")
    val ids = WordPiece.tokenIdsExternal(df, vocab)
      .select(col("token_ids")).head().getSeq[Int](0)
    assert(ids.head == 12 && ids.last == 13, s"[CLS]/[SEP] frame from the file: $ids")
    assert(ids.contains(11), s"'zzz' (z not in fixture alphabet) -> file [UNK] id: $ids")
    assert(!ids.exists(i => i >= 1 && i <= 4),
      s"no id from the internal specials block may appear: $ids")
    // bracketed entries ([unusedN] included) are never greedy candidates
    assert(!WordPiece.matchPiecesExternal(vocab).exists(p =>
      p.startsWith("[") && p.endsWith("]")))
  }

  test("alphabet/vocab sort is UTF-8 byte order (cross-engine collation pin)") {
    // above the BMP, UTF-16 and UTF-8 orders DISAGREE: U+FFFD sorts
    // below U+1F30D (a surrogate pair) in UTF-8 byte order, but Scala's
    // default String ordering puts the surrogate lead (0xD83C) first.
    val hi = "🌍" // U+1F30D, UTF-8 f0 9f 8c 8d
    val lo = "�"       // UTF-8 ef bf bd
    assert(Ordering.String.compare(hi, lo) < 0, "UTF-16 order (sanity)")
    assert(WordPiece.utf8Order.compare(lo, hi) < 0, "UTF-8 order")
    val v = WordPiece.vocabWithIds(Seq(hi, lo, "a"), Nil)
    assert(v.drop(5).map(_._1) == Seq("a", lo, hi),
      s"alphabet ids must follow UTF-8 byte order, got ${v.drop(5)}")
  }
}
