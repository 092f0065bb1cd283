package graft.text

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ByteLevelUtil

import graft.SparkTestSession

/** The byte-level BPE construction: the GPT-2 bytes_to_unicode table
  * (identity on printable ranges, 256+n elsewhere — Ġ for space, Ċ for
  * newline), the byte symbolizer kernel, the RE2-compatible
  * pretokenizer, the cross-engine per-code-point split seam, and the
  * coverage report's lossy-vs-lossless story. */
class ByteLevelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("byte map is the GPT-2 table: bijective, identity on printables, Ġ/Ċ markers") {
    val m = ByteLevelUtil.ByteToSym
    assert(m.length == 256)
    assert(m.distinct.length == 256, "mapping must be bijective")
    // printable ranges map to themselves
    assert(m('A'.toInt) == "A" && m('z'.toInt) == "z" && m('~'.toInt) == "~")
    assert(m(0xA1) == "¡" && m(0xFF) == "ÿ")
    // the famous markers: space → Ġ (U+0120), newline → Ċ (U+010A)
    assert(m(' '.toInt) == "Ġ")
    assert(m('\n'.toInt) == "Ċ")
    // every symbol is a single code point below U+0400 (so UTF-8 and
    // UTF-16 orderings agree — the driver-side comparison seam)
    assert(m.forall(s => s.codePointCount(0, s.length) == 1 &&
      s.codePointAt(0) < 0x400))
  }

  private def syms(tok: String): Seq[String] =
    Seq(tok).toDF("t")
      .select(org.apache.spark.sql.graft.VectorExpressions.byteLevelSyms(col("t")))
      .head().getSeq[String](0).toSeq

  test("symbolizer decomposes UTF-8 bytes through the map") {
    // é = 0xC3 0xA9 → Ã © (both in printable keep-ranges)
    assert(syms("é") == Seq("Ã", "©"))
    assert(syms(" it") == Seq("Ġ", "i", "t"))
    // 🌍 is 4 UTF-8 bytes, every one mapped inside the 256-symbol alphabet
    val e = syms("🌍")
    assert(e.length == 4 && e.forall(ByteLevelUtil.ByteToSym.contains))
    assert(syms("") == Seq.empty)
  }

  test("pretokenizer matches the documented GPT-2-minus-lookahead semantics") {
    val got = Seq("Héllo, wörld! it's 42").toDF("text")
      .select(ByteLevel.pretokens(col("text"))).head().getSeq[String](0).toSeq
    assert(got == Seq("Héllo", ",", " wörld", "!", " it", "'s", " 42"))
    // multi-space run = ONE whitespace pretoken (the lookahead-free tail)
    val ws = Seq("a  b").toDF("text")
      .select(ByteLevel.pretokens(col("text"))).head().getSeq[String](0).toSeq
    assert(ws == Seq("a", "  ", "b"))
  }

  test("Spark split-to-chars is per code point (the oracle's string_split seam)") {
    val got = Seq("H🌍x").toDF("t")
      .select(split(col("t"), "")).head().getSeq[String](0).toSeq
    assert(got == Seq("H", "🌍", "x"),
      "split must not cut surrogate pairs — DuckDB string_split('') is per code point")
  }

  test("coverage: byte-level 100%, char-level loses case/structure") {
    val df = Seq((1L, "Ab !🌍")).toDF("doc_id", "text")
    val r = ByteLevel.coverageReport(df).head()
    // distinct non-whitespace chars: A b ! 🌍
    assert(r.getLong(0) == 4L)
    assert(r.getLong(1) == 4L, "every char must decompose into the byte alphabet")
    // 'A' is lowercased away by the char-level normalizer
    assert(r.getLong(2) == 3L)
    assert(r.getDouble(3) == 100.0)
  }

  test("byte-level fixture regenerates from its generator; non-disjoint with space merges") {
    val resource = {
      val in = getClass.getResourceAsStream("/graft/bpe/ext_merges_bytelevel.txt")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(resource == graft.tools.GenExtMerges.byteLevelFixtureText(),
      "byte-level fixture drifted from its generator")
    val merges = ByteLevel.externalFixtureMerges()
    assert(merges.size >= 1000)
    assert(merges.exists(p => p._1.contains("Ġ") || p._2.contains("Ġ")),
      "a GPT-2-style list must carry space-marker merges")
    assert(merges.zipWithIndex.exists { case ((a, b), i) =>
      merges.take(i).exists { case (pa, pb) => pa + pb == a || pa + pb == b }
    }, "fixture must be non-disjoint (later rules consume earlier outputs)")
  }

  test("byte-level ranked apply tokenizes raw text losslessly through the priority loop") {
    val df = Seq((1L, "fast scan"), (2L, "It's Fast!")).toDF("doc_id", "text")
    val out = ByteLevel.applyMergesRanked(df, ByteLevel.externalFixtureMerges(),
        maxIters = 24)
      .orderBy("doc_id").collect()
    val toks1 = out(0).getSeq[String](1)
    // lossless: concatenating subwords recovers the byte-mapped text
    assert(toks1.mkString == "fastĠscan",
      s"subwords must reassemble to the mapped input, got $toks1")
    // the fixture's trained rules actually fire (fewer symbols than bytes)
    assert(toks1.length < "fast scan".length)
    val toks2 = out(1).getSeq[String](1)
    assert(toks2.mkString == "It'sĠFast!", s"case/punct must survive, got $toks2")
  }

  test("vocab id table: base bytes 0-255, merges 256+rank, first rank wins duplicates") {
    val vocab = ByteLevel.vocabForMerges(Seq(("a", "bc"), ("ab", "c"), ("x", "y")))
    val m = vocab.toMap
    assert(m("A") == 'A'.toInt && m("Ġ") == 32)
    assert(m("abc") == 256, "first rule producing 'abc' owns the id")
    assert(m("xy") == 258)
    assert(vocab.size == 256 + 2, "duplicate merge output must not add a second id")
    // every symbol has exactly one id
    assert(vocab.map(_._1).distinct.size == vocab.size)
  }

  test("tokenIds maps every emitted subword; ids reassemble losslessly corpus-wide") {
    val merges = ByteLevel.externalFixtureMerges()
    val df = Seq((1L, "fast scan"), (2L, "It's Fast! 🌍"), (3L, "你好 café"))
      .toDF("doc_id", "text")
    val ids = ByteLevel.tokenIds(df, merges, maxIters = 24)
      .orderBy("doc_id").collect()
    // no subword may miss the vocab (null id)
    ids.foreach(r => assert(!r.getSeq[Integer](1).contains(null),
      s"unmapped subword in ${r.getSeq[Integer](1)}"))
    // corpus-wide lossless reassembly: decoding ids through the reverse
    // vocab and unmapping bytes recovers the ORIGINAL raw text
    val rev = ByteLevel.vocabForMerges(merges).map(_.swap).toMap
    val symToByte = org.apache.spark.sql.graft.ByteLevelUtil.ByteToSym
      .zipWithIndex.map { case (s, b) => (s, b.toByte) }.toMap
    val texts = df.orderBy("doc_id").collect().map(_.getString(1))
    ids.zip(texts).foreach { case (r, original) =>
      val bytes = r.getSeq[Integer](1)
        .flatMap(id => rev(id.intValue()).split("").filter(_.nonEmpty).map(symToByte))
      assert(new String(bytes.toArray, "UTF-8") == original,
        s"ids must decode back to the raw text: '$original'")
    }
  }

  test("EOS special token: vocab-final id, appended once per document") {
    val merges = ByteLevel.externalFixtureMerges()
    val vocab = ByteLevel.vocabForMerges(merges, Seq("<|endoftext|>"))
    // GPT-2's convention: specials take the ids after the merge block
    assert(vocab.toMap.apply("<|endoftext|>") == vocab.size - 1)
    intercept[IllegalArgumentException] {
      ByteLevel.vocabForMerges(merges, Seq("a")) // collides with a base symbol
    }
    // specials offset by the TOTAL rule count, not the deduped output
    // count: with duplicate-output rules (("a","bc") and ("ab","c")
    // both yield "abc") the id must still be 256 + nMerges + k — the
    // convention upstream vocab files encode
    val dupVocab = ByteLevel.vocabForMerges(
      Seq(("a", "bc"), ("ab", "c")), Seq("<|endoftext|>"))
    assert(dupVocab.toMap.apply("abc") == 256,
      "first rank wins for a duplicated output")
    assert(dupVocab.toMap.apply("<|endoftext|>") == 256 + 2,
      "special ids offset by total merge count, unshifted by duplicate outputs")
    val df = Seq((1L, "fast scan"), (2L, "hash join")).toDF("doc_id", "text")
    val plain = ByteLevel.tokenIds(df, merges, maxIters = 24)
      .orderBy("doc_id").collect().map(_.getSeq[Integer](1))
    val withEos = ByteLevel.tokenIds(df, merges, maxIters = 24,
        eos = Some("<|endoftext|>"))
      .orderBy("doc_id").collect().map(_.getSeq[Integer](1))
    val eosId = vocab.toMap.apply("<|endoftext|>")
    plain.zip(withEos).foreach { case (p, e) =>
      assert(e == p :+ Integer.valueOf(eosId),
        "eos must append exactly one terminator per document")
    }
  }

  test("detokenize inverts tokenIds; foreign/special ids decode to null, not partial text") {
    val merges = ByteLevel.externalFixtureMerges()
    val df = Seq((1L, "fast scan"), (2L, "It's Fast! 🌍 café 你好"))
      .toDF("doc_id", "text")
    val rt = ByteLevel.detokenize(ByteLevel.tokenIds(df, merges), merges)
      .join(df, "doc_id").orderBy("doc_id").collect()
    rt.foreach(r => assert(r.getString(1) == r.getString(2),
      s"round-trip must be lossless: '${r.getString(1)}' vs '${r.getString(2)}'"))
    // an id outside the vocabulary (or a null element) → null decode
    val bad = Seq((1L, Seq[Integer](65, 999999)), (2L, Seq[Integer](65, null)))
      .toDF("doc_id", "token_ids")
    val got = ByteLevel.detokenize(bad, merges).orderBy("doc_id").collect()
    assert(got.forall(_.isNullAt(1)), "foreign/null ids must decode to null")
    // a special token decodes to its literal text (HF decode-with-
    // specials semantics: "<|endoftext|>"'s chars are all in the byte
    // alphabet and unmap to themselves)
    val eosId = ByteLevel.vocabForMerges(merges, Seq("<|endoftext|>"))
      .toMap.apply("<|endoftext|>")
    val withEos = Seq((1L, Seq(65, eosId))).toDF("doc_id", "token_ids")
    assert(ByteLevel.detokenize(withEos, merges, specials = Seq("<|endoftext|>"))
      .head().getString(1) == "A<|endoftext|>")
  }

  test("50k-rule production-size list: deterministic, rank-valid, lossless tokenIds") {
    val big = graft.tools.GenExtMerges.syntheticRankedByteLevel(50000)
    assert(big.size == 50000)
    assert(big == graft.tools.GenExtMerges.syntheticRankedByteLevel(50000),
      "generation must be deterministic")
    assert(big.distinct.size == big.size, "ranks must be unambiguous")
    assert(big.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty && !a.contains(' ') && !b.contains(' ') },
      "symbols must keep the merges.txt line format valid")
    // it extends the shipped trained fixture in rank order
    assert(big.take(ByteLevel.externalFixtureMerges().size) ==
      ByteLevel.externalFixtureMerges())
    // loadMergesTxt round-trips all 50k ranks through the user format
    val f = java.nio.file.Files.createTempFile("merges50k_spec", ".txt")
    java.nio.file.Files.writeString(f, "#version: 0.2\n" +
      big.map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n"))
    assert(Bpe.loadMergesTxt(f.toString) == big)
    // tokenIds at the 50k vocab (hashed probes on both maps): every
    // subword mapped, ids decode back to the raw text
    val df = Seq((1L, "fast scan join"), (2L, "It's Big-Data! 🌍 café"))
      .toDF("doc_id", "text")
    val ids = ByteLevel.tokenIds(df, big).orderBy("doc_id").collect()
    ids.foreach(r => assert(!r.getSeq[Integer](1).contains(null)))
    val rev = ByteLevel.vocabForMerges(big).map(_.swap).toMap
    val symToByte = ByteLevelUtil.ByteToSym
      .zipWithIndex.map { case (s, b) => (s, b.toByte) }.toMap
    val texts = df.orderBy("doc_id").collect().map(_.getString(1))
    ids.zip(texts).foreach { case (r, original) =>
      val bytes = r.getSeq[Integer](1)
        .flatMap(id => rev(id.intValue()).split("").filter(_.nonEmpty).map(symToByte))
      assert(new String(bytes.toArray, "UTF-8") == original)
    }
  }

  test("byte-level training learns raw-text structure the char path cannot see") {
    val df = Seq.tabulate(30)(i => (i.toLong, "It's low-cost! It's low-risk!"))
      .toDF("doc_id", "text")
    val merges = ByteLevel.learnMergesBatched(df, rounds = 3, batchSize = 8)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.nonEmpty)
    val alphabetUsed = merges.flatMap(p => (p._1 + p._2).toSeq).toSet
    // the learned rules operate over byte symbols that include the
    // space marker and preserved case — unreachable for the
    // normalized char-level trainer
    assert(alphabetUsed.contains('Ġ') || merges.exists(_._1 == "Ġ"),
      s"expected the Ġ space marker in learned rules, got ${merges.take(8).mkString(",")}")
  }
}
