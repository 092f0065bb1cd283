package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HfTokenizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parse pins the layout against handcrafted JSON (both merge formats)") {
    val classic = """{
      "model": {"type": "BPE",
        "vocab": {"a": 0, "b": 1, "ab": 7},
        "merges": ["a b"]},
      "added_tokens": [{"id": 9, "content": "<|endoftext|>", "special": true}],
      "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": false}
    }"""
    val m = HfTokenizer.parse(classic)
    assert(m.vocab == Seq(("a", 0), ("b", 1), ("ab", 7)))
    assert(m.merges == Seq(("a", "b")))
    assert(m.added == Seq(("<|endoftext|>", 9)))
    assert(m.addedId("<|endoftext|>").contains(9))
    assert(m.vocabIds.toMap.apply("<|endoftext|>") == 9)
    // tokenizers 0.20+ pair layout parses identically
    val pairs = classic.replace("[\"a b\"]", "[[\"a\", \"b\"]]")
    assert(HfTokenizer.parse(pairs).merges == Seq(("a", "b")))
  }

  test("foreign pipelines and malformed content reject loudly") {
    def base(model: String, pre: String = "{\"type\": \"ByteLevel\"}") =
      s"""{"model": $model, "pre_tokenizer": $pre}"""
    // non-BPE model
    intercept[IllegalArgumentException] {
      HfTokenizer.parse(base("""{"type": "WordPiece", "vocab": {}, "merges": []}"""))
    }
    // non-ByteLevel pre_tokenizer (Whitespace would mis-tokenize here)
    intercept[IllegalArgumentException] {
      HfTokenizer.parse(base(
        """{"type": "BPE", "vocab": {"a": 0}, "merges": []}""",
        """{"type": "Whitespace"}"""))
    }
    // malformed merge line
    intercept[IllegalArgumentException] {
      HfTokenizer.parse(base("""{"type": "BPE", "vocab": {"a": 0}, "merges": ["a b c"]}"""))
    }
    // added token conflicting with the vocab's id for the same piece
    intercept[IllegalArgumentException] {
      HfTokenizer.parse("""{
        "model": {"type": "BPE", "vocab": {"x": 3}, "merges": []},
        "added_tokens": [{"id": 4, "content": "x"}]}""")
    }
    // a Sequence wrapping ByteLevel is accepted (the released layout)
    val seq = HfTokenizer.parse("""{
      "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []},
      "pre_tokenizer": {"type": "Sequence",
        "pretokenizers": [{"type": "ByteLevel"}]}}""")
    assert(seq.vocab == Seq(("a", 0)))
  }

  test("shipped fixture regenerates byte-identical from its committed generator") {
    val resource = {
      val in = getClass.getResourceAsStream("/graft/bpe/ext_tokenizer.json")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(resource == graft.tools.GenHfTokenizer.fixtureText(),
      "fixture drifted from its generator — rerun graft.tools.GenHfTokenizer")
  }

  test("fixture carries the gpt2 file shape: vocab.json conventions + eos in both blocks") {
    val m = HfTokenizer.externalFixture()
    assert(m.merges == ByteLevel.externalFixtureMerges(),
      "fixture merges must be the pinned byte-level list")
    assert(m.vocab == ByteLevel.vocabForMerges(m.merges, Seq(HfTokenizer.EndOfText)),
      "fixture vocab must be the vocab.json conventions over that list")
    assert(m.addedId(HfTokenizer.EndOfText).contains(256 + m.merges.size))
  }

  test("tokenIds through the parsed file equals the native byte-level path end-to-end") {
    val df = Seq(
      (1L, "the window scan"), (2L, "merge join merge"), (3L, "naïve café 🌍"))
      .toDF("doc_id", "text")
    val m = HfTokenizer.externalFixture()
    val viaFile = HfTokenizer.tokenIds(df, m)
      .orderBy("doc_id").select("token_ids")
      .collect().map(_.getSeq[Int](0))
    val native = ByteLevel.tokenIds(df, ByteLevel.externalFixtureMerges(),
        eos = Some(HfTokenizer.EndOfText))
      .orderBy("doc_id").select("token_ids")
      .collect().map(_.getSeq[Int](0))
    assert(viaFile.toSeq.map(_.toSeq) == native.toSeq.map(_.toSeq))
    // every document terminates with the file's eos id
    val eos = m.addedId(HfTokenizer.EndOfText).get
    assert(viaFile.forall(_.last == eos))
  }
}
