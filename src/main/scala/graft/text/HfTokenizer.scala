package graft.text

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** Minimal reader for the `tokenizer.json` serialization (the
  * HuggingFace tokenizers library's public single-file layout — the
  * third bring-your-own-tokenizer format this engine loads, next to
  * GPT-2's `merges.txt` ([[Bpe.loadMergesTxt]]) and SentencePiece's
  * `.model` proto ([[Unigram]] via SpModel)). Covers the BYTE-LEVEL
  * BPE subset every GPT-2/RoBERTa-family file uses:
  *
  *  - `model.type == "BPE"`, `model.vocab` — the authoritative
  *    piece → id object — and `model.merges`, rank-ordered, either
  *    `"lhs rhs"` strings (classic) or `[lhs, rhs]` pairs (the
  *    tokenizers 0.20+ layout); both parse.
  *  - `added_tokens` — (id, content) specials like `<|endoftext|>`.
  *  - `pre_tokenizer`/`decoder`, when present, must be `ByteLevel`
  *    (possibly under a `Sequence`) — any other pipeline is REJECTED
  *    loudly rather than silently mis-tokenized with this engine's
  *    byte-level pretokenization.
  *
  * Apply rides the existing production kernels unchanged:
  * [[ByteLevel.tokenIdsWith]] — one ranked-priority codegen pass per
  * DISTINCT pretoken, ids through a hashed O(1) probe of the FILE's
  * own vocab map (never re-derived from rank conventions). */
object HfTokenizer {

  /** A parsed byte-level BPE tokenizer.json: `vocab` in file order,
    * `merges` in rank order, `added` (content, id) specials. */
  final case class BpeModel(
      vocab: Seq[(String, Int)],
      merges: Seq[(String, String)],
      added: Seq[(String, Int)]) {

    /** The id table for segmentation output: the file's vocab plus
      * any added token not already in it (real GPT-2 files carry
      * `<|endoftext|>` in BOTH; the vocab entry wins, and a
      * conflicting duplicate id is rejected at parse). */
    def vocabIds: Seq[(String, Int)] = {
      val have = vocab.map(_._1).toSet
      vocab ++ added.filterNot { case (p, _) => have(p) }
    }

    /** The added token named `content`'s id, if present. */
    def addedId(content: String): Option[Int] =
      added.collectFirst { case (p, i) if p == content => i }
        .orElse(vocab.collectFirst { case (p, i) if p == content => i })
  }

  /** The conventional GPT-2 document terminator. */
  val EndOfText = "<|endoftext|>"

  private def rejectPipeline(node: com.fasterxml.jackson.databind.JsonNode,
      field: String): Unit = {
    if (node.isMissingNode || node.isNull) return
    val t = node.path("type").asText("")
    t match {
      case "ByteLevel" => ()
      case "Sequence" =>
        node.path("pretokenizers").elements().asScala
          .foreach(rejectPipeline(_, field))
        node.path("decoders").elements().asScala
          .foreach(rejectPipeline(_, field))
      case other => throw new IllegalArgumentException(
        s"unsupported $field '$other' — this engine implements the ByteLevel pipeline only")
    }
  }

  /** Parse a tokenizer.json string. Fails loudly on: non-BPE model,
    * malformed merges, duplicate vocab pieces, an added token whose id
    * conflicts with the vocab's entry for the same piece, or a
    * non-ByteLevel pre_tokenizer/decoder. */
  def parse(json: String): BpeModel = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val model = root.path("model")
    val mtype = model.path("type").asText("")
    require(mtype == "BPE", s"unsupported model.type '$mtype' — expected BPE")
    rejectPipeline(root.path("pre_tokenizer"), "pre_tokenizer")
    rejectPipeline(root.path("decoder"), "decoder")

    val vocabNode = model.path("vocab")
    require(vocabNode.isObject, "model.vocab must be a piece -> id object")
    val vocab = vocabNode.properties().asScala.toSeq.map { e =>
      require(e.getValue.isIntegralNumber,
        s"vocab id for '${e.getKey}' is not an integer")
      (e.getKey, e.getValue.asInt())
    }
    require(vocab.map(_._1).distinct.length == vocab.length,
      "duplicate piece in model.vocab")

    val mergesNode = model.path("merges")
    require(mergesNode.isArray, "model.merges must be an array")
    val merges = mergesNode.elements().asScala.toSeq.map { m =>
      if (m.isTextual) {
        val parts = m.asText().split(" ", -1)
        require(parts.length == 2 && parts.forall(_.nonEmpty),
          s"malformed merge line '${m.asText()}'")
        (parts(0), parts(1))
      } else if (m.isArray && m.size() == 2)
        (m.get(0).asText(), m.get(1).asText())
      else throw new IllegalArgumentException(
        s"malformed merge entry $m — expected 'lhs rhs' or [lhs, rhs]")
    }

    val vocabMap = vocab.toMap
    val added = root.path("added_tokens").elements().asScala.toSeq.map { t =>
      val content = t.path("content").asText()
      val id = t.path("id").asInt()
      require(content.nonEmpty, "added_token without content")
      vocabMap.get(content).foreach(v => require(v == id,
        s"added token '$content' id $id conflicts with vocab id $v"))
      (content, id)
    }
    BpeModel(vocab, merges, added)
  }

  /** Load a tokenizer.json from disk — the BYO entry point. */
  def load(path: String): BpeModel = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.mkString) finally src.close()
  }

  /** The shipped fixture (GPT-2-layout tokenizer.json over the
    * byte-level fixture merge list, `<|endoftext|>` added token),
    * generated deterministically by `graft.tools.GenHfTokenizer` and
    * byte-compare-pinned by spec. */
  def externalFixture(): BpeModel = {
    val in = getClass.getResourceAsStream("/graft/bpe/ext_tokenizer.json")
    require(in != null,
      "fixture resource graft/bpe/ext_tokenizer.json not on classpath")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  /** Tokenize to ids under a parsed tokenizer.json: the file's merges
    * through the ranked kernel, the file's vocab map through the
    * hashed probe, `<|endoftext|>` appended per document when the
    * file declares it. */
  def tokenIds(df: DataFrame, model: BpeModel,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastVocab: Boolean = true,
      maxIters: Int = Bpe.AutoIters): DataFrame =
    ByteLevel.tokenIdsWith(df, model.merges, model.vocabIds,
      model.addedId(EndOfText), idCol, textCol, broadcastVocab, maxIters)
}
