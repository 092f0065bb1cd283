package graft.tools

/** Deterministic generator for the tokenizer.json fixture
  * (`graft/bpe/ext_tokenizer.json`): the byte-level fixture merge
  * list ([[GenExtMerges.byteLevelFixtureText]] — already
  * byte-compare-pinned) wrapped in the HuggingFace tokenizers
  * single-file layout a GPT-2-family repo ships — `model.vocab` under
  * the vocab.json conventions (bytes 0–255, merge outputs 256+rank,
  * first rank wins), classic `"lhs rhs"` merge strings, a ByteLevel
  * pre_tokenizer/decoder block, and `<|endoftext|>` as an
  * added token present in BOTH vocab and added_tokens (exactly how
  * the released gpt2 file carries it). Jackson serialization over
  * insertion-ordered nodes — pure function of the merge list, no RNG,
  * no clock; a spec re-runs this and byte-compares the committed
  * fixture. */
object GenHfTokenizer {

  def fixtureText(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("version", "1.0")

    // the committed byte-level merge fixture (itself byte-compare-
    // pinned against GenExtMerges.byteLevelFixtureText)
    val merges = graft.text.ByteLevel.externalFixtureMerges()
    val vocab = graft.text.ByteLevel.vocabForMerges(
      merges, Seq(graft.text.HfTokenizer.EndOfText))

    val addedArr = root.putArray("added_tokens")
    val eosId = vocab.toMap.apply(graft.text.HfTokenizer.EndOfText)
    val eosNode = addedArr.addObject()
    eosNode.put("id", eosId)
    eosNode.put("content", graft.text.HfTokenizer.EndOfText)
    eosNode.put("special", true)

    val pre = root.putObject("pre_tokenizer")
    pre.put("type", "ByteLevel")
    pre.put("add_prefix_space", false)
    val dec = root.putObject("decoder")
    dec.put("type", "ByteLevel")

    val model = root.putObject("model")
    model.put("type", "BPE")
    val vocabNode = model.putObject("vocab")
    vocab.foreach { case (p, i) => vocabNode.put(p, i) }
    val mergesArr = model.putArray("merges")
    merges.foreach { case (a, b) => mergesArr.add(s"$a $b") }

    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root) + "\n"
  }

  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0)
      else "src/main/resources/graft/bpe/ext_tokenizer.json"
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(f), "UTF-8")
    try w.write(fixtureText()) finally w.close()
    println(s"wrote $path")
  }
}
