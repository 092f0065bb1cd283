package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT (instruction-tuning) data preparation: chat-template framing +
  * LOSS MASKING over real tokenizer ids — the step every fine-tuning
  * pipeline runs between raw conversations and trainer feed (the
  * "train on assistant tokens only" convention: completion-only loss,
  * as in the published InstructGPT / FLAN recipes and every deployed
  * SFT trainer's `DataCollatorForCompletionOnlyLM` shape).
  *
  * A conversation is a sequence of role-alternating turns. Each turn
  * is tokenized SEPARATELY (the production rule — tokenizing the
  * rendered transcript as one string lets content bleed across
  * message boundaries and breaks the mask alignment), framed by a
  * role-marker special id, concatenated in turn order, terminated by
  * EOS. The loss mask is 1 exactly on assistant CONTENT ids — role
  * markers, user content, and the terminator all mask to 0.
  *
  * Special ids follow the HF added-token convention: appended after
  * the base vocabulary block, so content ids are identical with or
  * without the specials and the markers can never collide with a
  * merge-derived id.
  *
  * 100 TB shape: the turn explode is a narrow map (no shuffle); turn
  * tokenization rides the distinct-pretoken word cache of the ranked
  * BPE kernel ([[ByteLevel.tokenIdsWith]] — one codegen pass per
  * DISTINCT pretoken, hashed O(1) id probes); re-assembly is ONE
  * per-conversation groupBy (the one shuffle), with masks built as
  * array expressions — no UDF anywhere.
  *
  * The fixtures have no conversation column, so [[turns]] derives a
  * deterministic conversation from each document (fixed-length
  * whitespace-token windows, roles alternating user-first) — the same
  * synthesize-from-the-corpus device the multimodal fixtures use. The
  * framing/masking machinery downstream of the turn table is the real
  * operator surface.
  */
object Sft {

  val Eos = "<|endoftext|>"
  val UserMark = "<|user|>"
  val AssistantMark = "<|assistant|>"

  /** Deterministic turn table: (idCol, turn_idx, turn_text) — the
    * normalized token stream in `turnLen`-token windows, roles
    * alternating user-first (turn_idx % 2 = 1 → assistant). A
    * document with no tokens still yields its one empty user turn, so
    * every conversation survives to the framed output. */
  def turns(
      df: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      turnLen: Int = 8): DataFrame = {
    require(turnLen >= 1, s"turnLen must be >= 1, got $turnLen")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col(idCol), posexplode(
        transform(
          sequence(lit(0),
            floor((size(col("toks")) - lit(1)) / lit(turnLen)).cast("int")),
          k => array_join(
            slice(col("toks"), k * lit(turnLen) + lit(1), lit(turnLen)), " ")))
        .as(Seq("turn_idx", "turn_text")))
  }

  /** Framed ids + completion-only loss mask per conversation:
    * (idCol, token_ids, loss_mask), |token_ids| = |loss_mask|,
    * mask ∈ {0,1} with 1 exactly on assistant-content positions.
    * `keyStride` bounds turns per conversation (the surrogate turn
    * key is idCol·stride + turn_idx). */
  def maskedTokenIds(
      df: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text",
      turnLen: Int = 8,
      keyStride: Long = 1000000L,
      broadcastVocab: Boolean = true): DataFrame = {
    val vocabIds = ByteLevel.vocabForMerges(merges, Seq(Eos, UserMark, AssistantMark))
    val vm = vocabIds.toMap
    val eosId = vm(Eos)
    val uId = vm(UserMark)
    val aId = vm(AssistantMark)
    val t = turns(df, idCol, textCol, turnLen)
      .withColumn("sid", col(idCol).cast("long") * lit(keyStride) + col("turn_idx"))
    // turn tokenization over the surrogate key; a turn with no
    // pretokens (empty doc) has no ids row — restored as [] by the
    // left join so the conversation still gets framed
    val ids = ByteLevel.tokenIdsWith(
        t.select(col("sid"), col("turn_text")), merges, vocabIds, eosId = None,
        idCol = "sid", textCol = "turn_text", broadcastVocab = broadcastVocab)
      .select(col("sid"), col("token_ids"))
    t.select(col(idCol), col("turn_idx"), col("sid"))
      .join(ids, Seq("sid"), "left")
      .withColumn("tids", coalesce(col("token_ids"), typedLit(Array.empty[Int])))
      .withColumn("is_a", pmod(col("turn_idx"), lit(2)) === lit(1))
      .withColumn("turn_ids",
        concat(array(when(col("is_a"), lit(aId)).otherwise(lit(uId))), col("tids")))
      .withColumn("turn_mask",
        concat(array(lit(0)),
          transform(col("tids"), _ => when(col("is_a"), lit(1)).otherwise(lit(0)))))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(
        struct(col("turn_idx"), col("turn_ids").as("ti"), col("turn_mask").as("tm"))))
        .as("ts"))
      .select(col(idCol),
        concat(flatten(transform(col("ts"), x => x.getField("ti"))),
          array(lit(eosId))).as("token_ids"),
        concat(flatten(transform(col("ts"), x => x.getField("tm"))),
          array(lit(0))).as("loss_mask"))
  }
}
