package graft.text

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE merge training (Sennrich et al. ACL'16,
  * arXiv:1508.07909): learn the first N byte-pair-encoding merge rules
  * from the corpus — the tokenizer-construction step of every LLM data
  * pipeline (GPT-2/RoBERTa vocabularies are exactly such merge lists).
  *
  * The classic scale trick (Sennrich's own implementation, fastBPE,
  * HuggingFace trainers) is to run merge rounds over the DISTINCT-WORD
  * table, not the corpus: one corpus pass builds (word, count), and
  * every subsequent round costs O(|vocab|), independent of corpus
  * size. This maps exactly onto Spark:
  *
  *  - round 0: tokenize → explode → word counts (the one corpus-sized
  *    aggregation, map-side partial combined), symbolize each word to
  *    its character list + `</w>` end marker;
  *  - each round: adjacent-pair explode over the word table (narrow),
  *    weighted pair counts (vocab-bounded shuffle), a 1-row argmax
  *    `limit(1)` to the driver (count desc, pair asc tie-break), then
  *    a narrow fold that applies the merge greedily left-to-right to
  *    every word's symbol list.
  *
  * The greedy application is a left fold seeded with the first symbol:
  * runs of a self-pair (`a a a a` under merge `(a,a)`) compress to
  * `aa aa` — pairwise, non-overlapping, never re-merging the symbol
  * just created — which string-replace style application gets wrong;
  * the DuckDB oracle replays the identical fold via `list_reduce`.
  * The word table is `localCheckpoint`ed per round so N rounds iterate
  * on a materialized vocab-sized table instead of an N-deep lineage.
  */
object Bpe {

  /** Adjacent symbol pairs of `syms` as (a, b) structs. */
  private def adjacentPairs(syms: Column): Column =
    transform(slice(syms, lit(1), size(syms) - 1),
      (x, i) => struct(x.as("a"), element_at(syms, i + lit(2)).as("b")))

  /** Apply merge (a, b) → ab to a symbol list, greedy left-to-right:
    * fold seeded with the first symbol; a step either merges into the
    * accumulator's last element or appends. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      slice(syms, lit(2), size(syms) - 1),
      array(element_at(syms, 1)),
      (acc, x) => when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Learn the first `numMerges` merge rules. Returns a driver-built
    * DataFrame (merge_rank, lhs, rhs, pair_count) — `numMerges` rows,
    * the artifact a tokenizer consumes. */
  def learnMerges(
      df: DataFrame,
      textCol: String = "text",
      numMerges: Int = 8): DataFrame = {
    val spark = df.sparkSession
    var words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .select(
        concat(split(col("word"), ""), array(lit("</w>"))).as("syms"),
        col("cnt"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= numMerges && !exhausted) {
      val top = words
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r, a, b, n))
        words = words
          .select(applyMerge(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint()
        r += 1
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "lhs", "rhs", "pair_count")
      .orderBy("merge_rank")
  }

  /** Tokenize `textCol` with a learned merge list (the inference half
    * of BPE), via the tokenizer word-cache: the merge folds run once
    * per DISTINCT word — vocab-sized work, the same trick as training
    * — with ONE materialized step per rule ([[applyMerge]] +
    * `localCheckpoint`, the training-round discipline: a nested
    * fold-per-rule expression references its input ~4× per layer, so
    * 6 collapsed layers blow the expression tree up ~4⁶ and measured
    * 30–80 s where this shape takes under a second). Every document's
    * positional words then join the broadcast word→subwords table and
    * re-assemble in position order. Output: (idCol, bpe_tokens).
    * Empty-string tokens (an empty document) carry no subwords and
    * drop out. */
  def applyMerges(df: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    var vocab = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .distinct()
      .select(col("word"),
        concat(split(col("word"), ""), array(lit("</w>"))).as("syms"))
      .localCheckpoint()
    merges.foreach { case (a, b) =>
      vocab = vocab
        .select(col("word"), applyMerge(col("syms"), a, b).as("syms"))
        .localCheckpoint()
    }
    val pos = df
      .select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    pos.join(broadcast(vocab), "word")
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("syms")))),
        x => x.getField("syms"))).as("bpe_tokens"))
  }
}
