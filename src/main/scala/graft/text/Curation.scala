package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** End-to-end training-corpus curation: the standard pretraining filter
  * chain, composed from the engine's own operators (charter extension —
  * the reference has no text surface at all, SURVEY §2.4).
  *
  * Stages, in the order a 100 TB pipeline wants them (cheap narrow
  * filters first so the expensive candidate joins see the smallest
  * possible corpus):
  *
  *  1. language gate  — [[TextAnalysis.languageId]] (per-row, no shuffle)
  *  2. quality gate   — [[TextAnalysis.qualityScore]] ≥ `minQuality`
  *                      (per-row, no shuffle)
  *  3. exact dedup    — [[Dedup.dedupExact]] keep-lowest-id per content
  *                      hash (one skew-free shuffle on the 16-byte md5)
  *  4. near-dup dedup — [[Dedup.ngramJaccardPairs]] over survivors
  *                      (bucketed shared-shingle candidate join), closed
  *                      into duplicate clusters by
  *                      [[Dedup.connectedComponents]] (O(log d) join
  *                      rounds); every cluster keeps its minimum id
  *
  * The final keep-set subtracts cluster losers with a left-anti join.
  * The loser side is a bare id list (one long per dropped near-dup), so
  * AQE flips the statically-planned sort-merge join to broadcast at
  * runtime once the true size is known (plan-audit-pinned); if a corpus
  * ever produced more loser ids than a broadcast can hold, the adaptive
  * plan falls back to the shuffled anti-join rather than failing.
  */
object Curation {

  def curate(
      docs: DataFrame,
      lang: String = "en",
      minQuality: Double = 0.5,
      minJaccard: Double = 0.3,
      maxShingleDf: Long = 500L,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val gated = docs.filter(
      TextAnalysis.languageId(col(textCol)) === lang &&
        TextAnalysis.qualityScore(col(textCol)) >= minQuality)
    // three consumers (pair self-join sides share one subplan, but the
    // closure loop and the final anti-join would each re-run the gate +
    // dedup chain) — materialize the survivors once; at cluster scale
    // swap for a reliable checkpoint or an intermediate parquet write
    val exact = Dedup.dedupExact(gated, idCol, textCol).localCheckpoint()
    val pairs = Dedup
      .ngramJaccardPairs(exact, n = 3, minJaccard = minJaccard,
        idCol = idCol, textCol = textCol, maxShingleDf = maxShingleDf)
      .select("id_a", "id_b")
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    exact.join(losers, Seq(idCol), "left_anti")
  }
}
