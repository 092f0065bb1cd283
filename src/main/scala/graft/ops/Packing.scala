package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget bins
  * (context windows) for training-batch construction.
  *
  * Bin packing is inherently sequential — each placement depends on the
  * running fill — so a single global greedy pass cannot distribute. The
  * scale design is two-level: documents hash deterministically into
  * `nParts` logical parts (pure function of the id, no data skew), and
  * each part is packed independently by a greedy in-id-order scan. Bins
  * are keyed (part, bin_idx); parts never interact, so the job is
  * embarrassingly parallel and adding executors splits the work without
  * changing ANY assignment — the same property that makes the DuckDB
  * oracle possible (a per-part recursive recurrence reproduces every
  * bin id exactly).
  *
  * The per-part scan is the one genuinely imperative loop in the engine,
  * so it uses `mapPartitions` (charter: last resort, justified here —
  * a running-fill recurrence is not window-expressible). Rows arrive
  * sorted via `sortWithinPartitions`; a Spark partition may carry
  * several logical parts (hash collisions mod the partition count), so
  * the scan resets its state on every part boundary — assignments
  * depend only on the logical part, never on the physical task layout.
  *
  * Packing rule (mirrored by the oracle): docs in ascending id order;
  * a doc joins the current bin iff `fill + n_tokens ≤ budget`, else it
  * opens the next bin. A doc larger than the budget gets a bin of its
  * own (it opens a bin, and the next doc necessarily overflows it).
  */
object Packing {

  def packGreedy(
      docs: DataFrame,
      budget: Long,
      nParts: Int = 32,
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withPart = docs.select(
      col(idCol).cast("long").as("id"),
      // the shared parity-critical deviate (Sampling.hashDeviate) mod
      // the part count — salt-free, mirrored by the seq_pack oracle
      pmod(Sampling.hashDeviate(col(idCol), salt = ""), lit(nParts.toLong))
        .cast("int").as("part"),
      col(tokensCol).cast("long").as("n_tokens"))
    withPart
      .repartition(nParts, col("part"))
      .sortWithinPartitions(col("part"), col("id"))
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        var curPart = -1
        var bin = 0L
        var fill = 0L
        it.map { case (id, part, tok) =>
          if (part != curPart) { curPart = part; bin = 0L; fill = tok }
          else if (fill + tok <= budget) { fill += tok }
          else { bin += 1; fill = tok }
          (id, part, bin)
        }
      }
      .toDF(idCol, "part", "bin_idx")
  }

  /** Materialize the packed TRAINING SEQUENCES: join a [[packGreedy]]
    * assignment back to the document text and concatenate each bin's
    * docs in ascending id order with `sep` — the step that actually
    * emits what a trainer reads. One shuffle on (part, bin_idx); the
    * in-order concat is the chunkDedup reassembly pattern (array_sort
    * over (id, text) structs, then a field projection). Bins are
    * token-budget bounded by construction, so no group's packed string
    * can exceed budget × max-token-length — the agg state is bounded. */
  def packText(
      assignments: DataFrame,
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      sep: String = "\n"): DataFrame =
    assignments
      .join(docs.select(col(idCol), col(textCol)), Seq(idCol))
      .groupBy(col("part"), col("bin_idx"))
      .agg(
        count(lit(1)).as("n_docs"),
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol))).as("packed_text"))
}
