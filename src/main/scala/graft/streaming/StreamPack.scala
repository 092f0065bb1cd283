package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming sequence packing with CARRYOVER — the trainer-feed bin
  * packer ([[graft.ops.Packing.packGreedy]]) as a continuous operator:
  * documents stream in, bins fill across micro-batch boundaries, and a
  * batch's last partially-filled bin is NOT flushed — its cursor (bin
  * index, running fill) persists in the checkpointed state store and
  * the next batch keeps filling it. Without carryover every
  * micro-batch would seal its tail bin early and a months-long crawl
  * would emit one under-filled context window per part per trigger —
  * padding waste that compounds exactly at scale.
  *
  * The state is `flatMapGroupsWithState` keyed by the LOGICAL PART
  * (the same salt-free id-hash parts as the batch packer): two longs
  * per part, bounded forever, no timeout (a pack cursor never
  * expires). Within a batch each part's documents pack in ascending
  * id; across batches they pack in ARRIVAL order — the streaming
  * contract. When arrival order is globally ascending by id the
  * result is bit-identical to the batch [[graft.ops.Packing.packGreedy]]
  * (spec-pinned, and how the declared query sits under the batch
  * oracle).
  *
  * 100 TB shape: one groupByKey shuffle per micro-batch on the part
  * key (nParts cells — no skew, the parts are hash-uniform); state
  * traffic is 16 bytes per part per trigger. The packing rule is the
  * batch packer's exactly: join the current bin iff fill + n ≤ budget,
  * else open the next. */
object StreamPack {

  final case class DocTokens(doc_id: Long, part: Int, n_tokens: Long)
  final case class PackState(bin: Long, fill: Long)
  final case class Assignment(doc_id: Long, part: Int, bin_idx: Long)

  /** The stateful packing operator over a pre-keyed stream. */
  def assignments(
      docs: Dataset[DocTokens],
      budget: Long): Dataset[Assignment] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .groupByKey(_.part)
      .flatMapGroupsWithState[PackState, Assignment](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (part, rows, state: GroupState[PackState]) =>
          val sorted = rows.toIndexedSeq.sortBy(_.doc_id)
          var cur = state.getOption
          val out = sorted.map { r =>
            cur = cur match {
              case None =>
                Some(PackState(0L, r.n_tokens))
              case Some(PackState(b, f)) if f + r.n_tokens <= budget =>
                Some(PackState(b, f + r.n_tokens))
              case Some(PackState(b, _)) =>
                Some(PackState(b + 1, r.n_tokens))
            }
            Assignment(r.doc_id, part, cur.get.bin)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** Wire a documents stream (doc_id, text, …) through token counting
    * and the stateful packer into a parquet sink. Parts and token
    * counts are the batch packer's exact expressions, so an
    * id-ascending stream reproduces [[graft.ops.Packing.packGreedy]]
    * bit-for-bit. */
  def streamingPackIds(
      stream: DataFrame,
      sinkDir: String,
      checkpoint: String,
      budget: Long = 256L,
      nParts: Int = 8): StreamingQuery = {
    val spark = stream.sparkSession
    import spark.implicits._
    val keyed = stream.select(
        col("doc_id").cast("long").as("doc_id"),
        pmod(graft.ops.Sampling.hashDeviate(col("doc_id"), salt = ""),
          lit(nParts.toLong)).cast("int").as("part"),
        graft.text.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      .as[DocTokens]
    assignments(keyed, budget)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
