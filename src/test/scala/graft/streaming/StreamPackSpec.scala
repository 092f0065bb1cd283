package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.StreamPack.{Assignment, DocTokens}

class StreamPackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def runBatches(budget: Long, batches: Seq[Seq[DocTokens]]): Seq[Assignment] = {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocTokens]
    val name = s"pack_out_${System.nanoTime()}"
    val q = StreamPack.assignments(input.toDS(), budget)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[Assignment].collect().toSeq.sortBy(_.doc_id)
    } finally q.stop()
  }

  test("carryover: a bin straddles the batch boundary; result equals batch packGreedy") {
    // part fixed to 0; budget 11. Batch 1 ends with bin 1 holding 10
    // of 11 — batch 2's first doc (1 token) must JOIN that bin, not
    // open a new one.
    val b1 = Seq(DocTokens(1, 0, 6), DocTokens(2, 0, 6), DocTokens(3, 0, 4))
    val b2 = Seq(DocTokens(4, 0, 1), DocTokens(5, 0, 9))
    val got = runBatches(11L, Seq(b1, b2))
    assert(got.map(a => a.doc_id -> a.bin_idx) ==
      Seq(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L))
    // bin 1 holds docs from BOTH batches — the carryover itself
    val bin1 = got.filter(_.bin_idx == 1L).map(_.doc_id)
    assert(bin1.contains(3L) && bin1.contains(4L))
    // and equals the batch packer on the same id-ascending feed
    val batch = graft.ops.Packing.packGreedy(
      (b1 ++ b2).toDF("doc_id", "ignored_part", "n_tokens")
        .select(col("doc_id"), col("n_tokens")),
      budget = 11L, nParts = 1)
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(batch.map(t => t._1 -> t._3).toSeq == got.map(a => a.doc_id -> a.bin_idx).toSeq)
  }

  test("parts pack independently; within a batch docs pack in ascending id") {
    val b = Seq(
      DocTokens(5, 1, 4), DocTokens(3, 1, 4), DocTokens(1, 1, 4), // arrives unsorted
      DocTokens(2, 2, 9), DocTokens(4, 2, 9))
    val got = runBatches(8L, Seq(b))
    // part 1: ids 1,3 share bin 0 (4+4=8), id 5 opens bin 1
    assert(got.filter(_.part == 1).map(a => a.doc_id -> a.bin_idx) ==
      Seq(1L -> 0L, 3L -> 0L, 5L -> 1L))
    // part 2: each 9-token doc overflows an 8-budget bin alone
    assert(got.filter(_.part == 2).map(a => a.doc_id -> a.bin_idx) ==
      Seq(2L -> 0L, 4L -> 1L))
  }

  test("across batches assignment is ARRIVAL order — the streaming contract") {
    // high ids arrive FIRST: the packer must fill bins in arrival
    // order, not re-sort history (a streaming operator cannot)
    val got = runBatches(10L,
      Seq(Seq(DocTokens(10, 0, 6)), Seq(DocTokens(1, 0, 6))))
    assert(got.map(a => a.doc_id -> a.bin_idx) == Seq(1L -> 1L, 10L -> 0L))
  }

  test("oversized docs get a bin of their own and never wedge the stream") {
    val got = runBatches(5L, Seq(
      Seq(DocTokens(1, 0, 99)), Seq(DocTokens(2, 0, 3), DocTokens(3, 0, 99))))
    assert(got.map(a => a.doc_id -> a.bin_idx) ==
      Seq(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("state is bounded: one cursor row per touched part") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocTokens]
    val name = s"pack_state_${System.nanoTime()}"
    val q = StreamPack.assignments(input.toDS(), 100L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData((1 to 50).map(i => DocTokens(i.toLong, i % 4, 10L)): _*)
      q.processAllAvailable()
      input.addData((51 to 100).map(i => DocTokens(i.toLong, i % 4, 10L)): _*)
      q.processAllAvailable()
      val stateRows = q.recentProgress.iterator
        .map(p => p.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
      assert(stateRows == 4L, s"expected 4 part cursors, got $stateRows")
    } finally q.stop()
  }
}
