package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val merges = ByteLevel.externalFixtureMerges()
  private lazy val vocabIds =
    ByteLevel.vocabForMerges(merges, Seq(Sft.Eos, Sft.UserMark, Sft.AssistantMark))
  private lazy val vm = vocabIds.toMap
  private def eosId = vm(Sft.Eos)
  private def uId = vm(Sft.UserMark)
  private def aId = vm(Sft.AssistantMark)

  test("turns: fixed-length windows, user-first alternation, empty doc keeps one turn") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens -> turns of 4: 3 turns
      (2L, "")).toDF("doc_id", "text")
    val t = Sft.turns(df, turnLen = 4)
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2))
    assert(t.filter(_._1 == 1L).map(_._3).toSeq == Seq("a b c d", "e f g h", "i j"))
    assert(t.filter(_._1 == 2L).toSeq == Seq((2L, 0, "")))
  }

  test("framing invariants: lengths match, marker-first, EOS-last, mask only on assistant content") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "one two three"),
      (3L, "")).toDF("doc_id", "text")
    val out = Sft.maskedTokenIds(df, merges, turnLen = 4)
      .as[(Long, Seq[Int], Seq[Int])].collect()
    assert(out.length == 3)
    out.foreach { case (id, ids, mask) =>
      assert(ids.length == mask.length, s"doc $id length mismatch")
      assert(mask.forall(m => m == 0 || m == 1), s"doc $id mask values")
      assert(ids.head == uId, s"doc $id must open with the user marker")
      assert(ids.last == eosId && mask.last == 0, s"doc $id must close with unmasked EOS")
      // markers and EOS always mask 0
      ids.zip(mask).foreach { case (t, m) =>
        if (t == uId || t == aId || t == eosId) assert(m == 0, s"doc $id special masked")
      }
    }
    // empty doc: exactly [user-marker, EOS] / [0, 0]
    val empty = out.find(_._1 == 3L).get
    assert(empty._2 == Seq(uId, eosId) && empty._3 == Seq(0, 0))
  }

  test("mask selects exactly the assistant turns' content ids, in order") {
    val df = Seq((7L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    // turnLen 2 -> turns: [alpha beta](u) [gamma delta](a) [epsilon zeta](u)
    val out = Sft.maskedTokenIds(df, merges, turnLen = 2)
      .as[(Long, Seq[Int], Seq[Int])].collect().head
    val maskedIds = out._2.zip(out._3).filter(_._2 == 1).map(_._1)
    val wantIds = ByteLevel.tokenIdsWith(
        Seq((0L, "gamma delta")).toDF("doc_id", "text"), merges, vocabIds, None)
      .select("token_ids").as[Seq[Int]].head()
    assert(maskedIds == wantIds,
      s"masked ids must be exactly the assistant turn's content ids")
    // and the unmasked prefix is marker + user-turn ids
    val uIds = ByteLevel.tokenIdsWith(
        Seq((0L, "alpha beta")).toDF("doc_id", "text"), merges, vocabIds, None)
      .select("token_ids").as[Seq[Int]].head()
    assert(out._2.take(1 + uIds.length) == uId +: uIds)
    assert(out._2(1 + uIds.length) == aId, "assistant marker follows the user turn")
  }

  test("special ids sit after the merge block and cannot collide with content ids") {
    assert(eosId == 256 + merges.size)
    assert(uId == eosId + 1 && aId == eosId + 2)
    val df = Seq((1L, "hello world again and again")).toDF("doc_id", "text")
    val out = Sft.maskedTokenIds(df, merges, turnLen = 3)
      .as[(Long, Seq[Int], Seq[Int])].collect().head
    val contentIds = out._2.filterNot(t => t == uId || t == aId || t == eosId)
    assert(contentIds.forall(_ < eosId), "content ids stay inside the base vocab block")
  }

  test("turn-separate tokenization: ids concatenate per turn (no cross-boundary merges)") {
    val text = "aa bb cc dd" // turnLen 2: [aa bb] [cc dd]
    val whole = Sft.maskedTokenIds(
        Seq((1L, text)).toDF("doc_id", "text"), merges, turnLen = 2)
      .as[(Long, Seq[Int], Seq[Int])].collect().head
    val t1 = ByteLevel.tokenIdsWith(
        Seq((0L, "aa bb")).toDF("doc_id", "text"), merges, vocabIds, None)
      .select("token_ids").as[Seq[Int]].head()
    val t2 = ByteLevel.tokenIdsWith(
        Seq((0L, "cc dd")).toDF("doc_id", "text"), merges, vocabIds, None)
      .select("token_ids").as[Seq[Int]].head()
    assert(whole._2 == (uId +: t1) ++ (aId +: t2) :+ eosId)
  }
}
