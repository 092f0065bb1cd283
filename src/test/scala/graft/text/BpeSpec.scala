package graft.text

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference BPE trainer (Sennrich ACL'16 alg. over word counts). */
  private def refMerges(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    val wc = mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach { t =>
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
        .filter(_.nonEmpty).foreach(w => wc(w) += 1L)
    }
    var vocab: Map[String, List[String]] =
      wc.keys.map(w => w -> (w.map(_.toString).toList :+ "</w>")).toMap
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to n) {
      val pairs = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (w, syms) =>
        syms.sliding(2).foreach {
          case List(a, b) => pairs((a, b)) += wc(w)
          case _ =>
        }
      }
      if (pairs.nonEmpty) {
        val ((a, b), cnt) = pairs.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }.head
        out += ((r, a, b, cnt))
        vocab = vocab.map { case (w, syms) =>
          val acc = mutable.ListBuffer(syms.head)
          syms.tail.foreach { x =>
            if (acc.last == a && x == b) acc(acc.size - 1) = a + b
            else acc += x
          }
          w -> acc.toList
        }
      }
    }
    out.toSeq
  }

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the theater there is their thing",
    "banana bandana ananas",
    "aaaa aaa aa aaaa aaaa", // self-pair runs: the greedy-fold edge case
    "lower lowest newer newest wider widest")
  private val df = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("learnMerges matches the reference trainer, self-pair runs included") {
    val got = Bpe.learnMerges(df, numMerges = 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val want = refMerges(texts, 6)
    assert(got == want)
    // the fixture makes the first merge the self-pair (a, a) — the case
    // string-replace application would get wrong in later rounds
    assert(got.head._2 == "a" && got.head._3 == "a")
  }

  test("degenerate inputs: empty corpus trains zero merges; single chars tokenize") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Bpe.learnMerges(empty, numMerges = 3).collect().isEmpty)
    // a corpus of single-char words still has (char, </w>) pairs
    val tiny = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(tiny, numMerges = 2).collect()
    assert(m.nonEmpty && m.head.getString(1) == "a" && m.head.getString(2) == "</w>")
    val toks = Bpe.applyMerges(tiny,
        m.map(r => (r.getString(1), r.getString(2))).toSeq)
      .select("bpe_tokens").as[Seq[String]].head()
    assert(toks.contains("a</w>"), s"merged end-of-word token expected in $toks")
  }

  test("applyMerges reproduces the trained segmentation") {
    val merges = Bpe.learnMerges(df, numMerges = 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val toks = Bpe.applyMerges(df, merges)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])]
      .collect().toMap
    // "aaaa aaa aa ..." under merge (a,a) then whatever follows: the
    // word 'aaaa' must segment pairwise — [aa, aa, </w>] modulo later
    // merges built on 'aa'
    val aaaa = toks(3L)
    assert(aaaa.mkString(" ").startsWith("aa") || aaaa.head.startsWith("aa"))
    // round-trip: concatenating a word's symbols restores word + </w>
    val theSyms = toks(1L)
    assert(theSyms.mkString("").contains("the</w>") ||
      theSyms.mkString("").contains("the"))
    // every merge pair no longer appears adjacent unmerged after full
    // application, for the first learned rule
    val (a, b) = merges.head
    toks.values.foreach { syms =>
      syms.sliding(2).foreach {
        case Seq(x, y) => assert(!(x == a && y == b),
          s"unmerged occurrence of ($a,$b) in $syms")
        case _ =>
      }
    }
  }

  /** Reference BATCHED trainer: per round, rank pairs (count desc, a, b),
    * greedily keep up to `batch` pairwise symbol-disjoint pairs over
    * {a, b, a+b}, apply them in one left-to-right pass. */
  private def refBatched(texts: Seq[String], rounds: Int, batch: Int,
      cap: Int): Seq[Seq[(String, String, Long)]] = {
    val wc = mutable.Map.empty[String, Long].withDefaultValue(0L)
    texts.foreach { t =>
      t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
        .filter(_.nonEmpty).foreach(w => wc(w) += 1L)
    }
    var vocab: Map[List[String], Long] = wc.toSeq
      .groupBy { case (w, _) => w.map(_.toString).toList :+ "</w>" }
      .map { case (s, ws) => s -> ws.map(_._2).sum }
    val out = mutable.ArrayBuffer.empty[Seq[(String, String, Long)]]
    for (_ <- 1 to rounds) {
      val pairs = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case List(x, y) => pairs((x, y)) += c
          case _ =>
        }
      }
      val cands = pairs.toSeq.sortBy { case ((x, y), c) => (-c, x, y) }
        .take(cap).map { case ((x, y), c) => (x, y, c) }
      val sel = mutable.ArrayBuffer.empty[(String, String, Long)]
      val used = mutable.Set.empty[String]
      cands.foreach { case c @ (x, y, _) =>
        if (sel.size < batch && !(used(x) || used(y) || used(x + y))) {
          sel += c; used ++= Seq(x, y, x + y)
        }
      }
      out += sel.toSeq
      if (sel.nonEmpty) {
        val lk = sel.map(s => (s._1, s._2) -> (s._1 + s._2)).toMap
        vocab = vocab.toSeq.map { case (syms, c) =>
          val acc = mutable.ListBuffer(syms.head)
          syms.tail.foreach { x =>
            lk.get((acc.last, x)) match {
              case Some(m) => acc(acc.size - 1) = m
              case None => acc += x
            }
          }
          (acc.toList, c)
        }.groupBy(_._1).map { case (s, cs) => s -> cs.map(_._2).sum }
      }
    }
    out.toSeq
  }

  test("learnRounds matches the reference batched trainer and keeps batches symbol-disjoint") {
    val got = Bpe.learnRounds(df, rounds = 4, batchSize = 4, candCap = 64)
    val want = refBatched(texts, rounds = 4, batch = 4, cap = 64)
    assert(got == want)
    got.foreach { round =>
      // pairwise disjoint across RULES (a self-pair like (a,a) repeats
      // its own symbol within one rule — that is fine; two rules
      // sharing any of {a, b, ab} is not)
      val sets = round.map { case (a, b, _) => Set(a, b, a + b) }
      for (i <- sets.indices; j <- sets.indices if i < j)
        assert((sets(i) & sets(j)).isEmpty,
          s"rules $i and $j share symbols in round $round")
    }
    assert(got.flatten.size > 4, "batching must beat one merge per round here")
  }

  test("batchSize=1 batched training degenerates to the sequential trainer") {
    val seq6 = Bpe.learnMerges(df, numMerges = 6).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b1 = Bpe.learnRounds(df, rounds = 6, batchSize = 1, candCap = 64).flatten
    assert(b1 == seq6)
  }

  test("one combined fold per round equals applying the round's rules one-by-one") {
    val rounds = Bpe.learnRounds(df, rounds = 4, batchSize = 4, candCap = 64)
      .map(_.map(t => (t._1, t._2)))
    val grouped = Bpe.applyMergesGrouped(df, rounds)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    // the same rules in the same global order, each as its own group =
    // strict sequential application
    val sequential = Bpe.applyMergesGrouped(df, rounds.flatten.map(Seq(_)))
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    assert(grouped == sequential,
      "disjoint-batch combined fold must equal sequential rule application")
  }

  test("merge artifact: equals the live trainer, reuses, and invalidates on params") {
    val dir = java.nio.file.Files.createTempDirectory("bpe_art").toString
    Bpe.ensureMergeArtifact(spark, df, dir, rounds = 4, batchSize = 4, candCap = 64)
    // artifact read == live trainer, both shapes
    val live = Bpe.learnMergesBatched(df, rounds = 4, batchSize = 4, candCap = 64)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val art = Bpe.mergesFromArtifact(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(art == live)
    assert(Bpe.loadMergeRounds(spark, dir) ==
      Bpe.learnRounds(df, rounds = 4, batchSize = 4, candCap = 64)
        .map(_.map(t => (t._1, t._2))).filter(_.nonEmpty))
    // unchanged corpus+params: no rewrite
    val f1 = new java.io.File(s"$dir/data").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    Bpe.ensureMergeArtifact(spark, df, dir, rounds = 4, batchSize = 4, candCap = 64)
    val f2 = new java.io.File(s"$dir/data").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    assert(f2 == f1, "unchanged corpus+params must not retrain")
    // changed rounds: different artifact → rebuild
    Bpe.ensureMergeArtifact(spark, df, dir, rounds = 2, batchSize = 4, candCap = 64)
    val n = Bpe.mergesFromArtifact(spark, dir).count()
    val n2 = Bpe.learnRounds(df, rounds = 2, batchSize = 4, candCap = 64).flatten.size
    assert(n == n2, s"changed params must rebuild the artifact: $n vs $n2")
  }

  test("broadcastVocab=false tokenizes identically through a shuffle join") {
    val rounds = Bpe.learnRounds(df, rounds = 3, batchSize = 4, candCap = 64)
      .map(_.map(t => (t._1, t._2)))
    val on = Bpe.applyMergesGrouped(df, rounds, broadcastVocab = true)
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    val offDf = Bpe.applyMergesGrouped(df, rounds, broadcastVocab = false)
    val off = offDf
      .select("doc_id", "bpe_tokens").as[(Long, Seq[String])].collect().toMap
    assert(on == off, "the open-vocabulary shuffle path must match the broadcast path")
    // the flag removes the broadcast PIN (AQE may still choose to
    // broadcast a small vocab — the point is that a web-scale one is
    // no longer forced executor-wide): hint present iff flag on
    val onHinted = Bpe.applyMergesGrouped(df, rounds, broadcastVocab = true)
      .queryExecution.analyzed.toString
    val offHinted = offDf.queryExecution.analyzed.toString
    assert(onHinted.toLowerCase.contains("broadcast"),
      "broadcastVocab=true must pin the hint")
    assert(!offHinted.toLowerCase.contains("broadcast"),
      s"broadcastVocab=false must leave the join strategy to the planner:\n$offHinted")
  }

  test("randomized corpora: batched trainer matches the reference implementation") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcdefg"
    for (trial <- 1 to 3) {
      val words = (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(7))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val texts = (1 to 30).map { _ =>
        (1 to (3 + rnd.nextInt(10))).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      }
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Bpe.learnRounds(d, rounds = 5, batchSize = 6, candCap = 128)
      val want = refBatched(texts, rounds = 5, batch = 6, cap = 128)
      assert(got == want, s"trial $trial diverged: $got vs $want")
    }
  }

  test("batched training on an empty corpus yields empty rounds, not an error") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val rounds = Bpe.learnRounds(empty, rounds = 3, batchSize = 4, candCap = 16)
    assert(rounds == Seq(Seq(), Seq(), Seq()))
    assert(Bpe.learnMergesBatched(empty, rounds = 2).collect().isEmpty)
  }
}
