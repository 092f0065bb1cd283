package graft.text

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.tools.GenExtMerges

/** The external-merge-list inference path ([[Bpe.applyMergesRanked]] +
  * the `BpeRankMergeExpr` kernel) and its shipped fixture: rank-priority
  * semantics against an independent reference implementation, the
  * bounded-iteration contract, fixture provenance (regenerates
  * byte-identical), the non-disjointness that makes the grouped apply
  * illegal for it, and agreement with the grouped apply on the one list
  * family where both are defined (a self-trained batched artifact). */
class BpeExtSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent reference: the standard priority loop with the
    * SCAN-WITH-SKIP merge formulation (deliberately different from the
    * kernel's fold formulation — agreement checks the equivalence, not
    * the implementation). */
  private def refBpe(word: Seq[String], merges: Seq[(String, String)],
      maxIters: Int): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.toVector
    var iter = 0
    while (iter < maxIters) {
      val present = syms.zip(syms.drop(1)).filter(rank.contains)
      if (present.isEmpty) return syms
      val (a, b) = present.minBy(rank)
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toVector
      iter += 1
    }
    syms
  }

  private def kernel(words: Seq[Seq[String]], merges: Seq[(String, String)],
      maxIters: Int): Seq[Seq[String]] = {
    val df = words.zipWithIndex.map { case (w, i) => (i, w) }.toDF("i", "syms")
    df.select(col("i"),
        org.apache.spark.sql.graft.VectorExpressions
          .bpeRankMerge(col("syms"), merges, maxIters).as("out"))
      .orderBy("i").collect().map(_.getSeq[String](1).toSeq).toSeq
  }

  test("kernel matches the reference priority loop on randomized words and trained lists") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcdef"
    // a trained (rank-ordered, organically non-disjoint) list over a
    // random weighted vocabulary — the realistic rank-map shape
    val vocab = (1 to 60).map { _ =>
      (Seq.fill(2 + rnd.nextInt(7))(alphabet(rnd.nextInt(alphabet.length))).mkString,
        (1 + rnd.nextInt(50)).toLong)
    }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
    val merges = GenExtMerges.sequentialBpe(vocab, 80)
    assert(merges.size >= 30, s"trained list too small: ${merges.size}")
    val words = (1 to 200).map { _ =>
      Seq.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.length)).toString) :+ "</w>"
    }
    val got = kernel(words, merges, maxIters = 16)
    words.zip(got).foreach { case (w, k) =>
      assert(k == refBpe(w, merges, 16), s"mismatch on ${w.mkString}")
    }
  }

  test("maxIters is a hard bound: one iteration applies exactly the single best merge") {
    // rules: rank1 (a,b), rank2 (ab,c) — one iteration must produce
    // [ab, c], two must produce [abc]
    val merges = Seq(("a", "b"), ("ab", "c"))
    assert(kernel(Seq(Seq("a", "b", "c")), merges, maxIters = 1) == Seq(Seq("ab", "c")))
    assert(kernel(Seq(Seq("a", "b", "c")), merges, maxIters = 2) == Seq(Seq("abc")))
  }

  test("lowest rank wins regardless of position; self-runs compress pairwise") {
    // (c,d) outranks (a,b): applied first even though it sits later
    assert(kernel(Seq(Seq("a", "b", "c", "d")), Seq(("c", "d"), ("a", "b")), 16)
      == Seq(Seq("ab", "cd")))
    // the fold semantics on runs: "a a a" under (a,a) → [aa, a]
    assert(kernel(Seq(Seq("a", "a", "a")), Seq(("a", "a")), 16)
      == Seq(Seq("aa", "a")))
  }

  test("derived bound converges a word a fixed 24-iteration bound under-merges") {
    // a 30-rule CHAIN where every rule consumes the previous rule's
    // output: each priority iteration can apply exactly ONE merge, so
    // a 31-symbol word needs all 30 iterations — the worst case the
    // fixed default bound silently truncated
    val chain = (1 to 30).map { i =>
      ("a" + (1 until i).map(j => s"b$j").mkString, s"b$i")
    }
    val word = "a" +: (1 to 30).map(i => s"b$i")
    val conv = { (w: Seq[String], iters: Int) =>
      Seq((0, w)).toDF("i", "syms")
        .select(org.apache.spark.sql.graft.VectorExpressions
          .bpeRankConverged(col("syms"), chain, iters))
        .head().getBoolean(0)
    }
    // under the old fixed bound: 24 iterations leave rankable pairs
    assert(!conv(word, 24), "24 iterations must NOT converge the 31-symbol chain word")
    assert(kernel(Seq(word), chain, 24).head.length == 31 - 24,
      "the bounded apply under-merges — exactly the silent deviation")
    // the derived bound (len - 1 = 30) converges it fully
    assert(conv(word, 30))
    assert(kernel(Seq(word), chain, 30) == Seq(Seq("a" + (1 to 30).map(i => s"b$i").mkString)))
    // and convergence is sticky: surplus iterations change nothing
    assert(conv(word, 40))
    assert(kernel(Seq(word), chain, 40) == kernel(Seq(word), chain, 30))
  }

  test("zero unconverged words across the fixture corpora under the derived bounds") {
    val dir = "/root/testdata/sf0.001"
    // char-level: documents words under the char fixture list
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0).distinct()
      .select(col("word"),
        concat(split(col("word"), ""), array(lit("</w>"))).as("syms"))
    val charBound = Bpe.derivedIterBound(words, size(col("syms")))
    assert(charBound <= 16, s"char-level oracle unrolls 16 layers; derived bound $charBound must fit")
    val unconv = words.select(org.apache.spark.sql.graft.VectorExpressions
        .bpeRankConverged(col("syms"), Bpe.externalFixtureMerges(), charBound).as("c"))
      .filter(!col("c")).count()
    assert(unconv == 0L, s"$unconv char-level words failed to converge under the derived bound")
    // byte-level: pretokens of documents + the long-pretoken fixture
    // shape (the 35-byte pretoken the extended corpus carries)
    val raw = spark.read.parquet(s"$dir/documents.parquet").select("text")
      .unionAll(Seq(
        "Long: supercalifragilisticexpialidocious 123456789012345678901234567890 end.")
        .toDF("text"))
    val ptoks = raw
      .select(explode(ByteLevel.pretokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0).distinct()
      .select(org.apache.spark.sql.graft.VectorExpressions
        .byteLevelSyms(col("word")).as("syms"))
    val byteBound = Bpe.derivedIterBound(ptoks, size(col("syms")))
    assert(byteBound <= 36, s"byte-level oracles unroll 36 layers; derived bound $byteBound must fit")
    val unconvB = ptoks.select(org.apache.spark.sql.graft.VectorExpressions
        .bpeRankConverged(col("syms"), ByteLevel.externalFixtureMerges(), byteBound).as("c"))
      .filter(!col("c")).count()
    assert(unconvB == 0L, s"$unconvB byte-level pretokens failed to converge under the derived bound")
  }

  test("vocab-id hashed probe is bit-equal to the element_at map-literal formulation") {
    val vocab = Seq(("a", 0), ("b", 1), ("ab", 256), ("abc", 257))
    val df = Seq(
      (1, Seq("ab", "a", "b")),
      (2, Seq("abc", "zz", "a")) // zz is out-of-vocab → null id
    ).toDF("i", "syms")
    val hashed = df.select(col("i"),
        org.apache.spark.sql.graft.VectorExpressions.vocabIds(col("syms"), vocab).as("ids"))
      .orderBy("i").collect().map(_.getSeq[Integer](1))
    val literal = df.select(col("i"),
        transform(col("syms"), s => element_at(typedLit(vocab.toMap), s)).as("ids"))
      .orderBy("i").collect().map(_.getSeq[Integer](1))
    assert(hashed.toSeq == literal.toSeq)
    assert(hashed(1) == Seq(257, null, 0))
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.VocabIdsExpr(null, Seq(("a", 1), ("a", 2)))
    }
  }

  test("construction refuses ambiguous or separator-carrying rule lists") {
    intercept[IllegalArgumentException] {
      kernel(Seq(Seq("a")), Seq(("a", "b"), ("a", "b")), 16) // duplicate pair
    }
    intercept[IllegalArgumentException] {
      kernel(Seq(Seq("a")), Seq(("a\u0001", "b")), 16) // reserved separator
    }
    intercept[IllegalArgumentException] {
      kernel(Seq(Seq("a")), Seq(("a", "b")), 0) // non-positive bound
    }
  }

  test("loadMergesTxt parses a merges.txt file with version-comment and rank order") {
    val p = java.nio.file.Files.createTempFile("merges", ".txt")
    java.nio.file.Files.writeString(p,
      "#version: 0.2\nt h\nth e\ni n\n")
    assert(Bpe.loadMergesTxt(p.toString) == Seq(("t", "h"), ("th", "e"), ("i", "n")))
    intercept[IllegalArgumentException] {
      val bad = java.nio.file.Files.createTempFile("merges_bad", ".txt")
      java.nio.file.Files.writeString(bad, "nospace\n")
      Bpe.loadMergesTxt(bad.toString)
    }
  }

  test("loadMergesTxt keeps rules whose lhs is '#' — only a #version header is skipped") {
    // real GPT-2/RoBERTa merge lists contain '#'-lhs rules ('# #',
    // '## #' — vocab.json carries '##'/'###' tokens); upstream loaders
    // skip ONLY the first '#version' line, and so must this one:
    // dropping them would silently shift every subsequent rank
    val p = java.nio.file.Files.createTempFile("merges_hash", ".txt")
    java.nio.file.Files.writeString(p,
      "#version: 0.2\n# #\n## #\nt h\n")
    assert(Bpe.loadMergesTxt(p.toString) ==
      Seq(("#", "#"), ("##", "#"), ("t", "h")))
    // without a header, nothing is skipped at all
    val q = java.nio.file.Files.createTempFile("merges_nohdr", ".txt")
    java.nio.file.Files.writeString(q, "# #\nt h\n")
    assert(Bpe.loadMergesTxt(q.toString) == Seq(("#", "#"), ("t", "h")))
  }

  test("shipped fixture regenerates byte-identical from its committed generator") {
    val resource = {
      val in = getClass.getResourceAsStream("/graft/bpe/ext_merges.txt")
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    }
    assert(resource == GenExtMerges.fixtureText(),
      "fixture drifted from its generator — rerun graft.tools.GenExtMerges")
  }

  test("shipped fixture is >= 1k rules, rank-ordered and genuinely non-disjoint") {
    val merges = Bpe.externalFixtureMerges()
    assert(merges.size >= 1000, s"only ${merges.size} rules")
    // non-disjointness: some later rule consumes an earlier rule's
    // output — the property that makes the grouped per-round fold
    // illegal for this list (count how many, not just existence)
    val consuming = merges.zipWithIndex.count { case ((a, b), i) =>
      merges.take(i).exists { case (pa, pb) => pa + pb == a || pa + pb == b }
    }
    assert(consuming > 100,
      s"fixture should be deeply non-disjoint, only $consuming consuming rules")
  }

  test("in-memory fixture trainer equals the Spark sequential trainer on the same corpus") {
    val texts = Seq(
      "low low lower lowest", "new newer newest low", "wide wider widest new")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val sparkMerges = Bpe.learnMerges(df, numMerges = 12)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val wc = texts.flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }.toSeq
    assert(GenExtMerges.sequentialBpe(wc, 12) == sparkMerges,
      "the fixture generator's trainer must be the spec-pinned sequential trainer")
  }

  test("ranked apply agrees with the grouped apply on a self-trained disjoint artifact") {
    // a learnRounds artifact satisfies per-round disjointness AND the
    // trained-list well-formedness (a rule's inputs exist only via
    // earlier rules), so the priority loop and the sequential grouped
    // fold coincide on it — pinned here, claimed nowhere else
    val texts = Seq.tabulate(40)(i =>
      s"alpha beta gamma delta alpha beta epsilon ${"z" * (i % 4 + 1)}")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rounds = Bpe.learnRounds(df, rounds = 4, batchSize = 8)
    val flat = rounds.flatten.map(t => (t._1, t._2))
    assert(flat.nonEmpty)
    val grouped = Bpe.applyMergesGrouped(df, rounds.map(_.map(t => (t._1, t._2))))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    val ranked = Bpe.applyMergesRanked(df, flat, maxIters = 32)
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(grouped.toSeq == ranked.toSeq)
  }

  test("ranked apply on the fixture: one kernel pass, no per-rule plan steps") {
    val df = Seq((1L, "fast table scan"), (2L, "hash join batch")).toDF("doc_id", "text")
    val out = Bpe.applyMergesRanked(df, Bpe.externalFixtureMerges(), maxIters = 16)
    // the kernel projection is collapsed into the distinct-aggregate's
    // result expressions (invisible in the physical dump's
    // `functions=[]` line), so assert on the optimized logical plan
    assert(out.queryExecution.optimizedPlan.toString.contains("bpe_rank_merge"),
      "kernel must appear in the plan")
    val plan = out.queryExecution.executedPlan.toString
    // the whole apply is one narrow derivation + the positional join:
    // a per-rule chain would materialize ~1.1k scans via localCheckpoint
    assert(!plan.contains("ExistingRDD"),
      "ranked apply must not materialize intermediate vocab tables")
    val rows = out.orderBy("doc_id").collect()
    assert(rows.length == 2 && rows(0).getSeq[String](1).nonEmpty)
  }
}
