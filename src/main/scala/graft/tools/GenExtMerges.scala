package graft.tools

import scala.collection.mutable

/** Deterministic generator for the EXTERNAL BPE merge-list fixture
  * (`graft/bpe/ext_merges.txt` on the classpath): a rank-ordered,
  * NON-disjoint merge list of the kind every real pipeline loads from
  * disk (GPT-2's `merges.txt` is 50k such rules) — the inference-side
  * counterpart to the batched trainer, whose per-round rules are
  * deliberately symbol-disjoint and therefore cannot stand in for an
  * external list.
  *
  * The list is textbook sequential BPE (Sennrich et al. ACL'16: one
  * merge per round, argmax weighted pair count, tie-break (count desc,
  * pair asc) — exactly `Bpe.learnMerges` semantics, run in memory)
  * trained on a deterministic vocabulary built from the test corpus's
  * 31 base words plus all 961 pairwise compounds with Zipf-ish
  * weights. Training on compounds makes the learned rules overlap the
  * base words' substrings, so a large share of the 1300 rules
  * genuinely FIRE when the list is applied to the corpus, while the
  * list itself has the two properties an external list always has and
  * the batched artifact never does: rules are rank-ordered, and later
  * rules consume earlier rules' outputs (non-disjoint).
  *
  * The committed fixture is pinned by a spec that re-runs this
  * generator and byte-compares — provenance is reproducible, not
  * asserted. */
object GenExtMerges {

  /** The corpus's whitespace vocabulary (sorted), the seed alphabet of
    * the training vocab. */
  val BaseWords: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** End-of-word marker — must match `Bpe.wordTable`'s symbolization. */
  val EndMark = "</w>"

  /** Deterministic weighted training vocabulary: base words (heavier)
    * plus all ordered pairwise compounds (Zipf-ish decay in both
    * indices). Pure arithmetic — no RNG, no clock. */
  def trainingVocab: Seq[(String, Long)] = {
    val base = BaseWords.zipWithIndex.map { case (w, i) => (w, 2000L / (i + 2)) }
    val compounds = for {
      (w1, i) <- BaseWords.zipWithIndex
      (w2, j) <- BaseWords.zipWithIndex
    } yield (w1 + w2, math.max(1L, 600L / (i + j + 2)))
    base ++ compounds
  }

  /** Greedy left-to-right application of ONE merge (a, b) → ab to a
    * symbol array — the fold semantics shared with `Bpe.applyMerge`
    * and the kernel: seed with the first symbol; a step either merges
    * into the accumulator's last element or appends (a run `a a a a`
    * under (a,a) compresses pairwise to `aa aa`). */
  def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    if (syms.isEmpty) return syms
    val out = mutable.ArrayBuffer(syms(0))
    var i = 1
    while (i < syms.length) {
      if (out.last == a && syms(i) == b) out(out.length - 1) = a + b
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Textbook sequential BPE over a weighted distinct-word table:
    * `numMerges` rounds of (weighted pair count → argmax with
    * (count desc, pair asc) tie-break → merge everywhere). Stops early
    * if the pair table empties. */
  def sequentialBpe(
      vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] =
    sequentialBpeSyms(
      vocab.map { case (w, c) => (w.split("").toArray :+ EndMark, c) },
      numMerges)

  /** [[sequentialBpe]] over caller-symbolized words — the seam that
    * lets the byte-level fixture share the trainer core. */
  def sequentialBpeSyms(
      vocab: Seq[(Array[String], Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = vocab.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, x, y) }._1
        merges += ((a, b))
        words = words.map { case (syms, cnt) => (mergeOnce(syms, a, b), cnt) }
        r += 1
      }
    }
    merges.toSeq
  }

  /** The fixture body: one `lhs rhs` line per rule in rank order —
    * GPT-2's `merges.txt` layout (symbols never contain spaces). */
  def fixtureText(numMerges: Int = 1300): String =
    sequentialBpe(trainingVocab, numMerges)
      .map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n")

  /** The BYTE-LEVEL fixture: the same training vocabulary as GPT-2-style
    * pretokens — each word carries its leading space, so the learned
    * rules include `Ġ` (space-marker) merges — symbolized through the
    * published byte alphabet, no end marker. Rank-ordered and
    * non-disjoint like the char fixture; symbols are mapped byte chars
    * (never a raw space), so the `lhs rhs` line layout stays valid. */
  def byteLevelFixtureText(numMerges: Int = 1300): String = {
    val symbolize = (w: String) =>
      w.getBytes("UTF-8").map(b =>
        org.apache.spark.sql.graft.ByteLevelUtil.ByteToSym(b & 0xff))
    sequentialBpeSyms(
      trainingVocab.map { case (w, c) => (symbolize(" " + w), c) },
      numMerges)
      .map { case (a, b) => s"$a $b" }.mkString("", "\n", "\n")
  }

  /** A PRODUCTION-SIZE rank-ordered byte-level merge list (GPT-2 ships
    * 50k rules): the shipped ~1.1k trained fixture extended to `n`
    * rules by deterministic splitmix64 composition over the growing
    * symbol pool — each synthetic rule pairs two existing pool symbols
    * (base bytes, trained outputs, or earlier synthetic outputs), so
    * the list keeps the two structural properties of a real external
    * list (rank order; later rules consume earlier outputs) at the
    * size where map-scan vocab probes and per-rule plan steps fall
    * over. Pure arithmetic — no RNG object, no clock; regenerates
    * identically every call. Output symbols are capped at 24 chars and
    * never contain spaces (the merges.txt line format stays valid). */
  def syntheticRankedByteLevel(n: Int = 50000): Seq[(String, String)] = {
    val trained = byteLevelFixtureText().linesIterator
      .filter(_.nonEmpty)
      .map { l => val sp = l.indexOf(' '); (l.substring(0, sp), l.substring(sp + 1)) }
      .toVector
    require(n >= trained.size, s"n=$n below the trained fixture size ${trained.size}")
    val pool = mutable.ArrayBuffer.empty[String]
    pool ++= org.apache.spark.sql.graft.ByteLevelUtil.ByteToSym
    trained.foreach { case (a, b) => pool += (a + b) }
    val seen = mutable.Set.empty[(String, String)]
    seen ++= trained
    val out = mutable.ArrayBuffer.empty[(String, String)]
    out ++= trained
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    var salt = 0L
    while (out.size < n) {
      val a = pool(((mix(salt) >>> 1) % pool.size).toInt)
      val b = pool(((mix(salt + 0x632BE59BD9B4E019L) >>> 1) % pool.size).toInt)
      if (a.length + b.length <= 24 && !seen((a, b))) {
        out += ((a, b)); seen += ((a, b)); pool += (a + b)
      }
      salt += 1
    }
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "src/main/resources/graft/bpe"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ext_merges.txt"), fixtureText())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/ext_merges_bytelevel.txt"),
      byteLevelFixtureText())
    println(s"wrote $dir/ext_merges.txt and $dir/ext_merges_bytelevel.txt")
  }
}
