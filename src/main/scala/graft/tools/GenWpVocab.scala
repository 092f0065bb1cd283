package graft.tools

import scala.collection.mutable

/** Deterministic generator for the EXTERNAL WordPiece vocabulary
  * fixture (`graft/wp/ext_vocab.txt` on the classpath): a `vocab.txt`
  * in the released BERT layout — one piece per line, the LINE NUMBER
  * is the id — which is the complete artifact a WordPiece tokenizer
  * ships (greedy longest-match inference needs only the vocabulary;
  * there is no merges file at inference time).
  *
  * Layout mirrors the published bert-base files: `[PAD]` at 0, a
  * block of `[unusedN]` placeholders, then `[UNK]`/`[CLS]`/`[SEP]`/
  * `[MASK]` at ids NOT equal to this engine's internal training
  * convention (1–4) — so a query running through this fixture proves
  * the id plumbing is genuinely file-driven, not constant-driven.
  * After the specials: the alphabet (UTF-8 byte order), then merge
  * outputs in rank order.
  *
  * The pieces come from textbook WordPiece training (likelihood-gain
  * argmax, `##` continuation markers — `WordPiece.learnMerges`
  * semantics, run in memory) over [[GenExtMerges.trainingVocab]], the
  * same deterministic weighted vocabulary behind the BPE fixtures —
  * compounds make the learned pieces overlap the live corpus's words,
  * so the fixture vocabulary genuinely segments (not just [UNK]s) the
  * test corpus. Pure arithmetic, no RNG, no clock; a spec re-runs
  * this generator and byte-compares the committed fixture. */
object GenWpVocab {

  val ContPrefix = "##"
  val NumUnused = 10

  /** WordPiece symbolization: first char plain, continuations `##`. */
  def symbolize(w: String): Array[String] = {
    val cs = w.split("")
    cs.zipWithIndex.map { case (c, i) => if (i == 0) c else ContPrefix + c }
  }

  def mergedSym(a: String, b: String): String =
    a + (if (b.startsWith(ContPrefix)) b.substring(ContPrefix.length) else b)

  /** Greedy left-to-right application of ONE merge — the fold
    * semantics shared with `WordPiece.applyMerge`. */
  def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    if (syms.isEmpty) return syms
    val out = mutable.ArrayBuffer(syms(0))
    var i = 1
    while (i < syms.length) {
      if (out.last == a && syms(i) == b) out(out.length - 1) = mergedSym(a, b)
      else out += syms(i)
      i += 1
    }
    out.toArray
  }

  /** Textbook WordPiece training: `numMerges` rounds of weighted pair
    * + single counts → likelihood score `n/(na*nb)` argmax (score
    * desc, then (lhs, rhs)) → merge everywhere. Float64 score
    * arithmetic in the exact cast order `WordPiece.learnMerges`
    * uses. */
  def sequentialWordPiece(
      vocab: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, c) => (symbolize(w), c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val pairs = mutable.Map.empty[(String, String), Long]
      val singles = mutable.Map.empty[String, Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length) {
          singles(syms(i)) = singles.getOrElse(syms(i), 0L) + cnt
          if (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            pairs(k) = pairs.getOrElse(k, 0L) + cnt
          }
          i += 1
        }
      }
      if (pairs.isEmpty) exhausted = true
      else {
        val (a, b) = pairs.toSeq.minBy { case ((x, y), n) =>
          val score = n.toDouble / (singles(x).toDouble * singles(y).toDouble)
          (-score, x, y)
        }._1
        merges += ((a, b))
        words = words.map { case (syms, cnt) => (mergeOnce(syms, a, b), cnt) }
        r += 1
      }
    }
    merges.toSeq
  }

  /** UTF-8 byte-order string sort (the engine's collation pin). */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** The fixture body: one piece per line, line number = id. */
  def fixtureText(numMerges: Int = 300): String = {
    val merges = sequentialWordPiece(GenExtMerges.trainingVocab, numMerges)
    val alphabet = GenExtMerges.trainingVocab
      .flatMap { case (w, _) => symbolize(w) }.distinct
      .sortWith(utf8Lt)
    val specials =
      Seq("[PAD]") ++ (0 until NumUnused).map(i => s"[unused$i]") ++
        Seq("[UNK]", "[CLS]", "[SEP]", "[MASK]")
    val out = mutable.ArrayBuffer.empty[String]
    val seen = mutable.Set.empty[String]
    (specials ++ alphabet ++ merges.map { case (a, b) => mergedSym(a, b) })
      .foreach { p => if (!seen(p)) { out += p; seen += p } }
    out.mkString("", "\n", "\n")
  }

  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0)
      else "src/main/resources/graft/wp/ext_vocab.txt"
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new java.io.FileWriter(f)
    try w.write(fixtureText()) finally w.close()
    println(s"wrote $path")
  }
}
