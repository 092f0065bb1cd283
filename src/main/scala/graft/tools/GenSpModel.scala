package graft.tools

/** Deterministic generator for the EXTERNAL SentencePiece model fixture
  * (`graft/sp/ext_unigram.model` on the classpath): a unigram-LM
  * `.model` file in the published SentencePiece `ModelProto` wire
  * layout — the file every Llama-family tokenizer ships and
  * [[graft.text.Unigram.loadModelProto]] exists to read. The unigram
  * counterpart of the BPE `merges.txt` fixtures ([[GenExtMerges]]):
  * the inference-side artifact a user BRINGS, as opposed to one this
  * engine trained.
  *
  * Layout follows the Llama convention exactly: id 0 `<unk>`
  * (type UNKNOWN), ids 1–2 `<s>`/`</s>` (CONTROL), ids 3–258 the 256
  * byte pieces `<0x00>`..`<0xFF>` (BYTE — the `--byte_fallback`
  * block), ids 259+ the normal pieces in score order (▁-marked, the
  * `add_dummy_prefix` whitespace convention). Normal pieces and
  * scores derive purely arithmetically from [[GenExtMerges]]'s
  * deterministic weighted vocabulary (marked words → substring
  * windows → top multis + all singles; score = ln(count/total)
  * quantized to 10⁻⁶, emitted as float32) — no RNG, no clock. The
  * committed fixture is pinned by a spec that re-runs this generator
  * and byte-compares; provenance is reproducible, not asserted.
  *
  * Wire format written (proto2 `ModelProto`, public spec
  * `sentencepiece_model.proto`): repeated field 1 = `SentencePiece`
  * submessages; inside each, field 1 = piece (length-delimited
  * UTF-8), field 2 = score (fixed32 float LE), field 3 = type
  * (varint; omitted at the NORMAL=1 proto2 default, exactly how
  * upstream-written models omit it).
  */
object GenSpModel {

  val Unknown = 2
  val Control = 3
  val Byte = 6
  val Normal = 1

  val Marker = "▁"

  /** Piece rows in MODEL ORDER — the index is the id. */
  def pieces: Seq[(String, Float, Int)] = {
    val specials = Seq(
      ("<unk>", 0.0f, Unknown),
      ("<s>", 0.0f, Control),
      ("</s>", 0.0f, Control))
    val bytes = (0 until 256).map(b => (f"<0x$b%02X>", 0.0f, Byte))
    specials ++ bytes ++ normalPieces.map { case (p, s) => (p, s, Normal) }
  }

  /** Normal pieces with quantized scores, ordered (score desc, piece)
    * — ids ascend by rank, the convention trained models ship with.
    * Substring windows (length 1..4, code-point based) over the
    * ▁-marked deterministic vocabulary; all singles + top-200 multis.
    * Scores are exact 10⁻⁶ multiples so the integer cost the apply
    * quantizes back to is bit-stable. */
  def normalPieces: Seq[(String, Float)] = {
    val vocab = GenExtMerges.trainingVocab.map { case (w, n) => (Marker + w, n) }
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, n) <- vocab) {
      val cps = w.toSeq.map(_.toString) // BMP-only generator alphabet
      for (i <- cps.indices; l <- 1 to math.min(4, cps.length - i))
        counts(cps.slice(i, i + l).mkString) =
          counts.getOrElse(cps.slice(i, i + l).mkString, 0L) + n
    }
    val singles = counts.filter(_._1.length == 1).toSeq
    val multis = counts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(200)
    val kept = singles ++ multis
    val total = kept.map(_._2).sum.toDouble
    kept.map { case (p, n) =>
      val costMicros = (-Math.floor(1e6 * Math.log(n.toDouble / total))).toLong
      (p, (-costMicros / 1e6).toFloat, costMicros)
    }.sortBy { case (p, _, k) => (k, p) } // cost asc == score desc
      .map { case (p, s, _) => (p, s) }
  }

  /** A synthetic model at PRODUCTION vocabulary size (Llama ships 32k
    * pieces): the fixture's normal pieces extended by deterministic
    * enumeration of ▁-marked and word-internal strings over the
    * generator alphabet (splitmix64-scrambled order, descending
    * pseudo-scores at exact 10⁻⁶ multiples, every piece ≤ 4 code
    * points). For the scale probe: per-piece lattice and id probes
    * must stay O(1) at any vocabulary size. */
  def syntheticModel(nNormal: Int): Seq[(String, Float, Int)] = {
    val base = normalPieces
    val have = base.map(_._1).toSet
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val extra = scala.collection.mutable.LinkedHashSet.empty[String]
    var i = 0L
    while (extra.size < nNormal - base.size) {
      val h = mix(i)
      val len = 2 + (h & 3L).toInt % 3 // 2..4 code points incl. marker
      val marked = (h >>> 2) % 2 == 0
      val body = (0 until (if (marked) len - 1 else len)).map { k =>
        alpha(((h >>> (8 + 5 * k)) % 26).toInt)
      }.mkString
      val p = if (marked) Marker + body else body
      if (!have(p)) extra += p
      i += 1
    }
    val startCost = 20000000L // beyond every fixture cost: ranks append
    val extraPieces = extra.toSeq.zipWithIndex.map { case (p, k) =>
      (p, (-(startCost + k) / 1e6).toFloat)
    }
    val specials = pieces.take(3 + 256)
    specials ++ (base ++ extraPieces).map { case (p, s) => (p, s, Normal) }
  }

  private def varint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** Encode one SentencePiece submessage. */
  private def encodePiece(piece: String, score: Float, ptype: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val pb = piece.getBytes("UTF-8")
    out.write(0x0a); varint(out, pb.length.toLong); out.write(pb, 0, pb.length) // field 1, wire 2
    out.write(0x15) // field 2, wire 5 (fixed32)
    val bits = java.lang.Float.floatToIntBits(score)
    out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
    out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
    if (ptype != Normal) { out.write(0x18); varint(out, ptype.toLong) } // field 3, wire 0
    out.toByteArray
  }

  /** The whole ModelProto: repeated field 1 submessages, file order = id. */
  def encode(ps: Seq[(String, Float, Int)] = pieces): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ps.foreach { case (p, s, t) =>
      val body = encodePiece(p, s, t)
      out.write(0x0a); varint(out, body.length.toLong); out.write(body, 0, body.length)
    }
    out.toByteArray
  }

  def main(args: Array[String]): Unit = {
    val dst = java.nio.file.Paths.get(
      args.headOption.getOrElse("src/main/resources/graft/sp/ext_unigram.model"))
    java.nio.file.Files.createDirectories(dst.getParent)
    java.nio.file.Files.write(dst, encode())
    println(s"wrote ${java.nio.file.Files.size(dst)} bytes, ${pieces.size} pieces -> $dst")
  }
}
