package graft.text

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestSession
import graft.tools.GenSpModel

/** The external SentencePiece model path: fixture provenance, the
  * minimal ModelProto wire parser, the Llama layout pins, and the
  * apply through [[Unigram.tokenIdsFromModel]]. */
class SpModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fixture provenance: the committed .model byte-equals the generator") {
    val in = getClass.getResourceAsStream("/graft/sp/ext_unigram.model")
    assert(in != null)
    val resource = try in.readAllBytes() finally in.close()
    assert(java.util.Arrays.equals(resource, GenSpModel.encode()),
      "committed fixture must equal a generator re-run byte for byte")
  }

  test("parser round-trips the writer and skips unknown fields by wire type") {
    val ps = GenSpModel.pieces
    val parsed = Unigram.parseModelProto(GenSpModel.encode(ps))
    assert(parsed == ps.map { case (p, s, t) => Unigram.SpPiece(p, s, t) })
    // a real model carries trainer/normalizer specs as other top-level
    // fields — splice a fake field 2 submessage and a field 7 varint
    // in front and between; the pieces must parse identically
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x12); out.write(3); out.write(Array[Byte](1, 2, 3), 0, 3) // field 2, wire 2
    val body = GenSpModel.encode(ps)
    out.write(body, 0, body.length)
    out.write(0x38); out.write(0x2a) // field 7, wire 0
    assert(Unigram.parseModelProto(out.toByteArray) == parsed,
      "unknown top-level fields must be skipped, not break parsing")
  }

  test("Llama layout: specials at 0-2, BYTE block 3..258, normal pieces in score order") {
    val m = Unigram.externalFixtureModel()
    assert(m(0) == Unigram.SpPiece("<unk>", 0.0f, Unigram.SpUnknown))
    assert(m(1) == Unigram.SpPiece("<s>", 0.0f, Unigram.SpControl))
    assert(m(2) == Unigram.SpPiece("</s>", 0.0f, Unigram.SpControl))
    (0 until 256).foreach { b =>
      assert(m(3 + b) == Unigram.SpPiece(f"<0x$b%02X>", 0.0f, Unigram.SpByte))
    }
    val normal = m.drop(259)
    assert(normal.nonEmpty && normal.forall(_.ptype == Unigram.SpNormal))
    // ids ascend by (score desc, piece) — the trained-model convention
    val sorted = normal.sortBy(p => (Unigram.modelCostMicros(p.score), p.piece))
    assert(normal == sorted, "normal pieces must be in score order")
    assert(normal.exists(_.piece.startsWith(Unigram.SpMarker)),
      "a ▁-convention model must carry marked pieces")
  }

  test("parser fuzz: randomized piece lists round-trip the wire format exactly") {
    val rnd = new scala.util.Random(20260814L)
    val alphabets = Seq("abc", "αβγ", "日本語", "🌍🎉", "▁<>x", "'\"\\")
    (1 to 50).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val ps = (1 to n).map { _ =>
        val a = alphabets(rnd.nextInt(alphabets.size))
        val cps = a.codePoints().toArray
        val len = rnd.nextInt(5)
        val piece = (0 until len).map(_ =>
          new String(Character.toChars(cps(rnd.nextInt(cps.length))))).mkString
        val score = java.lang.Float.intBitsToFloat(rnd.nextInt()) match {
          case f if f.isNaN => -1.5f // NaN != NaN breaks equality; real scores are finite
          case f => f
        }
        val ptype = Seq(1, 1, 1, 2, 3, 6)(rnd.nextInt(6))
        (piece, score, ptype)
      }
      val parsed = Unigram.parseModelProto(graft.tools.GenSpModel.encode(ps))
      assert(parsed == ps.map { case (p, s, t) => Unigram.SpPiece(p, s, t) },
        s"round-trip mismatch on $ps")
    }
  }

  test("parser: every truncation of a model either parses a piece-list prefix or fails cleanly") {
    // a user-supplied .model can arrive truncated or corrupt: the parser
    // must never ArrayIndexOutOfBounds and never silently mis-parse —
    // every prefix of the wire bytes either yields an exact PREFIX of
    // the full piece list (cut fell on a piece boundary) or raises the
    // parser's own IllegalArgumentException grammar
    val ps = GenSpModel.pieces.take(12)
    val full = Unigram.parseModelProto(GenSpModel.encode(ps))
    val bytes = GenSpModel.encode(ps)
    (0 until bytes.length).foreach { cut =>
      val t = java.util.Arrays.copyOf(bytes, cut)
      try {
        val got = Unigram.parseModelProto(t)
        assert(got == full.take(got.size),
          s"truncation at $cut must yield a prefix of the full list")
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains("model proto"),
            s"truncation at $cut must fail with the parser's grammar, got: ${e.getMessage}")
      }
    }
    // corrupt inner length: a piece submessage whose string length runs
    // past the submessage end must trip the bounds require, not read
    // neighbouring bytes
    val corrupt = bytes.clone()
    // find the first piece's string-length byte (tag 0x0a len ... tag 0x0a len)
    assert((corrupt(0) & 0xff) == 0x0a)
    val subLen = corrupt(1) & 0xff
    assert((corrupt(2) & 0xff) == 0x0a)
    corrupt(3) = (subLen + 100).toByte // string claims to be longer than its submessage
    val err = intercept[IllegalArgumentException](Unigram.parseModelProto(corrupt))
    assert(err.getMessage.contains("model proto"))
  }

  test("tokenIdsFromModel: model ids, byte fallback at model byte ids, </s>, lossless decode") {
    val m = Unigram.externalFixtureModel()
    val df = Seq(
      (1L, "scan merge the table"),   // all in the generator vocabulary
      (2L, "Qé 你 scan")               // OOV chars -> model BYTE ids
    ).toDF("doc_id", "text")
    val got = Unigram.tokenIdsFromModel(df, m)
      .select("doc_id", "token_ids").as[(Long, Seq[Int])].collect().toMap
    // every id is a valid model id; each doc ends with </s>=2
    got.values.foreach { ids =>
      assert(ids.last == 2)
      assert(ids.forall(i => i >= 0 && i < m.size))
    }
    // doc 1 never needs fallback (generator vocabulary covers it);
    // doc 2 must byte-fall-back on the OOV chars at the MODEL's ids
    assert(!got(1L).exists(i => i >= 3 && i <= 258), s"unexpected fallback: ${got(1L)}")
    val eBytes = "é".getBytes("UTF-8").map(b => 3 + (b & 0xff)).toSeq
    val cjkBytes = "你".getBytes("UTF-8").map(b => 3 + (b & 0xff)).toSeq
    assert((eBytes ++ cjkBytes).forall(got(2L).contains),
      s"OOV chars must surface at the model's BYTE ids: ${got(2L)}")
    // decode through the model's own (piece, id) table restores the
    // normalized text — byte-fallback chars included
    val vocabIds = m.zipWithIndex
      .filter(_._1.ptype == Unigram.SpNormal)
      .map { case (p, i) => (p.piece, i) }
    val rt = Unigram.tokenIdsFromModel(df, m)
      .select(col("doc_id"), ltrim(translate(
        org.apache.spark.sql.graft.VectorExpressions.unigramDecode(
          col("token_ids"), vocabIds, 3, 256),
        Unigram.SpMarker, " ")).as("text_rt"))
      .join(df, "doc_id")
      .select(col("doc_id"), col("text_rt"),
        TextAnalysis.normalizeText(col("text")).as("norm"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    rt.foreach { case (d, t, n) => assert(t == n, s"doc $d: '$t' != '$n'") }
  }
}
