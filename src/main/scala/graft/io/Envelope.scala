package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.VectorRecord

/** Reference-format single-document JSON envelope source/sink —
  * `{"dim": int, "nextId": long, "vectors": [{"id","metadata","vec"}...]}`
  * as written by `save()` (`/root/reference/src/vectordb.cpp:158-178`,
  * 2-space pretty print, keys alphabetized) and read by `load()`
  * (`vectordb.cpp:180-218`).
  *
  * The file is ONE JSON object (not JSON-lines), so it is parsed/emitted
  * driver-side. This format is a compatibility shim for reference parity;
  * the scale path is Parquet (SURVEY §7.5 risk 6). Float32 values are
  * widened to float64 before emission, reproducing nlohmann's artifacts
  * (`1.1f` → `1.100000023841858`, `my_db.json:21-22`); parsing narrows
  * back to float32, which is lossless for values that originated as
  * float32.
  */
object Envelope {

  /** Parsed envelope: schema constant + id cursor + rows. */
  final case class Db(dim: Int, nextId: Long, records: Seq[VectorRecord])

  private val mapper = new ObjectMapper()

  /** Reference `load()` semantics: missing file → None ("start fresh",
    * `vectordb.cpp:183-186`); malformed JSON / missing fields → throw
    * (`vectordb.cpp:191-194,212-214`). */
  def load(path: String): Option[Db] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return None
    val root = mapper.readTree(Files.readString(p, StandardCharsets.UTF_8))
    require(root != null && root.isObject, s"Envelope $path: not a JSON object")
    require(root.has("dim") && root.has("nextId") && root.has("vectors"),
      s"Envelope $path: missing dim/nextId/vectors")
    val dim = root.get("dim").asInt()
    val nextId = root.get("nextId").asLong()
    val records = root.get("vectors").elements().asScala.map { v =>
      require(v.has("id") && v.has("vec"), s"Envelope $path: record missing id/vec")
      val vec = v.get("vec").elements().asScala.map(_.asDouble().toFloat).toArray
      val meta = if (v.has("metadata")) compact(v.get("metadata")) else null
      VectorRecord(v.get("id").asLong(), vec, meta)
    }.toSeq
    Some(Db(dim, nextId, records))
  }

  def loadDataset(spark: SparkSession, path: String): Option[(Int, Long, Dataset[VectorRecord])] =
    load(path).map { db =>
      import spark.implicits._
      (db.dim, db.nextId, spark.createDataset(db.records))
    }

  /** Write in the reference's exact byte format (verified against
    * `my_db.json`): alphabetized keys, 2-space indent, one array element
    * per line, `"key": value` spacing, no trailing newline. */
  def save(db: Db, path: String): Unit = {
    val sb = new java.lang.StringBuilder(1 << 16)
    sb.append("{\n  \"dim\": ").append(db.dim)
    sb.append(",\n  \"nextId\": ").append(db.nextId)
    sb.append(",\n  \"vectors\": ")
    if (db.records.isEmpty) sb.append("[]")
    else {
      sb.append("[\n")
      var first = true
      db.records.sortBy(_.id).foreach { r =>
        if (!first) sb.append(",\n")
        first = false
        sb.append("    {\n      \"id\": ").append(r.id)
        sb.append(",\n      \"metadata\": ")
        emit(parse(r.metadata), sb, indent = 6)
        sb.append(",\n      \"vec\": ")
        if (r.embedding.isEmpty) sb.append("[]")
        else {
          sb.append("[\n")
          sb.append(r.embedding.map(f => "        " + num(f.toDouble)).mkString(",\n"))
          sb.append("\n      ]")
        }
        sb.append("\n    }")
      }
      sb.append("\n  ]")
    }
    sb.append("\n}")
    Files.writeString(Paths.get(path), sb.toString, StandardCharsets.UTF_8)
  }

  def saveDataset(dim: Int, nextId: Long, ds: Dataset[VectorRecord], path: String): Unit =
    // Parity-shim scale note: the envelope is one JSON document, so the
    // rows must land on the driver; collect is inherent to the format.
    save(Db(dim, nextId, ds.collect().toSeq), path)

  private def parse(meta: String): JsonNode =
    if (meta == null) mapper.nullNode()
    else mapper.readTree(meta)

  /** nlohmann-`dump(2)`-style pretty print of a JSON string (sorted keys,
    * 2-space indent) — the format the reference CLI prints metadata in
    * (`/root/reference/src/main.cpp:84`). */
  def dump2(json: String): String = {
    val sb = new java.lang.StringBuilder
    emit(parse(json), sb, indent = 0)
    sb.toString
  }

  private def compact(n: JsonNode): String = mapper.writeValueAsString(n)

  /** nlohmann-style number formatting, re-implementing the exact
    * `format_buffer` rules of the vendored dtoa (json.hpp:18600-18667,
    * kMinExp=-4, kMaxExp=digits10=15, `e±XX` exponents ≥2 digits):
    * decimal "digits000.0" / "dig.its" / "0.000digits" inside the
    * exponent window, scientific outside. Digits come from Java's
    * shortest-distinguishing repr; a handful of extreme values (e.g.
    * float32 subnormals) get one more digit on Java 17 than Grisu2
    * emits — still round-trip-exact, just not byte-identical there. */
  private[io] def num(d: Double): String = {
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val repr = java.lang.Double.toString(math.abs(d))
    val (mant, exp10) =
      if (repr.contains('E')) { val Array(m, e) = repr.split('E'); (m, e.toInt) }
      else (repr, 0)
    val idx = mant.indexOf('.')
    val digitsRaw = mant.replace(".", "")
    val lead = digitsRaw.takeWhile(_ == '0').length
    val digits0 = digitsRaw.drop(lead).reverse.dropWhile(_ == '0').reverse
    val digits = if (digits0.isEmpty) "0" else digits0
    val n = idx - lead + exp10 // decimal point position in the digit string
    val k = digits.length
    val out =
      if (k <= n && n <= 15) digits + ("0" * (n - k)) + ".0"
      else if (0 < n && n <= 15) digits.take(n) + "." + digits.drop(n)
      else if (-4 < n && n <= 0) "0." + ("0" * -n) + digits
      else {
        val e = n - 1
        val m = if (k == 1) digits else digits.take(1) + "." + digits.drop(1)
        f"${m}e${if (e < 0) "-" else "+"}${math.abs(e)}%02d"
      }
    if (neg) "-" + out else out
  }

  /** Recursive nlohmann-dump(2)-style emitter: object keys sorted,
    * 2-space indent per level, space after colon. */
  private def emit(n: JsonNode, sb: java.lang.StringBuilder, indent: Int): Unit = {
    val pad = " " * indent
    val childPad = " " * (indent + 2)
    if (n == null || n.isNull) sb.append("null")
    else if (n.isObject) {
      val fields = n.properties().asScala.toSeq.sortBy(_.getKey)
      if (fields.isEmpty) sb.append("{}")
      else {
        sb.append("{\n")
        fields.zipWithIndex.foreach { case (e, i) =>
          if (i > 0) sb.append(",\n")
          sb.append(childPad).append(quote(e.getKey)).append(": ")
          emit(e.getValue, sb, indent + 2)
        }
        sb.append("\n").append(pad).append("}")
      }
    } else if (n.isArray) {
      val elems = n.elements().asScala.toSeq
      if (elems.isEmpty) sb.append("[]")
      else {
        sb.append("[\n")
        elems.zipWithIndex.foreach { case (e, i) =>
          if (i > 0) sb.append(",\n")
          sb.append(childPad)
          emit(e, sb, indent + 2)
        }
        sb.append("\n").append(pad).append("]")
      }
    } else if (n.isTextual) sb.append(quote(n.textValue()))
    else if (n.isIntegralNumber) sb.append(n.asLong().toString)
    else if (n.isFloatingPointNumber) sb.append(num(n.asDouble()))
    else if (n.isBoolean) sb.append(n.asBoolean().toString)
    else sb.append(n.toString)
  }

  private def quote(s: String): String = {
    val b = new java.lang.StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case '\b' => b.append("\\b")
      case '\f' => b.append("\\f")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append("\"").toString
  }
}
