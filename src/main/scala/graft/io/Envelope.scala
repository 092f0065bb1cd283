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

  /** nlohmann type name for a Jackson node (json.hpp `type_name()`), used
    * in the corruption-error texts below. */
  private def typeName(n: JsonNode): String =
    if (n == null || n.isNull) "null"
    else if (n.isObject) "object"
    else if (n.isArray) "array"
    else if (n.isTextual) "string"
    else if (n.isBoolean) "boolean"
    else "number"

  /** `j.at(key)` parity: at() on a non-object → type_error.304; missing
    * key → out_of_range.403. */
  private def at(n: JsonNode, key: String): JsonNode = {
    if (!n.isObject)
      throw new CppJsonException(
        s"[json.exception.type_error.304] cannot use at() with ${typeName(n)}")
    val v = n.get(key)
    if (v == null)
      throw new CppJsonException(s"[json.exception.out_of_range.403] key '$key' not found")
    v
  }

  /** `get<arithmetic>` parity: numbers AND booleans convert (nlohmann's
    * arithmetic from_json casts booleans), everything else is 302. */
  private def numberOf(n: JsonNode): Double = {
    if (n.isBoolean) return if (n.asBoolean()) 1.0 else 0.0
    if (!n.isNumber)
      throw new CppJsonException(
        s"[json.exception.type_error.302] type must be number, but is ${typeName(n)}")
    n.asDouble()
  }

  /** Reference `load()` semantics (`vectordb.cpp:180-218`): missing file →
    * None ("start fresh", :183-186); malformed JSON → runtime error with the
    * JSON parser's message (:191-194); missing/mistyped fields → the
    * "corrupted" error with the `at()`/`get<>` message (:212-214). Parsed
    * with [[CppJson]] so both error texts are byte-identical to the CLI's. */
  def load(path: String): Option[Db] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return None
    val root =
      // parse the raw bytes: decoding to String first would replace
      // ill-formed UTF-8 before the parser's validator can report it
      try CppJson.parse(Files.readAllBytes(p), requireEof = false)
      catch {
        case e: CppJsonException =>
          throw new RuntimeException(s"Failed to parse database file (JSON error): ${e.getMessage}")
      }
    try {
      val dim = numberOf(at(root, "dim")).toInt
      val nextId = numberOf(at(root, "nextId")).toLong
      val vectorsNode = if (root.has("vectors")) root.get("vectors") else null
      // nlohmann range-for semantics: arrays iterate elements, objects
      // iterate member values, null iterates nothing, and any other
      // primitive iterates ONCE over the value itself (so a corrupted
      // scalar "vectors" fails inside at(), exactly like the reference)
      val elems: Iterator[JsonNode] =
        if (vectorsNode == null || vectorsNode.isNull) Iterator.empty
        else if (vectorsNode.isArray || vectorsNode.isObject) vectorsNode.elements().asScala
        else Iterator.single(vectorsNode)
      val records = elems.map { v =>
        val id = numberOf(at(v, "id")).toLong
        val meta = compact(at(v, "metadata"))
        val vecNode = at(v, "vec")
        if (!vecNode.isArray)
          throw new CppJsonException(
            s"[json.exception.type_error.302] type must be array, but is ${typeName(vecNode)}")
        val vec = vecNode.elements().asScala.map(e => numberOf(e).toFloat).toArray
        VectorRecord(id, vec, meta)
      }.toSeq
      Some(Db(dim, nextId, records))
    } catch {
      case e: CppJsonException =>
        throw new RuntimeException(s"Database file is corrupted (missing fields): ${e.getMessage}")
    }
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
    // reference quirk: `json& j_vectors = j["vectors"]` (vectordb.cpp:162)
    // stays null when no records are pushed, so an empty db serializes
    // "vectors": null — not []
    if (db.records.isEmpty) sb.append("null")
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

  /** Hard cap on envelope-sink rows: the single-document JSON format
    * requires collecting every row to the driver, so an unbounded
    * store would OOM the driver with no explanation. Above the cap the
    * save REFUSES with an error naming the scale path instead. */
  val MaxEnvelopeRows = 1000000L

  def saveDataset(dim: Int, nextId: Long, ds: Dataset[VectorRecord], path: String,
      maxRows: Long = MaxEnvelopeRows): Unit = {
    // Parity-shim scale note: the envelope is one JSON document, so the
    // rows must land on the driver; collect is inherent to the format.
    // Guard via ONE bounded collect — limit(cap + 1) — so the upstream
    // dataset is computed once (count + collect would pay it twice and
    // open a TOCTOU window between the two), the driver never holds
    // more than cap + 1 rows, and a 100 TB store pointed at the parity
    // sink fails with instructions, not an executor-to-driver OOM.
    val cap = math.min(maxRows, Int.MaxValue - 1L).toInt
    val rows = ds.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"envelope save refused: more than $cap rows (the " +
        "single-document JSON cap — the whole envelope must materialize " +
        "on the driver); use VectorStore.saveParquet for a distributed " +
        "sink, or filter the store before exporting an envelope")
    save(Db(dim, nextId, rows.toSeq), path)
  }

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

  /** nlohmann-style number formatting: digits from [[Grisu]] (the same
    * Grisu2 shortest-digit algorithm the vendored dtoa runs,
    * json.hpp:18440-18568) laid out by the exact `format_buffer` rules
    * (json.hpp:18600-18667, kMinExp=-4, kMaxExp=digits10=15, `e±XX`
    * exponents ≥2 digits): decimal "digits000.0" / "dig.its" /
    * "0.000digits" inside the exponent window, scientific outside.
    * Non-finite values emit "null" like `dump_float` (json.hpp:19669). */
  private[io] def num(d: Double): String = {
    if (d.isNaN || d.isInfinite) return "null"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val (digits, exp10) = Grisu.shortest(math.abs(d))
    val k = digits.length
    val n = k + exp10 // decimal point position in the digit string
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
    else if (n.isIntegralNumber)
      // u64 values above Long.MaxValue keep full digits (nlohmann stores
      // them as number_unsigned and dumps the decimal digits)
      sb.append(if (n.canConvertToLong) n.asLong().toString else n.bigIntegerValue().toString)
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
