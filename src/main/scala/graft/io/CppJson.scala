package graft.io

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, BigIntegerNode, BooleanNode, DoubleNode, JsonNodeFactory, LongNode, NullNode, ObjectNode, TextNode}

/** JSON parser with byte-exact error-message parity with the JSON library
  * the reference CLI links against (`/root/reference/lib/json/json.hpp`) —
  * the reference's `add`/`update` call `json::parse(argv[4])` before any
  * mutation (`main.cpp:70,153`) and surface the parser's `what()` text on
  * stderr, so the CLI's stderr is only byte-identical if the whole error
  * grammar matches:
  *
  *   `[json.exception.parse_error.101] parse error at line L, column C:
  *    syntax error while parsing <ctx> - <cause>[; expected <token>]`
  *
  * plus `out_of_range.406` for non-finite number conversions. Positions
  * count every `get()` including the one returning EOF (json.hpp:8364),
  * the raw-token context accumulates across structural/literal tokens and
  * resets only on string/number scans (json.hpp:7280,7995,8345), and
  * control characters in the context print as `<U+XXXX>` (json.hpp: lexer
  * `get_token_string`). Number typing follows the lexer: u64-or-i64 when
  * the integral token fits, else `strtod` with overflow -> out_of_range.
  *
  * Implemented over UTF-8 bytes so positions and UTF-8 validation behave
  * like the C++ byte stream.
  */
final class CppJsonException(msg: String) extends RuntimeException(msg)

object CppJson {

  def parse(s: String, requireEof: Boolean = true): JsonNode =
    parse(s.getBytes(StandardCharsets.UTF_8), requireEof)

  /** Byte-level entry point — file contents must NOT be decoded to a
    * String first, or ill-formed UTF-8 would be silently replaced with
    * U+FFFD before the lexer's validator sees it. */
  def parse(input: Array[Byte], requireEof: Boolean): JsonNode =
    new Parser(new Lexer(input), requireEof).parse()

  /** Compact re-serialization that Jackson can re-read with identical node
    * types (used to canonicalize CLI metadata for storage). */
  def compact(n: JsonNode): String = n.toString

  // ---- lexer ----------------------------------------------------------

  private final val EOF = -1

  private object Tok extends Enumeration {
    val LiteralTrue, LiteralFalse, LiteralNull, ValueString, ValueNumber,
        BeginArray, BeginObject, EndArray, EndObject, NameSeparator,
        ValueSeparator, ParseError, EndOfInput = Value
  }

  private def tokenName(t: Tok.Value): String = t match {
    case Tok.LiteralTrue => "true literal"
    case Tok.LiteralFalse => "false literal"
    case Tok.LiteralNull => "null literal"
    case Tok.ValueString => "string literal"
    case Tok.ValueNumber => "number literal"
    case Tok.BeginArray => "'['"
    case Tok.BeginObject => "'{'"
    case Tok.EndArray => "']'"
    case Tok.EndObject => "'}'"
    case Tok.NameSeparator => "':'"
    case Tok.ValueSeparator => "','"
    case Tok.ParseError => "<parse error>"
    case Tok.EndOfInput => "end of input"
  }

  private val controlNames = Array(
    "NUL", "SOH", "STX", "ETX", "EOT", "ENQ", "ACK", "BEL", "BS", "HT", "LF",
    "VT", "FF", "CR", "SO", "SI", "DLE", "DC1", "DC2", "DC3", "DC4", "NAK",
    "SYN", "ETB", "CAN", "EM", "SUB", "ESC", "FS", "GS", "RS", "US")
  private val shortEscapes = Map(0x08 -> "\\b", 0x09 -> "\\t", 0x0A -> "\\n",
    0x0C -> "\\f", 0x0D -> "\\r")

  private final class Lexer(input: Array[Byte]) {
    private var idx = 0 // next byte to read
    private var nextUnget = false
    var current: Int = 0 // last byte read (0..255) or EOF
    var charsReadTotal = 0
    var charsReadCurrentLine = 0
    var linesRead = 0
    private val tokenString = new java.io.ByteArrayOutputStream // raw bytes
    private val tokenBuffer = new java.lang.StringBuilder // cooked value
    var errorMessage: String = ""
    var stringValue: String = ""
    var numberNode: JsonNode = NullNode.getInstance()

    private var tokenLen = 0 // valid prefix of tokenString (supports unget)

    def get(): Int = {
      charsReadTotal += 1
      charsReadCurrentLine += 1
      if (nextUnget) nextUnget = false
      else current = if (idx < input.length) { val b = input(idx) & 0xFF; idx += 1; b } else EOF
      if (current != EOF) {
        if (tokenLen < tokenString.size) tokenString // keep existing byte
        else tokenString.write(current)
        tokenLen += 1
      }
      if (current == '\n') { linesRead += 1; charsReadCurrentLine = 0 }
      current
    }

    private def unget(): Unit = {
      nextUnget = true
      charsReadTotal -= 1
      if (charsReadCurrentLine == 0) { if (linesRead > 0) linesRead -= 1 }
      else charsReadCurrentLine -= 1
      if (current != EOF && tokenLen > 0) tokenLen -= 1
    }

    private def reset(): Unit = {
      tokenBuffer.setLength(0)
      tokenString.reset()
      tokenLen = 0
      tokenString.write(current)
      tokenLen = 1
    }

    /** Raw token context with control bytes escaped as `<U+XXXX>`, decoded
      * as UTF-8 so well-formed multi-byte input re-encodes to the same
      * bytes the C++ binary echoes. */
    def tokenContext: String = {
      val raw = tokenString.toByteArray.take(tokenLen)
      val out = new java.io.ByteArrayOutputStream
      raw.foreach { b =>
        val u = b & 0xFF
        if (u <= 0x1F) out.write(f"<U+$u%04X>".getBytes(StandardCharsets.US_ASCII))
        else out.write(u)
      }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    }

    def line: Int = linesRead + 1
    def column: Int = charsReadCurrentLine

    private def skipWhitespace(): Unit = {
      do get()
      while (current == ' ' || current == '\t' || current == '\n' || current == '\r')
    }

    def scan(): Tok.Value = {
      if (charsReadTotal == 0 && input.length >= 1 && (input(0) & 0xFF) == 0xEF) {
        // BOM: json.hpp skip_bom short-circuits — a mismatch stops reading
        // at the offending byte, which fixes the reported column
        get()
        if (get() != 0xBB || get() != 0xBF) {
          errorMessage = "invalid BOM; must be 0xEF 0xBB 0xBF if given"
          return Tok.ParseError
        }
      }
      skipWhitespace()
      current match {
        case '[' => Tok.BeginArray
        case ']' => Tok.EndArray
        case '{' => Tok.BeginObject
        case '}' => Tok.EndObject
        case ':' => Tok.NameSeparator
        case ',' => Tok.ValueSeparator
        case 't' => scanLiteral("true", Tok.LiteralTrue)
        case 'f' => scanLiteral("false", Tok.LiteralFalse)
        case 'n' => scanLiteral("null", Tok.LiteralNull)
        case '"' => scanString()
        case '-' | '0' | '1' | '2' | '3' | '4' | '5' | '6' | '7' | '8' | '9' => scanNumber()
        case EOF => Tok.EndOfInput
        case _ => errorMessage = "invalid literal"; Tok.ParseError
      }
    }

    private def scanLiteral(lit: String, t: Tok.Value): Tok.Value = {
      var i = 1
      while (i < lit.length) {
        if (get() != lit.charAt(i)) { errorMessage = "invalid literal"; return Tok.ParseError }
        i += 1
      }
      t
    }

    private def err(msg: String): Tok.Value = { errorMessage = msg; Tok.ParseError }

    private def get4Hex(): Int = {
      var cp = 0
      var i = 0
      while (i < 4) {
        val c = get()
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else return -1
        cp = (cp << 4) | d
        i += 1
      }
      cp
    }

    private def scanString(): Tok.Value = {
      reset()
      while (true) {
        get() match {
          case EOF => return err("invalid string: missing closing quote")
          case '"' => stringValue = tokenBuffer.toString; return Tok.ValueString
          case '\\' =>
            get() match {
              case '"' => tokenBuffer.append('"')
              case '\\' => tokenBuffer.append('\\')
              case '/' => tokenBuffer.append('/')
              case 'b' => tokenBuffer.append('\b')
              case 'f' => tokenBuffer.append('\f')
              case 'n' => tokenBuffer.append('\n')
              case 'r' => tokenBuffer.append('\r')
              case 't' => tokenBuffer.append('\t')
              case 'u' =>
                val cp1 = get4Hex()
                if (cp1 < 0) return err("invalid string: '\\u' must be followed by 4 hex digits")
                if (cp1 >= 0xD800 && cp1 <= 0xDBFF) {
                  if (get() != '\\')
                    return err("invalid string: surrogate U+D800..U+DBFF must be followed by U+DC00..U+DFFF")
                  if (get() != 'u')
                    return err("invalid string: surrogate U+D800..U+DBFF must be followed by U+DC00..U+DFFF")
                  val cp2 = get4Hex()
                  if (cp2 < 0) return err("invalid string: '\\u' must be followed by 4 hex digits")
                  if (cp2 < 0xDC00 || cp2 > 0xDFFF)
                    return err("invalid string: surrogate U+D800..U+DBFF must be followed by U+DC00..U+DFFF")
                  tokenBuffer.appendCodePoint(0x10000 + ((cp1 - 0xD800) << 10) + (cp2 - 0xDC00))
                } else if (cp1 >= 0xDC00 && cp1 <= 0xDFFF) {
                  return err("invalid string: surrogate U+DC00..U+DFFF must follow U+D800..U+DBFF")
                } else tokenBuffer.appendCodePoint(cp1)
              case _ => return err("invalid string: forbidden character after backslash")
            }
          case c if c <= 0x1F =>
            val esc = shortEscapes.get(c).map(e => s" or $e").getOrElse("")
            return err(f"invalid string: control character U+${c}%04X (${controlNames(c)}) must be escaped to \\u${c}%04X$esc")
          case c if c <= 0x7F => tokenBuffer.append(c.toChar)
          case c => // UTF-8 multi-byte sequence, validated like json.hpp:7254
            def cont(lo: Int, hi: Int): Int = {
              val b = get(); if (b >= lo && b <= hi) b else -1
            }
            var cp = -1
            if (c >= 0xC2 && c <= 0xDF) {
              val b1 = cont(0x80, 0xBF)
              if (b1 >= 0) cp = ((c & 0x1F) << 6) | (b1 & 0x3F)
            } else if (c == 0xE0) {
              val b1 = cont(0xA0, 0xBF); val b2 = if (b1 >= 0) cont(0x80, 0xBF) else -1
              if (b2 >= 0) cp = ((c & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
            } else if ((c >= 0xE1 && c <= 0xEC) || c == 0xEE || c == 0xEF) {
              val b1 = cont(0x80, 0xBF); val b2 = if (b1 >= 0) cont(0x80, 0xBF) else -1
              if (b2 >= 0) cp = ((c & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
            } else if (c == 0xED) {
              val b1 = cont(0x80, 0x9F); val b2 = if (b1 >= 0) cont(0x80, 0xBF) else -1
              if (b2 >= 0) cp = ((c & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
            } else if (c == 0xF0) {
              val b1 = cont(0x90, 0xBF); val b2 = if (b1 >= 0) cont(0x80, 0xBF) else -1
              val b3 = if (b2 >= 0) cont(0x80, 0xBF) else -1
              if (b3 >= 0) cp = ((c & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F)
            } else if (c >= 0xF1 && c <= 0xF3) {
              val b1 = cont(0x80, 0xBF); val b2 = if (b1 >= 0) cont(0x80, 0xBF) else -1
              val b3 = if (b2 >= 0) cont(0x80, 0xBF) else -1
              if (b3 >= 0) cp = ((c & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F)
            } else if (c == 0xF4) {
              val b1 = cont(0x80, 0x8F); val b2 = if (b1 >= 0) cont(0x80, 0xBF) else -1
              val b3 = if (b2 >= 0) cont(0x80, 0xBF) else -1
              if (b3 >= 0) cp = ((c & 0x07) << 18) | ((b1 & 0x3F) << 12) | ((b2 & 0x3F) << 6) | (b3 & 0x3F)
            }
            if (cp < 0) return err("invalid string: ill-formed UTF-8 byte")
            tokenBuffer.appendCodePoint(cp)
        }
      }
      Tok.ParseError // unreachable
    }

    private def scanNumber(): Tok.Value = {
      reset()
      val num = new java.lang.StringBuilder
      num.append(current.toChar)
      var isFloat = false
      var state =
        if (current == '-') 'm'
        else if (current == '0') 'z'
        else 'i'
      var done = false
      while (!done) {
        val c = get()
        state match {
          case 'm' => // after leading minus: need a digit
            if (c == '0') state = 'z'
            else if (c >= '1' && c <= '9') state = 'i'
            else return err("invalid number; expected digit after '-'")
            num.append(c.toChar)
          case 'z' => // after leading zero
            if (c == '.') { isFloat = true; state = 'd'; num.append('.') }
            else if (c == 'e' || c == 'E') { isFloat = true; state = 'e'; num.append(c.toChar) }
            else { unget(); done = true }
          case 'i' => // integer digits
            if (c >= '0' && c <= '9') num.append(c.toChar)
            else if (c == '.') { isFloat = true; state = 'd'; num.append('.') }
            else if (c == 'e' || c == 'E') { isFloat = true; state = 'e'; num.append(c.toChar) }
            else { unget(); done = true }
          case 'd' => // just after decimal point: need a digit
            if (c >= '0' && c <= '9') { state = 'f'; num.append(c.toChar) }
            else return err("invalid number; expected digit after '.'")
          case 'f' => // fraction digits
            if (c >= '0' && c <= '9') num.append(c.toChar)
            else if (c == 'e' || c == 'E') { state = 'e'; num.append(c.toChar) }
            else { unget(); done = true }
          case 'e' => // just after exponent char
            if (c == '+' || c == '-') { state = 's'; num.append(c.toChar) }
            else if (c >= '0' && c <= '9') { state = 'x'; num.append(c.toChar) }
            else return err("invalid number; expected '+', '-', or digit after exponent")
          case 's' => // just after exponent sign
            if (c >= '0' && c <= '9') { state = 'x'; num.append(c.toChar) }
            else return err("invalid number; expected digit after exponent sign")
          case 'x' => // exponent digits
            if (c >= '0' && c <= '9') num.append(c.toChar)
            else { unget(); done = true }
        }
      }
      val tok = num.toString
      if (!isFloat) {
        val big = BigInt(tok)
        if (tok.startsWith("-")) {
          if (big >= Long.MinValue) { numberNode = LongNode.valueOf(big.longValue); return Tok.ValueNumber }
        } else {
          if (big.bitLength <= 63) { numberNode = LongNode.valueOf(big.longValue); return Tok.ValueNumber }
          if (big.bitLength <= 64) { numberNode = BigIntegerNode.valueOf(big.bigInteger); return Tok.ValueNumber }
        }
      }
      val d = java.lang.Double.parseDouble(tok)
      if (d.isInfinite)
        throw new CppJsonException(s"[json.exception.out_of_range.406] number overflow parsing '$tok'")
      numberNode = DoubleNode.valueOf(d)
      Tok.ValueNumber
    }
  }

  // ---- parser ---------------------------------------------------------

  private final class Parser(lex: Lexer, requireEof: Boolean) {
    private val nf = JsonNodeFactory.instance

    private def fail(msg: String): Nothing =
      throw new CppJsonException(
        s"[json.exception.parse_error.101] parse error at line ${lex.line}, column ${lex.column}: $msg")

    /** json.hpp parser::exception_message — lexer errors carry the raw
      * context, parser errors name the unexpected token. */
    private def syntaxError(context: String, last: Tok.Value, expected: Option[Tok.Value]): Nothing = {
      val cause =
        if (last == Tok.ParseError) s"${lex.errorMessage}; last read: '${lex.tokenContext}'"
        else s"unexpected ${tokenName(last)}"
      val exp = expected match {
        case Some(Tok.EndOfInput) => "; expected end of input"
        case Some(t) => s"; expected ${tokenName(t)}"
        case None => ""
      }
      fail(s"syntax error while parsing $context - $cause$exp")
    }

    private def literalOrValue(context: String, last: Tok.Value): Nothing =
      if (last == Tok.ParseError) syntaxError(context, last, None)
      else fail(s"syntax error while parsing $context - unexpected ${tokenName(last)}; expected '[', '{', or a literal")

    def parse(): JsonNode = {
      val node = parseValue(lex.scan())
      if (requireEof) {
        val t2 = lex.scan()
        if (t2 != Tok.EndOfInput) syntaxError("value", t2, Some(Tok.EndOfInput))
      }
      node
    }

    private def parseValue(t: Tok.Value): JsonNode = t match {
      case Tok.LiteralTrue => BooleanNode.TRUE
      case Tok.LiteralFalse => BooleanNode.FALSE
      case Tok.LiteralNull => NullNode.getInstance()
      case Tok.ValueString => TextNode.valueOf(lex.stringValue)
      case Tok.ValueNumber => lex.numberNode
      case Tok.BeginObject => parseObject()
      case Tok.BeginArray => parseArray()
      case Tok.EndOfInput if lex.charsReadTotal == 1 =>
        // json.hpp:13204 — the whole input was one EOF read
        fail("attempting to parse an empty input; check that your input string or stream contains the expected JSON")
      case _ => literalOrValue("value", t)
    }

    private def parseObject(): ObjectNode = {
      val obj = new ObjectNode(nf)
      var t = lex.scan()
      if (t == Tok.EndObject) return obj
      while (true) {
        if (t != Tok.ValueString) syntaxError("object key", t, Some(Tok.ValueString))
        val key = lex.stringValue
        val sep = lex.scan()
        if (sep != Tok.NameSeparator) syntaxError("object separator", sep, Some(Tok.NameSeparator))
        obj.set[JsonNode](key, parseValue(lex.scan()))
        lex.scan() match {
          case Tok.ValueSeparator => t = lex.scan()
          case Tok.EndObject => return obj
          case other => syntaxError("object", other, Some(Tok.EndObject))
        }
      }
      obj // unreachable
    }

    private def parseArray(): ArrayNode = {
      val arr = new ArrayNode(nf)
      var t = lex.scan()
      if (t == Tok.EndArray) return arr
      while (true) {
        arr.add(parseValue(t))
        lex.scan() match {
          case Tok.ValueSeparator => t = lex.scan()
          case Tok.EndArray => return arr
          case other => syntaxError("array", other, Some(Tok.EndArray))
        }
      }
      arr // unreachable
    }
  }

}
