package graft.io

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** [[CppJson]] error-message parity. The pinned cases were captured by
  * running the compiled reference binary; the fuzz section compiles a
  * helper around the same json.hpp and compares ok/error plus the exact
  * error text for thousands of adversarial inputs. */
class CppJsonSpec extends AnyFunSuite {

  private def err(s: String): String =
    try { CppJson.parse(s); "OK" }
    catch { case e: CppJsonException => e.getMessage }

  private def p101(lc: (Int, Int), msg: String): String =
    s"[json.exception.parse_error.101] parse error at line ${lc._1}, column ${lc._2}: $msg"

  test("pinned parse-error texts match the reference binary's observed output") {
    assert(err("notjson") == p101((1, 2),
      "syntax error while parsing value - invalid literal; last read: 'no'"))
    assert(err("{") == p101((1, 2),
      "syntax error while parsing object key - unexpected end of input; expected string literal"))
    assert(err("""{"a":}""") == p101((1, 6),
      "syntax error while parsing value - unexpected '}'; expected '[', '{', or a literal"))
    assert(err("") == p101((1, 1),
      "attempting to parse an empty input; check that your input string or stream contains the expected JSON"))
    assert(err("[1,2") == p101((1, 5),
      "syntax error while parsing array - unexpected end of input; expected ']'"))
    assert(err("\"abc") == p101((1, 5),
      "syntax error while parsing value - invalid string: missing closing quote; last read: '\"abc'"))
    assert(err("1 2") == p101((1, 3),
      "syntax error while parsing value - unexpected number literal; expected end of input"))
    assert(err("{}extra") == p101((1, 3),
      "syntax error while parsing value - invalid literal; last read: '{}e'; expected end of input"))
    assert(err("tru") == p101((1, 4),
      "syntax error while parsing value - invalid literal; last read: 'tru'"))
    assert(err("falseX") == p101((1, 6),
      "syntax error while parsing value - invalid literal; last read: 'falseX'; expected end of input"))
    assert(err("-a") == p101((1, 2),
      "syntax error while parsing value - invalid number; expected digit after '-'; last read: '-a'"))
    assert(err("1.") == p101((1, 3),
      "syntax error while parsing value - invalid number; expected digit after '.'; last read: '1.'"))
    assert(err("1e") == p101((1, 3),
      "syntax error while parsing value - invalid number; expected '+', '-', or digit after exponent; last read: '1e'"))
    assert(err("1e+") == p101((1, 4),
      "syntax error while parsing value - invalid number; expected digit after exponent sign; last read: '1e+'"))
    assert(err("01") == p101((1, 2),
      "syntax error while parsing value - unexpected number literal; expected end of input"))
    assert(err("\"a\\x\"") == p101((1, 4),
      "syntax error while parsing value - invalid string: forbidden character after backslash; last read: '\"a\\x'"))
    assert(err("\"a\\u12\"") == p101((1, 7),
      "syntax error while parsing value - invalid string: '\\u' must be followed by 4 hex digits; last read: '\"a\\u12\"'"))
    assert(err("+1") == p101((1, 1),
      "syntax error while parsing value - invalid literal; last read: '+'"))
    assert(err("""{"a" 1}""") == p101((1, 6),
      "syntax error while parsing object separator - unexpected number literal; expected ':'"))
    assert(err("""{"a":1,}""") == p101((1, 8),
      "syntax error while parsing object key - unexpected '}'; expected string literal"))
    assert(err("[1 2]") == p101((1, 4),
      "syntax error while parsing array - unexpected number literal; expected ']'"))
    assert(err("[,]") == p101((1, 2),
      "syntax error while parsing value - unexpected ','; expected '[', '{', or a literal"))
    assert(err("""{"a":1 "b":2}""") == p101((1, 10),
      "syntax error while parsing object - unexpected string literal; expected '}'"))
    assert(err("\"a\tb\"") == p101((1, 3),
      "syntax error while parsing value - invalid string: control character U+0009 (HT) must be escaped to \\u0009 or \\t; last read: '\"a<U+0009>'"))
    assert(err("\"a\nb\"") == p101((2, 0),
      "syntax error while parsing value - invalid string: control character U+000A (LF) must be escaped to \\u000A or \\n; last read: '\"a<U+000A>'"))
    assert(err("\"\\ud800x\"") == p101((1, 8),
      "syntax error while parsing value - invalid string: surrogate U+D800..U+DBFF must be followed by U+DC00..U+DFFF; last read: '\"\\ud800x'"))
    assert(err("\"\\udc00\"") == p101((1, 7),
      "syntax error while parsing value - invalid string: surrogate U+DC00..U+DFFF must follow U+D800..U+DBFF; last read: '\"\\udc00'"))
    assert(err("{\n\"a\":}") == p101((2, 5),
      "syntax error while parsing value - unexpected '}'; expected '[', '{', or a literal"))
    assert(err("1e999") ==
      "[json.exception.out_of_range.406] number overflow parsing '1e999'")
    // bad BOM: column counts the short-circuited skip_bom reads (3 for
    // EF BB x, 2 for EF x); the raw-byte echo is U+FFFD-substituted here
    // because a JVM String cannot carry lone invalid bytes
    def errBytes(b: Array[Byte]): String =
      try { CppJson.parse(b, requireEof = true); "OK" }
      catch { case e: CppJsonException => e.getMessage }
    assert(errBytes(Array(0xEF.toByte, 0xBB.toByte, 'A'.toByte))
      .startsWith(p101((1, 3), "syntax error while parsing value - invalid BOM; must be 0xEF 0xBB 0xBF if given; last read: '")))
    assert(errBytes(Array(0xEF.toByte, 'A'.toByte))
      .startsWith(p101((1, 2), "syntax error while parsing value - invalid BOM; must be 0xEF 0xBB 0xBF if given; last read: '")))
    // a correct BOM is consumed silently
    assert(errBytes("﻿{\"a\": 1}".getBytes(java.nio.charset.StandardCharsets.UTF_8)) == "OK")
    assert(err("""{"a":1e999}""") ==
      "[json.exception.out_of_range.406] number overflow parsing '1e999'")
  }

  test("number typing: u64/i64 stay integral, overflow falls back to double") {
    assert(CppJson.parse("18446744073709551615").bigIntegerValue().toString == "18446744073709551615")
    assert(CppJson.parse("18446744073709551616").isDouble) // > u64 max → strtod
    assert(CppJson.parse("-9223372036854775808").isLong)
    assert(CppJson.parse("-9223372036854775809").isDouble)
    assert(CppJson.parse("1e-999").asDouble() == 0.0) // underflow is not an error
    assert(CppJson.parse("1e2").isDouble) // exponent form is always float
  }

  private lazy val helper: Option[String] = {
    val out = Paths.get("/tmp/graft_refbin/parsej")
    val src = Paths.get("/tmp/graft_refbin/parsej.cpp")
    try {
      Files.createDirectories(out.getParent)
      if (!Files.exists(out)) {
        // reads the input from stdin as raw bytes: argv transport would
        // re-encode non-ASCII through the JVM's platform charset
        Files.writeString(src,
          """#include "json.hpp"
            |#include <cstdio>
            |#include <string>
            |int main(){
            |  std::string s; int c;
            |  while ((c = fgetc(stdin)) != EOF) s.push_back((char)c);
            |  try { nlohmann::json j = nlohmann::json::parse(s); printf("OK\n"); }
            |  catch (const std::exception& e) { printf("%s\n", e.what()); }
            |  return 0;
            |}
            |""".stripMargin)
        val cmd = Seq("g++", "-std=c++17", "-O2", "-I/root/reference/lib/json",
          "-o", out.toString, src.toString)
        if (cmd.! != 0) None else Some(out.toString)
      } else Some(out.toString)
    } catch { case _: Exception => None }
  }

  test("fuzz: ok/error status and full error text match nlohmann for adversarial inputs") {
    assume(helper.isDefined, "no C++ toolchain available")
    val rnd = new scala.util.Random(0xBEEF)
    val alphabet = "{}[]\",:0123456789.eE+-truefalsnl \\uab \t"
    val seeds = Seq("""{"a": [1, 2.5, -3e4], "b": {"c": null, "d": "x\ny"}}""",
      """[true, false, null, "\u00e9\ud83d\ude00", 1e-3]""", """{"k":"v"}""")
    def mutate(s: String): String = {
      val sb = new StringBuilder(s)
      val n = 1 + rnd.nextInt(3)
      (1 to n).foreach { _ =>
        if (sb.isEmpty) sb.append(alphabet(rnd.nextInt(alphabet.length)))
        else rnd.nextInt(3) match {
          case 0 => sb.deleteCharAt(rnd.nextInt(sb.length))
          case 1 => sb.insert(rnd.nextInt(sb.length + 1), alphabet(rnd.nextInt(alphabet.length)))
          case _ => sb.setCharAt(rnd.nextInt(sb.length), alphabet(rnd.nextInt(alphabet.length)))
        }
      }
      sb.toString
    }
    val randoms = (1 to 600).map(_ =>
      (1 to 1 + rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val mutated = (1 to 600).map(_ => mutate(seeds(rnd.nextInt(seeds.length))))
    val inputs = (randoms ++ mutated).filterNot(_.contains('\u0000'))

    def ascii(s: String): String =
      s.flatMap(c => if (c >= ' ' && c < 127) c.toString else f"\\u${c.toInt}%04x")
    val mismatches = inputs.flatMap { s =>
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      // capture the helper's stdout as bytes and decode UTF-8 explicitly:
      // .!! would decode with the platform charset and mangle non-ASCII
      val outBuf = new java.io.ByteArrayOutputStream
      val io = new ProcessIO(
        in => { in.write(bytes); in.close() },
        out => { out.transferTo(outBuf); out.close() },
        errS => errS.close())
      Process(Seq(helper.get)).run(io).exitValue()
      val want = new String(outBuf.toByteArray, java.nio.charset.StandardCharsets.UTF_8).stripSuffix("\n")
      val got =
        try { CppJson.parse(s); "OK" }
        catch { case e: CppJsonException => e.getMessage }
      if (got != want) Some(s"input=${ascii(s.take(40))} got=${ascii(got)} want=${ascii(want)}") else None
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size}/${inputs.size} mismatches, first: ${mismatches.take(5).mkString("\n")}")
  }
}
