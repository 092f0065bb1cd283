package graft.io

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Byte parity of [[Envelope.num]] (Grisu2 digits + format_buffer layout)
  * against the reference's vendored JSON library, verified live: a tiny
  * C++ helper linking the same json.hpp dumps doubles passed as raw bit
  * patterns, and every value must match byte-for-byte. Covers random
  * doubles, random float32s widened to double (the envelope's actual
  * input distribution, vectordb.cpp:169), subnormals, and the known
  * Grisu2-vs-shortest divergence cases. Skips when no C++ toolchain.
  */
class GrisuParitySpec extends AnyFunSuite {

  private lazy val helper: Option[String] = {
    val out = Paths.get("/tmp/graft_refbin/dumpd")
    val src = Paths.get("/tmp/graft_refbin/dumpd.cpp")
    try {
      Files.createDirectories(out.getParent)
      if (!Files.exists(out)) {
        Files.writeString(src,
          """#include "json.hpp"
            |#include <cstdio>
            |#include <cstdint>
            |#include <cstring>
            |#include <cstdlib>
            |int main(){
            |  char line[64];
            |  while (fgets(line, sizeof line, stdin)) {
            |    uint64_t bits = strtoull(line, nullptr, 16);
            |    double d; memcpy(&d, &bits, 8);
            |    nlohmann::json j = d;
            |    printf("%s\n", j.dump().c_str());
            |  }
            |  return 0;
            |}
            |""".stripMargin)
        val cmd = Seq("g++", "-std=c++17", "-O2", "-I/root/reference/lib/json",
          "-o", out.toString, src.toString)
        if (cmd.! != 0) None else Some(out.toString)
      } else Some(out.toString)
    } catch { case _: Exception => None }
  }

  test("num matches nlohmann dump byte-for-byte on 60k doubles and widened float32s") {
    assume(helper.isDefined, "no C++ toolchain available")
    val rnd = new scala.util.Random(0xA11CE)
    val edge = Seq(1.0, 0.1, 1.5e-7, 3.4028234663852886e38, 1.1754943508222875e-38,
      java.lang.Double.MIN_VALUE, java.lang.Double.MAX_VALUE, java.lang.Double.MIN_NORMAL,
      123456.789, 1.100000023841858, 7.038530682568257e-26, 5e-324, 1.5e300,
      java.lang.Float.MIN_VALUE.toDouble, java.lang.Float.MIN_NORMAL.toDouble,
      (1 until 100).map(i => java.lang.Float.intBitsToFloat(i).toDouble), // float subnormals
      (1 until 100).map(i => java.lang.Double.longBitsToDouble(i.toLong))).flatMap {
      case s: Seq[_] => s.asInstanceOf[Seq[Double]]
      case d: Double => Seq(d)
    }
    val vals = (edge ++
      (1 to 30000).map(_ => java.lang.Double.longBitsToDouble(rnd.nextLong())) ++
      (1 to 30000).map(_ => java.lang.Float.intBitsToFloat(rnd.nextInt()).toDouble))
      .filter(d => !d.isNaN && !d.isInfinite && d != 0.0)

    val in = Files.createTempFile("grisu", ".txt")
    Files.writeString(in, vals.map(d =>
      java.lang.Long.toHexString(java.lang.Double.doubleToRawLongBits(d))).mkString("", "\n", "\n"))
    val expected = (helper.get #< in.toFile).!!.linesIterator.toVector
    assert(expected.size == vals.size)

    val mismatches = vals.lazyZip(expected).collect {
      case (d, want) if Envelope.num(d) != want => s"$d: got=${Envelope.num(d)} want=$want"
    }
    assert(mismatches.isEmpty, s"${mismatches.size} mismatches, first: ${mismatches.take(5)}")
  }
}
