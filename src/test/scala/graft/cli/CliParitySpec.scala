package graft.cli

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Live behavioral diff against the COMPILED reference binary: the same
  * scripted session is run through both CLIs and stdout must match
  * byte-for-byte (after normalizing the db path that appears in the
  * init message). Compiles the reference from /root/reference sources
  * into /tmp; skips cleanly when no C++ toolchain is present.
  */
class CliParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val refBinary: Option[String] = {
    val out = Paths.get("/tmp/graft_refbin/vectordb")
    try {
      Files.createDirectories(out.getParent)
      if (!Files.exists(out)) {
        val cmd = Seq("g++", "-std=c++17", "-O2",
          "-I/root/reference/lib/json", "-I/root/reference/lib/hnsw",
          "-o", out.toString,
          "/root/reference/src/main.cpp", "/root/reference/src/vectordb.cpp",
          "/root/reference/lib/hnsw/hnsw.cpp")
        if (cmd.! != 0) None else Some(out.toString)
      } else Some(out.toString)
    } catch { case _: Exception => None }
  }

  private def runRef(bin: String, db: String, args: Seq[String]): String = {
    val sb = new StringBuilder
    // capture stdout only (stderr carries usage/errors in both CLIs)
    Process(Seq(bin, db) ++ args).!(ProcessLogger(l => sb.append(l).append('\n'), _ => ()))
    sb.toString
  }

  private def runOurs(db: String, args: Seq[String]): String = {
    val bos = new ByteArrayOutputStream()
    val ps = new PrintStream(bos, true, "UTF-8")
    // println goes through Console.out (which caches the original
    // System.out), so redirect both
    Console.withOut(ps) {
      val old = System.out
      System.setOut(ps)
      try Cli.run(spark, (db +: args).toArray) finally System.setOut(old)
    }
    bos.toString("UTF-8")
  }

  test("scripted session produces byte-identical stdout to the compiled reference") {
    assume(refBinary.isDefined, "no C++ toolchain available to build the reference")
    val bin = refBinary.get
    // pass the path WITHOUT the .json suffix: both CLIs append it
    val refDb = Files.createTempDirectory("ref_cli").resolve("db").toString
    val ourDb = Files.createTempDirectory("our_cli").resolve("db").toString

    val script: Seq[Seq[String]] = Seq(
      Seq("init", "3"),
      Seq("add", "1.0,2.0,3.0", """{"tag": "a"}"""),
      Seq("add", "1.5,2.5,3.5", """{"tag": "b", "n": 7}"""),
      Seq("get", "1"),
      Seq("get", "2"),
      Seq("search", "2", "1.0,2.0,3.1"),
      Seq("update", "2", "9.0,9.0,9.0", """{"tag": "c"}"""),
      Seq("search", "2", "1.0,2.0,3.1"),
      Seq("delete", "1"),
      Seq("search", "2", "1.0,2.0,3.1"),
      Seq("rebuild"))

    script.foreach { args =>
      val ref = runRef(bin, refDb, args).replace(refDb, "<DB>")
      val ours = runOurs(ourDb, args).replace(ourDb, "<DB>")
      assert(ours == ref, s"divergence on command: ${args.mkString(" ")}")
    }

    // after the identical mutation sequence, the persisted databases
    // must also be byte-identical (envelope format + float emission)
    val refFile = new String(Files.readAllBytes(Paths.get(refDb + ".json")), "UTF-8")
    val ourFile = new String(Files.readAllBytes(Paths.get(ourDb + ".json")), "UTF-8")
    assert(ourFile == refFile, "persisted db.json diverged")
  }
}
