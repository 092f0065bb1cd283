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

  private def runRef(bin: String, db: String, args: Seq[String]): (String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    Process(Seq(bin, db) ++ args).!(ProcessLogger(
      l => out.append(l).append('\n'), l => err.append(l).append('\n')))
    (out.toString, err.toString)
  }

  private def runOurs(db: String, args: Seq[String]): (String, String) = {
    val outB = new ByteArrayOutputStream()
    val errB = new ByteArrayOutputStream()
    val outPs = new PrintStream(outB, true, "UTF-8")
    val errPs = new PrintStream(errB, true, "UTF-8")
    // println goes through Console.out (which caches the original
    // System.out), so redirect both layers, both streams
    Console.withOut(outPs) {
      Console.withErr(errPs) {
        val (oldOut, oldErr) = (System.out, System.err)
        System.setOut(outPs)
        System.setErr(errPs)
        try Cli.run(spark, (db +: args).toArray)
        finally { System.setOut(oldOut); System.setErr(oldErr) }
      }
    }
    // drop Spark log4j lines ("yy/MM/dd HH:mm:ss LEVEL ...") that the
    // shared session may emit on the redirected stderr
    def clean(s: String): String =
      s.linesWithSeparators.filterNot(_.matches("""^\d\d/\d\d/\d\d .*""")).mkString
    (clean(outB.toString("UTF-8")), clean(errB.toString("UTF-8")))
  }

  test("scripted session produces byte-identical stdout to the compiled reference") {
    assume(refBinary.isDefined, "no C++ toolchain available to build the reference")
    val bin = refBinary.get
    // materialize the lazy session NOW, or its startup logs land in the
    // first command's captured stderr
    spark.sparkContext
    // pass the path WITHOUT the .json suffix: both CLIs append it
    val refDb = Files.createTempDirectory("ref_cli").resolve("db").toString
    val ourDb = Files.createTempDirectory("our_cli").resolve("db").toString

    val script: Seq[Seq[String]] = Seq(
      Seq("init", "3"),
      Seq("search", "3", "1.0,1.0,1.0"),            // empty-db search + warning
      Seq("rebuild"),                               // double warning on empty db
      Seq("add", "1.0,2.0,3.0", """{"tag": "a"}"""),
      Seq("add", "1.5,2.5,3.5", """{"tag": "b", "n": 7}"""),
      Seq("add", "1.1,1.2,1.3", "null"),            // float32 artifact values
      Seq("get", "1"),
      Seq("get", "3"),
      Seq("get", "999"),                            // miss → stderr
      Seq("search", "2", "1.0,2.0,3.1"),
      Seq("search", "50", "1.0,2.0,3.1"),           // k > n truncates
      Seq("search", "2", "1.0,2.0"),                // dim mismatch → error
      Seq("search", "2", "a,b,c"),                  // parse error text
      Seq("update", "2", "9.0,9.0,9.0", """{"tag": "c"}"""),
      Seq("update", "999", "1.0,1.0,1.0", "{}"),    // miss → stderr
      Seq("search", "2", "1.0,2.0,3.1"),
      Seq("delete", "1"),
      Seq("delete", "1"),                           // second delete misses
      Seq("search", "2", "1.0,2.0,3.1"),
      Seq("rebuild"))

    script.foreach { args =>
      val (refOut, refErr) = runRef(bin, refDb, args)
      val (ourOut, ourErr) = runOurs(ourDb, args)
      assert(ourOut.replace(ourDb, "<DB>") == refOut.replace(refDb, "<DB>"),
        s"stdout divergence on command: ${args.mkString(" ")}")
      assert(ourErr.replace(ourDb, "<DB>") == refErr.replace(refDb, "<DB>"),
        s"stderr divergence on command: ${args.mkString(" ")}")
    }

    // after the identical mutation sequence, the persisted databases
    // must also be byte-identical (envelope format + float emission)
    val refFile = new String(Files.readAllBytes(Paths.get(refDb + ".json")), "UTF-8")
    val ourFile = new String(Files.readAllBytes(Paths.get(ourDb + ".json")), "UTF-8")
    assert(ourFile == refFile, "persisted db.json diverged")
  }
}
