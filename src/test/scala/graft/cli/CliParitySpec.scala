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

  private def runOurs(db: String, args: Seq[String], prog: String = "graft"): (String, String) = {
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
        try Cli.run(spark, (db +: args).toArray, prog)
        finally { System.setOut(oldOut); System.setErr(oldErr) }
      }
    }
    // drop Spark log4j lines ("yy/MM/dd HH:mm:ss LEVEL ...") that the
    // shared session may emit on the redirected stderr
    def clean(s: String): String =
      s.linesWithSeparators.filterNot(_.matches("""^\d\d/\d\d/\d\d .*""")).mkString
    (clean(outB.toString("UTF-8")), clean(errB.toString("UTF-8")))
  }

  /** Runs the same command list through both CLIs, asserting stdout and
    * stderr parity per command; optionally the persisted file too. */
  private def compareSession(script: Seq[Seq[String]], alsoFile: Boolean = true): Unit = {
    assume(refBinary.isDefined, "no C++ toolchain available to build the reference")
    spark.sparkContext // materialize before capturing stderr
    val refDb = Files.createTempDirectory("ref_cli").resolve("db").toString
    val ourDb = Files.createTempDirectory("our_cli").resolve("db").toString
    script.foreach { args =>
      val (refOut, refErr) = runRef(refBinary.get, refDb, args)
      // usage lines echo argv[0]; give our CLI the same program name
      val (ourOut, ourErr) = runOurs(ourDb, args, prog = refBinary.get)
      assert(ourOut.replace(ourDb, "<DB>") == refOut.replace(refDb, "<DB>"),
        s"stdout divergence on command: ${args.mkString(" ")}")
      assert(ourErr.replace(ourDb, "<DB>") == refErr.replace(refDb, "<DB>"),
        s"stderr divergence on command: ${args.mkString(" ")}")
    }
    if (alsoFile && Files.exists(Paths.get(refDb + ".json"))) {
      val refFile = new String(Files.readAllBytes(Paths.get(refDb + ".json")), "UTF-8")
      val ourFile = new String(Files.readAllBytes(Paths.get(ourDb + ".json")), "UTF-8")
      assert(ourFile == refFile, "persisted db.json diverged")
    }
  }

  test("init-only db file matches byte-for-byte (vectors stays null)") {
    compareSession(Seq(Seq("init", "3")))
  }

  test("missing-file commands and argument-parsing edges match the reference") {
    compareSession(Seq(
      Seq("add", "1.0,2.0", "{}"),         // dim-0 mismatch, NO empty-db warning
      Seq("get", "5"),                     // miss without load warning
      Seq("update", "3", "1.0", "{}"),
      Seq("delete", "9"),
      Seq("rebuild"),                      // single warning (load skips missing file)
      Seq("search", "3", ""),              // empty query on dim-0: index never built
      Seq("search", "3", "1.0"),           // dim mismatch beats index error
      Seq("get", "abc"),                   // std::stoll failure text
      Seq("init", "abc"),                  // std::stoi failure text
      Seq("init", "3.7"),                  // stoi prefix: dim 3
      Seq("init", "4"),                    // now exists → reference error text
      Seq("frobnicate"),
      Seq("add", "1.0,2.0,3.0")),          // wrong arity → usage line
      alsoFile = true)
  }

  test("stof prefix/hex/range semantics and %g printing match the reference") {
    compareSession(Seq(
      Seq("init", "3"),
      Seq("add", "0x10,0x1p2,.5", "{}"),            // hex floats, bare fraction
      Seq("add", "1.5abc,2.0xyz,3.", "{}"),         // longest-prefix parse
      Seq("add", "  2.5 , 2 ,3", "{}"),             // whitespace tolerance
      // (vector values kept distinct: equal distances would expose the
      // reference HNSW's arbitrary tie order vs our deterministic (dist,id))
      Seq("add", "15000000,1000000,999999", "{}"),  // %g scientific cutoff at 1e6
      Seq("add", "-0.0,0.0,1", "{}"),               // signed zero prints "-0"
      Seq("add", "1.0,2.0,3.0,", "{}"),             // trailing comma: 3 items
      Seq("add", "1e39,1,1", "{}"),                 // overflow → ERANGE → invalid
      Seq("add", "1e-39,1,1", "{}"),                // subnormal → ERANGE → invalid
      Seq("add", "1e-46,1,1", "{}"),                // underflow-to-zero → invalid
      Seq("add", "1.0,,3.0", "{}"),                 // interior empty item
      Seq("add", "2x", "{}", "extra"),              // arity
      Seq("search", "2x", "1.0,2.0,3.0"),           // stoi prefix for k
      Seq("get", "1"), Seq("get", "2"), Seq("get", "3"),
      Seq("get", "4"), Seq("get", "5"), Seq("get", "6"),
      Seq("search", "3", "16,4,0.5")))
  }

  test("metadata parse errors surface nlohmann's exact text through the CLI") {
    val bad = Seq("notjson", "{", "", """{"a":}""", "[1,2", "\"abc", "1 2",
      "{}extra", "tru", "-a", "1.", "1e", "01", """"a\x"""", "+1",
      """{"a" 1}""", """{"a":1,}""", "[1 2]", "[,]", "1e999")
    compareSession(
      Seq(Seq("init", "1")) ++
        bad.map(m => Seq("add", "1.0", m)) ++
        Seq(
          Seq("add", "1.0", """{"n":18446744073709551615}"""), // u64 stays integral
          Seq("add", "1.0", """{"x":1e-999}"""),               // underflow is fine
          Seq("add", "1.0", """{"d":1.5e300, "i":-9223372036854775809}"""),
          Seq("update", "1", "2.0", "{bad"),                   // update parses too
          Seq("get", "1"), Seq("get", "2"), Seq("get", "3")))
  }

  test("non-finite components serialize as null and poison later loads identically") {
    compareSession(Seq(
      Seq("init", "3"),
      Seq("add", "inf,1,1", "{}"),   // stof accepts inf; dump writes null
      Seq("get", "1"),               // load now fails: type_error.302 text
      Seq("search", "1", "1,1,1"),
      Seq("add", "nan,2,2", "{}"),   // load fails before the add
      Seq("rebuild")))
  }

  test("random float32 sessions round-trip with byte-identical files and output") {
    val rnd = new scala.util.Random(0xF10A7)
    def safeFloat(): Float = {
      while (true) {
        val f = java.lang.Float.intBitsToFloat(rnd.nextInt())
        // std::stof rejects non-finite-producing and subnormal inputs
        if (!f.isNaN && !f.isInfinite && (f == 0.0f || math.abs(f) >= java.lang.Float.MIN_NORMAL))
          return f
      }
      0.0f
    }
    val adds = (1 to 12).map { _ =>
      Seq("add", (1 to 4).map(_ => safeFloat().toString).mkString(","), "{}")
    }
    val gets = (1 to 12).map(i => Seq("get", i.toString))
    compareSession(Seq(Seq("init", "4")) ++ adds ++ gets)
  }

  test("hand-corrupted db files produce the reference's exact load errors") {
    assume(refBinary.isDefined, "no C++ toolchain available to build the reference")
    spark.sparkContext
    val cases: Seq[Array[Byte]] = Seq(
      """{"dim": 2, "nextId": 2, "vectors": 5}""",              // at() on number → 304
      """{"dim": 2, "nextId": 2, "vectors": "x"}""",            // at() on string → 304
      """{"dim": 2, "nextId": 2, "vectors": [{"id": 1, "metadata": null, "vec": 2.5}]}""", // 302 array
      """{"dim": true, "nextId": 2, "vectors": null}""",        // boolean dim is ACCEPTED
      """{"dim": 2, "nextId": 2, "vectors": {"a": {"id": 1, "metadata": null, "vec": [1.0,2.0]}}}""", // object iterates values
      """{"dim": 2, "nextId": 2, "vectors": [{"id": 1, "vec": [1.0,2.0]}]}""", // 403 metadata
      """{"dim": 2, "nextId": 2, "vectors": null}extra""",      // operator>> stops after one value
      """{"dim": 2""",                                          // truncated → parse error
      // NOTE: ill-formed-UTF-8 files (e.g. a bad BOM) are excluded: the
      // reference echoes the raw invalid bytes in its error context, and
      // a JVM String cannot emit lone invalid bytes — the column and the
      // message text still match (pinned in CppJsonSpec), only the raw
      // byte echo is substituted with U+FFFD
      "not json at all").map(_.getBytes("UTF-8"))
    cases.zipWithIndex.foreach { case (bytes, i) =>
      val refDb = Files.createTempDirectory("ref_cor").resolve("db").toString
      val ourDb = Files.createTempDirectory("our_cor").resolve("db").toString
      Files.write(Paths.get(refDb + ".json"), bytes)
      Files.write(Paths.get(ourDb + ".json"), bytes)
      val (refOut, refErr) = runRef(refBinary.get, refDb, Seq("get", "1"))
      val (ourOut, ourErr) = runOurs(ourDb, Seq("get", "1"), prog = refBinary.get)
      assert(ourOut.replace(ourDb, "<DB>") == refOut.replace(refDb, "<DB>"),
        s"stdout divergence on corrupted case $i: ${new String(bytes, "UTF-8").take(60)}")
      assert(ourErr.replace(ourDb, "<DB>") == refErr.replace(refDb, "<DB>"),
        s"stderr divergence on corrupted case $i: ${new String(bytes, "UTF-8").take(60)}")
    }
  }

  test("hex-float ERANGE rejection matches the reference (e is a hex digit)") {
    compareSession(Seq(
      Seq("init", "3"),
      Seq("add", "0xep-160,1,1", "{}"),   // subnormal via hex, mantissa is 'e'
      Seq("add", "0xe0p-200,1,1", "{}"),  // underflow to zero via hex
      Seq("add", "0xep0,1,1", "{}"),      // plain hex 'e' = 14, accepted
      Seq("get", "1")))
  }

  test("randomized 60-command sessions stay byte-identical (state after failures included)") {
    // seeded generator mixing valid and invalid commands: exercises the
    // persisted-state interactions (adds after failed adds, deletes of
    // missing ids, searches between mutations) beyond the fixed script
    val rnd = new scala.util.Random(0xC11F)
    def vec(dim: Int): String = (1 to dim).map(_ =>
      (math.floor(rnd.nextFloat() * 1000) / 100.0).toString).mkString(",")
    def randomCommand(): Seq[String] = rnd.nextInt(10) match {
      case 0 => Seq("add", vec(3), s"""{"n": ${rnd.nextInt(100)}}""")
      case 1 => Seq("add", vec(2 + rnd.nextInt(3)), "{}")       // maybe dim mismatch
      case 2 => Seq("get", rnd.nextInt(12).toString)
      case 3 => Seq("delete", rnd.nextInt(12).toString)
      case 4 => Seq("update", rnd.nextInt(12).toString, vec(3), """{"u": true}""")
      case 5 => Seq("search", (1 + rnd.nextInt(5)).toString, vec(3))
      case 6 => Seq("rebuild")
      case 7 => Seq("add", vec(3), Seq("notjson", "{", "[1,", """{"a":}""")(rnd.nextInt(4)))
      case 8 => Seq("search", "2", vec(3) + "x")                // prefix parse tail
      case _ => Seq("get", "abc")                               // stoll failure
    }
    val script = Seq(Seq("init", "3")) ++ (1 to 60).map(_ => randomCommand())
    compareSession(script)
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
