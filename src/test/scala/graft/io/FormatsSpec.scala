package graft.io

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.VectorRecord

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val records = Seq(
    VectorRecord(1L, Array(1.0f, 2.5f), """{"tag":"a","n":3}"""),
    VectorRecord(2L, Array(-0.5f, 1.1f), null),
    VectorRecord(3L, Array(0f, 0f), """{"nested":{"x":[1,2]}}"""))

  private def sortById(s: Seq[VectorRecord]) = s.sortBy(_.id)

  private def assertSame(a: Seq[VectorRecord], b: Seq[VectorRecord]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    sortById(a).zip(sortById(b)).foreach { case (x, y) =>
      assert(x.id == y.id)
      assert(x.embedding.toSeq == y.embedding.toSeq)
      (Option(x.metadata), Option(y.metadata)) match {
        case (None, None) =>
        case (Some(mx), Some(my)) => assert(mapper.readTree(mx) == mapper.readTree(my))
        case other => fail(s"metadata null mismatch: $other")
      }
    }
  }

  test("JSONL round-trips records with structured (unquoted) metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    Formats.writeJsonl(records.toDS(), dir)
    // the line must embed metadata as an object, not an escaped string
    val line = spark.read.text(dir).as[String].collect().find(_.contains("\"tag\"")).get
    assert(line.contains("\"metadata\":{") && !line.contains("\\\""))
    assertSame(Formats.readJsonl(spark, dir).collect().toSeq, records)
  }

  test("CSV round-trips records with the embedding packed as a string") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Formats.writeCsv(records.toDS(), dir)
    assertSame(Formats.readCsv(spark, dir).collect().toSeq, records)
  }

  test("CSV document roundtrip survives embedded newlines (multiLine + RFC-4180 escape)") {
    // the csv_roundtrip query's option discipline, exercised on the text
    // shape the fixture corpus happens to lack: a document WITH '\n'.
    // Without multiLine + an explicit escape the default reader splits
    // the record on the raw newline and the roundtrip silently corrupts.
    val dir = java.nio.file.Files.createTempDirectory("graft_csvnl").toString
    val rows = Seq(
      (1L, "line one\nline two\n- bullet \"quoted\"", "en"),
      (2L, "plain", null.asInstanceOf[String]))
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite")
      .option("header", "true").option("nullValue", "\\N")
      .option("escape", "\"")
      .csv(dir)
    val back = spark.read
      .schema("doc_id BIGINT, text STRING, lang STRING")
      .option("header", "true").option("nullValue", "\\N")
      .option("escape", "\"").option("multiLine", "true")
      .csv(dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(back == rows)
  }

  test("XML round-trips records with the embedding as repeated elements") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    Formats.writeXml(records.toDS(), dir)
    // the file must contain real repeated-element structure
    val raw = spark.read.text(dir).as[String].collect().mkString("\n")
    assert(raw.contains("<record>") && raw.contains("<embedding>"))
    assertSame(Formats.readXml(spark, dir).collect().toSeq, records)
  }
}
