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

  test("XML round-trips records with the embedding as repeated elements") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xml").toString
    Formats.writeXml(records.toDS(), dir)
    // the file must contain real repeated-element structure
    val raw = spark.read.text(dir).as[String].collect().mkString("\n")
    assert(raw.contains("<record>") && raw.contains("<embedding>"))
    assertSame(Formats.readXml(spark, dir).collect().toSeq, records)
  }
}
