package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Mirrors the reference's five end-to-end scenarios
  * (/root/reference/src/test.cpp:35-154) plus the FIXTURES.md §A2
  * behavior fixtures verified against the compiled reference.
  * The stale-index assertion of test 4 (test.cpp:117) is NOT mirrored:
  * the reference itself fails it (SURVEY §5); we assert fresh-search
  * semantics instead.
  */
class VectorStoreSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def tmpDb(): String =
    Files.createTempDirectory("store").resolve("db.json").toString

  // test.cpp:35-51 — scenario 1: init + reload
  test("init persists dim; reload sees empty db; get misses") {
    val path = tmpDb()
    val s1 = VectorStore.init(spark, path, 2)
    assert(s1.getDimensions == 2)
    val s2 = VectorStore.load(spark, path)
    assert(s2.getDimensions == 2)
    assert(s2.toDF.count() == 0)
    assert(s2.get(1).isEmpty)
  }

  test("long mutation sequences keep the plan bounded (lineage checkpoint)") {
    val path = tmpDb()
    val store = VectorStore.init(spark, path, 2)
    (1 to 100).foreach(i => store.add(Array(i.toFloat, i.toFloat), "{}"))
    // without checkpointing this lineage is ~100 stacked unions; with the
    // every-32 localCheckpoint it stays a handful of nodes
    val planNodes = store.toDS.queryExecution.logical.collect { case n => n }.size
    assert(planNodes < 40, s"plan grew to $planNodes nodes — lineage not truncated")
    assert(store.toDF.count() == 100)
    assert(store.get(57L).exists(_.embedding.sameElements(Array(57f, 57f))))
  }

  test("init refuses an existing file (vectordb.cpp:24-26)") {
    val path = tmpDb()
    VectorStore.init(spark, path, 2)
    val e = intercept[IllegalStateException](VectorStore.init(spark, path, 2))
    // reference text exactly (vectordb.cpp:25) — the CLI prints "Error: " + this
    assert(e.getMessage == "Database file already exists. Cannot initialize.")
  }

  // test.cpp:54-88 — scenario 2: add, save, reload, get
  test("add assigns ids 1,2; metadata round-trips; miss on 999") {
    val path = tmpDb()
    val s = VectorStore.init(spark, path, 2)
    val id1 = s.add(Array(1.0f, 1.0f), """{"name":"point_A"}""")
    val id2 = s.add(Array(1.1f, 1.2f), """{"name":"point_B"}""")
    assert(id1 == 1L && id2 == 2L)
    s.save(path)
    val r = VectorStore.load(spark, path)
    assert(r.nextId == 3L)
    val got = r.get(1).get
    assert(got.embedding.toSeq == Seq(1.0f, 1.0f))
    assert(got.metadata.contains("point_A"))
    assert(r.get(999).isEmpty)
  }

  // test.cpp:91-104 + FIXTURES §A2 — scenario 3: search
  test("search matches the verified reference fixture (A2)") {
    val path = tmpDb()
    val s = VectorStore.init(spark, path, 2)
    s.add(Array(1.0f, 1.0f), """{"name":"point_A"}""")
    s.add(Array(1.1f, 1.2f), """{"name":"point_B"}""")
    s.add(Array(5.0f, 5.0f), """{"name":"point_C"}""")
    s.add(Array(5.1f, 4.9f), """{"name":"point_D"}""")
    val res = s.search(Array(1.0f, 1.05f), 2).collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(math.abs(res(0).getDouble(1) - 0.0025) < 1e-6)
    assert(math.abs(res(1).getDouble(1) - 0.0325) < 1e-6)
  }

  test("search second fixture: query (5,5) k=3 after adding E=(9,9)") {
    val path = tmpDb()
    val s = VectorStore.init(spark, path, 2)
    s.add(Array(1.0f, 1.0f), null)
    s.add(Array(1.1f, 1.2f), null)
    s.add(Array(5.0f, 5.0f), null)
    s.add(Array(5.1f, 4.9f), null)
    s.add(Array(9.0f, 9.0f), null)
    val res = s.search(Array(5.0f, 5.0f), 3).collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(3L, 4L, 2L))
    assert(res(0).getDouble(1) == 0.0)
    assert(math.abs(res(1).getDouble(1) - 0.02) < 1e-6)
    assert(math.abs(res(2).getDouble(1) - 29.65) < 1e-4)
  }

  // test.cpp:108-127 — scenario 4, with ACTUAL semantics: after delete,
  // a fresh search no longer returns the deleted id.
  test("delete removes the row; search stays consistent; ids not reused") {
    val path = tmpDb()
    val s = VectorStore.init(spark, path, 2)
    s.add(Array(1.0f, 1.0f), null)
    s.add(Array(5.0f, 5.0f), null)
    assert(s.delete(1))
    assert(!s.delete(1))
    val res = s.search(Array(1.0f, 1.0f), 5).collect()
    assert(res.map(_.getLong(0)).toSeq == Seq(2L))
    val id3 = s.add(Array(2.0f, 2.0f), null)
    assert(id3 == 3L) // nextId never reused (vectordb.cpp:74-80)
  }

  // test.cpp:130-154 — scenario 5: update moves a vector
  test("update moves a vector; found at new position only") {
    val path = tmpDb()
    val s = VectorStore.init(spark, path, 2)
    s.add(Array(1.0f, 1.0f), """{"v":1}""")
    s.add(Array(5.0f, 5.0f), """{"v":2}""")
    assert(s.update(1, Array(9.0f, 9.0f), """{"v":9}"""))
    assert(!s.update(99, Array(9.0f, 9.0f), null))
    val near9 = s.search(Array(9.0f, 9.0f), 1).collect()
    assert(near9.head.getLong(0) == 1L && near9.head.getDouble(1) == 0.0)
    val near1 = s.search(Array(1.0f, 1.0f), 1).collect()
    assert(near1.head.getLong(0) == 2L) // nothing left at the old spot's vicinity except id 2
    assert(s.get(1).get.metadata == """{"v":9}""")
  }

  test("dim mismatch errors on add/update/search (vectordb.cpp:39-41,65-67,124-126)") {
    val path = tmpDb()
    val s = VectorStore.init(spark, path, 2)
    assertThrows[IllegalArgumentException](s.add(Array(1.0f), null))
    s.add(Array(1.0f, 2.0f), null)
    assertThrows[IllegalArgumentException](s.update(1, Array(1.0f, 2.0f, 3.0f), null))
    assertThrows[IllegalArgumentException](s.search(Array(1.0f), 1))
  }

  test("k > n truncates; empty store returns empty (SURVEY §2.3)") {
    val path = tmpDb()
    val s = VectorStore.init(spark, path, 2)
    assert(s.search(Array(0.0f, 0.0f), 5).collect().isEmpty)
    s.add(Array(1.0f, 1.0f), null)
    assert(s.search(Array(0.0f, 0.0f), 5).count() == 1)
  }

  test("parquet store round-trips (scale path)") {
    val dir = Files.createTempDirectory("storepq").toString
    val path = tmpDb()
    val s = VectorStore.init(spark, path, 2)
    s.addBatch(Seq(
      (Array(1.0f, 1.0f), """{"n":1}"""),
      (Array(2.0f, 2.0f), """{"n":2}""")))
    s.saveParquet(dir)
    val r = VectorStore.loadParquet(spark, dir)
    assert(r.getDimensions == 2 && r.nextId == 3L)
    assert(r.toDF.count() == 2)
    assert(r.get(2).get.embedding.toSeq == Seq(2.0f, 2.0f))
  }
}
