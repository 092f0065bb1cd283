package graft.index

import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.VectorSearch

/** Tombstone delete + compaction on the persisted IVF layout — the
  * index-maintenance leg the reference gets WRONG (its HNSW serves
  * deleted ids until a manual rebuild; SURVEY §5 pins that we do not
  * reproduce the staleness). */
class IvfDeleteSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private lazy val spark = SparkTestSession.spark
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  override def afterAll(): Unit = { emb.unpersist(blocking = true); super.afterAll() }

  private def queryVec(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toArray

  private def planted(n: Int, base: Long) =
    emb.filter(col("vec_id") === 2).crossJoin(spark.range(n))
      .select((col("id") + lit(base)).as("vec_id"), col("embedding"), col("label"))

  test("deleted ids vanish from probes; delete is idempotent; fingerprint forces rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_del").toString + "/corpus"
    val layout = Ivf.buildLayout(spark, emb, dir, nlist = 8, maxIter = 3)
    Ivf.appendToLayout(layout, planted(5, 6000000L))
    val q = queryVec(2)

    val n1 = Ivf.deleteFromLayout(layout,
      Seq(6000000L, 6000001L, 9999999L).toDF("vec_id")) // one id never existed
    assert(n1 == 2, s"expected 2 live deletions, got $n1")
    val got = Ivf.searchLayout(spark, layout, q, k = 4, nprobe = 1).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 6000002L, 6000003L, 6000004L))

    // re-deleting the same ids is a no-op (no tombstone dup, no double xor)
    val n2 = Ivf.deleteFromLayout(layout, Seq(6000000L, 6000001L).toDF("vec_id"))
    assert(n2 == 0)

    // filtered probe is tombstone-aware too
    val lbl = emb.filter(col("vec_id") === 2).head().getAs[Number]("label").intValue()
    val whereGot = Ivf.searchLayoutWhere(spark, layout, q, k = 50, nprobe = 8,
      col("label") === lbl).collect().map(_.getLong(0)).toSet
    assert(!whereGot.contains(6000000L) && !whereGot.contains(6000001L))

    // the xor-updated fingerprint no longer matches corpus ∪ planted,
    // so a build over that input refits instead of reusing the layout
    val sidecar = java.nio.file.Paths.get(dir, "_centroids.json")
    val mtime = java.nio.file.Files.getLastModifiedTime(sidecar)
    val union = emb.select(col("vec_id"), col("embedding"), col("label"))
      .union(planted(5, 6000000L))
    Ivf.buildLayout(spark, union, dir, nlist = 8, maxIter = 3)
    assert(java.nio.file.Files.getLastModifiedTime(sidecar) != mtime,
      "post-delete fingerprint must NOT claim to equal the pre-delete input")
  }

  test("compaction: threshold gate, only affected clusters rewritten, results unchanged") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_cmp").toString + "/corpus"
    val layout = Ivf.buildLayout(spark, emb, dir, nlist = 8, maxIter = 3)
    Ivf.appendToLayout(layout, planted(40, 7000000L))
    val delIds = (0 until 30).map(i => 7000000L + i).toDF("vec_id")
    Ivf.deleteFromLayout(layout, delIds)
    val q = queryVec(2)
    val before = Ivf.searchLayout(spark, layout, q, k = 11, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq

    // below the threshold: nothing happens
    assert(!Ivf.compactLayout(spark, layout, maxTombstoneFraction = 0.9))
    assert(new java.io.File(s"$dir/_tombstones").exists())

    assert(Ivf.compactLayout(spark, layout, maxTombstoneFraction = 0.01))
    // the reclaim CONSUMES the mask at the commit point; the tombstone
    // dirs themselves are retained until lagged GC (the snapshot-pin
    // contract — a probe pinned pre-commit still anti-joins them)
    val st = graft.io.MutableStore.state(dir)
    assert(st.liveTombs == Some(Seq()),
      "compaction must consume every live tombstone batch")
    // only the affected cluster is rewritten: the fresh fold tree holds
    // exactly one cluster dir; untouched clusters keep their old files
    // (referenced by the new manifest in place — nothing moved)
    val folds = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("_fold_v"))
    assert(folds.length == 1)
    val rewritten = folds.head.listFiles().filter(_.getName.startsWith("cluster="))
    assert(rewritten.length == 1,
      s"only the affected cluster may be rewritten, got ${rewritten.mkString(",")}")

    val after = Ivf.searchLayout(spark, layout, q, k = 11, nprobe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after == before, "compaction must not change probe results")
    // physical removal: the deleted ids are gone from the LIVE file set
    // (the superseded pre-reclaim files survive on disk for pinned
    // probes until lagged GC, so the check reads through the manifest)
    val raw = Ivf.layoutRows(spark, layout)
      .filter(col("vec_id") >= 7000000L).count()
    assert(raw == 10, s"expected the 10 surviving copies physically, got $raw")
    // …and the fresh fold files carry ONLY survivors (no mask needed)
    val foldRows = spark.read.parquet(folds.head.getPath)
      .filter(col("vec_id") >= 7000000L).count()
    assert(foldRows == 10, s"fold tree must hold survivors only, got $foldRows")

    // second compaction with no tombstones is a no-op
    assert(!Ivf.compactLayout(spark, layout, maxTombstoneFraction = 0.01))
  }

  test("re-adding a tombstoned id fails LOUD; compact-then-re-add revives exactly once") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_readd").toString + "/corpus"
    val layout = Ivf.buildLayout(spark, emb, dir, nlist = 8, maxIter = 3)
    Ivf.appendToLayout(layout, planted(3, 6200000L))
    val q = queryVec(2)
    Ivf.deleteFromLayout(layout, Seq(6200000L).toDF("vec_id"))
    // the layout's tombstones are a GLOBAL mask: a silent re-add would
    // be hidden by every probe (and un-masking would resurrect the old
    // row) — both append paths must reject it loudly
    val e1 = intercept[IllegalArgumentException] {
      Ivf.appendToLayout(layout, planted(1, 6200000L))
    }
    assert(e1.getMessage.contains("tombstoned"))
    val e2 = intercept[IllegalArgumentException] {
      Ivf.appendDelta(layout, planted(1, 6200000L), "t_readd")
    }
    assert(e2.getMessage.contains("tombstoned"))
    // the supported revival path: physical reclaim, then re-add
    assert(Ivf.compactLayout(spark, layout, maxTombstoneFraction = 0.0))
    Ivf.appendToLayout(layout, planted(1, 6200000L))
    val got = Ivf.searchLayout(spark, layout, q, k = 5, nprobe = 1).collect()
      .map(_.getLong(0)).toSeq
    assert(got.count(_ == 6200000L) == 1,
      s"revived id must be served exactly once, got $got")
  }

  test("post-delete probe equals exact search over the shrunken corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivf_del_eq").toString + "/corpus"
    val layout = Ivf.buildLayout(spark, emb, dir, nlist = 4, maxIter = 3)
    val q = queryVec(7)
    val exactBefore = VectorSearch.knnExact(emb, q.toSeq, 10).collect().map(_.getLong(0)).toSeq
    val victims = exactBefore.take(3)
    Ivf.deleteFromLayout(layout, victims.toDF("vec_id"))
    val got = Ivf.searchLayout(spark, layout, q, k = 10, nprobe = 4).collect()
      .map(_.getLong(0)).toSeq
    val exactAfter = VectorSearch.knnExact(
      emb.filter(!col("vec_id").isin(victims: _*)), q.toSeq, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == exactAfter)
    assert(victims.forall(v => !got.contains(v)))
  }
}
