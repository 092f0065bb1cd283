package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.VectorRecord
import graft.io.Envelope

/** The reference's `VectorDB` facade re-expressed over a
  * `Dataset[VectorRecord]` — operators O1–O5, O8–O10 of SURVEY §2.1.
  *
  * Semantics preserved (all cited against `/root/reference/src/vectordb.cpp`):
  *  - `init` refuses an existing file (vectordb.cpp:24-26) — O1
  *  - `add` assigns `nextId`, increments, dim-checks (vectordb.cpp:38-52) — O2
  *  - `get` returns Option, no exception on miss (vectordb.cpp:54-59) — O3
  *  - `update` replaces in place, false on miss, dim-checks (vectordb.cpp:61-72) — O4
  *  - `delete` erases, false on miss, never reuses ids (vectordb.cpp:74-80) — O5
  *  - `save`/`load` round-trip the JSON envelope (vectordb.cpp:158-218) — O8/O9
  *  - `getDimensions` (vectordb.cpp:220-222) — O10
  *  - deleted/stale-index semantics are deliberately NOT reproduced: the
  *    reference's own test 4 fails on them (SURVEY §5); exact search here
  *    is always fresh, and the approximate path refits explicitly.
  *
  * Scale note: this facade is the single-database parity surface, so the
  * id cursor lives on the driver exactly like the reference's `nextId`.
  * At 100 TB the store is Parquet-backed (`saveParquet`/`loadParquet`),
  * mutations are batch DataFrame transforms (see [[VectorCrud]]), and id
  * assignment uses block allocation — `addBatch` demonstrates that path.
  */
final class VectorStore private (
    val spark: SparkSession,
    val dim: Int,
    private var cursor: Long,
    private var data: Dataset[VectorRecord],
    /** Whether `load` found the file on disk — the reference's `load()`
      * returns before `rebuildIndex()` when the file is missing
      * (vectordb.cpp:181-186), so the empty-index warning and the built
      * index itself only exist when the file was present. */
    val fromFile: Boolean = false) {

  import spark.implicits._

  /** O10 — schema introspection. */
  def getDimensions: Int = dim

  /** Mutations since the last lineage checkpoint. Every mutation rebinds
    * `data` to a new plan on top of the old one (union/map/filter), so a
    * long session would accrete an O(mutations) lineage and every action
    * would replan all of it; truncating via localCheckpoint every N keeps
    * plan size O(1) amortized. */
  private var mutationsSinceCheckpoint = 0
  private val checkpointEvery = 32

  private def afterMutation(): Unit = {
    mutationsSinceCheckpoint += 1
    if (mutationsSinceCheckpoint >= checkpointEvery) {
      data = data.localCheckpoint(true)
      mutationsSinceCheckpoint = 0
    }
  }

  def toDS: Dataset[VectorRecord] = data
  def toDF: DataFrame = data.toDF()

  def nextId: Long = cursor

  private def checkDim(vec: Array[Float]): Unit =
    // reference text exactly (vectordb.cpp:40,66) — no require(), which
    // would prepend "requirement failed: " and break CLI stderr parity
    if (vec.length != dim)
      throw new IllegalArgumentException("Vector dimension mismatch.")

  /** O2 — insert one record, server-side id assignment. */
  def add(vec: Array[Float], metadata: String): Long = {
    checkDim(vec)
    val id = cursor
    cursor += 1
    data = data.union(spark.createDataset(Seq(VectorRecord(id, vec, metadata))))
    afterMutation()
    id
  }

  /** Scale-path insert: block-allocate ids for a whole batch in one
    * union (one id-range reservation per batch, not per row). */
  def addBatch(rows: Seq[(Array[Float], String)]): Seq[Long] = {
    rows.foreach(r => checkDim(r._1))
    val ids = rows.indices.map(_ + cursor)
    val recs = rows.zip(ids).map { case ((v, m), id) => VectorRecord(id, v, m) }
    cursor += rows.size
    data = data.union(spark.createDataset(recs))
    afterMutation()
    ids
  }

  /** O3 — point lookup; None on miss (reference returns a (rec,false) pair).
    * Column predicate (not a closure) so the filter pushes to the scan. */
  def get(id: Long): Option[VectorRecord] =
    data.filter(org.apache.spark.sql.functions.col("id") === id).collect().headOption

  /** O4 — replace vec+metadata by id; false on miss. */
  def update(id: Long, vec: Array[Float], metadata: String): Boolean = {
    checkDim(vec)
    if (get(id).isEmpty) false
    else {
      data = data.map(r => if (r.id == id) VectorRecord(id, vec, metadata) else r)
      afterMutation()
      true
    }
  }

  /** O5 — erase by id; false on miss; `cursor` never decremented. */
  def delete(id: Long): Boolean = {
    if (get(id).isEmpty) false
    else {
      data = data.filter(org.apache.spark.sql.functions.col("id") =!= id)
      afterMutation()
      true
    }
  }

  /** O7 exact — squared-L2 top-k, nearest-first, ties by id.
    * Returns columns (id, dist). */
  def search(query: Array[Float], k: Int): DataFrame = {
    checkDim(query)
    VectorSearch.knnExact(data.toDF(), query.toSeq, k, idCol = "id", embCol = "embedding")
  }

  /** Exact-duplicate removal (beyond the reference surface, CLI `dedup`):
    * rows with an identical embedding collapse to the lowest id — the
    * same first-occurrence policy as [[graft.dedup.Dedup.exactDedup]],
    * expressed as a hash-partitioned window so it stays a single shuffle
    * on the embedding key at any scale. Returns the number of rows
    * removed. Metadata of the dropped duplicates is discarded (lowest id
    * wins), matching batch dedup semantics. */
  def dedupExact(): Long = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number}
    val before = data.count()
    val w = Window.partitionBy(col("embedding")).orderBy(col("id").asc)
    data = data.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .as[VectorRecord]
    afterMutation()
    before - data.count()
  }

  /** O8 — envelope sink. */
  def save(path: String): Unit =
    Envelope.saveDataset(dim, cursor, data, path)

  /** Scale-path sink/source: Parquet with dim/nextId in a sidecar. */
  def saveParquet(dir: String): Unit = {
    data.write.mode("overwrite").parquet(s"$dir/vectors")
    graft.io.Artifact.writeAtomic(
      Paths.get(s"$dir/_meta.json"), s"""{"dim": $dim, "nextId": $cursor}""")
  }
}

object VectorStore {

  /** O1 — create an empty database; refuses an existing file
    * (vectordb.cpp:24-26) and saves the empty envelope immediately
    * (vectordb.cpp:31-35). */
  def init(spark: SparkSession, path: String, dim: Int): VectorStore = {
    if (Files.exists(Paths.get(path)))
      // reference text exactly (vectordb.cpp:25)
      throw new IllegalStateException("Database file already exists. Cannot initialize.")
    import spark.implicits._
    val store = new VectorStore(spark, dim, 1L, spark.emptyDataset[VectorRecord])
    store.save(path)
    store
  }

  /** O9 — envelope source; missing file is NOT an error in the reference
    * ("start fresh", vectordb.cpp:183-186), but a fresh store needs a
    * dimension, hence `dimIfFresh`. */
  def load(spark: SparkSession, path: String, dimIfFresh: Int = 0): VectorStore = {
    import spark.implicits._
    Envelope.loadDataset(spark, path) match {
      case Some((dim, nextId, ds)) => new VectorStore(spark, dim, nextId, ds, fromFile = true)
      case None => new VectorStore(spark, dimIfFresh, 1L, spark.emptyDataset[VectorRecord], fromFile = false)
    }
  }

  def loadParquet(spark: SparkSession, dir: String): VectorStore = {
    import spark.implicits._
    val metaNode = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readString(Paths.get(s"$dir/_meta.json")))
    new VectorStore(spark, metaNode.get("dim").asInt(), metaNode.get("nextId").asLong(),
      spark.read.parquet(s"$dir/vectors").as[VectorRecord])
  }
}
