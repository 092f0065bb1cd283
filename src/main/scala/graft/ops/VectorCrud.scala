package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CRUD as batch DataFrame transforms — the 100 TB shape of the
  * reference's point mutations (`/root/reference/src/vectordb.cpp:38-80`).
  * Each op is a narrow transform or pushdown-friendly filter: no shuffle,
  * no driver round-trip, composable with any source.
  */
object VectorCrud {

  /** Persist a table bucketed+sorted by id so that REPEATED equi-joins
    * on id (vectors ⋈ codes, vectors ⋈ features, incremental CRUD
    * merges) are co-located: both sides read pre-hashed buckets and the
    * join plans with zero Exchange. At 100 TB this converts every id
    * join from a full shuffle into a local merge — pay the shuffle once
    * at write time, amortize it over every subsequent join. Requires a
    * table name (bucketing is a metastore feature). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      idCol: String = "id"): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, idCol)
      .sortBy(idCol)
      .format("parquet")
      .saveAsTable(table)

  /** O3 — point lookup: `filter` that pushes to the scan as an
    * id predicate (PushedFilters: [EqualTo(id, x)]). */
  def get(df: DataFrame, id: Long, idCol: String = "id"): DataFrame =
    df.filter(col(idCol) === id)

  /** O5 — delete: anti-filter, pushed to the scan. */
  def delete(df: DataFrame, id: Long, idCol: String = "id"): DataFrame =
    df.filter(col(idCol) =!= id)

  /** Batch delete by key set: broadcast anti-join (no shuffle of the
    * big side). */
  def deleteAll(df: DataFrame, ids: DataFrame, idCol: String = "id"): DataFrame =
    df.join(broadcast(ids), df(idCol) === ids(ids.columns.head), "left_anti")

  /** O2 — append new rows (id assignment is the caller's contract —
    * the facade's driver cursor at parity scale, block allocation at
    * cluster scale). Union is shuffle-free. */
  def add(df: DataFrame, rows: DataFrame): DataFrame =
    df.unionByName(rows)

  /** O4 — in-place replace by id: a `when/otherwise` projection (narrow,
    * codegen'd, no shuffle). `updates` maps column name → replacement. */
  def update(df: DataFrame, id: Long, updates: Map[String, Column], idCol: String = "id"): DataFrame =
    updates.foldLeft(df) { case (acc, (name, value)) =>
      acc.withColumn(name, when(col(idCol) === id, value).otherwise(col(name)))
    }
}
