package graft.core

import org.apache.spark.sql.types._

/** The engine's single record type — mirrors the reference's
  * `VectorData { long long id; vector<float> vec; json metadata; }`
  * (`/root/reference/src/vectordb.h:22-26`).
  *
  * `metadata` is kept as a canonical JSON *string* column: the reference
  * treats metadata as an opaque blob (stored and echoed, never filtered
  * in-engine — SURVEY §2.4), and a string column round-trips any JSON
  * losslessly. Access paths use `get_json_object` / `from_json`.
  */
case class VectorRecord(id: Long, embedding: Array[Float], metadata: String)

object VectorRecord {

  /** Canonical Spark schema (SURVEY §1.4). Array length (= `dim`) is not
    * encodable in Spark's type system, so dimension is enforced by the
    * store facade / validation operator instead. */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("metadata", StringType, nullable = true)))
}
