package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

/** Vector distance / similarity columns composed from built-in
  * higher-order functions (`zip_with` + `aggregate`), so the whole kernel
  * stays inside Catalyst (no Scala UDF, no codegen break).
  *
  * Semantics match the reference's squared-L2 kernel
  * (`/root/reference/lib/hnsw/hnsw.h:45-52`) under this engine's declared
  * float64 policy (SURVEY §7.5 risk 1): float32 elements are cast to
  * float64 (exact) and accumulated strictly left-to-right, which is
  * bit-reproducible and matches a left-associative SQL sum in the DuckDB
  * oracle. The reference accumulates in float32; ordering of results is
  * identical, only the reported distance precision differs (documented).
  */
object Distances {

  private def asD(c: Column): Column = c.cast("array<double>")

  /** Squared L2 distance between two float-array columns (float64).
    * Native codegen expression — see [[VectorExpressions]]; bit-identical
    * to [[l2SqHof]]. */
  def l2Sq(a: Column, b: Column): Column = VectorExpressions.l2Sq(a, b)

  /** Higher-order-function form of [[l2Sq]] (interpreted; kept as the
    * cross-check twin for the codegen expression). */
  def l2SqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asD(a), asD(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) distance — the reference prints sqrt only at the CLI
    * (`/root/reference/src/main.cpp:115-116`). */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Dot product of two float-array columns (float64, codegen). */
  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  /** Higher-order-function form of [[dot]] (cross-check twin). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(asD(a), asD(b), (x, y) => x * y),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm of a float-array column. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine distance (1 - cosine similarity). */
  def cosineDist(a: Column, b: Column): Column =
    lit(1.0) - cosine(a, b)
}
