package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional data layout — the clustering
  * primitive behind Delta/Iceberg `OPTIMIZE ZORDER BY` (Morton 1966;
  * the interleaved-bit curve of Orenstein & Merrett SIGMOD'84): sort
  * rows by the bit-interleaving of two dimension keys so that any
  * contiguous run of the sort order covers a compact axis-aligned box
  * in BOTH dimensions at once. A layout sorted by one column bounds
  * only that column per file; the Morton layout bounds both, so
  * file-level min/max statistics prune scans for 2-D predicates —
  * at 100 TB the difference between touching every file for the
  * second predicate column and touching O(√selectivity) of them.
  *
  * The reference engine has no layout control at all (one in-memory
  * store, `/root/reference/src/vectordb.cpp`); this is charter
  * extension surface for the large-scale pipeline.
  *
  * Everything here is oracle-replicable integer/double arithmetic:
  * dimension buckets derive from the data's own min/max (one 1-row
  * broadcast aggregate), the Morton key is an unrolled bit-interleave
  * expression, and equal-ROW block assignment uses a counting-sort
  * style cumulative over the DISTINCT-CELL table (bounded by the
  * 2^(2·bits) key space, independent of corpus row count) — never a
  * global row sort.
  */
object ZOrder {

  /** 2-D Morton key: interleave the low `bits` bits of two bucketed
    * non-negative dimension keys (x even positions, y odd). */
  def mortonKey(x: Column, y: Column, bits: Int = 10): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** The matching DuckDB SQL for [[mortonKey]], for oracle replay. */
  def mortonSql(x: String, y: String, bits: Int = 10): String =
    (0 until bits).flatMap { i =>
      Seq(s"(((($x >> $i) & 1)) << ${2 * i})",
        s"(((($y >> $i) & 1)) << ${2 * i + 1})")
    }.mkString("(", " | ", ")")

  /** Scale a dimension into `buckets` equal-width buckets of its own
    * [min, max] range (range columns come from a broadcast 1-row
    * aggregate). Double arithmetic in a fixed op order so the DuckDB
    * oracle reproduces the exact bucket ids. */
  def rangeBucket(c: Column, mn: Column, mx: Column, buckets: Int): Column =
    least(
      floor((c.cast("double") - mn) / (mx - mn + lit(1e-9)) *
        lit(buckets.toDouble)).cast("long"),
      lit(buckets - 1L))

  /** The matching DuckDB SQL for [[rangeBucket]]. */
  def rangeBucketSql(c: String, mn: String, mx: String, buckets: Int): String =
    s"least(CAST(floor((CAST($c AS DOUBLE) - $mn) / ($mx - $mn + 1e-9) * " +
      s"$buckets.0) AS BIGINT), ${buckets - 1})"

  /** Per-layout clustering quality: bucket both dimensions, aggregate
    * to the occupied-cell table (ONE shuffle over the raw rows, output
    * bounded by the 2^(2·bits) key space), then for each of three sort
    * layouts — Morton, x-major, y-major — assign equal-row blocks via
    * a cumulative count over the cell table and measure the average
    * per-block span of each dimension. Sorted-by-x bounds only x;
    * Morton bounds both. Output: one row per layout
    * (layout, n_blocks, avg_x_span_micro, avg_y_span_micro).
    *
    * The only window runs over the DISTINCT-cell table (≤ 2^(2·bits)
    * rows regardless of data size) — the raw data is touched exactly
    * once, by the bucketing aggregation. */
  def layoutStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 10,
      blocks: Int = 64): DataFrame = {
    val b = 1 << bits
    val ranges = df.agg(
      min(col(xCol)).cast("double").as("x_mn"),
      max(col(xCol)).cast("double").as("x_mx"),
      min(col(yCol)).cast("double").as("y_mn"),
      max(col(yCol)).cast("double").as("y_mx"))
    val cells = df.crossJoin(broadcast(ranges))
      .select(
        rangeBucket(col(xCol), col("x_mn"), col("x_mx"), b).as("xb"),
        rangeBucket(col(yCol), col("y_mn"), col("y_mx"), b).as("yb"))
      .groupBy("xb", "yb").agg(count(lit(1)).as("cnt"))
      // tiny (≤ occupied cells); pin it so the three layout branches
      // don't re-run the raw-data aggregation (exchange reuse under
      // AQE is not guaranteed — the perplexityBuckets discipline)
      .localCheckpoint()
    val total = cells.agg(sum(col("cnt")).as("n_rows"))

    def one(name: String, sortKey: Column): DataFrame = {
      val w = Window.orderBy("sk").rowsBetween(Window.unboundedPreceding, -1)
      cells.withColumn("sk", sortKey)
        .withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .crossJoin(broadcast(total))
        .withColumn("blk",
          floor((col("cum") * lit(blocks.toLong)).cast("double") /
            col("n_rows").cast("double")).cast("long"))
        .groupBy("blk")
        .agg((max(col("xb")) - min(col("xb"))).as("xs"),
          (max(col("yb")) - min(col("yb"))).as("ys"))
        .agg(count(lit(1)).as("n_blocks"),
          floor(sum(col("xs")).cast("double") * lit(1e6) /
            count(lit(1)).cast("double")).cast("long").as("avg_x_span_micro"),
          floor(sum(col("ys")).cast("double") * lit(1e6) /
            count(lit(1)).cast("double")).cast("long").as("avg_y_span_micro"))
        .select(lit(name).as("layout"), col("n_blocks"),
          col("avg_x_span_micro"), col("avg_y_span_micro"))
    }

    one("by_x", col("xb") * lit(b.toLong) + col("yb"))
      .unionAll(one("by_y", col("yb") * lit(b.toLong) + col("xb")))
      .unionAll(one("zorder", mortonKey(col("xb"), col("yb"), bits)))
      .orderBy("layout")
  }

  /** Write `df` as a Z-ordered parquet layout: bucket the two
    * dimensions on the data's own range, range-partition on the Morton
    * key into `numFiles` files, sort within each file. File-level
    * parquet min/max stats then bound BOTH columns per file, so a 2-D
    * predicate prunes at the file level (`repartitionByRange` samples
    * ranges — no global sort). */
  def writeZOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      path: String,
      numFiles: Int,
      bits: Int = 10): Unit = {
    val b = 1 << bits
    val ranges = df.agg(
      min(col(xCol)).cast("double").as("x_mn"),
      max(col(xCol)).cast("double").as("x_mx"),
      min(col(yCol)).cast("double").as("y_mn"),
      max(col(yCol)).cast("double").as("y_mx"))
    df.crossJoin(broadcast(ranges))
      .withColumn("__z", mortonKey(
        rangeBucket(col(xCol), col("x_mn"), col("x_mx"), b),
        rangeBucket(col(yCol), col("y_mn"), col("y_mx"), b), bits))
      .drop("x_mn", "x_mx", "y_mn", "y_mx")
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  private val zorderSidecar = "_graft_zorder_sidecar.json"

  /** Idempotently materialize a Z-ordered layout of `df` at `dir`
    * ([[writeZOrdered]]) behind the fingerprint-sidecar protocol
    * ([[graft.io.Artifact.ensure]]: sidecar written LAST under the dir
    * lock — a crashed write never looks complete; a changed input OR
    * changed build parameter forces a rewrite): the
    * build-once/probe-many discipline of the IVF layouts and BM25
    * posting lists, applied to data LAYOUT. */
  def ensureZOrderedLayout(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      dir: String,
      xCol: String,
      yCol: String,
      numFiles: Int = 32,
      bits: Int = 10): Unit = {
    val (nRows, dataHash, hashSum) =
      graft.io.Artifact.hashAgg(df, xxhash64(df.columns.map(col): _*))
    graft.io.Artifact.ensure(dir, zorderSidecar,
      graft.io.Artifact.fingerprintJson(nRows, dataHash,
        "hsum" -> hashSum,
        "xCol" -> xCol, "yCol" -> yCol,
        "numFiles" -> numFiles.toString, "bits" -> bits.toString)) {
      writeZOrdered(df, xCol, yCol, s"$dir/data", numFiles, bits)
    }
  }

  /** 2-D box scan through a Z-ordered layout: a plain filtered read —
    * the point is what the LAYOUT does to it. Both range predicates
    * reach the parquet scan (PushedFilters), and because every file's
    * min/max footer stats bound BOTH columns, the reader skips the
    * files (and row groups) whose box misses the predicate — at 100 TB
    * the query touches O(box) files instead of every file for the
    * second column. */
  def scanBox(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      xCol: String, yCol: String,
      xLo: Long, xHi: Long, yLo: Double, yHi: Double): DataFrame =
    spark.read.parquet(s"$dir/data")
      .filter(col(xCol) >= xLo && col(xCol) <= xHi &&
        col(yCol) >= yLo && col(yCol) <= yHi)

  /** File-level pruning measurement for a written layout: per parquet
    * file, the (min, max) box of the two dimensions — exactly the
    * footer statistics a reader prunes on — and whether the box
    * intersects the query box. Returns (files_total, files_touched). */
  def filesTouched(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      xCol: String, yCol: String,
      xLo: Double, xHi: Double, yLo: Double, yHi: Double): (Long, Long) = {
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(xCol)).cast("double").as("x0"),
        max(col(xCol)).cast("double").as("x1"),
        min(col(yCol)).cast("double").as("y0"),
        max(col(yCol)).cast("double").as("y1"))
    val touched = perFile.agg(
      count(lit(1)).as("n"),
      sum(when(col("x1") >= xLo && col("x0") <= xHi &&
        col("y1") >= yLo && col("y0") <= yHi, 1L).otherwise(0L)).as("t"))
      .head()
    (touched.getLong(0), touched.getLong(1))
  }
}
