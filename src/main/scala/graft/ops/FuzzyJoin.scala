package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) entity resolution with partition-signature
  * blocking — the PassJoin/Ed-Join family's segment principle (Li,
  * Deng, Feng: PassJoin, PVLDB'11; public algorithm): if
  * ed(s, t) ≤ k and s is split into k+1 contiguous segments, the k
  * edits cannot touch every segment, so at least one segment of s
  * appears unchanged in t. For EQUAL-LENGTH strings and k = 1 the
  * single edit is necessarily a substitution, the untouched half is
  * positionally identical, and blocking on (segment index, segment
  * text) is provably COMPLETE — no candidate within the threshold is
  * missed. For k ≥ 2 or unequal lengths the positional equi-join is a
  * (standard, documented) high-recall heuristic: shifted spans from
  * insert+delete combinations can escape the positional key.
  *
  * The declared query's oracle BRUTE-FORCES probe × registry in
  * DuckDB, so the hash gate doubles as a completeness proof of the
  * blocking on the test corpus — the blocked plan must produce
  * exactly the all-pairs answer.
  *
  * 100 TB shape: the registry side (the big side) takes one narrow
  * map ×(k+1 segment rows); the probe side (dirty records to resolve)
  * broadcasts; candidates are a broadcast hash equi-join on
  * (seg_idx, seg) followed by a bounded distinct — never an all-pairs
  * product, and the final `levenshtein` filter is a codegen'd Spark
  * built-in over candidates only.
  */
object FuzzyJoin {

  /** (seg_idx, seg) rows for each input row: `segments` contiguous
    * chunks with boundaries floor(i·len/segments) — the same formula
    * both engines can replay. Rows shorter than `segments` chars are
    * dropped (they would emit empty segments that match every other
    * empty segment; within-threshold matches for such stubs are out
    * of this operator's contract). */
  private def segmented(df: DataFrame, nameCol: String, segments: Int): DataFrame = {
    val n = length(col(nameCol))
    val segs = (0 until segments).map { i =>
      val start = floor(n * lit(i) / lit(segments)).cast("int") + lit(1)
      val end = floor(n * lit(i + 1) / lit(segments)).cast("int")
      struct(lit(i).as("seg_idx"),
        col(nameCol).substr(start, end - start + lit(1)).as("seg"))
    }
    df.filter(n >= lit(segments))
      .select(col("*"), explode(array(segs: _*)).as("s"))
      .select(col("*"), col("s.seg_idx").as("seg_idx"), col("s.seg").as("seg"))
      .drop("s")
  }

  /** Resolve each dirty `probes` record against the big `registry`:
    * all registry rows within `maxDist` edits of a probe, found via
    * segment blocking + exact levenshtein. Output: (probeIdCol,
    * registryIdCol, dist INT), one row per qualifying pair. */
  def fuzzyLookup(
      registry: DataFrame,
      probes: DataFrame,
      registryIdCol: String,
      registryNameCol: String,
      probeIdCol: String,
      probeNameCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k1 = maxDist + 1
    val reg = segmented(
      registry.select(col(registryIdCol), col(registryNameCol)), registryNameCol, k1)
    val prb = segmented(
      probes.select(col(probeIdCol), col(probeNameCol)), probeNameCol, k1)
    val cand = reg.join(broadcast(prb), Seq("seg_idx", "seg"))
      .select(col(probeIdCol), col(registryIdCol),
        col(probeNameCol), col(registryNameCol))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col(probeNameCol), col(registryNameCol)))
      .filter(col("dist") <= lit(maxDist))
      .select(col(probeIdCol), col(registryIdCol), col("dist"))
  }

  /** Registry SELF-dedup: all unordered pairs (id1 < id2) within
    * `maxDist` edits, via the same segment blocking as a shuffle
    * equi-join on (seg_idx, seg) — the fuzzy-duplicate-pair operator
    * for a dirty registry (same completeness tier as [[fuzzyLookup]]:
    * provable for equal-length k=1). Output: (id1, id2, dist INT).
    *
    * 100 TB shape: a hash-partitioned self-equi-join on the segment
    * key — candidate volume is Σ_seg |bucket|², the classic blocking
    * trade; hot segments (shared halves) are the skew knob, and the
    * id1 < id2 cut halves the candidate set before the distance
    * filter. Never an all-pairs product. */
  def fuzzySelfPairs(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val k1 = maxDist + 1
    val segs = segmented(df.select(col(idCol), col(nameCol)), nameCol, k1)
    val left = segs.select(col("seg_idx"), col("seg"),
      col(idCol).as("id1"), col(nameCol).as("n1"))
    val right = segs.select(col("seg_idx"), col("seg"),
      col(idCol).as("id2"), col(nameCol).as("n2"))
    left.join(right, Seq("seg_idx", "seg"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("n1"), col("n2"))
      .distinct()
      .withColumn("dist", levenshtein(col("n1"), col("n2")))
      .filter(col("dist") <= lit(maxDist))
      .select(col("id1"), col("id2"), col("dist"))
  }
}
