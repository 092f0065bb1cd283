package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType, LongType, StringType, StructField, StructType}

// This file lives in the org.apache.spark.sql namespace because the
// Expression SPI it needs (AbstractDataType, the classic Column↔Expression
// bridge) is private[sql] — the standard pattern for Spark extension
// libraries. Everything else in this project stays under graft.*.

/** Native Catalyst expressions for the vector-distance hot path.
  *
  * The higher-order-function composition in [[Distances]] is correct but
  * not codegen-compatible (HOF lambdas are interpreted and allocate a
  * result array per row); these expressions generate a tight primitive
  * Java loop inside whole-stage codegen — the "custom Expression with
  * doGenCode" step that SURVEY §7.4 reserves for the distance kernel
  * (reference kernel: /root/reference/lib/hnsw/hnsw.h:45-52).
  *
  * Semantics are identical to the HOF versions, bit-for-bit: float32
  * elements widened to float64 (exact), accumulated strictly
  * left-to-right; mismatched lengths or null elements yield null (as
  * `zip_with` padding does).
  */
abstract class VectorFoldExpression extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  /** Per-element contribution in the interpreted path. */
  protected def combine(x: Double, y: Double): Double

  /** Java source for the per-element contribution given the two element
    * variable names. */
  protected def combineJava(d1: String, d2: String): String

  private lazy val leftHasNulls =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private lazy val rightHasNulls =
    right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if ((leftHasNulls && x.isNullAt(i)) || (rightHasNulls && y.isNullAt(i))) return null
      s += combine(x.getFloat(i).toDouble, y.getFloat(i).toDouble)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: this block may be inlined next to other loops (HOF
      // lambdas, a second instance of this expression) and bare locals
      // would collide ("Redefinition of local variable")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d1 = ctx.freshName("d1")
      val d2 = ctx.freshName("d2")
      val nullCheck =
        if (leftHasNulls || rightHasNulls)
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    final double $d1 = (double) $a.getFloat($i);
         |    final double $d2 = (double) $b.getFloat($i);
         |    $s += ${combineJava(d1, d2)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })
  }
}

/** Squared L2 distance: Σ (aᵢ−bᵢ)², float64, left-to-right. */
case class L2SqExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def combine(x: Double, y: Double): Double = { val d = x - y; d * d }
  override protected def combineJava(d1: String, d2: String): String = s"($d1 - $d2) * ($d1 - $d2)"
  override def prettyName: String = "l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product: Σ aᵢ·bᵢ, float64, left-to-right. */
case class DotExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineJava(d1: String, d2: String): String = s"$d1 * $d2"
  override def prettyName: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Token-hash helpers shared by interpreted and generated SimHash code. */
object GraftHash {
  private val md5Pool = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of the MD5 digest, big-endian — equals the first 16
    * hex chars of `md5(token)` read as an unsigned 64-bit value, which a
    * SQL oracle can recompute (DuckDB `md5` + hex arithmetic). */
  def md5Long(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Pool.get()
    md.reset()
    val d = md.digest(s.getBytes)
    java.nio.ByteBuffer.wrap(d).getLong
  }
}

/** 64-bit SimHash of a token array: every token hashed once, a ±1 vote
  * per bit, sign → bit pack. Codegen loop replaces the interpreted
  * higher-order-function fold (~64 lambda evals per token per row).
  *
  * `hashKind` selects the token hash:
  *  - "xx": xxhash64 seed 42 (identical to the SQL `xxhash64` function) —
  *    the fast default for production pipelines
  *  - "md5": first 8 bytes of MD5 — slower, but recomputable by an
  *    external SQL engine, which makes the whole near-dup operator
  *    oracle-checkable end-to-end
  * Null tokens hash to the xx seed in both kinds. */
case class SimHashExpr(child: Expression, hashKind: String = "xx")
    extends UnaryExpression with ExpectsInputTypes {
  require(hashKind == "xx" || hashKind == "md5", s"unknown hashKind $hashKind")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val votes = new Array[Long](64)
    val n = arr.numElements()
    val md5 = hashKind == "md5"
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else if (md5) GraftHash.md5Long(arr.getUTF8String(i))
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gh = GraftHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      // fresh names: avoid local-variable collisions when inlined
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val sig = ctx.freshName("sig")
      val hashCall =
        if (hashKind == "md5") s"$gh.md5Long($a.getUTF8String($i))"
        else s"$xxh.hashUTF8String($a.getUTF8String($i), 42L)"
      s"""
         |long[] $votes = new long[64];
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.isNullAt($i) ? 42L : $hashCall;
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($votes[$j] > 0) $sig |= (1L << $j); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature of a (distinct) shingle array: element j of the
  * result is min over shingles of xxhash64(shingle, seed = j). One
  * compiled pass over shingles × k seeds. Empty input → Long.MaxValue
  * sentinels (the identity of min), so empty docs never collide with
  * real signatures in a band join. */
case class MinHashExpr(child: Expression, k: Int) extends UnaryExpression with ExpectsInputTypes {
  require(k > 0, s"k must be positive, got $k")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashUTF8String(s, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val gad = classOf[GenericArrayData].getName
      // fresh names: avoid local-variable collisions when inlined
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $h = $xxh.hashUTF8String($s, (long) $j);
         |      if ($h < $mins[$j]) $mins[$j] = $h;
         |    }
         |  }
         |}
         |${ev.value} = new $gad($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static kernel shared by [[ShinglesExpr]]'s interpreted and codegen
  * paths: distinct word n-grams (space-joined, first-occurrence order,
  * null tokens skipped like `concat_ws`). */
object ShingleUtil {
  def shingles(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i <= len - n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (tokens.isNullAt(i + j)) null else tokens.getUTF8String(i + j)
        j += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** Distinct word n-gram shingles of a token array — the compiled
  * replacement for the transform/slice/concat_ws/array_distinct HOF
  * pipeline, whose interpreted lambdas dominated the dedup operators
  * (the shingle expression is re-evaluated on every branch of a
  * self-join). Semantics identical: space-joined n-grams, distinct,
  * first-occurrence order; fewer than n tokens → empty array. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression with ExpectsInputTypes {
  require(n > 0, s"n must be positive, got $n")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(a: Any): Any =
    ShingleUtil.shingles(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleUtil.shingles($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Greedy left-to-right phrase merge of a token array — the compiled
  * replacement for the `aggregate`-HOF fold in the phrase-rewrite
  * operator, whose interpreted lambda (O(|phrases|) array_contains +
  * string concat per token) dominated `doc_phrase_rewrite`'s runtime.
  * Semantics are EXACTLY the fold's: seed with the first token; for
  * each next token x, if `last + " " + x` is in the phrase set, the
  * accumulator's last element becomes `last + "_" + x` (a token
  * consumed by one merge is not re-offered to the next — self-runs
  * compress pairwise); a null on either side appends (the HOF's
  * concat-null → array_contains-null → otherwise branch). The DuckDB
  * oracle replays the identical fold, so the kernel's equivalence is
  * hash-checked per round, not just spec-pinned. */
case class PhraseMergeExpr(child: Expression, phrases: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "phrase_merge"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](phrases.size * 2)
    phrases.foreach(p => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(p)))
    s
  }

  private final val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private final val Under = org.apache.spark.unsafe.types.UTF8String.fromString("_")

  def mergeIn(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      // clone: getUTF8String can return a view over a reused unsafe
      // buffer; stored elements must own their bytes
      val x = if (arr.isNullAt(i)) null else arr.getUTF8String(i).clone()
      val last = if (out.isEmpty) null else out.get(out.size - 1)
      if (i > 0 && last != null && x != null &&
          set.contains(org.apache.spark.unsafe.types.UTF8String.concat(last, Space, x)))
        out.set(out.size - 1,
          org.apache.spark.unsafe.types.UTF8String.concat(last, Under, x))
      else out.add(x)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def nullSafeEval(a: Any): Any = mergeIn(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phraseMerger", this, classOf[PhraseMergeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.mergeIn($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Rank-priority BPE apply over a symbol array — the inference half of
  * BPE for an EXTERNAL rank-ordered merge list (GPT-2's `merges.txt`
  * shape: 50k rules where later rules consume earlier rules' outputs,
  * so the batched trainer's per-round disjointness invariant does NOT
  * hold and the grouped per-round fold is not legal). Semantics are
  * the public standard (Sennrich's `apply_bpe.py`, GPT-2's `bpe()`):
  * repeat up to `maxIters` times — find the LOWEST-RANKED adjacent
  * pair present in the word, merge every occurrence greedy
  * left-to-right (the shared fold semantics: a merged element is not
  * re-offered to the next site, so an `a a a a` run under (a,a)
  * compresses pairwise), stop when no adjacent pair is in the rank
  * map. Each iteration shrinks the array, so `maxIters >=
  * len(symbols) - 1` guarantees full convergence; the bound exists so
  * the SQL oracle can replay the loop as exactly `maxIters` unrolled
  * steps. Cost: O(len² · lookup) per DISTINCT word and O(1) driver
  * steps — rule count only sizes the hash map, never the plan. The
  * rank map rides inside the expression (task binaries are
  * torrent-broadcast once per executor) and is rebuilt lazily on
  * deserialization. U+0001 is the reserved rank-key separator
  * (`graft.text.Bpe.Sep`); construction refuses rules containing it. */
case class BpeRankMergeExpr(
    child: Expression, merges: Seq[(String, String)], maxIters: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxIters > 0, s"maxIters must be positive, got $maxIters")
  require(merges.nonEmpty, "empty merge list")
  require(merges.forall { case (a, b) =>
      a.nonEmpty && b.nonEmpty && !a.contains('\u0001') && !b.contains('\u0001')
    }, "merge symbols must be non-empty and free of the reserved U+0001 separator")
  require(merges.distinct.length == merges.length,
    "duplicate (lhs, rhs) pair in merge list — ranks would be ambiguous")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_rank_merge"

  @transient private lazy val ranks: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(a + "\u0001" + b),
        Integer.valueOf(i))
    }
    m
  }

  def bpeIn(arr: ArrayData): ArrayData =
    new GenericArrayData(
      BpeRankMergeUtil.run(arr, ranks, maxIters).word.asInstanceOf[Array[Any]])

  override protected def nullSafeEval(a: Any): Any = bpeIn(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRankMerger", this, classOf[BpeRankMergeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.bpeIn($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The shared priority-loop core of [[BpeRankMergeExpr]] and
  * [[BpeRankConvergedExpr]]: identical merge semantics, plus one bit of
  * diagnostic output (did the word reach a state with no rankable
  * adjacent pair within the iteration bound?). */
object BpeRankMergeUtil {
  private final val Sep = org.apache.spark.unsafe.types.UTF8String.fromString("\u0001")

  final class Result(
      val word: Array[org.apache.spark.unsafe.types.UTF8String],
      val converged: Boolean)

  def run(
      arr: ArrayData,
      ranks: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer],
      maxIters: Int): Result = {
    val n = arr.numElements()
    var word = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      // clone: getUTF8String can return a view over a reused buffer
      word(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).clone()
      i += 1
    }
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // lowest-ranked adjacent pair present (ranks are unique per pair,
      // so the argmin is deterministic)
      var bestRank = Integer.MAX_VALUE
      var bestA: org.apache.spark.unsafe.types.UTF8String = null
      var bestB: org.apache.spark.unsafe.types.UTF8String = null
      var j = 0
      while (j < word.length - 1) {
        val a = word(j); val b = word(j + 1)
        if (a != null && b != null) {
          val r = ranks.get(org.apache.spark.unsafe.types.UTF8String.concat(a, Sep, b))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bestA = a; bestB = b
          }
        }
        j += 1
      }
      if (bestA == null) converged = true
      else {
        // merge every (bestA, bestB) site via the shared fold: the
        // merged element replaces the accumulator's last and is not
        // re-offered (bestA+bestB != bestA since bestB is non-empty,
        // so this equals the scan-with-skip formulation)
        val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](word.length)
        var k = 0
        while (k < word.length) {
          val x = word(k)
          val last = if (out.isEmpty) null else out.get(out.size - 1)
          if (k > 0 && last != null && x != null &&
              last.equals(bestA) && x.equals(bestB))
            out.set(out.size - 1,
              org.apache.spark.unsafe.types.UTF8String.concat(bestA, bestB))
          else out.add(x)
          k += 1
        }
        word = out.toArray(new Array[org.apache.spark.unsafe.types.UTF8String](out.size))
      }
      iter += 1
    }
    if (!converged) {
      // the bound stopped the loop — check whether any rankable pair
      // was actually left undone (the final iteration may have merged
      // the last one)
      var anyPair = false
      var j = 0
      while (j < word.length - 1 && !anyPair) {
        val a = word(j); val b = word(j + 1)
        if (a != null && b != null &&
            ranks.get(org.apache.spark.unsafe.types.UTF8String.concat(a, Sep, b)) != null)
          anyPair = true
        j += 1
      }
      converged = !anyPair
    }
    new Result(word, converged)
  }
}

/** Diagnostic twin of [[BpeRankMergeExpr]]: TRUE iff the priority loop
  * reaches a state with no rankable adjacent pair within `maxIters`
  * iterations — i.e. the bounded apply equals the unbounded published
  * BPE semantics for this word. A pretoken longer than the bound allows
  * can otherwise silently under-merge (long URLs, digit runs, CJK-heavy
  * pretokens); specs assert zero unconverged words per corpus, and
  * [[graft.text.Bpe.rankApplyBound]] derives a bound that makes
  * convergence structural (>= max symbol count - 1, and every iteration
  * shrinks the word by at least one symbol). */
case class BpeRankConvergedExpr(
    child: Expression, merges: Seq[(String, String)], maxIters: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(maxIters > 0, s"maxIters must be positive, got $maxIters")
  require(merges.nonEmpty, "empty merge list")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_rank_converged"

  @transient private lazy val ranks: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(a + "\u0001" + b),
        Integer.valueOf(i))
    }
    m
  }

  def convergedIn(arr: ArrayData): Boolean =
    BpeRankMergeUtil.run(arr, ranks, maxIters).converged

  override protected def nullSafeEval(a: Any): Any = convergedIn(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRankConv", this, classOf[BpeRankConvergedExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.convergedIn($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Subword -> vocabulary-id mapping as ONE hashed probe per element.
  * The declarative alternative (`transform(arr, s => element_at(vmap,
  * s))` over a `typedLit` map literal) is a LINEAR scan of the map per
  * lookup in Catalyst — fine at a 1.4k fixture vocab, the wrong shape
  * at a production 50k vocab (50k comparisons per subword). Here the
  * vocab rides as a reference object (task binaries are broadcast once
  * per executor) hashed on construction: O(1) per subword at any vocab
  * size. Missing symbols map to null — `element_at`'s semantics, so
  * the two formulations are bit-equal where both run. */
case class VocabIdsExpr(child: Expression, vocab: Seq[(String, Int)])
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty, "empty vocabulary")
  require(vocab.map(_._1).distinct.length == vocab.length,
    "duplicate symbol in vocabulary — ids would be ambiguous")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vocab_ids"

  @transient private lazy val ids: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](vocab.size * 2)
    vocab.foreach { case (s, i) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(s), Integer.valueOf(i))
    }
    m
  }

  def idsIn(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) null else ids.get(arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any = idsIn(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabIdsMapper", this, classOf[VocabIdsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.idsIn($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Piece -> id mapping WITH BYTE FALLBACK — SentencePiece's
  * `--byte_fallback` semantics (the Llama-family tokenizer
  * convention): a piece found in the vocabulary emits its id (one
  * hashed O(1) probe, the [[VocabIdsExpr]] device); a piece absent
  * from it — by the Viterbi kernel's construction always a single
  * out-of-vocabulary character — expands to its UTF-8 bytes, one
  * `<0xXX>` id per byte at `byteBase + byteValue`. Every input
  * therefore maps to at least one id and the output carries no nulls:
  * segmentation-by-ids is TOTAL over arbitrary text, the property the
  * fallback exists for. Output positions flatten in piece order. */
case class ByteFallbackIdsExpr(child: Expression, vocab: Seq[(String, Int)],
    byteBase: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty, "empty vocabulary")
  require(vocab.map(_._1).distinct.length == vocab.length,
    "duplicate symbol in vocabulary — ids would be ambiguous")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_fallback_ids"

  @transient private lazy val ids: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](vocab.size * 2)
    vocab.foreach { case (s, i) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(s), Integer.valueOf(i))
    }
    m
  }

  def idsIn(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n + 4)
    var i = 0
    while (i < n) {
      // the declared input type admits nullable elements even though the
      // intended producer (UnigramViterbiExpr) never emits them — fail
      // loudly rather than NPE inside getUTF8String
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"byte_fallback_ids: null token at position $i — input tokens must be non-null")
      val s = arr.getUTF8String(i)
      val id = ids.get(s)
      if (id != null) out += id
      else {
        // UTF8String already holds the UTF-8 bytes — no re-encode
        val bs = s.getBytes
        var j = 0
        while (j < bs.length) {
          out += Integer.valueOf(byteBase + (bs(j) & 0xff))
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(a: Any): Any = idsIn(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteFallbackIdsMapper", this, classOf[ByteFallbackIdsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.idsIn($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Token ids -> text for the UNIGRAM byte-fallback id layout — the
  * decode direction of the SentencePiece-family tokenizer as one
  * codegen kernel: a trained-piece id resolves through the reverse
  * vocabulary to its piece's UTF-8 bytes (PRECOMPUTED at
  * construction), a byte-piece id `<0xXX>` contributes its raw byte
  * (`id - byteBase`), and control ids `0..byteBase-1` contribute
  * nothing (upstream decode drops control tokens). The assembled byte
  * sequence UTF-8-decodes to the piece stream — with the
  * [[graft.text.Unigram.SpMarker]] convention the caller then turns
  * markers into spaces to restore the original spacing. A foreign or
  * null id yields null (a decode under the wrong vocabulary must be
  * visibly wrong, not silently partial). */
case class UnigramDecodeExpr(child: Expression, vocab: Seq[(String, Int)],
    byteBase: Int, bytePieces: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty, "empty vocabulary")
  require(vocab.map(_._2).distinct.length == vocab.length,
    "duplicate id in vocabulary — decoding would be ambiguous")
  require(vocab.forall(_._2 >= byteBase + bytePieces),
    "trained-piece ids must sit above the byte-piece block")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_decode"

  @transient private lazy val bytesById: java.util.HashMap[Integer, Array[Byte]] = {
    val m = new java.util.HashMap[Integer, Array[Byte]](vocab.size * 2)
    vocab.foreach { case (piece, id) =>
      m.put(Integer.valueOf(id), piece.getBytes("UTF-8"))
    }
    m
  }

  def decode(arr: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = arr.numElements()
    val out = new java.io.ByteArrayOutputStream(n * 3)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val id = arr.getInt(i)
      if (id >= byteBase && id < byteBase + bytePieces) {
        out.write(id - byteBase)
      } else if (id >= 0 && id < byteBase) {
        // control token: contributes no text
      } else {
        val b = bytesById.get(Integer.valueOf(id))
        if (b == null) return null
        out.write(b, 0, b.length)
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out.toByteArray)
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = decode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramDecoder", this, classOf[UnigramDecodeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $ref.decode($a);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** BERT's WordPiece greedy longest-match-first segmentation (Schuster &
  * Nakajima, ICASSP 2012; the released BERT `WordpieceTokenizer`
  * algorithm) as ONE codegen kernel per DISTINCT word: walk the word
  * left to right, at each position take the LONGEST vocabulary piece
  * that matches (continuation positions probe with the `##` prefix);
  * if no piece matches at some position the ENTIRE word becomes the
  * unknown token — the published is_bad semantics, not a per-char
  * fallback. Words longer than `maxInputChars` are unknown outright
  * (the reference implementation's max_input_chars_per_word guard).
  * The vocabulary rides as a hashed reference object (O(1) membership
  * at any vocabulary size); per-position probes are bounded by the
  * longest piece's character length, never vocabulary size. Input is
  * the word's character array (code-point faithful — the same
  * `split(word, "")` device the unigram kernel uses, so surrogate
  * pairs stay whole and DuckDB's character-indexed `substr` replays
  * positions exactly). */
case class WordPieceExpr(
    child: Expression, vocab: Seq[String], unkToken: String,
    contPrefix: String, maxInputChars: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty, "empty vocabulary")
  require(vocab.distinct.length == vocab.length, "duplicate piece in vocabulary")
  require(maxInputChars >= 1, s"maxInputChars must be >= 1, got $maxInputChars")
  require(contPrefix.nonEmpty, "empty continuation prefix")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wordpiece_greedy"

  @transient private lazy val pieceSet: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](vocab.size * 2)
    vocab.foreach(p => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(p)))
    s
  }
  // longest CONTENT a piece can match: its code-point count (the ##
  // prefix is re-added at probe time, so this over-counts continuation
  // pieces by the prefix length — a safe upper bound on probe length)
  @transient private lazy val maxPieceChars: Int =
    vocab.map(p => p.codePointCount(0, p.length)).max
  @transient private lazy val prefixU8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(contPrefix)
  @transient private lazy val unkU8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(unkToken)

  def segment(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val chars = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      chars(i) = arr.getUTF8String(i).clone()
      i += 1
    }
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    if (n > maxInputChars)
      return new GenericArrayData(Array[Any](unkU8))
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    var start = 0
    while (start < n) {
      var end = math.min(n, start + maxPieceChars)
      var found: org.apache.spark.unsafe.types.UTF8String = null
      while (end > start && found == null) {
        val sub = org.apache.spark.unsafe.types.UTF8String
          .concat(java.util.Arrays.copyOfRange(chars, start, end): _*)
        val cand =
          if (start > 0) org.apache.spark.unsafe.types.UTF8String.concat(prefixU8, sub)
          else sub
        if (pieceSet.contains(cand)) found = cand
        else end -= 1
      }
      if (found == null)
        return new GenericArrayData(Array[Any](unkU8)) // is_bad: whole word -> [UNK]
      out.add(found)
      start = end
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = segment(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceGreedy", this, classOf[WordPieceExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $ref.segment($a);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Token ids -> text for the BERT WordPiece id layout — the decode
  * direction of the WordPiece tokenizer as one codegen kernel over a
  * hashed id -> piece table: control ids (`dropIds` — [PAD]/[CLS]/
  * [SEP]/[MASK], NOT [UNK]) contribute nothing, a `##`-prefixed piece
  * appends to the previous word with the prefix stripped, any other
  * piece starts a new whitespace-separated word, and a foreign id
  * nulls the result (corrupted input surfaces, never silently
  * truncates). */
case class WordPieceDecodeExpr(child: Expression, vocab: Seq[(String, Int)],
    contPrefix: String, dropIds: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty, "empty vocabulary")
  require(vocab.map(_._2).distinct.length == vocab.length,
    "duplicate id in vocabulary — decoding would be ambiguous")
  require(contPrefix.nonEmpty, "empty continuation prefix")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wordpiece_decode"

  @transient private lazy val pieceById: java.util.HashMap[Integer, String] = {
    val m = new java.util.HashMap[Integer, String](vocab.size * 2)
    vocab.foreach { case (p, id) => m.put(Integer.valueOf(id), p) }
    m
  }
  @transient private lazy val dropSet: java.util.HashSet[Integer] = {
    val s = new java.util.HashSet[Integer](dropIds.size * 2)
    dropIds.foreach(i => s.add(Integer.valueOf(i)))
    s
  }

  def decode(arr: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 4)
    var i = 0
    var wrote = false
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val id = Integer.valueOf(arr.getInt(i))
      if (!dropSet.contains(id)) {
        val p = pieceById.get(id)
        if (p == null) return null
        if (p.startsWith(contPrefix) && wrote) sb.append(p, contPrefix.length, p.length)
        else {
          if (wrote) sb.append(' ')
          sb.append(p)
          wrote = true
        }
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = decode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPieceDecoder", this, classOf[WordPieceDecodeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $ref.decode($a);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Codegen Bloom-filter membership probe over a string column — the
  * map-side prefilter of the bloom-accelerated decontamination path.
  * The sketch rides inside the expression as a reference object (task
  * binaries are torrent-broadcast once per executor — the same
  * distribution a manual `sparkContext.broadcast` buys, without the
  * ScalaUDF eval layer), and the probe hashes the UTF8String's bytes
  * directly — `BloomFilter.mightContainString` semantics (it hashes
  * the UTF-8 bytes) without the per-row String materialization the
  * UDF formulation paid. Null input yields null (filtered rows drop,
  * matching the UDF's `s != null && ...` guard). */
/** Exact int64 squared-L2 between a long-array column and a FIXED
  * centroid literal — the quantized-k-means assignment kernel
  * ([[graft.ops.QuantKMeans]]). One expression node per centroid:
  * inlining the d subtract-square terms as a Catalyst tree instead
  * (k·d ≈ 256 `element_at` nodes per row) costs seconds of analyzer/
  * codegen time PER JOB on the driver — measured as a ~18 s fixed
  * overhead per Lloyd round at d=64, k=4 — while this kernel is one
  * tight Java loop over the unsafe array with the centroid as a
  * task-broadcast reference object. */
case class L2SqLongLitExpr(child: Expression, cent: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(cent != null && cent.nonEmpty, "empty centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2sq_long_lit"

  def distTo(arr: ArrayData): Long = {
    val n = arr.numElements()
    require(n == cent.length, s"dim mismatch: $n vs ${cent.length}")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = arr.getLong(i) - cent(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def nullSafeEval(a: Any): Any =
    distTo(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("l2sqLongLit", this, classOf[L2SqLongLitExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.distTo($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class BloomProbeExpr(
    child: Expression, bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {
  require(bloom != null, "null bloom filter")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_probe"

  def probe(s: org.apache.spark.unsafe.types.UTF8String): Boolean =
    bloom.mightContainBinary(s.getBytes)

  override protected def nullSafeEval(a: Any): Any =
    probe(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProber", this, classOf[BloomProbeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.probe($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Token ids -> RAW TEXT: the decode direction of the byte-level
  * tokenizer, as one codegen kernel. Each id resolves through the
  * reverse vocabulary to its subword symbol string, each symbol char
  * unmaps to its raw byte (the inverse of the published
  * bytes_to_unicode table), and the byte sequence UTF-8-decodes to the
  * original text — the losslessness property of byte-level BPE, here
  * as an O(1)-per-id hashed probe with the per-id byte arrays
  * PRECOMPUTED at construction (no per-row string walking of the
  * vocabulary). An unknown or null id yields a null result (a decode
  * of ids from a foreign vocabulary must be visibly wrong, not
  * silently partial). */
case class ByteLevelDecodeExpr(child: Expression, vocab: Seq[(String, Int)])
    extends UnaryExpression with ExpectsInputTypes {
  require(vocab.nonEmpty, "empty vocabulary")
  require(vocab.map(_._2).distinct.length == vocab.length,
    "duplicate id in vocabulary — decoding would be ambiguous")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.IntegerType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_level_decode"

  @transient private lazy val bytesById: java.util.HashMap[Integer, Array[Byte]] = {
    val symToByte: Map[Char, Byte] = ByteLevelUtil.ByteToSym.zipWithIndex.map {
      case (s, b) => (s.charAt(0), b.toByte)
    }.toMap
    val m = new java.util.HashMap[Integer, Array[Byte]](vocab.size * 2)
    vocab.foreach { case (sym, id) =>
      // a special token whose name uses alphabet chars (ASCII names
      // like <|endoftext|> always do) decodes to its literal text —
      // upstream decode-with-specials semantics; a symbol carrying a
      // non-alphabet char cannot be byte-unmapped and yields null
      val bytes =
        if (sym.forall(symToByte.contains)) sym.map(symToByte).toArray else null
      m.put(Integer.valueOf(id), bytes)
    }
    m
  }

  def decode(arr: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = arr.numElements()
    var total = 0
    val parts = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val b = bytesById.get(Integer.valueOf(arr.getInt(i)))
      if (b == null) return null
      parts(i) = b
      total += b.length
      i += 1
    }
    val out = new Array[Byte](total)
    var off = 0
    i = 0
    while (i < n) {
      System.arraycopy(parts(i), 0, out, off, parts(i).length)
      off += parts(i).length
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = decode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteLevelDecoder", this, classOf[ByteLevelDecodeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $ref.decode($a);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Viterbi segmentation under a unigram language model (Kudo ACL'18,
  * arXiv:1804.10959 — the SentencePiece model family): per word, the
  * minimum-total-cost split into vocabulary pieces, where a piece's
  * cost is its quantized negative log-probability (integer — the
  * whole DP is integer arithmetic, so the SQL oracle replays it
  * bit-exactly with no transcendental-function drift inside the DP).
  * dp[i] = min over j in [max(0, i-maxPieceLen), i) of dp[j] +
  * cost(syms[j..i)); single-char pieces fall back to `unkCost` when
  * absent (segmentation is total — no word is unrepresentable); ties
  * break to the SMALLEST j (the longest last piece), scanning j
  * ascending with strict improvement — the oracle's lexicographic
  * (cost, j) struct-min. One kernel call per DISTINCT word; the
  * vocabulary rides as a hashed reference object, so vocab size never
  * touches the plan. */
case class UnigramViterbiExpr(
    child: Expression, pieces: Seq[(String, Long)], maxPieceLen: Int, unkCost: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(pieces.nonEmpty, "empty piece vocabulary")
  require(pieces.map(_._1).distinct.length == pieces.length,
    "duplicate piece in vocabulary — costs would be ambiguous")
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  require(unkCost > 0, s"unkCost must be positive, got $unkCost")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_viterbi"

  @transient private lazy val costs: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long](pieces.size * 2)
    pieces.foreach { case (p, c) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(p), java.lang.Long.valueOf(c))
    }
    m
  }

  def segment(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val syms = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      syms(i) = arr.getUTF8String(i).clone()
      i += 1
    }
    val dp = new Array[Long](n + 1)
    val back = new Array[Int](n + 1)
    i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var bestJ = -1
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val piece = org.apache.spark.unsafe.types.UTF8String
          .concat(java.util.Arrays.copyOfRange(syms, j, i): _*)
        val c = costs.get(piece)
        val stepCost: java.lang.Long =
          if (c != null) c
          else if (i - j == 1) java.lang.Long.valueOf(unkCost)
          else null
        if (stepCost != null && dp(j) + stepCost.longValue() < best) {
          best = dp(j) + stepCost.longValue(); bestJ = j
        }
        j += 1
      }
      dp(i) = best; back(i) = bestJ
      i += 1
    }
    // backtrack: pieces right-to-left, then reverse
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String]()
    var p = n
    while (p > 0) {
      val j = back(p)
      out.add(org.apache.spark.unsafe.types.UTF8String
        .concat(java.util.Arrays.copyOfRange(syms, j, p): _*))
      p = j
    }
    java.util.Collections.reverse(out)
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any): Any = segment(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramViterbi", this, classOf[UnigramViterbiExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = $ref.segment($a);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** GPT-2's public byte-level alphabet (the `bytes_to_unicode` table from
  * the released encoder): every one of the 256 byte values maps to a
  * printable Unicode character — visually-printable bytes (`!`..`~`,
  * `¡`..`¬`, `®`..`ÿ`) map to themselves, the rest to 256+n in
  * increasing byte order (space → `Ġ`, newline → `Ċ`, …). BPE over
  * these symbols can never hit an out-of-vocabulary character: any
  * UTF-8 input decomposes into base alphabet symbols byte by byte —
  * the byte-fallback property the char-level path lacks (punctuation
  * and non-ASCII vanish from `TextAnalysis.tokens`' normalized
  * alphanumerics). All mapped characters sit below U+0400, so their
  * UTF-8 and UTF-16 orderings agree and driver-side string comparisons
  * match Spark/DuckDB binary collation. */
object ByteLevelUtil {
  /** byte value (0–255) → mapped symbol, the GPT-2 table. */
  val ByteToSym: Array[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = new String(Character.toChars(b))
      else { out(b) = new String(Character.toChars(256 + n)); n += 1 }
      b += 1
    }
    out
  }

  private val symUtf8: Array[org.apache.spark.unsafe.types.UTF8String] =
    ByteToSym.map(org.apache.spark.unsafe.types.UTF8String.fromString)

  /** UTF-8 bytes of `s`, each mapped to its alphabet symbol. */
  def syms(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val bytes = s.getBytes
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = symUtf8(bytes(i) & 0xff)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Byte-level BPE symbolization of a (pre)token: the token's UTF-8
  * bytes, each mapped through [[ByteLevelUtil.ByteToSym]] — the round-0
  * word table of a GPT-2-class tokenizer (no `</w>` marker; the space
  * byte rides inside the pretoken as `Ġ`). */
case class ByteLevelSymsExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_level_syms"

  override protected def nullSafeEval(a: Any): Any =
    ByteLevelUtil.syms(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val util = ByteLevelUtil.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $util.syms($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static kernel for [[SrpSignExpr]]: Rademacher (±1) hyperplane sign
  * matrices, cached per (bits, seed, dim) — built once per executor, not
  * per row. */
object SrpUtil {
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Long, Int), Array[Array[Byte]]]()

  private def matrix(bits: Int, seed: Long, dim: Int): Array[Array[Byte]] =
    cache.computeIfAbsent((bits, seed, dim), { _ =>
      val rnd = new java.util.Random(seed)
      Array.fill(bits)(Array.fill(dim)(if (rnd.nextBoolean()) 1.toByte else -1.toByte))
    })

  def sign(v: ArrayData, bits: Int, seed: Long): ArrayData = {
    val dim = v.numElements()
    val m = matrix(bits, seed, dim)
    val words = new Array[Long](bits / 64)
    var i = 0
    while (i < bits) {
      val row = m(i)
      var s = 0.0
      var j = 0
      while (j < dim) {
        val x = if (v.isNullAt(j)) 0.0 else v.getFloat(j).toDouble
        s += (if (row(j) > 0) x else -x)
        j += 1
      }
      if (s > 0) words(i / 64) |= (1L << (i % 64))
      i += 1
    }
    new GenericArrayData(words)
  }
}

/** Sign-random-projection (SRP) bit signature of an embedding — the
  * cosine analogue of SimHash: bit i is the sign of the dot product with
  * a deterministic Rademacher hyperplane. P(bits agree) = 1 − θ/π, so
  * banded signatures give a cosine LSH with AND-amplification inside a
  * band; used by the embedding near-dup join. Output: bits/64 longs. */
case class SrpSignExpr(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits > 0 && bits % 64 == 0, s"bits must be a positive multiple of 64, got $bits")
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_sign"

  override protected def nullSafeEval(a: Any): Any =
    SrpUtil.sign(a.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.SrpUtil.sign($a, $bits, ${seed}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PQ asymmetric-distance computation: `dist = Σ_s table[s·k + code_s]`
  * — m byte-indexed lookups into the per-query ADC table (squared-L2
  * from each query subvector to every subspace centroid). The table is
  * embedded in the expression (one instance per query, a few KB), so the
  * per-row work in the scan is m array reads: the cheapest possible
  * distance kernel over a compressed corpus. */
case class PqAdcExpr(child: Expression, table: Seq[Double], k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && table.nonEmpty && table.length % k == 0,
    s"table length ${table.length} must be a positive multiple of k=$k")
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc"

  @transient private lazy val tableArr: Array[Double] = table.toArray

  override protected def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    var s = 0
    var sum = 0.0
    while (s < codes.length) {
      sum += tableArr(s * k + (codes(s) & 0xFF))
      s += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("pqTable", tableArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.freshName("s")
      val sum = ctx.freshName("sum")
      s"""
         |double $sum = 0.0;
         |for (int $s = 0; $s < $a.length; $s++) {
         |  $sum += $tableRef[$s * $k + ($a[$s] & 0xFF)];
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of array elements contained in a fixed word set — the compiled
  * replacement for `size(filter(tokens, _.isInCollection(words)))`,
  * whose interpreted lambda dominated the language-ID and quality-score
  * operators (5 language filters per row). The set is built once per
  * expression instance, not per row. */
case class TokenSetCountExpr(child: Expression, words: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_set_count"

  @transient private lazy val set: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.size * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  def countIn(arr: ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(a: Any): Any = countIn(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSetCounter", this, classOf[TokenSetCountExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.countIn($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static kernel for [[WinnowExpr]]: winnowing fingerprints (Schleimer,
  * Wilkerson & Aiken, SIGMOD'03 — the MOSS algorithm). Karp-Rabin
  * rolling hashes of character k-grams; from every window of w
  * consecutive hashes keep the minimum (rightmost on ties), dedup
  * preserving order. Guarantees: any substring match of length
  * ≥ w + k − 1 shares at least one fingerprint. */
object WinnowUtil {
  private final val Base = 1000003L

  def fingerprints(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // Karp-Rabin: h(i+1) = (h(i) - s(i)·B^(k-1))·B + s(i+k)
    var pow = 1L
    var j = 1
    while (j < k) { pow *= Base; j += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + s.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    if (nGrams <= w) {
      // degenerate: one window — keep the global min
      var m = hashes(0)
      i = 1
      while (i < nGrams) { if (hashes(i) <= m) m = hashes(i); i += 1 }
      return new GenericArrayData(Array[Any](m))
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var start = 0
    while (start <= nGrams - w) {
      var m = hashes(start)
      var mi = start
      i = start + 1
      while (i < start + w) {
        if (hashes(i) <= m) { m = hashes(i); mi = i } // rightmost min on ties
        i += 1
      }
      out.add(m)
      start += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }
}

/** Static kernel for [[LangIdExpr]]: one fused pass over the normalized
  * text computing every per-language marker-hit count plus the CJK
  * character count, then the first-wins argmax — semantically identical
  * to the declarative cascade in `TextAnalysis.languageId`
  * (greatest over 4× token-set-count + cjk-count, first listed language
  * wins ties, "und" when the max is ≤ 0), which remains the reference
  * implementation the spec bit-compares against. The fusion matters in
  * Filter predicates: FilterExec does no subexpression elimination, so
  * the declarative cascade re-evaluates its split/regexp children about
  * a dozen times per row there — this kernel is one byte scan. */
object LangIdUtil {
  /** Cascade order; index 4 (zh) is scored by CJK chars, not markers. */
  val Langs: Array[org.apache.spark.unsafe.types.UTF8String] =
    Array("en", "es", "de", "fr", "zh")
      .map(org.apache.spark.unsafe.types.UTF8String.fromString)
  private val Und = org.apache.spark.unsafe.types.UTF8String.fromString("und")

  /** Marker words per language index, mirroring
    * `TextAnalysis.LangMarkers` (which the oracle SQL also encodes).
    * All markers are 2–5 ASCII bytes, so a token can only match if it
    * is too; "la" carries two language bits (es and fr). */
  private val MarkerMask: java.util.HashMap[java.lang.Long, java.lang.Integer] = {
    val markers = Seq(
      0 -> Seq("the", "and", "of", "is", "with"),
      1 -> Seq("el", "la", "de", "que", "con"),
      2 -> Seq("der", "die", "und", "ist", "mit"),
      3 -> Seq("le", "la", "et", "est", "avec"))
    val m = new java.util.HashMap[java.lang.Long, java.lang.Integer](64)
    for ((idx, ws) <- markers; w <- ws) {
      val k = java.lang.Long.valueOf(packKey(w))
      val prev = m.get(k)
      m.put(k, java.lang.Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << idx)))
    }
    m
  }

  /** Exact base-128 packing of a ≤5-byte ASCII token, length-prefixed
    * by the leading 1 bit so "aa" and "a" can never collide. */
  private def packKey(w: String): Long =
    w.getBytes("US-ASCII").foldLeft(1L)((k, b) => (k << 7) | b)

  def langId(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val n = s.numBytes()
    val counts = new Array[Long](5)
    var key = 1L
    var tokLen = 0
    var asciiTok = true
    var i = 0
    def flush(): Unit = {
      if (asciiTok && tokLen >= 2 && tokLen <= 5) {
        val mask = MarkerMask.get(java.lang.Long.valueOf(key))
        if (mask != null) {
          val m = mask.intValue()
          var l = 0
          while (l < 4) { if ((m & (1 << l)) != 0) counts(l) += 1; l += 1 }
        }
      }
      key = 1L; tokLen = 0; asciiTok = true
    }
    while (i < n) {
      val b = s.getByte(i)
      if (b == 0x20) { flush(); i += 1 }
      else if (b >= 0) { // ASCII, not a space
        if (tokLen < 5) key = (key << 7) | b else asciiTok = false
        tokLen += 1
        i += 1
      } else { // multi-byte UTF-8 head or continuation
        asciiTok = false
        tokLen += 1
        val ub = b & 0xFF
        if ((ub & 0xE0) == 0xC0) i += 2
        else if ((ub & 0xF0) == 0xE0) {
          if (i + 2 < n) {
            val cp = ((ub & 0x0F) << 12) |
              ((s.getByte(i + 1) & 0x3F) << 6) | (s.getByte(i + 2) & 0x3F)
            if (cp >= 0x4E00 && cp <= 0x9FFF) counts(4) += 1
          }
          i += 3
        } else if ((ub & 0xF8) == 0xF0) i += 4
        else i += 1 // stray continuation byte
      }
    }
    flush()
    var mx = counts(0)
    var l = 1
    while (l < 5) { if (counts(l) > mx) mx = counts(l); l += 1 }
    if (mx <= 0L) return Und
    var win = 0
    while (counts(win) != mx) win += 1
    Langs(win)
  }
}

/** Static kernel for [[QualityScoreExpr]]: one pass over the normalized
  * text computing token count, distinct-token count, and stopword hits,
  * then the exact double arithmetic of the declarative
  * `TextAnalysis.qualityScore` (which stays as the bit-compared
  * reference). Token segmentation mirrors Spark `split(s, " ", -1)`:
  * every boundary yields a token, empty segments included. */
object QualityUtil {
  /** `TextAnalysis.Stopwords`, packed like [[LangIdUtil]]'s markers
    * (all are 1–5 ASCII bytes). */
  private val StopKeys: java.util.HashSet[java.lang.Long] = {
    val s = new java.util.HashSet[java.lang.Long](32)
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with")
      .foreach { w =>
        s.add(java.lang.Long.valueOf(
          w.getBytes("US-ASCII").foldLeft(1L)((k, b) => (k << 7) | b)))
      }
    s
  }

  def score(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val bytes = s.getBytes
    val n = bytes.length
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](64)
    var nTok = 0L; var nDistinct = 0L; var nStop = 0L
    var st = 0
    var key = 1L
    var packable = true // ≤5 bytes, all ASCII — eligible for the stop set
    var i = 0
    def flush(end: Int): Unit = {
      nTok += 1
      if (packable && end - st >= 1 && end - st <= 5 &&
        StopKeys.contains(java.lang.Long.valueOf(key))) nStop += 1
      if (seen.add(org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, st, end - st)))
        nDistinct += 1
      st = end + 1; key = 1L; packable = true
    }
    while (i < n) {
      val b = bytes(i)
      if (b == 0x20) flush(i)
      else if (b >= 0 && i - st < 5) key = (key << 7) | b
      else packable = false
      i += 1
    }
    flush(n)
    // exactly the declarative op order: least(nTok/64, 1)·0.4 +
    // distinct/nTok·0.4 + stop-band·0.2 (nTok ≥ 1 always: split of ""
    // yields one empty token)
    val nTokD = nTok.toDouble
    val lengthScore = math.min(nTokD / 64.0, 1.0)
    val diversity = nDistinct.toDouble / nTokD
    val stop = nStop.toDouble / nTokD
    val stopScore = if (stop >= 0.01 && stop <= 0.6) 1.0 else 0.5
    lengthScore * 0.4 + diversity * 0.4 + stopScore * 0.2
  }
}

/** Fused single-pass quality score over a NORMALIZED text column — same
  * Filter-predicate motivation as [[LangIdExpr]] (quality gates live in
  * filters, where the declarative form re-evaluates its split/regexp
  * children per reference). */
case class QualityScoreExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quality_score"

  override protected def nullSafeEval(a: Any): Any =
    QualityUtil.score(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.QualityUtil.score($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused single-pass language-ID over a NORMALIZED text column (the
  * caller applies `normalizeText` first, exactly as the declarative
  * cascade's `tokens`/`cjkCharCount` children do). */
case class LangIdExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(a: Any): Any =
    LangIdUtil.langId(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.LangIdUtil.langId($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static kernel for [[RepetitionExpr]]: ONE pass over the token array
  * computing all three Gopher-style repetition fractions — duplicate
  * 2-gram fraction, top-2-gram fraction, duplicate 3-gram fraction.
  * Tokens cannot contain spaces (they come from splitting on space), so
  * counting distinct token TUPLES is exactly counting the declarative
  * path's space-joined gram strings — the declarative
  * `TextAnalysis.dupNgramFraction`/`topNgramFraction` stay as the
  * bit-compared reference. All fractions are ratios of exact integers,
  * so fused and declarative doubles are bit-identical. */
object RepetitionUtil {
  def stats(toks: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val n = toks.numElements()
    val total2 = n - 1
    val total3 = n - 2
    var dup2 = 0.0; var top2 = 0.0; var dup3 = 0.0
    if (total2 > 0) {
      val t = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { t(j) = toks.getUTF8String(j); j += 1 }
      val counts2 = new java.util.HashMap[AnyRef, Array[Int]](total2 * 2)
      val seen3 = new java.util.HashSet[AnyRef](if (total3 > 0) total3 * 2 else 1)
      var max2 = 0
      var i = 0
      while (i < total2) {
        val c2 = counts2.computeIfAbsent((t(i), t(i + 1)), _ => new Array[Int](1))
        c2(0) += 1
        if (c2(0) > max2) max2 = c2(0)
        if (i < total3) seen3.add((t(i), t(i + 1), t(i + 2)))
        i += 1
      }
      dup2 = 1.0 - counts2.size.toDouble / total2.toDouble
      top2 = max2.toDouble / total2.toDouble
      if (total3 > 0) dup3 = 1.0 - seen3.size.toDouble / total3.toDouble
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dup2, top2, dup3))
  }
}

/** Fused one-pass repetition signals over a STAGED token-array column
  * (same staging contract as the declarative forms): replaces two
  * interpreted gram-array builds + array_distinct + array_sort + an
  * aggregate HOF per row with a single hash-counting pass. */
case class RepetitionExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StructType(Seq(
    StructField("dup_2gram_frac", DoubleType, nullable = false),
    StructField("top_2gram_frac", DoubleType, nullable = false),
    StructField("dup_3gram_frac", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(a: Any): Any =
    RepetitionUtil.stats(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = (InternalRow) org.apache.spark.sql.graft.RepetitionUtil.stats($a);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing document fingerprints: array<long> of selected k-gram
  * rolling hashes. Narrow per-row compute; near-dup candidates come
  * from a shared-fingerprint join (same bucketed shape as the shingle
  * join). */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && w > 0, s"k and w must be positive, got k=$k w=$w")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(a: Any): Any =
    WinnowUtil.fingerprints(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.WinnowUtil.fingerprints($a, $k, $w);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object VectorExpressions {
  /** Codegen squared-L2 column. */
  def l2Sq(a: Column, b: Column): Column =
    ExpressionUtils.column(
      L2SqExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen dot-product column. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen exact int64 squared-L2 to a fixed centroid literal. */
  def l2SqLongLit(q: Column, cent: Array[Long]): Column =
    ExpressionUtils.column(L2SqLongLitExpr(ExpressionUtils.expression(q), cent))

  /** Codegen 64-bit SimHash of a token-array column. `hashKind` "xx"
    * (fast default) or "md5" (SQL-oracle-recomputable). */
  def simHash(tokens: Column, hashKind: String = "xx"): Column =
    ExpressionUtils.column(SimHashExpr(ExpressionUtils.expression(tokens), hashKind))

  /** Codegen k-element MinHash signature of a shingle-array column. */
  def minHash(shingles: Column, k: Int): Column =
    ExpressionUtils.column(MinHashExpr(ExpressionUtils.expression(shingles), k))

  /** Codegen distinct word n-gram shingles of a token-array column. */
  def shingles(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ShinglesExpr(ExpressionUtils.expression(tokens), n))

  /** Codegen greedy left-to-right phrase merge of a token-array column. */
  def phraseMerge(tokens: Column, phrases: Seq[String]): Column =
    ExpressionUtils.column(PhraseMergeExpr(ExpressionUtils.expression(tokens), phrases))

  /** Codegen rank-priority BPE apply of an external merge list to a
    * symbol-array column (see [[BpeRankMergeExpr]]). */
  def bpeRankMerge(syms: Column, merges: Seq[(String, String)], maxIters: Int): Column =
    ExpressionUtils.column(
      BpeRankMergeExpr(ExpressionUtils.expression(syms), merges, maxIters))

  /** Codegen byte-level BPE symbolization of a (pre)token column. */
  def byteLevelSyms(tok: Column): Column =
    ExpressionUtils.column(ByteLevelSymsExpr(ExpressionUtils.expression(tok)))

  /** Convergence diagnostic for the rank-priority BPE apply (see
    * [[BpeRankConvergedExpr]]). */
  def bpeRankConverged(syms: Column, merges: Seq[(String, String)], maxIters: Int): Column =
    ExpressionUtils.column(
      BpeRankConvergedExpr(ExpressionUtils.expression(syms), merges, maxIters))

  /** Codegen hashed subword->id mapping (see [[VocabIdsExpr]]). */
  def vocabIds(syms: Column, vocab: Seq[(String, Int)]): Column =
    ExpressionUtils.column(VocabIdsExpr(ExpressionUtils.expression(syms), vocab))

  /** Codegen hashed piece->id mapping with SentencePiece byte fallback
    * (see [[ByteFallbackIdsExpr]]). */
  def byteFallbackIds(syms: Column, vocab: Seq[(String, Int)], byteBase: Int): Column =
    ExpressionUtils.column(
      ByteFallbackIdsExpr(ExpressionUtils.expression(syms), vocab, byteBase))

  /** Codegen WordPiece greedy longest-match segmentation (see
    * [[WordPieceExpr]]). */
  def wordPieceGreedy(chars: Column, vocab: Seq[String], unkToken: String,
      contPrefix: String, maxInputChars: Int): Column =
    ExpressionUtils.column(WordPieceExpr(
      ExpressionUtils.expression(chars), vocab, unkToken, contPrefix, maxInputChars))

  /** Codegen WordPiece id decode (see [[WordPieceDecodeExpr]]). */
  def wordPieceDecode(ids: Column, vocab: Seq[(String, Int)],
      contPrefix: String, dropIds: Seq[Int]): Column =
    ExpressionUtils.column(WordPieceDecodeExpr(
      ExpressionUtils.expression(ids), vocab, contPrefix, dropIds))

  /** Codegen unigram byte-fallback id decode (see [[UnigramDecodeExpr]]). */
  def unigramDecode(ids: Column, vocab: Seq[(String, Int)],
      byteBase: Int, bytePieces: Int): Column =
    ExpressionUtils.column(
      UnigramDecodeExpr(ExpressionUtils.expression(ids), vocab, byteBase, bytePieces))

  /** Codegen Bloom membership probe (see [[BloomProbeExpr]]). */
  def bloomProbe(s: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    ExpressionUtils.column(BloomProbeExpr(ExpressionUtils.expression(s), bloom))

  /** Codegen token-id -> raw-text decode (see [[ByteLevelDecodeExpr]]). */
  def byteLevelDecode(ids: Column, vocab: Seq[(String, Int)]): Column =
    ExpressionUtils.column(ByteLevelDecodeExpr(ExpressionUtils.expression(ids), vocab))

  /** Codegen unigram-LM Viterbi segmentation (see [[UnigramViterbiExpr]]). */
  def unigramViterbi(syms: Column, pieces: Seq[(String, Long)],
      maxPieceLen: Int, unkCost: Long): Column =
    ExpressionUtils.column(
      UnigramViterbiExpr(ExpressionUtils.expression(syms), pieces, maxPieceLen, unkCost))

  /** Codegen SRP bit signature (bits/64 longs) of an embedding column. */
  def srpSign(emb: Column, bits: Int, seed: Long = 42L): Column =
    ExpressionUtils.column(SrpSignExpr(ExpressionUtils.expression(emb), bits, seed))

  /** Codegen count of tokens contained in a fixed word set. */
  def tokenSetCount(tokens: Column, words: Seq[String]): Column =
    ExpressionUtils.column(TokenSetCountExpr(ExpressionUtils.expression(tokens), words))

  /** Codegen winnowing fingerprints (k-gram size, window size). */
  def winnow(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowExpr(ExpressionUtils.expression(text), k, w))

  /** Fused one-pass language-ID of a NORMALIZED text column. */
  def langId(normText: Column): Column =
    ExpressionUtils.column(LangIdExpr(ExpressionUtils.expression(normText)))

  /** Fused one-pass quality score of a NORMALIZED text column. */
  def qualityScore(normText: Column): Column =
    ExpressionUtils.column(QualityScoreExpr(ExpressionUtils.expression(normText)))

  /** Fused one-pass repetition fractions of a STAGED token-array column. */
  def repetition(toks: Column): Column =
    ExpressionUtils.column(RepetitionExpr(ExpressionUtils.expression(toks)))

  /** Codegen PQ asymmetric distance over a codes column (see [[PqAdcExpr]]). */
  def pqAdc(codes: Column, table: Array[Double], k: Int): Column =
    ExpressionUtils.column(PqAdcExpr(ExpressionUtils.expression(codes), table.toSeq, k))
}
