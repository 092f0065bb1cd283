package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

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

  /** Java source for the per-element contribution, in terms of `d1`/`d2`. */
  protected def combineJava: String

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
      val nullCheck =
        if (leftHasNulls || rightHasNulls)
          s"""if ($a.isNullAt(i) || $b.isNullAt(i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |final int n = $a.numElements();
         |if (n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double s = 0.0;
         |  for (int i = 0; i < n; i++) {
         |    $nullCheck
         |    final double d1 = (double) $a.getFloat(i);
         |    final double d2 = (double) $b.getFloat(i);
         |    s += $combineJava;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = s; }
         |}
       """.stripMargin
    })
  }
}

/** Squared L2 distance: Σ (aᵢ−bᵢ)², float64, left-to-right. */
case class L2SqExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def combine(x: Double, y: Double): Double = { val d = x - y; d * d }
  override protected def combineJava: String = "(d1 - d2) * (d1 - d2)"
  override def prettyName: String = "l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product: Σ aᵢ·bᵢ, float64, left-to-right. */
case class DotExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def combine(x: Double, y: Double): Double = x * y
  override protected def combineJava: String = "d1 * d2"
  override def prettyName: String = "dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
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
}
