package org.apache.spark.sql.graft

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StructType}

/** Bounded top-k rows per group as a [[TypedImperativeAggregate]]: the
  * buffer is a k-bounded binary heap of struct rows ordered by the first
  * `numKeys` struct fields (the window's sort keys), so partial
  * aggregation keeps at most k rows per group PER MAP PARTITION before
  * the shuffle — the bounded form of the window-rank top-k pattern
  * (SURVEY §7.4). `eval` returns the rows sorted ascending, so a
  * positional explode reproduces `row_number()`.
  */
case class RowTopKAgg(
    child: Expression,
    k: Int,
    numKeys: Int,
    ascending: Seq[Boolean],
    nullsFirst: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RowTopKAgg.Buffer] with UnaryLike[Expression] {

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "row_topk"

  private lazy val rowOrdering: Ordering[InternalRow] = {
    val fieldTypes = structType.fields.map(_.dataType)
    val fieldOrds = (0 until numKeys).map(i => TypeUtils.getInterpretedOrdering(fieldTypes(i)))
    new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < numKeys) {
          val an = a.isNullAt(i)
          val bn = b.isNullAt(i)
          val c =
            if (an && bn) 0
            else if (an) { if (nullsFirst(i)) -1 else 1 }
            else if (bn) { if (nullsFirst(i)) 1 else -1 }
            else fieldOrds(i).compare(a.get(i, fieldTypes(i)), b.get(i, fieldTypes(i)))
          val signed = if (ascending(i)) c else -c
          if (signed != 0) return signed
          i += 1
        }
        0
      }
    }
  }

  private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): RowTopKAgg.Buffer =
    new RowTopKAgg.Buffer(k, rowOrdering)

  override def update(buffer: RowTopKAgg.Buffer, input: InternalRow): RowTopKAgg.Buffer = {
    val row = child.eval(input).asInstanceOf[InternalRow]
    // materialize through an UnsafeRow copy: eval output may reuse buffers
    buffer.add(toUnsafe(row).copy())
    buffer
  }

  override def merge(a: RowTopKAgg.Buffer, b: RowTopKAgg.Buffer): RowTopKAgg.Buffer = {
    b.heap.foreach(a.add)
    a
  }

  override def eval(buffer: RowTopKAgg.Buffer): Any =
    new GenericArrayData(buffer.sortedRows.toArray[Any])

  override def serialize(buffer: RowTopKAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.heap.size)
    buffer.heap.foreach { r =>
      val bytes = r.asInstanceOf[UnsafeRow].getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RowTopKAgg.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.add(row)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): RowTopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): RowTopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): RowTopKAgg =
    copy(child = newChild)
}

object RowTopKAgg {
  /** k-bounded worst-on-top heap of owned struct rows. */
  final class Buffer(k: Int, ord: Ordering[InternalRow]) {
    val heap: mutable.PriorityQueue[InternalRow] = mutable.PriorityQueue.empty(ord)
    def add(r: InternalRow): Unit = {
      if (heap.size < k) heap.enqueue(r)
      else if (ord.lt(r, heap.head)) { heap.dequeue(); heap.enqueue(r) }
    }
    def sortedRows: Seq[InternalRow] = heap.toSeq.sorted(ord)
  }
}

/** Optimizer rule rewriting the window-rank top-k pattern
  *
  * {{{ Filter(rn <= k, [Project(attrs)], Window(rn = row_number() over
  *     (partition by P order by O), child)) }}}
  *
  * into the bounded-aggregate form
  *
  * {{{ Project(cols, rank = pos+1,
  *       Generate(posexplode(topk),
  *         Aggregate(P, row_topk(struct(O ++ child.output), k), child))) }}}
  *
  * — per-group state is k rows instead of a sort of every candidate, and
  * partial aggregation bounds EACH MAP PARTITION's shuffle contribution
  * at k rows per group (the [[graft.ops.TopKAggregator]] shape, applied
  * automatically). Kept behind `spark.graft.rewriteTopK` so plans only
  * change when asked; output attribute ids are preserved so the rewrite
  * is transparent to parent operators.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  final val ConfKey = "spark.graft.rewriteTopK"
  /** rewrite only when the per-group state stays trivially memory-safe */
  final val MaxK = 10000

  /** Adds the rule to an existing session's extra optimizations (idempotent). */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
    spark.conf.set(ConfKey, "true")
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(ConfKey, "false") != "true") return plan
    plan.transformUp {
      case f @ Filter(cond, child) => rewrite(f, cond, child).getOrElse(f)
    }
  }

  private def rewrite(f: Filter, cond: Expression, below: LogicalPlan): Option[LogicalPlan] = {
    // unwrap an attribute-only Project (the .withColumn shape)
    val wnd = below match {
      case w: Window => w
      case Project(pl, w: Window) if pl.forall(_.isInstanceOf[AttributeReference]) => w
      case _ => return None
    }

    val (rankAttr, k) = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType)) => (a, v)
      case LessThan(a: AttributeReference, Literal(v: Int, IntegerType)) => (a, v - 1)
      case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference) => (a, v)
      case _ => return None
    }
    if (k < 1 || k > MaxK) return None

    val (ps, os) = wnd.windowExpressions match {
      case Seq(al @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(ps, os, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
          if al.exprId == rankAttr.exprId && os.nonEmpty => (ps, os)
      case _ => return None
    }
    // grouping must be plain attributes to pass through the Aggregate
    val psAttrs = ps.map {
      case a: AttributeReference => a
      case _ => return None
    }

    // InferWindowGroupLimit (which runs earlier) inserts a rank-limit
    // node under the window; the aggregate replaces it entirely — keep
    // it and its required sort/exchange would survive for nothing
    val source = wnd.child match {
      case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
          if wgl.partitionSpec == ps && wgl.orderSpec == os => wgl.child
      case other => other
    }

    val payload = source.output
    val structExpr = CreateStruct(os.map(_.child) ++ payload)
    val aggFn = RowTopKAgg(structExpr, k, os.length,
      os.map(_.direction == Ascending), os.map(_.nullOrdering == NullsFirst))
    val aggAlias = Alias(aggFn.toAggregateExpression(), "_graft_topk")()
    val agg = Aggregate(psAttrs, psAttrs :+ aggAlias, source)

    val structType = structExpr.dataType.asInstanceOf[StructType]
    val pos = AttributeReference("_graft_pos", IntegerType, nullable = false)()
    val elem = AttributeReference("_graft_row", structType, nullable = false)()
    val gen = Generate(PosExplode(aggAlias.toAttribute), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(pos, elem), agg)

    val psIds = psAttrs.map(_.exprId).toSet
    val structBase = os.length
    val byId = payload.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
    val projList = f.output.map { a =>
      if (a.exprId == rankAttr.exprId) Alias(Add(pos, Literal(1)), a.name)(exprId = a.exprId)
      else if (psIds.contains(a.exprId)) a
      else byId.get(a.exprId) match {
        case Some(i) => Alias(GetStructField(elem, structBase + i, Some(a.name)), a.name)(exprId = a.exprId)
        case None => return None // an output we cannot reconstruct — bail out
      }
    }
    Some(Project(projList, gen))
  }
}
