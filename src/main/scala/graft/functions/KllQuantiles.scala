package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile sketch aggregate — `kll_quantiles(x, q1, q2, …)`
  * returns `array<double>` of estimated quantiles from a KLL sketch
  * (Karnin-Lang-Liberty; DataSketches impl, default k=200 ⇒ ~1.65%
  * normalized rank error).
  *
  * This is the percentile path that SURVIVES unbounded groups: exact
  * percentile buffers every value per group (the VERDICT r1
  * scale-killer that `Percentiles.exact` solved with a sort), and
  * `approx_percentile` is Spark-internal state you can't persist. A
  * KLL sketch is O(k·log n) memory, MERGEABLE (partial aggregation
  * works — the shuffle carries sketches, not values), and its bytes
  * round-trip through `serialize`/`deserialize`, so the same sketch
  * can be stored in a TableStore and folded incrementally like the
  * HLL distinct sketches (IncrementalAgg).
  *
  * TypedImperativeAggregate keeps the live sketch as a JVM object in
  * the ObjectHashAggregate buffer and pays serialization only at the
  * shuffle boundary — the idiomatic Catalyst shape for sketch
  * aggregates (same as Spark's own approx_percentile / hll_sketch_agg).
  */
/** Shared KLL buffer mechanics for the two aggregate forms. */
trait KllAggBase extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {
  def child: Expression

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double column, got ${other.catalogString}")
  }

  override def nullable: Boolean = true

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance()

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

case class KllQuantilesAgg(
    child: Expression,
    quantiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "kll_quantiles"

  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(quantiles.map(q =>
      buffer.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)).toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
}

/** `kll_sketch(x)` — the same aggregation, but the RESULT is the
  * serialized sketch itself (binary). This is what makes percentile
  * state a first-class table column: store it, union it later with
  * `kll_merge`, read it with `kll_quantile` — the KLL leg of the
  * sketch-cube pattern (HLL's `hll_sketch_agg`/`hll_union` analog,
  * which Spark does not ship for quantiles). */
case class KllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch"

  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null else buffer.toByteArray

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

object KllScalar {
  /** Static workers shared by interpreted eval and generated code. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val s = KllDoublesSketch.heapify(Memory.wrap(a))
    s.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    s.toByteArray
  }
  def quantile(bytes: Array[Byte], q: Double): Double =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
      .getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
}

/** `kll_merge(sketch, sketch)` — scalar union of two serialized
  * sketches. Runs over state tables (one row per key), never over raw
  * data, so interpreted-vs-codegen cost is irrelevant; what matters is
  * that it is a pure Column function usable as an IncrementalAgg
  * merge rule. */
case class KllMergeExpr(
    left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_merge requires (binary, binary), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"

  override def nullSafeEval(a: Any, b: Any): Any =
    KllScalar.merge(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.KllScalar.merge($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllMergeExpr =
    copy(left = newLeft, right = newRight)
}

/** `kll_quantile(sketch, q)` — scalar quantile read from a serialized
  * sketch column. */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary, double), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(a: Any, b: Any): Any =
    KllScalar.quantile(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.KllScalar.quantile($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}
