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
case class KllQuantilesAgg(
    child: Expression,
    quantiles: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_quantiles requires a double column, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

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

  override def eval(buffer: KllDoublesSketch): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(quantiles.map(q =>
      buffer.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)).toArray)

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantilesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesAgg =
    copy(child = newChild)
}
