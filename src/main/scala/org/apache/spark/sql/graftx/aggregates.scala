/*
 * graft's custom distributed aggregates. Same package rationale as
 * expressions.scala: TypedImperativeAggregate and the Column <->
 * Expression bridge are private[sql] in Spark 4.
 */
package org.apache.spark.sql.graftx

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregate (Karnin–Lang–Liberty 2016): mergeable
  * streaming quantiles with ~1.65% normalized rank error at k=200,
  * O(k · log(n/k)) space. This is the 100 TB path for per-group
  * quantiles: `percentile` (exact, f06) buffers every value of a group
  * on one task, while this sketch is a few KB per group regardless of
  * n, with partial aggregation (map-side combine) for free because
  * TypedImperativeAggregate serializes/merges buffers across stages.
  *
  * Returns array<double> of the requested quantiles (INCLUSIVE search
  * criteria), null for an empty group.
  */
case class KllQuantiles(child: Expression, k: Int, probs: Array[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(k >= 8 && probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

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
    else new GenericArrayData(buffer.getQuantiles(probs, QuantileSearchCriteria.INCLUSIVE))

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
