/*
 * graft's custom distributed aggregates. Same package rationale as
 * expressions.scala: TypedImperativeAggregate and the Column <->
 * Expression bridge are private[sql] in Spark 4.
 */
package org.apache.spark.sql.graftx

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * criteria), null for an empty group. (Spark 4.1's builtin
  * kll_sketch_agg_double + kll_sketch_get_quantile_double chain is
  * equivalent per value — ThetaSpec asserts agreement; this variant
  * extracts the whole quantile ARRAY in the aggregation itself.)
  */
case class KllQuantiles(child: Expression, k: Int, probs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  // Seq, not Array: expression equality/canonicalization is structural
  // on case-class fields, and an Array field compares by reference —
  // two identical kll_quantiles calls would never dedup as common
  // subexpressions. Materialized to an array once for eval.
  require(k >= 8 && probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
    s"kll_quantiles: need k >= 8 (got $k) and probs in [0,1] (got $probs)")
  @transient private lazy val probsArr: Array[Double] = probs.toArray

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
    else new GenericArrayData(buffer.getQuantiles(probsArr, QuantileSearchCriteria.INCLUSIVE))

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Mutable theta-sketch aggregation buffer: raw values stream into an
  * UpdateSketch; merged partials stream into a Union. Folding the two
  * lazily keeps the common single-phase update path allocation-light.
  */
final class ThetaBuf(var upd: UpdateSketch, var uni: Union) {
  /** Fold everything into one compact sketch. IDEMPOTENT: `upd` is
    * folded INTO `uni` (never just nulled), so repeated serialize/eval
    * on the same buffer returns the same sketch — Spark's current call
    * sequences never re-read a buffer after serialize, but a
    * destructive fold here would silently empty the sketch if one
    * ever did (ThetaSpec pins the double-serialize case).
    */
  def compact(lgK: Int): CompactSketch = {
    if (upd != null) {
      if (uni == null)
        uni = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      uni.union(upd.compact())
      upd = null
    }
    if (uni == null) UpdateSketch.builder().build().compact()
    else uni.getResult
  }
}

/** Theta sketch distinct aggregate (Dasgupta/Rhodes/et al., the
  * DataSketches theta family): like HLL it estimates distinct counts
  * in O(2^lgK) space with mergeable partials — but unlike HLL the
  * sketch supports SET ALGEBRA (intersection / A-not-B via
  * `theta_intersect_estimate`), which HLL fundamentally cannot.
  * Overlap-of-populations questions ("customers in segment A ∩ B")
  * at 100 TB are exactly this sketch.
  *
  * Spark 4.1 ships builtin theta functions (theta_sketch_agg /
  * theta_union / theta_intersection); graft's variants emit the SAME
  * DataSketches compact wire format (interop asserted in ThetaSpec),
  * add the exact-below-2^lgK sizing knob the q36/q37 oracles exploit,
  * and return the intersection/difference ESTIMATE in one call.
  *
  * Below 2^lgK distinct values the sketch retains every hash — the
  * estimate is EXACT (what the q36 oracle exploits); above, relative
  * standard error is ~1/sqrt(2^lgK) (~0.8% at lgK=14).
  * Returns the serialized compact sketch (BINARY).
  */
case class ThetaSketchAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaBuf]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(lgK >= 4 && lgK <= 26)

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch"

  override def createAggregationBuffer(): ThetaBuf = new ThetaBuf(null, null)

  override def update(buffer: ThetaBuf, input: InternalRow): ThetaBuf = {
    val v = child.eval(input)
    if (v != null) {
      if (buffer.upd == null)
        buffer.upd = UpdateSketch.builder().setLogNominalEntries(lgK).build()
      buffer.upd.update(v.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: ThetaBuf, other: ThetaBuf): ThetaBuf = {
    if (buffer.uni == null)
      buffer.uni = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    buffer.uni.union(other.compact(lgK))
    buffer
  }

  override def eval(buffer: ThetaBuf): Any = buffer.compact(lgK).toByteArray

  override def serialize(buffer: ThetaBuf): Array[Byte] = buffer.compact(lgK).toByteArray

  override def deserialize(bytes: Array[Byte]): ThetaBuf = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    new ThetaBuf(null, u)
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Union aggregate over SERIALIZED theta sketches (BINARY column) —
  * the re-aggregation half of the sketch pattern: sketch the raw data
  * once per fine-grained group, then roll totals up along any
  * dimension by unioning the stored sketches, never rescanning the
  * facts. This is how a 100 TB distinct-count cube stays one fact
  * scan + arbitrarily many cheap rollups.
  */
case class ThetaUnionAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ThetaBuf]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(lgK >= 4 && lgK <= 26)

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): ThetaBuf = new ThetaBuf(null, null)

  override def update(buffer: ThetaBuf, input: InternalRow): ThetaBuf = {
    val v = child.eval(input)
    if (v != null) {
      if (buffer.uni == null)
        buffer.uni = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      buffer.uni.union(Sketches.wrapCompactSketch(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buffer
  }

  override def merge(buffer: ThetaBuf, other: ThetaBuf): ThetaBuf = {
    if (buffer.uni == null)
      buffer.uni = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    buffer.uni.union(other.compact(lgK))
    buffer
  }

  override def eval(buffer: ThetaBuf): Any = buffer.compact(lgK).toByteArray

  override def serialize(buffer: ThetaBuf): Array[Byte] = buffer.compact(lgK).toByteArray

  override def deserialize(bytes: Array[Byte]): ThetaBuf = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    new ThetaBuf(null, u)
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct-count estimate of a serialized theta sketch. Interpreted
  * eval is fine: runs once per aggregated row, not per event.
  */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override protected def nullSafeEval(b: Any): Any =
    Sketches.wrapCompactSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct-count estimate of the INTERSECTION of two serialized theta
  * sketches — the set operation HLL cannot express.
  */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(Sketches.wrapCompactSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    i.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Count + sum-vector + Gram-matrix accumulator over a float-vector
  * column, in one pass with map-side combine: buffer is the flat
  * double array [n, sum(d), gram(d·d lower triangle incl. diagonal)].
  * From the final row, mean = sum/n and covariance =
  * gram/n − mean·meanᵀ — everything PCA / covariance analysis needs
  * from a 100 TB table in a single O(d²)-state aggregate (d=32 →
  * 17 KB of state total, vs shuffling any per-row data at all).
  */
case class VecStatsAgg(child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(d >= 1 && d <= 4096)
  private val gramLen = d * (d + 1) / 2

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_stats"

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](1 + d + gramLen)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      // fail fast on malformed vectors: silently skipping a wrong
      // dimension (or reading a null element as 0.0) would skew the
      // mean/covariance with no signal to the caller
      if (a.numElements() != d)
        throw new IllegalArgumentException(
          s"vec_stats: expected dimension $d, got ${a.numElements()}")
      var i = 0
      while (i < d) {
        if (a.isNullAt(i))
          throw new IllegalArgumentException(
            s"vec_stats: null element at index $i (dim $d vector)")
        i += 1
      }
      buffer(0) += 1.0
      i = 0
      var g = 1 + d
      while (i < d) {
        val x = a.getFloat(i).toDouble
        buffer(1 + i) += x
        var j = 0
        while (j <= i) { buffer(g) += x * a.getFloat(j); g += 1; j += 1 }
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asDoubleBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VecStatsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecStatsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Project a float vector onto k constant planes with per-plane offsets:
  * out[j] = dot(v, planes[j]) − offsets[j]. With planes = principal
  * components and offsets[j] = dot(mean, planes[j]) this IS centered
  * PCA projection — the mean subtraction folds into one constant per
  * component, so the hot loop is a pure dot product (codegen'd, same
  * shape as SrpCode).
  */
case class ProjectPlanes(child: Expression, planes: Seq[Seq[Double]],
                         offsets: Seq[Double])
    extends UnaryExpression with ImplicitCastInputTypes {
  // Seq fields for structural expression equality (see KllQuantiles);
  // flattened to arrays once for the eval/codegen hot loop.
  require(planes.length == offsets.length,
    s"project_planes: ${planes.length} planes vs ${offsets.length} offsets")
  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val offsetsArr: Array[Double] = offsets.toArray
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "project_planes"

  override protected def nullSafeEval(e: Any): Any = {
    val a = e.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val out = new Array[Double](planesArr.length)
    var p = 0
    while (p < planesArr.length) {
      val w = planesArr(p)
      var dot = 0.0
      var i = 0
      val n = math.min(a.numElements(), w.length)
      while (i < n) { dot += a.getFloat(i) * w(i); i += 1 }
      out(p) = dot - offsetsArr(p)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode = {
    val ws = ctx.addReferenceObj("projPlanes", planesArr, "double[][]")
    val os = ctx.addReferenceObj("projOffsets", offsetsArr, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val w = ctx.freshName("w")
      s"""
         |double[] $out = new double[$ws.length];
         |for (int $p = 0; $p < $ws.length; $p++) {
         |  double[] $w = $ws[$p];
         |  double $dot = 0.0;
         |  int $n = Math.min($a.numElements(), $w.length);
         |  for (int $i = 0; $i < $n; $i++) $dot += $a.getFloat($i) * $w[$i];
         |  $out[$p] = $dot - $os[$p];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct-count estimate of A \ B over two serialized theta sketches. */
case class ThetaANotBEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_a_not_b_estimate"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Sketches.wrapCompactSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    op.notB(Sketches.wrapCompactSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    op.getResult(true).getEstimate
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Frequent-items ("heavy hitters") aggregate over a string column —
  * the Misra–Gries/SpaceSaving family as shipped in DataSketches
  * (ItemsSketch): O(maxMapSize) state per group, mergeable partials
  * (map-side combine for free), one pass. This is the 100 TB top-k
  * architecture: exact per-token GROUP BY of a web corpus shuffles
  * the full vocabulary; the sketch tree-reduces a few MB per group
  * instead, with deterministic error ≤ n/maxMapSize on every count.
  *
  * EXACT REGIME: while the number of distinct items a buffer sees
  * stays under the sketch's purge threshold (~0.75 · maxMapSize), no
  * counter is ever evicted and every estimate is the exact count —
  * merges included. Sizing maxMapSize above the corpus vocabulary
  * (the t15 oracle does) therefore yields exact results; at larger
  * scale the same query degrades gracefully to ±n/maxMapSize bounds.
  *
  * Returns the top `k` rows as array<struct<item,est>> ordered by
  * (est DESC, item ASC) — a total order, so output is deterministic
  * whenever estimates are (in particular in the exact regime).
  */
case class FreqItemsAgg(child: Expression, maxMapSize: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  require((maxMapSize & (maxMapSize - 1)) == 0 && maxMapSize >= 8,
    s"freq_items: maxMapSize must be a power of two >= 8, got $maxMapSize")
  require(k >= 1, s"freq_items: k must be >= 1, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "freq_items"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any = {
    val rows = buffer.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
    val top = rows.sortBy(r => (-r.getEstimate, r.getItem)).take(k)
    new GenericArrayData(top.map(r => InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(r.getItem),
      r.getEstimate)))
  }

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Bounded per-group top-k selection aggregate: keeps the k SMALLEST
  * (ord, id) pairs — multiset semantics, duplicates retained — in a
  * size-capped heap that partial aggregation combines map-side. This
  * is the scale-safe replacement for `row_number() <= k` ranked
  * windows (perGroupCap/d20): the window sorts an entire group inside
  * one task — a hot domain at corpus scale is a single-task sort —
  * while this buffer never exceeds k pairs per (task, group) and
  * merges in O(k log k). Returns array<struct<ord,id>> sorted
  * ascending, i.e. position p (1-based) IS the rank the window form
  * would have assigned.
  */
case class TopKPairsAgg(ord: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Long, Long)]]
  with ImplicitCastInputTypes {
  require(k >= 1, s"top_k_pairs: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_pairs"

  // max-heap on (ord, id): the root is the WORST retained pair, so a
  // better candidate replaces it in O(log k).
  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Long, Long)] =
    scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.Tuple2[Long, Long])

  private def push(buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
                   p: (Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(p)
    else if (Ordering.Tuple2[Long, Long].lt(p, buf.head)) {
      buf.dequeue(); buf.enqueue(p)
    }
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) push(buf, (o.asInstanceOf[Long], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: scala.collection.mutable.PriorityQueue[(Long, Long)],
                     other: scala.collection.mutable.PriorityQueue[(Long, Long)]): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.clone().dequeueAll.reverse // ascending (ord, id)
    new GenericArrayData(sorted.map(p => InternalRow(p._1, p._2)).toArray[Any])
  }

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (o, i) => bb.putLong(o); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Long, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getLong, bb.getLong)); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(ord = cs(0), id = cs(1))
}

/** CPC distinct-count sketch aggregate (Lang 2017, the DataSketches
  * "compressed probabilistic counting" family): ~40% better
  * accuracy-per-stored-byte than HLL at the same nominal size, at the
  * cost of NO set algebra (use [[ThetaSketchAgg]] when intersections
  * / A-not-B matter). The driving use case at corpus scale is
  * ARCHIVAL counting: per-source / per-batch distinct-token or
  * distinct-URL cardinality profiles persisted for every crawl batch
  * — thousands of stored sketches per day where bytes-at-rest
  * dominate and only unions are ever needed. Returns the serialized
  * compact sketch (BINARY); read with [[CpcEstimate]]. Mergeable:
  * partials combine through CpcUnion exactly like any
  * TypedImperativeAggregate.
  */
case class CpcSketchAgg(child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.cpc.CpcSketch]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(lgK >= 4 && lgK <= 26, s"cpc_sketch: lgK in [4, 26], got $lgK")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cpc_sketch"

  override def createAggregationBuffer(): org.apache.datasketches.cpc.CpcSketch =
    new org.apache.datasketches.cpc.CpcSketch(lgK)

  override def update(buffer: org.apache.datasketches.cpc.CpcSketch,
                      input: InternalRow): org.apache.datasketches.cpc.CpcSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: org.apache.datasketches.cpc.CpcSketch,
                     other: org.apache.datasketches.cpc.CpcSketch): org.apache.datasketches.cpc.CpcSketch = {
    val u = new org.apache.datasketches.cpc.CpcUnion(lgK)
    u.update(buffer)
    u.update(other)
    u.getResult
  }

  override def eval(buffer: org.apache.datasketches.cpc.CpcSketch): Any =
    buffer.toByteArray

  override def serialize(buffer: org.apache.datasketches.cpc.CpcSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): org.apache.datasketches.cpc.CpcSketch =
    org.apache.datasketches.cpc.CpcSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): CpcSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CpcSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
