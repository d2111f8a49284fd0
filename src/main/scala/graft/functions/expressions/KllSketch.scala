package graft.functions.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketches as native Catalyst aggregates — the MERGEABLE
  * percentile state that completes the incremental-maintenance story:
  * `IncrementalRollup` carries exact additive measures (its docs call out
  * that exact medians need the raw distribution), `Sketches` carries HLL
  * distinct state, and this adds bounded-error QUANTILE state
  * (Karnin-Lang-Liberty, the Datasketches KLL implementation already on
  * Spark's classpath — Spark ships HLL aggregates but no KLL surface).
  *
  * Same shape as Spark's own datasketches aggregates: a
  * `TypedImperativeAggregate` whose buffer IS the sketch (partial
  * aggregation and shuffle-side merge come from the aggregate framework —
  * map-side combine of sketches, not rows), evaluating to the sketch's
  * serialized bytes so the state can live in a warehouse COLUMN and merge
  * across ingest batches at read time.
  *
  * Error contract: rank error ≤ ~1.65% at the default k=200 (single
  * sketch); merging never degrades the bound's ORDER (KLL is fully
  * mergeable). Below k retained values the sketch is exact.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

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

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = KllFns.SketchFnName
}

/** Union of serialized KLL sketches (the read-time fold over per-batch
  * sketch rows stored in a warehouse column).
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
  override def prettyName: String = KllFns.MergeFnName
}

/** Quantile extraction from serialized sketch bytes. Post-aggregate scalar
  * over already-reduced rows (one per group), so CodegenFallback costs
  * nothing measurable — it never sits in a per-row hot path.
  */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  // an all-null group aggregates to an EMPTY sketch; degrade to null like
  // Spark's approx aggregates instead of datasketches throwing on getQuantile
  override def nullable: Boolean = true

  override def nullSafeEval(sketchBytes: Any, prob: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(prob.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = KllFns.QuantileFnName
}

object KllFns {
  val SketchFnName = "kll_sketch_agg"
  val MergeFnName = "kll_merge_agg"
  val QuantileFnName = "kll_quantile"
  val DefaultK = 200

  private def lit(e: Any) = org.apache.spark.sql.functions.lit(e)

  /** Session registration (see CosineFns.register for the once-per-session
    * rationale); GraftExtensions injects the same builders cluster-wide.
    */
  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    put(SketchFnName, exprs => KllSketchAgg(exprs.head, DefaultK))
    put(MergeFnName, exprs => KllMergeAgg(exprs.head, DefaultK))
    put(QuantileFnName, exprs => KllQuantile(exprs(0), exprs(1)))
  }

  val sketchBuilder: Seq[Expression] => Expression =
    exprs => KllSketchAgg(exprs.head, DefaultK)
  val mergeBuilder: Seq[Expression] => Expression =
    exprs => KllMergeAgg(exprs.head, DefaultK)
  val quantileBuilder: Seq[Expression] => Expression =
    exprs => KllQuantile(exprs(0), exprs(1))

  /** Column-API entry points; require `register(spark)` once per session. */
  def kllSketch(values: Column): Column = call_function(SketchFnName, values)
  def kllMerge(sketches: Column): Column = call_function(MergeFnName, sketches)
  def kllQuantile(sketch: Column, prob: Double): Column =
    call_function(QuantileFnName, sketch, lit(prob))
}
