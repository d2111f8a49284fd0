package graft.functions.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketches as native Catalyst aggregates —
  * the third leg of the mergeable-state family (HLL = distinct, KLL =
  * quantiles, this = top items): Misra-Gries-style ItemsSketch whose
  * (ε-bounded) counts survive merging, so "top event types / hot keys over
  * N ingest batches" folds from per-batch sketch rows without rescanning
  * any batch — the BATCH dual of `EventStream.heavyHitters`' streaming
  * state.
  *
  * Error contract (Datasketches frequencies): with maxMapSize m, every
  * reported estimate err ≤ n/ (m/2) of the TRUE count... below ~0.75·m
  * distinct items nothing evicts and counts are EXACT (specs assert
  * equality there; above it, the lower/upper bounds bracket the truth).
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

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

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
  override def prettyName: String = FreqFns.SketchFnName
}

/** Union of serialized frequent-items sketches (read-time fold over
  * per-batch sketch rows in a warehouse column).
  */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe()))
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(new ArrayOfStringsSerDe())

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe())
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe())

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
  override def prettyName: String = FreqFns.MergeFnName
}

/** Top-k extraction from serialized sketch bytes: array of (item, estimate,
  * lower, upper) ordered by estimate desc then item asc (deterministic
  * under ties). NO_FALSE_NEGATIVES: every true heavy hitter appears.
  * Post-aggregate scalar — CodegenFallback is off the hot path.
  */
case class FreqTopItems(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("estimate", LongType),
    StructField("lower", LongType), StructField("upper", LongType))))

  override def nullSafeEval(sketchBytes: Any, k: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(sketchBytes.asInstanceOf[Array[Byte]]), new ArrayOfStringsSerDe())
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k.asInstanceOf[Int])
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
    new GenericArrayData(rows.asInstanceOf[Array[Any]]): ArrayData
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FreqTopItems =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = FreqFns.TopFnName
}

object FreqFns {
  val SketchFnName = "freq_sketch_agg"
  val MergeFnName = "freq_merge_agg"
  val TopFnName = "freq_top_items"
  val DefaultMapSize = 128 // power of 2; exact below ~0.75x this many distincts

  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    put(SketchFnName, sketchBuilder)
    put(MergeFnName, mergeBuilder)
    put(TopFnName, topBuilder)
  }

  val sketchBuilder: Seq[Expression] => Expression =
    exprs => FreqSketchAgg(exprs.head, DefaultMapSize)
  val mergeBuilder: Seq[Expression] => Expression =
    exprs => FreqMergeAgg(exprs.head, DefaultMapSize)
  val topBuilder: Seq[Expression] => Expression =
    exprs => FreqTopItems(exprs(0), exprs(1))

  /** Column-API entry points; require `register(spark)` once per session. */
  def freqSketch(items: Column): Column = call_function(SketchFnName, items)
  def freqMerge(sketches: Column): Column = call_function(MergeFnName, sketches)
  def freqTopItems(sketch: Column, k: Int): Column =
    call_function(TopFnName, sketch, org.apache.spark.sql.functions.lit(k))
}
