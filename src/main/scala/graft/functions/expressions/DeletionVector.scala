package graft.functions.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.roaringbitmap.longlong.Roaring64NavigableMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DELETION VECTORS — roaring bitmaps of deleted row ordinals, the Iceberg
  * v3 / Delta DV representation of positional deletes. One bitmap per data
  * file replaces the (file, ordinal) pair rows: the read-side test for "is
  * this row deleted?" becomes a per-row bitmap probe INSIDE the scan's
  * codegen span instead of an anti-join against pair files, and
  * merge-on-write (new DV = old DV ∪ new positions) keeps per-file delete
  * state O(1) entries no matter how many delete commits touch the file.
  *
  * Serialization is Roaring64NavigableMap's own portable byte stream,
  * wrapped in nothing — the bytes live in a parquet BINARY column keyed by
  * target file path ([[graft.sink.Warehouse]]'s `dv<version>` files).
  */
object DvCodec {
  def empty(): Roaring64NavigableMap = new Roaring64NavigableMap()

  def toBytes(bm: Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream(math.max(64, bm.serializedSizeInBytes().toInt))
    val out = new DataOutputStream(bos)
    bm.serialize(out)
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): Roaring64NavigableMap = {
    val bm = new Roaring64NavigableMap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }
}

/** Aggregate LONG row ordinals into one serialized deletion vector. */
case class DvPositionsAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${DvFns.AggName} expects a BIGINT position, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Roaring64NavigableMap = DvCodec.empty()

  override def update(buffer: Roaring64NavigableMap, input: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Roaring64NavigableMap,
                     other: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64NavigableMap): Any = DvCodec.toBytes(buffer)
  override def serialize(buffer: Roaring64NavigableMap): Array[Byte] = DvCodec.toBytes(buffer)
  override def deserialize(bytes: Array[Byte]): Roaring64NavigableMap = DvCodec.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): DvPositionsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DvPositionsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): DvPositionsAgg =
    copy(child = newChild)
  override def prettyName: String = DvFns.AggName
}

/** Union of two serialized DVs; a null side is the empty bitmap (the
  * merge-on-write join's "no previous DV" arm). Post-aggregate scalar over
  * O(affected files) rows — CodegenFallback is off the hot path.
  */
case class DvOr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    (a, b) match {
      case (null, null) => null
      case (x, null)    => x
      case (null, y)    => y
      case (x, y) =>
        val bm = DvCodec.fromBytes(x.asInstanceOf[Array[Byte]])
        bm.or(DvCodec.fromBytes(y.asInstanceOf[Array[Byte]]))
        DvCodec.toBytes(bm)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DvOr =
    copy(left = l, right = r)
  override def prettyName: String = DvFns.OrName
}

/** Cardinality of a serialized DV (live deleted-position count). */
case class DvCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullSafeEval(bytes: Any): Any =
    DvCodec.fromBytes(bytes.asInstanceOf[Array[Byte]]).getLongCardinality

  override protected def withNewChildInternal(newChild: Expression): DvCardinality =
    copy(child = newChild)
  override def prettyName: String = DvFns.CardName
}

/** Read-side deletion-vector probe — the one interface [[DvDeleted]]
  * calls through. Two shippings: [[DvLookup]] broadcasts the vector BYTES
  * (right while total deleted positions are small), [[DvLazyLookup]]
  * broadcasts only descriptors and point-reads vectors task-side (right at
  * extreme churn, where an all-bytes broadcast would pressure driver and
  * executor memory).
  */
sealed trait DvProbe extends Serializable {
  def deleted(file: UTF8String, pos: Long): Boolean
}

/** Per-task deletion-vector lookup: file path → decoded bitmap, shipped as
  * a BROADCAST of the serialized map (tasks carry only the handle; each
  * task decodes lazily, once). Read-only after decode, so concurrent probes
  * within a task are safe.
  */
final class DvLookup(bc: Broadcast[Map[String, Array[Byte]]]) extends DvProbe {
  @transient private lazy val decoded: java.util.HashMap[UTF8String, Roaring64NavigableMap] = {
    val m = new java.util.HashMap[UTF8String, Roaring64NavigableMap]()
    bc.value.foreach { case (f, b) => m.put(UTF8String.fromString(f), DvCodec.fromBytes(b)) }
    m
  }
  def deleted(file: UTF8String, pos: Long): Boolean = {
    val bm = decoded.get(file)
    bm != null && bm.contains(pos)
  }
}

/** Lazy deletion-vector probe for LARGE delete states (the Delta/Iceberg
  * descriptor posture): the broadcast holds only target-file → dv-parquet
  * DESCRIPTORS — O(affected files) path strings, never vector bytes — and
  * each task point-reads, once, only the vectors of files it actually
  * scans: a parquet record filter on the target-path column (the dv file
  * is written sorted by target, so page/column indexes bound the read to
  * O(one vector)). A JVM-wide bounded cache de-duplicates reads across the
  * executor's tasks; an untargeted or absent file probes as the empty
  * vector.
  */
final class DvLazyLookup(bc: Broadcast[Map[String, String]],
                         fileCol: String, bytesCol: String) extends DvProbe {
  @transient private lazy val local =
    new java.util.HashMap[UTF8String, Roaring64NavigableMap]()
  def deleted(file: UTF8String, pos: Long): Boolean = {
    var bm = local.get(file)
    if (bm == null) {
      val f = file.toString
      bm = bc.value.get(f)
        .map(dv => DvLazyLookup.vectorFor(dv, f, fileCol, bytesCol))
        .getOrElse(DvLazyLookup.EmptyBm)
      // copy the key: the probed UTF8String may be backed by a reused
      // scan buffer and must not be retained as-is
      local.put(UTF8String.fromString(f), bm)
    }
    bm.contains(pos)
  }
}

object DvLazyLookup {
  private[graft] val EmptyBm = new Roaring64NavigableMap() // never mutated

  /** Distinct per-task vector REQUESTS resolved in this JVM (cache hits
    * included) — test instrumentation: a scan touching 1 of N deleted
    * files must request exactly 1 vector, however the bytes are served.
    */
  private[graft] val decodes = new java.util.concurrent.atomic.AtomicLong

  // bounded LRU shared across tasks: hot vectors of the current scan stay
  // resident, an unbounded churn history cannot accrete executor memory
  private val cache: java.util.Map[String, Roaring64NavigableMap] =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Roaring64NavigableMap](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Roaring64NavigableMap]) = size() > 256
      })

  private def vectorFor(dvPath: String, target: String,
                        fileCol: String, bytesCol: String): Roaring64NavigableMap = {
    decodes.incrementAndGet()
    val key = dvPath + "\u0000" + target
    val hit = cache.get(key)
    if (hit != null) return hit
    val bm = readOne(dvPath, target, fileCol, bytesCol)
    cache.put(key, bm)
    bm
  }

  private def readOne(dvPath: String, target: String,
                      fileCol: String, bytesCol: String): Roaring64NavigableMap = {
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val pred = FilterApi.eq(FilterApi.binaryColumn(fileCol),
      org.apache.parquet.io.api.Binary.fromString(target))
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(dvPath))
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withFilter(FilterCompat.get(pred))
      .build()
    try {
      var g = reader.read()
      while (g != null) {
        if (g.getString(fileCol, 0) == target)
          return DvCodec.fromBytes(g.getBinary(bytesCol, 0).getBytes)
        g = reader.read()
      }
      EmptyBm
    } finally reader.close()
  }
}

/** The read-side probe: `dv_deleted(file, pos)` against a [[DvLookup]] —
  * one reference-object call inside the WholeStageCodegen span (the
  * BpeEncode pattern), replacing the pairs anti-join that would otherwise
  * shuffle or broadcast-join every scanned row.
  */
case class DvDeleted(left: Expression, right: Expression, lookup: DvProbe)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dv_deleted expects (STRING file, BIGINT pos), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(file: Any, pos: Any): Any =
    lookup.deleted(file.asInstanceOf[UTF8String], pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup, classOf[DvProbe].getName)
    defineCodeGen(ctx, ev, (f, p) => s"$ref.deleted($f, $p)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DvDeleted =
    copy(left = l, right = r)
  override def prettyName: String = "dv_deleted"
}

object DvFns {
  val AggName = "dv_positions_agg"
  val OrName = "dv_or"
  val CardName = "dv_cardinality"

  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    def put(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    put(AggName, exprs => DvPositionsAgg(exprs.head))
    put(OrName, exprs => DvOr(exprs(0), exprs(1)))
    put(CardName, exprs => DvCardinality(exprs.head))
  }

  /** Column-API entry points; aggregate/scalars require `register` once per
    * session, the probe binds its lookup directly (no registry round-trip —
    * the lookup is a runtime object, not a literal).
    */
  def dvAgg(pos: Column): Column = call_function(AggName, pos)
  def dvOr(a: Column, b: Column): Column = call_function(OrName, a, b)
  def dvCard(bytes: Column): Column = call_function(CardName, bytes)
  def dvDeleted(lookup: DvProbe, file: Column, pos: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      DvDeleted(org.apache.spark.sql.graft.ColumnBridge.expression(file),
        org.apache.spark.sql.graft.ColumnBridge.expression(pos), lookup))
}
