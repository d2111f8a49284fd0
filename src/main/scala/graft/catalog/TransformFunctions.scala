package graft.catalog

import java.time.LocalDate

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The warehouse's partition transforms as Spark V2 catalog functions —
  * the piece that lets the PLANNER reason about graft's hidden partitioning
  * (reference context: the Iceberg REST catalog the reference writes into
  * exposes exactly these transforms to engines, `salesforce_pipeline.py:42-49`).
  *
  * [[GraftCatalog]] serves these through `FunctionCatalog`, which is how
  * Spark's storage-partitioned-join machinery (`V2ScanPartitioningAndOrdering`
  * → `V2ExpressionUtils.loadV2FunctionOpt`) resolves a scan-reported
  * `KeyGroupedPartitioning(bucket(16, id))` into a catalyst
  * `TransformExpression` it can match across the two sides of a join. Two
  * scans whose clustering resolves to the SAME bound function (canonical
  * name) and the same arguments are co-partitioned — the join then plans
  * with ZERO shuffle (see [[SpjSupport]]).
  *
  * Every `produceResult` is bit-identical to the WRITE side's column
  * expression ([[graft.sink.PartitionTransforms.exprAndKind]]) — same
  * murmur3 seed, same floorDiv epoch arithmetic, same 1970 anchors — so a
  * value Spark computes through the function can never disagree with the
  * partition a row was actually written to.
  *
  * Compatibility safety: Spark's shuffle-spec check compares bound
  * functions by CANONICAL NAME plus — for the special-cased bucket
  * transform only — the bucket-count literal (`numBucketsOpt`). A
  * BoundFunction is bound from argument TYPES, so a parameter value can
  * never ride the canonical name; bucket(16) vs bucket(32) is kept apart
  * by Spark's own count comparison (spec-pinned), while truncate has no
  * such channel — which is why [[SpjSupport]] refuses to REPORT truncate
  * clustering at all (a width mismatch would silently co-locate). The
  * canonical names here embed the input type: bucketing an int column and
  * a long column hash differently, so they must never co-locate either.
  */
object TransformFunctions {

  val names: Seq[String] = Seq("bucket", "truncate", "years", "months", "days", "hours")

  def load(name: String): Option[UnboundFunction] = name.toLowerCase match {
    case "bucket"   => Some(BucketUnbound)
    case "truncate" => Some(TruncateUnbound)
    case n @ ("years" | "months" | "days" | "hours") => Some(TimeUnbound(n))
    case _ => None
  }

  private def integral(dt: DataType) =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
  private def bucketable(dt: DataType) =
    integral(dt) || dt == StringType || dt == DateType || dt == TimestampType

  /** `bucket(n, col)` → pmod(hash(col), n); hash is murmur3 with Spark's
    * seed 42, exactly `functions.hash(col)` on the write side. A null input
    * hashes to the seed itself (Spark's fold-over-children semantics), so
    * null rows land in bucket pmod(42, n) — a real bucket, never null.
    */
  private object BucketUnbound extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String = "bucket(n, col): murmur3(seed 42) hash bucket, matches graft's write-side bucket transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, s"bucket expects (numBuckets, col), got $inputType")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket count must be int, got ${inputType.fields(0).dataType}")
      val dt = inputType.fields(1).dataType
      require(bucketable(dt), s"bucket does not support column type $dt")
      BucketBound(dt)
    }
  }

  private final case class BucketBound(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def isResultNullable: Boolean = false
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket(${dt.simpleString})"
    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val h =
        if (input.isNullAt(1)) 42 // hash() of a null child leaves the seed untouched
        else Murmur3HashFunction.hash(input.get(1, dt), dt, 42L).toInt
      Integer.valueOf(((h % n) + n) % n)
    }
  }

  /** `truncate(w, col)`: ints floor to a multiple of w (as long), strings cut
    * to their first w chars. NOTE: truncate clustering is never REPORTED for
    * SPJ ([[SpjSupport]]) — the width cannot be compared across join sides
    * (see the object doc) — so this function exists for resolution
    * completeness, not co-location claims.
    */
  private object TruncateUnbound extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String = "truncate(w, col): integral floor-to-width / string prefix, matches graft's write-side truncate transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, s"truncate expects (width, col), got $inputType")
      require(inputType.fields(0).dataType == IntegerType,
        s"truncate width must be int, got ${inputType.fields(0).dataType}")
      val dt = inputType.fields(1).dataType
      require(integral(dt) || dt == StringType, s"truncate does not support column type $dt")
      TruncateBound(dt)
    }
  }

  private final case class TruncateBound(dt: DataType) extends ScalarFunction[Any] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = if (dt == StringType) StringType else LongType
    override def name(): String = "truncate"
    override def canonicalName(): String = s"graft.truncate(${dt.simpleString})"
    override def produceResult(input: InternalRow): Any = {
      if (input.isNullAt(1)) return null
      val w = input.getInt(0)
      dt match {
        case StringType => input.getUTF8String(1).substringSQL(1, w)
        case _ =>
          val v = dt match {
            case ByteType  => input.getByte(1).toLong
            case ShortType => input.getShort(1).toLong
            case IntegerType => input.getInt(1).toLong
            case LongType  => input.getLong(1)
            case other     => throw new IllegalStateException(s"unreachable: $other")
          }
          java.lang.Long.valueOf(v - Math.floorMod(v, w.toLong))
      }
    }
  }

  /** years/months/days/hours over timestamp (epoch micros) or date (epoch
    * day) — pure epoch arithmetic, anchored at 1970, tz-independent, same
    * floorDiv the write expressions spell with pmod.
    */
  private final case class TimeUnbound(fn: String) extends UnboundFunction {
    override def name(): String = fn
    override def description(): String = s"$fn(col): epoch-anchored $fn ordinal, matches graft's write-side $fn transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1, s"$fn expects (col), got $inputType")
      val dt = inputType.fields(0).dataType
      require(dt == TimestampType || (dt == DateType && fn != "hours"),
        s"$fn does not support column type $dt")
      TimeBound(fn, dt)
    }
  }

  private final case class TimeBound(fn: String, dt: DataType) extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(dt)
    override def resultType(): DataType = LongType
    override def name(): String = fn
    override def canonicalName(): String = s"graft.$fn(${dt.simpleString})"
    override def produceResult(input: InternalRow): java.lang.Long = {
      if (input.isNullAt(0)) return null
      val epochDay: Long = dt match {
        case TimestampType => Math.floorDiv(input.getLong(0), 86400000000L)
        case DateType      => input.getInt(0).toLong
        case other         => throw new IllegalStateException(s"unreachable: $other")
      }
      fn match {
        case "days"  => java.lang.Long.valueOf(epochDay)
        case "hours" => java.lang.Long.valueOf(Math.floorDiv(input.getLong(0), 3600000000L))
        case "years" =>
          java.lang.Long.valueOf((LocalDate.ofEpochDay(epochDay).getYear - 1970).toLong)
        case "months" =>
          val d = LocalDate.ofEpochDay(epochDay)
          java.lang.Long.valueOf(((d.getYear - 1970) * 12 + d.getMonthValue - 1).toLong)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
  }
}
