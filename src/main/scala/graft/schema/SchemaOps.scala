package graft.schema

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema system of the engine (SURVEY.md §1.2-1.3).
  *
  * The reference discovers schemas per-sObject and coerces every incoming
  * batch to the *target* table's schema before writing: missing columns are
  * appended as typed nulls, extra columns are silently dropped, and the final
  * projection is in target-column order (reference:
  * `salesforce_pipeline.py:153-174`). `conform` reproduces exactly that
  * one-way schema-evolution contract as a pure DataFrame transformation.
  *
  * The type lattice mirrors `iceberg/schema.py:35-55`: integers widen to
  * long, floats widen to double, unknowns degrade to string, timestamps stay
  * native (tz-aware ≡ Spark `TimestampType` under a UTC session, naive ≡
  * `TimestampNTZType`).
  */
object SchemaOps {

  /** Widen a field per the reference's type lattice (`iceberg/schema.py:35-55`).
    * Integer widths → LongType; float widths → DoubleType; primitive
    * temporal/bool/binary/string kept; anything unrepresentable → StringType.
    */
  def widen(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType                        => DoubleType
    case BooleanType                                   => BooleanType
    case TimestampType                                 => TimestampType
    case TimestampNTZType                              => TimestampNTZType
    case DateType                                      => DateType
    case BinaryType                                    => BinaryType
    case StringType                                    => StringType
    case _: DecimalType                                => DoubleType
    // Engine extension: keep arrays (embeddings) instead of degrading.
    case ArrayType(e, n)                               => ArrayType(widen(e), n)
    // Engine extension: VARIANT is already the widest semi-structured type
    // (parse-once storage for JSON columns); degrading it to string would
    // re-introduce the per-query JSON parse it exists to remove.
    case v: VariantType                                => v
    case _                                             => StringType
  }

  /** Apply `widen` across a whole schema; everything nullable (the reference
    * creates all Iceberg fields `required=False`, `iceberg/schema.py:57-64`).
    */
  def widenSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => StructField(f.name, widen(f.dataType), nullable = true)))

  /** Coerce `df` to `target`: null-fill missing columns with the target type,
    * drop extras, cast type mismatches, and project in target order.
    * Target schema wins (`salesforce_pipeline.py:161-166`). Pure projection —
    * no shuffle, stays inside whole-stage codegen.
    */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val incoming = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols = target.fields.map { f =>
      incoming.get(f.name) match {
        case Some(dt) if dt == f.dataType => col(f.name)
        case Some(_)                      => col(f.name).cast(f.dataType).as(f.name)
        case None                         => lit(null).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Normalize TIMESTAMP(NANOS) parquet columns that Spark surfaced as raw
    * long nanos (legacy `nanosAsLong`): µs-exact integer `div 1000` — double
    * division would lose precision at ns magnitudes (> 2^53). No-op for
    * columns already typed timestamp. Shared by the extraction path
    * (ResourceDef.nanosCols) and the query surface (events.ts).
    */
  def normalizeNanos(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
      else d
    }
}
