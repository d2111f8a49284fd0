package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.schema.SchemaOps

/** Schema conform semantics (SURVEY §1.2, FIXTURES §A unit-fixture guidance):
  * missing target column null-filled, extra incoming column dropped, order =
  * target order, types widened per the reference lattice.
  */
class SchemaOpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val incoming = spark.createDataFrame(
    Seq(Row(1, "a", 2.5f), Row(2, "b", 3.5f)).asJava,
    StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("extra_col", FloatType))))

  test("conform null-fills missing, drops extra, reorders, casts") {
    val target = StructType(Seq(
      StructField("name", StringType),
      StructField("id", LongType),
      StructField("added_later", DoubleType)))
    val out = SchemaOps.conform(incoming, target)
    assert(out.schema.fieldNames.toSeq == Seq("name", "id", "added_later"))
    assert(out.schema("id").dataType == LongType)
    val rows = out.orderBy("id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows.forall(_.isNullAt(2)))
  }

  test("widen maps per the reference type lattice") {
    assert(SchemaOps.widen(IntegerType) == LongType)
    assert(SchemaOps.widen(ShortType) == LongType)
    assert(SchemaOps.widen(FloatType) == DoubleType)
    assert(SchemaOps.widen(DecimalType(10, 2)) == DoubleType)
    assert(SchemaOps.widen(StringType) == StringType)
    assert(SchemaOps.widen(TimestampNTZType) == TimestampNTZType)
    // unknown degrades to string (iceberg/schema.py:53-55 analog)
    assert(SchemaOps.widen(CalendarIntervalType) == StringType)
    // engine extension: arrays preserved with widened element
    assert(SchemaOps.widen(ArrayType(FloatType)) == ArrayType(DoubleType))
  }

  test("conform is total: empty target, empty incoming") {
    val out = SchemaOps.conform(incoming, StructType(Nil))
    assert(out.columns.isEmpty && out.count() == 2)
  }
}
