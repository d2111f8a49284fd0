package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.expressions.SqDistFns

/** Native sqdist_native vs the composable fold it replaces: bit-identical
  * doubles on every input class (the PQ family's oracle queries depend on
  * the exact IEEE op sequence), null/ragged semantics matched to zip_with.
  */
class SquaredDistanceSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the aggregate(zip_with) fold on deterministic vectors") {
    SqDistFns.register(spark)
    val rows = (0 until 200).map { i =>
      val a = (0 until 16).map(p => math.sin(i * 16 + p) * 100).toArray
      val b = (0 until 16).map(p => math.cos(i * 16 + p) * 100).toArray
      Row(i.toLong, a, b)
    }
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("a", ArrayType(DoubleType)),
      StructField("b", ArrayType(DoubleType))))
    val df = spark.createDataFrame(rows.asJava, schema)
    val diff = df.select(
        SqDistFns.sqDistNative(col("a"), col("b")).as("nat"),
        fold(col("a"), col("b")).as("ref"))
      .filter(col("nat") =!= col("ref")) // bitwise: any ULP drift fails
      .count()
    assert(diff == 0L, "native and fold must agree bit for bit")
  }

  test("null and ragged semantics match the fold: NULL out, never a partial sum") {
    SqDistFns.register(spark)
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType)),
      StructField("b", ArrayType(DoubleType))))
    val df = spark.createDataFrame(Seq(
      Row(Array(1.0, 2.0), Array(1.0)),            // ragged
      Row(Array[Any](1.0, null).map(_.asInstanceOf[Any]), Array[Any](1.0, 2.0)), // null element
      Row(null, Array(1.0))                         // null array
    ).asJava, schema)
    val out = df.select(SqDistFns.sqDistNative(col("a"), col("b")).as("d")).collect()
    assert(out.forall(_.isNullAt(0)), "every malformed input must yield NULL")
  }
}
