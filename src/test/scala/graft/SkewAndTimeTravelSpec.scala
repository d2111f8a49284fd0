package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Skew
import graft.sink.Warehouse

class SkewAndTimeTravelSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("saltedAgg equals plain groupBy agg on skewed data") {
    // 90% of rows share one hot key
    val rows = (0 until 2000).map(i =>
      Row(if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong))
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("k", StringType), StructField("v", LongType))))
    val salted = Skew.saltedAgg(df, "k", Seq("v"), buckets = 8)
      .orderBy("k").collect().toSeq
    val plain = df.groupBy("k").agg(sum("v").as("v"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("saltedAgg min/max passthrough and reserved-name guard") {
    val rows = (0 until 200).map(i => Row(if (i % 4 == 0) "a" else "b", i.toLong, (i * 3 % 17).toLong))
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType), StructField("w", LongType)))
    val df = spark.createDataFrame(rows.asJava, schema)
    // min and max of the same column requested together must be rejected
    // (one output name) — that's the duplicate guard, not a silent clobber
    intercept[IllegalArgumentException](
      Skew.saltedAgg(df, "k", Seq("v"), buckets = 8, mins = Seq("w"), maxs = Seq("w")))
    val ok = Skew.saltedAgg(df.withColumn("w2", col("w")), "k", Seq("v"), buckets = 8,
        mins = Seq("w"), maxs = Seq("w2"))
      .orderBy("k").collect().toSeq
    val plain = df.withColumn("w2", col("w")).groupBy("k")
      .agg(sum("v").as("v"), min("w").as("w"), max("w2").as("w2"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    assert(ok == plain)
    // reserved working/output names are rejected up front
    intercept[IllegalArgumentException](
      Skew.saltedAgg(df.withColumn("n", lit(1)), "k", Seq("v")))
    intercept[IllegalArgumentException](
      Skew.saltedAgg(df.withColumn("__salt", lit(1)), "k", Seq("v")))
  }

  test("time travel: every committed snapshot stays readable") {
    val wh = new Warehouse(spark, tmpDir("tt"))
    val schema = StructType(Seq(StructField("x", LongType)))
    def batch(n: Long) = spark.createDataFrame(
      (0L until n).map(Row(_)).asJava, schema)
    val v0 = wh.replace("t", batch(3))
    val v1 = wh.append("t", batch(2))
    val v2 = wh.replace("t", batch(1))
    assert(wh.history("t") == Seq(0L, 1L, 2L))
    assert(wh.loadVersion("t", v0).count() == 3)
    assert(wh.loadVersion("t", v1).count() == 5)
    assert(wh.loadVersion("t", v2).count() == 1)
    assert(wh.load("t").count() == 1)
    intercept[IllegalArgumentException](wh.loadVersion("t", 99))
  }

  test("restore: rolls back content as a NEW commit, history intact, O(1) data") {
    val wh = new Warehouse(spark, tmpDir("restore"))
    val schema = StructType(Seq(StructField("x", LongType)))
    def batch(r: Range) = spark.createDataFrame(r.map(i => Row(i.toLong)).asJava, schema)
    val v0 = wh.replace("t", batch(0 until 3))
    wh.append("t", batch(10 until 12))          // v1: the "bad write"
    val v2 = wh.append("t", batch(20 until 21)) // v2: more damage
    val before = wh.manifestAt("t", v0).files.map(_.path).toSet

    val v3 = wh.restore("t", v0)
    assert(v3 == v2 + 1, "restore is a new commit, not a rewind")
    assert(wh.load("t").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
    // zero data IO: the restored snapshot references v0's files BY PATH
    assert(wh.manifestAt("t", v3).files.map(_.path).toSet == before)
    // nothing erased: the rolled-back versions stay time-travelable
    assert(wh.history("t") == Seq(0L, 1L, 2L, 3L))
    assert(wh.loadVersion("t", v2).count() == 6)
    // life goes on: post-restore writes commit on top
    wh.append("t", batch(30 until 32))
    assert(wh.load("t").count() == 5)
    // restoring a never-committed version fails loudly
    intercept[IllegalArgumentException](wh.restore("t", 99))
    // expiry keeps the CURRENT lineage's files; after it drops the bad
    // versions' manifests, restore to them is a loud failure, not silence
    wh.expireSnapshots("t", keepLast = 1, orphanGraceMs = 0)
    intercept[IllegalArgumentException](wh.restore("t", v2))
    assert(wh.load("t").count() == 5, "expiry must not touch the live snapshot")
  }
}
