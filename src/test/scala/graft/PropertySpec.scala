package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.schema.SchemaOps
import graft.sink.Warehouse

/** Property-based checks over the disposition algebra (SURVEY §5): merge
  * idempotence, replace-equals-last-batch, conform totality/idempotence.
  * ScalaCheck generators driven directly with fixed seeds (the scalatestplus
  * bridge isn't on the offline classpath); Spark jobs per case are
  * expensive, so case counts stay small but the inputs are genuinely
  * generated (duplicate PKs, arbitrary values).
  */
class PropertySpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType),
    StructField("Amount", LongType)))

  private def df(rows: Seq[(String, Long)]) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private val batchGen: Gen[List[(String, Long)]] =
    Gen.listOfN(6, Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.choose(0L, 99L)))

  private def samples[T](g: Gen[T], n: Int, seed0: Long): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed0 + i)))

  test("property: merging a batch twice == merging it once") {
    for (((initial, batch), i) <- samples(Gen.zip(batchGen, batchGen), 5, 42).zipWithIndex) {
      val once = new Warehouse(spark, tmpDir(s"p-once$i"))
      val twice = new Warehouse(spark, tmpDir(s"p-twice$i"))
      once.replace("t", df(initial)); twice.replace("t", df(initial))
      once.merge("t", df(batch), Seq("Id"))
      twice.merge("t", df(batch), Seq("Id"))
      twice.merge("t", df(batch), Seq("Id"))
      val a = once.load("t").orderBy("Id", "Amount").collect().toSeq
      val b = twice.load("t").orderBy("Id", "Amount").collect().toSeq
      assert(a == b, s"case $i: initial=$initial batch=$batch")
    }
  }

  test("property: replace == last batch, regardless of history") {
    for (((first, last), i) <- samples(Gen.zip(batchGen, batchGen), 5, 137).zipWithIndex) {
      val wh = new Warehouse(spark, tmpDir(s"p-repl$i"))
      wh.replace("t", df(first))
      wh.replace("t", df(last))
      val got = wh.load("t").orderBy("Id", "Amount").collect().toSeq
      val want = df(last).orderBy("Id", "Amount").collect().toSeq
      assert(got == want, s"case $i")
    }
  }

  test("property: conform is total and idempotent on arbitrary target subsets") {
    val targets = Seq(
      StructType(Seq(StructField("Id", StringType))),
      StructType(Seq(StructField("Amount", DoubleType), StructField("Id", StringType))),
      StructType(Seq(StructField("New", TimestampType), StructField("Id", StringType))))
    for (((rows, target), i) <-
        samples(Gen.zip(batchGen, Gen.oneOf(targets)), 6, 7).zipWithIndex) {
      val once = SchemaOps.conform(df(rows), target)
      val twiceDf = SchemaOps.conform(once, target)
      assert(once.schema.fieldNames.toSeq == target.fieldNames.toSeq, s"case $i")
      assert(twiceDf.schema == once.schema, s"case $i")
      assert(once.count() == rows.size, s"case $i")
    }
  }
}
