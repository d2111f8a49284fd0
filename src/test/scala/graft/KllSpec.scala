package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Sketches
import graft.functions.expressions.KllFns
import graft.sink.Warehouse

/** KLL quantile-state contract: below the sketch's k the state is EXACT
  * (merged across batches == one-shot == true percentile); above k the
  * merged estimate honors the normalized rank-error bound; sketch rows
  * survive a warehouse round-trip and fold at read like every other
  * incremental state.
  */
class KllSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  private def events(rows: (String, Double)*): DataFrame =
    spark.createDataFrame(
      rows.map(r => Row(java.sql.Timestamp.valueOf(r._1), r._2)).asJava, schema)

  // one day, values 1..120 (< k=200 ⇒ sketch retains everything exactly)
  private val day1 = (1 to 120).map(i => (s"2024-03-01 0${i % 10}:00:00", i.toDouble))

  test("below k: merged-across-batches quantiles are EXACT and equal one-shot") {
    val (a, b) = day1.splitAt(47)
    val batches = Sketches.dailyValueSketches(events(a: _*))
      .unionByName(Sketches.dailyValueSketches(events(b: _*)))
    val merged = Sketches.mergeDailyQuantiles(batches, Seq(0.5, 0.9)).collect()
    assert(merged.length == 1)
    val row = merged.head
    assert(row.getAs[Long]("n_events") == 120L)
    // KLL inclusive rank semantics on fully-retained data: q(p) = the
    // smallest value whose rank >= p, over 1..120
    assert(row.getAs[Double]("p50") == 60.0, row.toString)
    assert(row.getAs[Double]("p90") == 108.0, row.toString)
    val oneShot = Sketches.mergeDailyQuantiles(
      Sketches.dailyValueSketches(events(day1: _*)), Seq(0.5, 0.9)).collect().head
    assert(oneShot.getAs[Double]("p50") == row.getAs[Double]("p50"))
    assert(oneShot.getAs[Double]("p90") == row.getAs[Double]("p90"))
  }

  test("above k: merged estimate honors the rank-error bound") {
    val n = 5000
    val big = (1 to n).map(i => (s"2024-03-02 00:00:00", i.toDouble))
    val (a, rest) = big.splitAt(1700)
    val (b, c) = rest.splitAt(1700)
    val batches = Seq(a, b, c).map(p => Sketches.dailyValueSketches(events(p: _*)))
      .reduce(_ unionByName _)
    val row = Sketches.mergeDailyQuantiles(batches, Seq(0.5, 0.99)).collect().head
    // merging 3 sketches at worst sums their rank errors' order — allow 3x
    // the single-sketch ~1.65% bound on the value's TRUE rank
    def rankOf(v: Double) = v / n
    assert(math.abs(rankOf(row.getAs[Double]("p50")) - 0.5) < 0.05, row.toString)
    assert(math.abs(rankOf(row.getAs[Double]("p99")) - 0.99) < 0.05, row.toString)
    assert(row.getAs[Long]("n_events") == n.toLong)
  }

  test("sketch rows round-trip the warehouse and fold at read") {
    val wh = new Warehouse(spark, tmpDir("kll-wh"))
    val (a, b) = day1.splitAt(60)
    wh.append("value_sketches", Sketches.dailyValueSketches(events(a: _*)))
    wh.append("value_sketches", Sketches.dailyValueSketches(events(b: _*)))
    val row = Sketches.mergeDailyQuantiles(
      wh.load("value_sketches"), Seq(0.5)).collect().head
    assert(row.getAs[Long]("n_events") == 120L)
    assert(row.getAs[Double]("p50") == 60.0, row.toString)
  }

  test("an all-null group yields null quantiles, not an exception") {
    val rows = Seq(Row(java.sql.Timestamp.valueOf("2024-03-03 00:00:00"), null))
    val ev = spark.createDataFrame(rows.asJava, schema)
    val out = Sketches.mergeDailyQuantiles(
      Sketches.dailyValueSketches(ev), Seq(0.5)).collect()
    assert(out.length == 1, out.mkString)
    assert(out.head.isNullAt(out.head.fieldIndex("p50")),
      "empty sketch must degrade to null like Spark's approx aggregates")
    assert(out.head.getAs[Long]("n_events") == 1L)
  }

  test("SQL surface resolves via registration (kll_* functions)") {
    KllFns.register(spark)
    events(day1: _*).createOrReplaceTempView("kll_events")
    val r = spark.sql(
      """SELECT kll_quantile(kll_merge_agg(s), 0.5d) AS med FROM (
        |  SELECT kll_sketch_agg(value) AS s FROM kll_events GROUP BY date_trunc('day', ts))
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 60.0, r.toString)
  }
}
