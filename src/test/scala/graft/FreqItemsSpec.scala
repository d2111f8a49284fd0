package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import graft.functions.Sketches
import graft.sink.Warehouse

/** Frequent-items state contract: below the sketch's map size counts are
  * EXACT (merged across batches == one-shot == true counts, deterministic
  * order); above it the bounds bracket the truth and no true heavy hitter
  * is missed (NO_FALSE_NEGATIVES); sketch rows survive a warehouse
  * round-trip like the HLL/KLL state.
  */
class FreqItemsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("event_type", StringType)))

  private def events(rows: (String, String)*): DataFrame =
    spark.createDataFrame(
      rows.map(r => Row(java.sql.Timestamp.valueOf(r._1), r._2)).asJava, schema)

  // 5 types with distinct skewed counts: view 40, click 25, purchase 10,
  // refund 4, error 1 (far below mapSize 128 => exact)
  private val day =
    (1 to 40).map(_ => ("2024-04-01 01:00:00", "view")) ++
    (1 to 25).map(_ => ("2024-04-01 02:00:00", "click")) ++
    (1 to 10).map(_ => ("2024-04-01 03:00:00", "purchase")) ++
    (1 to 4).map(_ => ("2024-04-01 04:00:00", "refund")) ++
    Seq(("2024-04-01 05:00:00", "error"))

  private def topOf(df: DataFrame): Seq[(String, Long, Long, Long)] =
    df.collect().head.getSeq[Row](2)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("below map size: merged-across-batches top-k is EXACT") {
    val (a, b) = day.splitAt(33)
    val batches = Sketches.dailyTypeSketches(events(a: _*))
      .unionByName(Sketches.dailyTypeSketches(events(b: _*)))
    val merged = Sketches.mergeDailyTopTypes(batches, 3)
    val top = topOf(merged)
    assert(top.map(t => (t._1, t._2)) ==
      Seq(("view", 40L), ("click", 25L), ("purchase", 10L)), top.toString)
    // exact regime: bounds collapse onto the estimate
    assert(top.forall(t => t._3 == t._2 && t._4 == t._2), top.toString)
    val oneShot = topOf(Sketches.mergeDailyTopTypes(
      Sketches.dailyTypeSketches(events(day: _*)), 3))
    assert(oneShot == top)
  }

  test("eviction regime: bounds bracket true counts; heavy hitter never missed") {
    // 300 distinct rare types (evicts at mapSize 128) + one dominant type
    val rare = (1 to 300).map(i => ("2024-04-02 01:00:00", s"rare$i"))
    val heavy = (1 to 500).map(_ => ("2024-04-02 02:00:00", "dominant"))
    val (a, b) = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(rare ++ heavy).splitAt(400)
    val batches = Sketches.dailyTypeSketches(events(a: _*))
      .unionByName(Sketches.dailyTypeSketches(events(b: _*)))
    val top = topOf(Sketches.mergeDailyTopTypes(batches, 5))
    val dom = top.find(_._1 == "dominant")
    assert(dom.isDefined, s"true heavy hitter missing: $top")
    assert(dom.get._3 <= 500L && 500L <= dom.get._4,
      s"bounds must bracket the true count: $dom")
  }

  test("sketch rows round-trip the warehouse and fold at read") {
    val wh = new Warehouse(spark, tmpDir("fi-wh"))
    val (a, b) = day.splitAt(50)
    wh.append("type_sketches", Sketches.dailyTypeSketches(events(a: _*)))
    wh.append("type_sketches", Sketches.dailyTypeSketches(events(b: _*)))
    val out = Sketches.mergeDailyTopTypes(wh.load("type_sketches"), 2)
    assert(out.collect().head.getAs[Long]("n_events") == day.size.toLong)
    assert(topOf(out).map(_._1) == Seq("view", "click"))
  }
}
