package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.sink.Warehouse

/** Incremental HLL sketch maintenance: merged-across-batches must equal the
  * single-shot sketch exactly (determinism + order-insensitive union), the
  * warehouse round-trip must preserve sketch binaries, and estimates must
  * track exact distinct counts at fixture scale.
  */
class SketchSpec extends SparkSpec {

  private lazy val events =
    graft.schema.SchemaOps.normalizeNanos(
      spark.read.parquet(s"$sf/events.parquet"), Seq("ts"))

  test("merging per-batch sketches == one-shot sketch, through the warehouse") {
    // three ingest batches by event_id residue — disjoint, covering all rows
    val wh = new Warehouse(spark, tmpDir("wh-sketch"))
    (0 until 3).foreach { r =>
      wh.append("daily_users",
        Sketches.dailyUserSketches(events.filter(col("event_id") % 3 === r)))
    }
    val merged = Sketches.mergeDaily(wh.load("daily_users"))
      .orderBy("day").collect()
    val oneShot = Sketches.mergeDaily(Sketches.dailyUserSketches(events))
      .orderBy("day").collect()
    assert(merged.length == oneShot.length && merged.length > 0)
    merged.zip(oneShot).foreach { case (m, o) =>
      assert(m.getTimestamp(0) == o.getTimestamp(0))
      assert(m.getLong(1) == o.getLong(1),
        s"day ${m.get(0)}: merged estimate ${m.getLong(1)} != one-shot ${o.getLong(1)}")
      assert(m.getLong(2) == o.getLong(2))
    }
    // event totals are exact: the sum over batches is the corpus total
    assert(merged.map(_.getLong(2)).sum == events.count())
  }

  test("estimates track exact distincts; global rollup composes") {
    val perDayExact = events
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()
      .groupBy("day").agg(count(lit(1)).as("exact"))
    val sketched = Sketches.mergeDaily(Sketches.dailyUserSketches(events))
    val joined = sketched.join(perDayExact, "day").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val est = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - exact) / exact < 0.05,
        s"day ${r.get(0)}: estimate $est vs exact $exact drifted > 5%")
    }
    val global = Sketches.mergeAll(Sketches.dailyUserSketches(events)).head()
    val globalExact = events.select("user_id").distinct().count().toDouble
    assert(math.abs(global.getLong(0) - globalExact) / globalExact < 0.05)
  }
}
