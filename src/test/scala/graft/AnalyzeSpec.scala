package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** ANALYZE (Warehouse.analyzeTable): NDV accuracy, exact null counts and
  * length stats, the stored-file round trip, the CALL procedure face, and
  * the DSv2 columnStats surface into Catalyst plan statistics.
  */
class AnalyzeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val root = {
    val dir = tmpDir("graft-analyze")
    spark.conf.set("spark.sql.catalog.gana", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gana.root", dir)
    dir
  }
  private lazy val wh = { root; new Warehouse(spark, root) }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("score", DoubleType)))

  private def seed(): Unit = if (!wh.exists("facts")) {
    // 5000 rows: id unique, grp has 37 distinct, score has 500 distinct,
    // every 10th grp is null
    val rows = (0 until 5000).map { i =>
      Row(i.toLong, if (i % 10 == 0) null else s"g${i % 37}", (i % 500) / 7.0)
    }
    wh.replace("facts", spark.createDataFrame(rows.asJava, schema))
  }

  test("analyze: NDV within HLL tolerance, null/length stats exact, round-trips") {
    seed()
    val r = wh.analyzeTable("facts")
    assert(r.rows == 5000 && r.version == wh.currentVersion("facts"))
    assert(r.cols.keySet == Set("id", "grp", "score"))
    def within(est: Long, exact: Long, tol: Double) =
      math.abs(est - exact) <= math.max(1, (exact * tol).toLong)
    assert(within(r.cols("id").ndv, 5000, 0.05), s"id ndv ${r.cols("id").ndv}")
    assert(within(r.cols("grp").ndv, 37, 0.05), s"grp ndv ${r.cols("grp").ndv}")
    assert(within(r.cols("score").ndv, 500, 0.05), s"score ndv ${r.cols("score").ndv}")
    assert(r.cols("grp").nullCount == 500 && r.cols("id").nullCount == 0)
    // grp values are g0..g36: max length 3, avg ceil > 0; fixed-width cols -1
    assert(r.cols("grp").maxLen == 3 && r.cols("grp").avgLen >= 2)
    assert(r.cols("id").avgLen == -1 && r.cols("id").maxLen == -1)
    // stored file serves the same record
    assert(wh.columnStats("facts").contains(r))
  }

  test("CALL graft.system.analyze runs it; cols subset respected") {
    seed()
    val out = spark.sql("CALL gana.system.analyze(tbl => 'facts', cols => 'id,grp')").head()
    assert(out.getLong(1) == 5000 && out.getInt(2) == 2)
    assert(wh.columnStats("facts").get.cols.keySet == Set("id", "grp"))
    intercept[Exception](
      spark.sql("CALL gana.system.analyze(tbl => 'facts', cols => 'nope')"))
  }

  test("columnStats surface into Catalyst plan statistics (distinctCount, nullCount)") {
    seed()
    wh.analyzeTable("facts")
    val plan = spark.sql("SELECT id, grp FROM gana.facts").queryExecution.optimizedPlan
    val att = plan.stats.attributeStats
    assert(att.nonEmpty, s"no attribute stats: ${plan.stats}")
    val byName = att.toSeq.map { case (a, st) => a.name -> st }.toMap
    assert(byName.contains("grp") && byName("grp").nullCount.exists(_.toLong == 500L),
      byName.toString)
    assert(byName("grp").distinctCount.exists(d => math.abs(d.toLong - 37L) <= 2),
      byName("grp").toString)
    // a time-travel scan is a different population: no served column stats
    val v = wh.currentVersion("facts")
    val ttPlan = spark.sql(s"SELECT id, grp FROM gana.facts VERSION AS OF $v")
      .queryExecution.optimizedPlan
    assert(ttPlan.stats.attributeStats.isEmpty, ttPlan.stats.toString)
  }

  test("staleness is versioned, a re-analyze refreshes") {
    seed()
    val before = wh.analyzeTable("facts")
    wh.append("facts",
      spark.createDataFrame(Seq(Row(99999L, "brandnew", 1.0)).asJava, schema))
    assert(wh.columnStats("facts").get.version == before.version) // stale, visibly
    val after = wh.analyzeTable("facts")
    assert(after.version == wh.currentVersion("facts") && after.rows == 5001)
  }
}
