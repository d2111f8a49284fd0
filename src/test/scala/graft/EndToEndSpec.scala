package graft

import org.apache.spark.sql.functions._
import graft.model.{ResourceDef, WriteMode}
import graft.sink.Warehouse
import graft.state.WatermarkStore

/** Full production-shape slice: DSv2 sObject connector (watermark predicate
  * pushed into the source as SOQL) -> merge disposition into the snapshot
  * warehouse -> watermark advance -> incremental second run extracts only
  * newer rows. The same loop `Pipeline.run` drives over parquet, here driven
  * over the API-shaped source.
  */
class EndToEndSpec extends SparkSpec {

  private val fmt = "graft.sources.dsv2.SObjectDataSource"
  private def source(rows: Long) = spark.read.format(fmt)
    .option("sobject", "Account").option("rows", rows.toString)
    .option("pageSize", "500").load()

  test("DSv2 extract -> merge -> incremental re-extract") {
    val wh = new Warehouse(spark, tmpDir("e2e-wh"))
    val st = new WatermarkStore(tmpDir("e2e-st"))
    val res = ResourceDef("account", WriteMode.Merge, Seq("Id"), Some("SystemModstamp"))

    // run 1: full history (2000 rows exist so far)
    val run1 = source(2000)
    wh.write(res, run1)
    val wm1 = run1.agg(date_format(max("SystemModstamp"),
      "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("wm")).head().getString(0)
    st.advance(res.name, wm1)
    assert(wh.load("account").count() == 2000)

    // run 2: source has grown to 2500 rows; extract only past the watermark
    val cut = st.get(res.name).get
    val run2 = source(2500).filter(
      col("SystemModstamp") > to_timestamp(lit(cut), "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]"))
    // watermark predicate is pushed into the connector as SOQL
    val plan = run2.queryExecution.executedPlan.toString
    assert(plan.contains("SystemModstamp >"), s"watermark not pushed:\n$plan")
    assert(run2.count() == 500)
    wh.write(res, run2)
    assert(wh.load("account").count() == 2500)

    // run 3: nothing new -> merge of empty batch is a no-op on content
    val wm2 = run2.agg(date_format(max("SystemModstamp"),
      "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("wm")).head().getString(0)
    st.advance(res.name, wm2)
    val run3 = source(2500).filter(
      col("SystemModstamp") > to_timestamp(lit(st.get(res.name).get),
        "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]"))
    assert(run3.count() == 0)
    wh.write(res, run3)
    assert(wh.load("account").count() == 2500)

    // updated row re-merges: simulate an update by re-extracting row 100
    val updated = source(2500).filter(col("Id") === "Account-00000100")
      .withColumn("Name", lit("UPDATED"))
    wh.write(res, updated)
    val t = wh.load("account")
    assert(t.count() == 2500)
    assert(t.filter(col("Id") === "Account-00000100").head().getAs[String]("Name") == "UPDATED")
  }

  test("pure DSv2 path: read.format(sobject) -> writeTo(catalog) with dispositions") {
    val dir = tmpDir("e2e-cat")
    spark.conf.set("spark.sql.catalog.e2e", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.e2e.root", dir)
    val wh = new Warehouse(spark, dir)

    // initial load: CTAS through the catalog (create + first append)
    source(2000).writeTo("e2e.account").create()
    assert(spark.sql("SELECT count(*) FROM e2e.account").head().getLong(0) == 2000)

    // incremental batch merges by PK through the same writeTo surface
    source(2500).filter(col("Id") > "Account-00001999")
      .writeTo("e2e.account")
      .option("disposition", "merge").option("primaryKeys", "Id")
      .append()
    assert(spark.sql("SELECT count(*) FROM e2e.account").head().getLong(0) == 2500)
    assert(spark.sql("SELECT count(DISTINCT Id) FROM e2e.account").head().getLong(0) == 2500)
    // ATOMIC CTAS (StagingTableCatalog): create + first batch land as the
    // SINGLE v0 commit; merge added v1; the pre-merge snapshot stays
    // time-travel-readable in SQL
    assert(spark.sql("SELECT count(*) FROM e2e.account VERSION AS OF 0").head().getLong(0) == 2000)
    assert(wh.history("account") == Seq(0L, 1L))
  }
}
