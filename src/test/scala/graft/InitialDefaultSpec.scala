package graft

import java.nio.file.Paths

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** ADD COLUMN with INITIAL DEFAULT (Iceberg v3 initial-default semantics,
  * carried by Spark's `EXISTS_DEFAULT` field metadata): pre-addition files
  * serve the frozen constant, post-addition files serve stored values —
  * including genuine nulls — and the commit is metadata-only at any table
  * size. Rewrites materialize the value physically because their victim
  * scans already serve it.
  */
class InitialDefaultSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))
  private def df(rows: (Long, Long)*) = TestSpark.spark.createDataFrame(
    rows.map { case (k, v) => Row(k, v) }.asJava, schema)

  private def rowsOf(wh: Warehouse, t: String): Set[Seq[Any]] =
    wh.load(t).collect().map(_.toSeq).toSet

  test("metadata-only: old rows read the default, post-addition writes read stored values incl. null") {
    val root = tmpDir("idef-basic")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(1L -> 10L, 2L -> 20L), statsCols = Seq("k"))
    val pathsBefore = wh.currentManifest("t").files.map(_.path)
    val vAdd = wh.addColumns("t",
      Seq(StructField("tier", StringType)), Map("tier" -> "'basic'"))
    // metadata-only: same files, byte for byte
    assert(wh.currentManifest("t").files.map(_.path) == pathsBefore)
    assert(rowsOf(wh, "t") == Set(Seq(1L, 10L, "basic"), Seq(2L, 20L, "basic")))
    // post-addition write: explicit value and explicit null BOTH stored
    val s2 = StructType(schema.fields :+ StructField("tier", StringType))
    wh.append("t", spark.createDataFrame(Seq(
      Row(3L, 30L, "gold"), Row(4L, 40L, null)).asJava, s2), statsCols = Seq("k"))
    assert(rowsOf(wh, "t") == Set(
      Seq(1L, 10L, "basic"), Seq(2L, 20L, "basic"),
      Seq(3L, 30L, "gold"), Seq(4L, 40L, null)))
    // a write that OMITS the column conforms to null (target-schema-wins),
    // not to the default — initial-default touches pre-addition files only
    wh.append("t", df(5L -> 50L), statsCols = Seq("k"))
    assert(wh.load("t").filter(col("k") === 5L).head().getAs[String]("tier") == null)
    // time travel: the pre-addition snapshot has no such column
    assert(!wh.loadVersion("t", vAdd - 1).columns.contains("tier"))
  }

  test("typed defaults freeze as canonical literals (timestamp, decimal, arithmetic constant)") {
    val root = tmpDir("idef-typed")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(1L -> 10L))
    wh.addColumns("t", Seq(
      StructField("ts", TimestampType),
      StructField("amt", DecimalType(10, 2)),
      StructField("n", LongType)),
      Map("ts" -> "TIMESTAMP '2024-02-01 00:00:00'", "amt" -> "'12.50'", "n" -> "2 + 3"))
    val r = wh.load("t").head()
    assert(r.getAs[java.sql.Timestamp]("ts") == java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(r.getAs[java.math.BigDecimal]("amt") == new java.math.BigDecimal("12.50"))
    assert(r.getAs[Long]("n") == 5L)
  }

  test("rewrites materialize the default physically; reads unchanged") {
    val root = tmpDir("idef-rewrite")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 4).foreach(i => wh.append("t", df((i.toLong * 2) -> i.toLong, (i * 2 + 1).toLong -> i.toLong)))
    wh.addColumns("t", Seq(StructField("tag", StringType)), Map("tag" -> "'x'"))
    val want = rowsOf(wh, "t")
    wh.compactFiles("t", smallRows = 100000L)
    assert(rowsOf(wh, "t") == want)
    // the rewritten files carry the column PHYSICALLY: a raw schema-less
    // read of the table dir's current files sees it
    val cur = wh.currentManifest("t").files.map(f => Paths.get(root, "t", f.path).toString)
    val raw = spark.read.parquet(cur: _*)
    assert(raw.columns.contains("tag"))
    assert(raw.filter(col("tag") === "x").count() == 8)
  }

  test("rename keeps the default; merge rewrite of matching files preserves values") {
    val root = tmpDir("idef-rename")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(1L -> 10L, 2L -> 20L), statsCols = Seq("k"))
    wh.addColumns("t", Seq(StructField("tag", StringType)), Map("tag" -> "'x'"))
    wh.renameColumn("t", "tag", "label")
    assert(rowsOf(wh, "t") == Set(Seq(1L, 10L, "x"), Seq(2L, 20L, "x")))
    // CoW merge rewrites the matching file: untouched rows keep the default
    val s2 = StructType(schema.fields :+ StructField("label", StringType))
    wh.merge("t", spark.createDataFrame(Seq(Row(2L, 22L, "gold")).asJava, s2), Seq("k"))
    assert(rowsOf(wh, "t") == Set(Seq(1L, 10L, "x"), Seq(2L, 22L, "gold")))
  }

  test("MOR interplay: defaults serve through pending equality deletes") {
    val root = tmpDir("idef-mor")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(1L -> 10L, 2L -> 20L, 3L -> 30L), statsCols = Seq("k"))
    wh.addColumns("t", Seq(StructField("tag", StringType)), Map("tag" -> "'x'"))
    wh.equalityDelete("t", df(2L -> 20L).select("k"))
    assert(rowsOf(wh, "t") == Set(Seq(1L, 10L, "x"), Seq(3L, 30L, "x")))
  }

  test("validation: non-constant, non-castable, and unknown-column defaults refuse") {
    val root = tmpDir("idef-bad")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(1L -> 10L))
    intercept[IllegalArgumentException](wh.addColumns("t",
      Seq(StructField("r", DoubleType)), Map("r" -> "rand()")))
    intercept[IllegalArgumentException](wh.addColumns("t",
      Seq(StructField("n", LongType)), Map("n" -> "'abc'")))
    intercept[IllegalArgumentException](wh.addColumns("t",
      Seq(StructField("a", LongType)), Map("b" -> "1")))
    // nothing committed by the refusals
    assert(wh.load("t").columns.toSeq == Seq("k", "v"))
  }

  test("SQL DDL face: ALTER TABLE ADD COLUMN ... DEFAULT serves old rows via the catalog") {
    val root = tmpDir("idef-sql")
    spark.conf.set("spark.sql.catalog.idefsql", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.idefsql.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(1L -> 10L, 2L -> 20L), statsCols = Seq("k"))
    spark.sql("ALTER TABLE idefsql.t ADD COLUMN tier STRING DEFAULT 'basic'")
    val got = spark.sql("SELECT k, tier FROM idefsql.t ORDER BY k").collect().toSeq
    assert(got == Seq(Row(1L, "basic"), Row(2L, "basic")))
  }
}
