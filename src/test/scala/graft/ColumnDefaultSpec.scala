package graft

import org.apache.spark.sql.Row
import graft.sink.Warehouse

/** Write-side column DEFAULTs (Spark's `SUPPORT_COLUMN_DEFAULT_VALUE`
  * catalog capability): `CREATE TABLE ... (c T DEFAULT <const>)` stores the
  * default as `CURRENT_DEFAULT` field metadata; Spark's own analyzer
  * (`ResolveDefaultColumns`) then fills omitted columns and the `DEFAULT`
  * keyword at ANALYSIS time, so the engine's write paths never see a hole.
  * The metadata lives in the manifest schema (StructType JSON), so defaults
  * survive catalog restarts like any other schema fact. Engine-side
  * programmatic appends keep the conform (target-schema-wins null-fill)
  * contract — defaults are a SQL-face feature, matching the reference's
  * "schema contract lives at the boundary" stance
  * (salesforce_pipeline.py:166).
  */
class ColumnDefaultSpec extends SparkSpec {

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  test("omitted columns, DEFAULT keyword, explicit NULL, explicit value") {
    val root = tmpDir("cdef-basic")
    register("cdef", root)
    spark.sql("CREATE TABLE cdef.t (k BIGINT, v BIGINT, tier STRING DEFAULT 'basic')")
    spark.sql("INSERT INTO cdef.t (k, v) VALUES (1, 10)")          // omitted → default
    spark.sql("INSERT INTO cdef.t VALUES (2, 20, DEFAULT)")         // keyword → default
    spark.sql("INSERT INTO cdef.t VALUES (3, 30, NULL)")            // explicit null STAYS null
    spark.sql("INSERT INTO cdef.t VALUES (4, 40, 'gold')")          // explicit value
    val got = spark.sql("SELECT k, tier FROM cdef.t ORDER BY k").collect().toSeq
    assert(got == Seq(Row(1L, "basic"), Row(2L, "basic"), Row(3L, null), Row(4L, "gold")))
  }

  test("typed and computed-constant defaults (timestamp, decimal, arithmetic)") {
    val root = tmpDir("cdef-typed")
    register("cdeft", root)
    spark.sql("""CREATE TABLE cdeft.t (
      k BIGINT,
      ts TIMESTAMP DEFAULT TIMESTAMP '2024-02-01 00:00:00',
      amt DECIMAL(10,2) DEFAULT 12.50,
      n BIGINT DEFAULT 2 + 3)""")
    spark.sql("INSERT INTO cdeft.t (k) VALUES (1)")
    val r = spark.sql("SELECT * FROM cdeft.t").head()
    assert(r.getAs[java.sql.Timestamp]("ts") == java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    assert(r.getAs[java.math.BigDecimal]("amt") == new java.math.BigDecimal("12.50"))
    assert(r.getAs[Long]("n") == 5L)
  }

  test("defaults persist in the manifest schema: a separate catalog instance serves them") {
    val root = tmpDir("cdef-persist")
    register("cdefa", root)
    spark.sql("CREATE TABLE cdefa.t (k BIGINT, tier STRING DEFAULT 'basic')")
    spark.sql("INSERT INTO cdefa.t (k) VALUES (1)")
    // a SECOND catalog over the same root = a fresh GraftCatalog + Warehouse
    // instance reading the manifest cold — the default must come from disk
    register("cdefb", root)
    spark.sql("INSERT INTO cdefb.t (k) VALUES (2)")
    val got = spark.sql("SELECT k, tier FROM cdefb.t ORDER BY k").collect().toSeq
    assert(got == Seq(Row(1L, "basic"), Row(2L, "basic")))
  }

  test("engine-side programmatic append keeps target-schema-wins null-fill") {
    val root = tmpDir("cdef-conform")
    register("cdefc", root)
    spark.sql("CREATE TABLE cdefc.t (k BIGINT, tier STRING DEFAULT 'basic')")
    val wh = new Warehouse(spark, root)
    import spark.implicits._
    // programmatic append with the column ABSENT: conform null-fills — the
    // default is an analysis-time SQL-face feature, not a storage rewrite
    wh.append("t", Seq(7L).toDF("k"))
    assert(spark.sql("SELECT tier FROM cdefc.t WHERE k = 7").head().isNullAt(0))
  }

  test("CTAS result columns carry no phantom defaults; DESCRIBE shows the declared one") {
    val root = tmpDir("cdef-desc")
    register("cdefd", root)
    spark.sql("CREATE TABLE cdefd.t (k BIGINT, tier STRING DEFAULT 'basic')")
    val desc = spark.sql("DESCRIBE TABLE cdefd.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc.contains("tier"))
    // the default round-trips into the table's reported schema metadata
    val f = spark.table("cdefd.t").schema("tier")
    assert(f.metadata.contains("CURRENT_DEFAULT") &&
      f.metadata.getString("CURRENT_DEFAULT") == "'basic'")
  }

  test("ALTER TABLE ADD COLUMN ... DEFAULT: old rows serve it AND new INSERTs fill it") {
    val root = tmpDir("cdef-alter")
    register("cdefe", root)
    spark.sql("CREATE TABLE cdefe.t (k BIGINT)")
    spark.sql("INSERT INTO cdefe.t VALUES (1)")
    spark.sql("ALTER TABLE cdefe.t ADD COLUMN tier STRING DEFAULT 'basic'")
    // EXISTS_DEFAULT: the pre-addition row reads the frozen constant
    assert(spark.sql("SELECT tier FROM cdefe.t WHERE k = 1").head().getString(0) == "basic")
    // CURRENT_DEFAULT: an INSERT that OMITS the column must fill the
    // declared default, not NULL (the capability legalizes this DDL, so
    // the metadata must carry both keys)
    spark.sql("INSERT INTO cdefe.t (k) VALUES (2)")
    assert(spark.sql("SELECT tier FROM cdefe.t WHERE k = 2").head().getString(0) == "basic")
    spark.sql("INSERT INTO cdefe.t VALUES (3, DEFAULT)")
    assert(spark.sql("SELECT tier FROM cdefe.t WHERE k = 3").head().getString(0) == "basic")
  }

  test("EXISTS_DEFAULT is the FROZEN literal, never the raw default SQL") {
    val root = tmpDir("cdef-frozen")
    register("cdeff", root)
    // a computed-constant default: CURRENT_DEFAULT may keep the SQL text,
    // but EXISTS_DEFAULT (what old rows serve forever) must be the
    // evaluated literal — re-evaluating stored SQL at scan time drifts
    spark.sql("CREATE TABLE cdeff.t (k BIGINT, n BIGINT DEFAULT 2 + 3)")
    val f = spark.table("cdeff.t").schema("n")
    val exists = f.metadata.getString("EXISTS_DEFAULT")
    assert(!exists.contains("+"), s"EXISTS_DEFAULT must be frozen, got: $exists")
    spark.sql("INSERT INTO cdeff.t (k) VALUES (1)")
    assert(spark.sql("SELECT n FROM cdeff.t").head().getLong(0) == 5L)
  }
}
