package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** Parse-once semi-structured storage: VARIANT columns in the warehouse.
  *
  * The 100 TB contract under test:
  *   - ingest parses JSON ONCE (`parse_json` at write time) and stores the
  *     column SHREDDED — typed parquet subcolumns beside the binary
  *     fallback — so a query extracting `$.k` pays one leaf column's IO;
  *   - query-time extraction is pushed INTO the scan (Spark's own
  *     PushVariantIntoScan on the V1 load path, pushDownVariants on the
  *     catalog's DSv2 path): the plan carries NO JSON string parse;
  *   - the string-era SQL face keeps working: `get_json_object(v, path)`
  *     on a variant column resolves to `variant_get::string`
  *     ([[graft.catalog.VariantJsonCompatRule]]) with the same
  *     null-on-missing contract;
  *   - the column behaves like any other under the warehouse's field-id
  *     discipline: RENAME is metadata-only and old shredded files keep
  *     serving, ADD COLUMN null-fills history, conform null-fills a batch
  *     that lacks the column, and the MOR overlay composes.
  */
class VariantStoreSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("props", VariantType)))

  /** Rows 0..n-1 with props = {"k": <i*10>, "tag": "t<i%3>"} (and one null
    * props row at id = n-1 when `withNull`).
    */
  private def batch(lo: Long, n: Long, withNull: Boolean = false): DataFrame = {
    val raw = spark.createDataFrame(
      (lo until lo + n).map { i =>
        val js = if (withNull && i == lo + n - 1) null
                 else s"""{"k": ${i * 10}, "tag": "t${i % 3}"}"""
        Row(i, js)
      }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("props", StringType))))
    raw.select(col("id"), parse_json(col("props")).as("props"))
  }

  private def mkWarehouse(prefix: String): (Warehouse, String) = {
    val root = tmpDir(prefix)
    (new Warehouse(spark, root), root)
  }

  /** True when `q`'s scan read schema carries `props` as a pushed
    * struct-of-requested-fields instead of a variant. String-matched on
    * the executed plan (AQE nests the real scan outside the `children`
    * walk, so node collection misses it).
    */
  private def propsPushedToStruct(q: DataFrame, name: String = "props"): Boolean = {
    q.collect() // AQE: materialize the final plan before printing it
    val s = q.queryExecution.executedPlan.toString
    // V1 prints the rewritten ReadSchema (variant -> struct); V2 keeps the
    // variant label in ReadSchema and prints the extractions separately
    s.contains(s"$name:struct<") || s.contains(s"PushedVariantExtractions: [$name:")
  }

  private def assertNoJsonParse(q: DataFrame): Unit = {
    val s = q.queryExecution.optimizedPlan.toString + "\n" +
      q.queryExecution.executedPlan.toString
    assert(!s.contains("get_json_object") && !s.contains("GetJsonObject"),
      s"JSON string extraction survived into the plan:\n$s")
    assert(!s.contains("parse_json") && !s.contains("ParseJson"),
      s"a query-time JSON parse survived into the plan:\n$s")
  }

  test("ingest writes SHREDDED variant files; extraction reads typed leaves, no JSON parse") {
    val (wh, root) = mkWarehouse("varshred")
    wh.create("t", schema)
    wh.append("t", batch(0, 500))

    // the written parquet physically carries the shredded group:
    // props = { metadata, value, typed_value { k..., tag... } }
    val file = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "t"))
      .iterator().asScala.find(_.toString.endsWith(".parquet")).get
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri),
        spark.sessionState.newHadoopConf()))
    val msg = try footer.getFooter.getFileMetaData.getSchema.toString finally footer.close()
    assert(msg.contains("typed_value"), s"expected a shredded variant group, footer schema:\n$msg")
    assert(msg.contains("metadata") && msg.contains("props"), msg)

    // extraction on the load path: values exact, variant replaced by a
    // struct of requested fields in the scan schema (pushdown fired), and
    // no JSON parse anywhere in the plan
    val q = wh.load("t")
      .select(col("id"), variant_get(col("props"), "$.k", "long").as("k"))
      .filter(col("id") < 5).orderBy("id")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      (0L until 5L).map(i => (i, i * 10)))
    assertNoJsonParse(q)
    assert(propsPushedToStruct(q),
      s"pushdown should rewrite variant -> struct-of-requested-fields:\n" +
        q.queryExecution.executedPlan.toString)
  }

  test("DSv2 SQL face: variant extraction pushes into the catalog scan") {
    val (wh, root) = mkWarehouse("varsql")
    spark.conf.set("spark.sql.catalog.vsq", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vsq.root", root)
    wh.create("t", schema)
    wh.append("t", batch(0, 300))

    val q = spark.sql(
      "SELECT sum(variant_get(props, '$.k', 'long')) AS s FROM vsq.t WHERE id < 100")
    assert(q.collect().head.getLong(0) == (0L until 100L).map(_ * 10).sum)
    assertNoJsonParse(q)
    assert(propsPushedToStruct(q),
      s"DSv2 variant pushdown should rewrite the scan schema:\n" +
        q.queryExecution.executedPlan.toString)
  }

  test("get_json_object face on variant: same answers as the string era, null on missing") {
    val (wh, root) = mkWarehouse("varcompat")
    spark.conf.set("spark.sql.catalog.vcp", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vcp.root", root)
    wh.create("t", schema)
    wh.append("t", batch(0, 50, withNull = true))

    // scalar long renders as its literal text; string unquoted; missing
    // path and null variant both null — get_json_object's contract
    val rows = spark.sql(
      """SELECT id, get_json_object(props, '$.k') AS k,
        |       get_json_object(props, '$.tag') AS tag,
        |       get_json_object(props, '$.absent') AS missing
        |FROM vcp.t ORDER BY id""".stripMargin).collect()
    assert(rows.take(3).map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq ==
      Seq(("0", "t0", null), ("10", "t1", null), ("20", "t2", null)))
    assert(rows.last.getString(1) == null, "null variant must extract to null")

    // and the compat face is the PUSHED form, not a per-row JSON parse
    val q = spark.sql("SELECT get_json_object(props, '$.k') AS k FROM vcp.t WHERE id < 10")
    assertNoJsonParse(q)
    assert(propsPushedToStruct(q),
      "compat-rewritten extraction should still push into the scan:\n" +
        q.queryExecution.executedPlan.toString)

    // strings stay on the V1 contract: no rewrite, no breakage
    val sdf = spark.createDataFrame(
      Seq(Row(1L, """{"k": 7}""")).asJava,
      StructType(Seq(StructField("id", LongType), StructField("js", StringType))))
    sdf.createOrReplaceTempView("plain_json")
    assert(spark.sql("SELECT get_json_object(js, '$.k') FROM plain_json")
      .collect().head.getString(0) == "7")
  }

  test("wildcard get_json_object paths stay unrewritten (variant_get grammar guard)") {
    val (wh, root) = mkWarehouse("varwild")
    spark.conf.set("spark.sql.catalog.vwd", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vwd.root", root)
    wh.create("t", schema)
    wh.append("t", batch(0, 5))
    // '$.a[*].b' is get_json_object grammar variant_get rejects — the
    // compat rule must leave it alone so the REAL mismatch (variant input
    // to get_json_object) surfaces, not an INVALID_VARIANT_GET path error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT get_json_object(props, '$.a[*].b') FROM vwd.t").collect()
    }
    assert(!e.getMessage.contains("INVALID_VARIANT_GET"), e.getMessage)
    assert(e.getMessage.contains("DATATYPE_MISMATCH") ||
      e.getMessage.toLowerCase.contains("get_json_object"), e.getMessage)
    // a plain path on the same table still rewrites and serves
    assert(spark.sql("SELECT get_json_object(props, '$.k') AS k FROM vwd.t WHERE id = 2")
      .collect().head.getString(0) == "20")
  }

  test("diffRows across a variant column RENAME aligns each side's proxy") {
    val (wh, _) = mkWarehouse("vardiffren")
    wh.create("t", schema)
    wh.append("t", batch(0, 5))
    val v0 = wh.currentVersion("t")
    wh.renameColumn("t", "props", "attrs")
    wh.append("t", batch(5, 3).withColumnRenamed("props", "attrs"))
    val vHead = wh.currentVersion("t")
    // per-side proxy: the from side's variant column is still named props —
    // proxying it under the to side's name would ADD a column and fail on
    // set-op arity; carried rows must cancel by VALUE across the rename
    val (added, removed) = wh.diffRows("t", v0, vHead)
    assert(removed.count() == 0, "rename alone must not fabricate removals")
    assert(added.columns.toSeq == Seq("id", "attrs"))
    assert(added.select(variant_get(col("attrs"), "$.k", "long")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(50L, 60L, 70L))
  }

  test("field-id discipline: RENAME keeps serving old shredded files; ADD null-fills; conform") {
    val (wh, _) = mkWarehouse("varevolve")
    wh.create("t", schema)
    wh.append("t", batch(0, 20))
    wh.renameColumn("t", "props", "payload")
    wh.append("t", batch(20, 20).withColumnRenamed("props", "payload"))

    // both eras serve under the new name, by field id, shredded
    val q = wh.load("t")
      .select(col("id"), variant_get(col("payload"), "$.k", "long").as("k"))
      .orderBy("id")
    assert(q.collect().map(_.getLong(1)).toSeq == (0L until 40L).map(_ * 10))
    assertNoJsonParse(q)

    // a later variant column null-fills history
    wh.addColumns("t", Seq(StructField("extra", VariantType)))
    val withExtra = wh.load("t").select(col("id"),
      col("extra").isNull.as("no_extra")).orderBy("id")
    assert(withExtra.collect().forall(_.getBoolean(1)))

    // conform: a batch MISSING the variant column null-fills it (the
    // append-side schema contract, unchanged by the new type)
    val idOnly = spark.createDataFrame(
      Seq(Row(100L)).asJava, StructType(Seq(StructField("id", LongType))))
    val conformed = graft.schema.SchemaOps.conform(idOnly, wh.currentManifest("t").schema)
    assert(conformed.schema("payload").dataType.isInstanceOf[VariantType])
    assert(conformed.collect().head.isNullAt(1))

    // widen keeps VARIANT (never degrades back to a string parse)
    assert(graft.schema.SchemaOps.widen(VariantType).isInstanceOf[VariantType])
  }

  test("CDC composes: the change feed bags variant rows by canonical JSON and restores them") {
    val (wh, root) = mkWarehouse("varcdc")
    wh.create("t", schema)
    def b(rows: Seq[(Long, String)]): DataFrame = spark.createDataFrame(
      rows.map { case (i, js) => Row(i, js) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("props", StringType))))
      .select(col("id"), parse_json(col("props")).as("props"))
    // the proxy must keep a variant STRING "5" distinct from a variant
    // NUMBER 5 — id 4 flips between them and must surface as a change
    wh.append("t", b(Seq(1L -> """{"k": 1}""", 2L -> """{"k": 2}""",
      4L -> """{"k": "5"}""")))
    wh.morMerge("t", b(Seq(2L -> """{"k": 20}""", 3L -> """{"k": 3}""",
      4L -> """{"k": 5}""")), Seq("id"))

    val ch = wh.readChanges("t", 1, 2)
    assert(ch.schema("props").dataType.isInstanceOf[VariantType],
      "the emitted feed must restore VARIANT, not leak the JSON proxy")
    val got = ch.select(col("id"), col("_change_type"),
        get_json_object(col("props"), "$.k").as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(got == Seq((2L, "+I", "20"), (2L, "-D", "2"), (3L, "+I", "3"),
      (4L, "+I", "5"), (4L, "-D", "5")), got.toString)
    // ...and the string-vs-number identity is PRESERVED, not collapsed
    val types = ch.filter(col("id") === 4)
      .select(col("_change_type"), expr("schema_of_variant(props)").as("s"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(types == Seq(("+I", "OBJECT<k: BIGINT>"), ("-D", "OBJECT<k: STRING>")),
      types.toString)

    // the $changes SQL face (staged windows) serves the same bag
    spark.conf.set("spark.sql.catalog.vcd", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vcd.root", root)
    val sqlCh = spark.read.option("from-version", 1).option("to-version", 2)
      .table("vcd.`t$changes`")
      .select(col("id"), col("_change_type"),
        get_json_object(col("props"), "$.k").as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(sqlCh == got, s"$sqlCh != $got")

    // update pre/post-images pair by the morMerge's own key columns
    val imgs = wh.readChangesWithImages("t", 1, 2)
      .select(col("id"), col("_change_type"),
        get_json_object(col("props"), "$.k").as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(imgs == Seq((2L, "+U", "20"), (2L, "-U", "2"), (3L, "+I", "3"),
      (4L, "+U", "5"), (4L, "-U", "5")), imgs.toString)
  }

  test("MOR overlay composes: deletes and upserts over a variant table stay exact") {
    val (wh, _) = mkWarehouse("varmor")
    wh.create("t", schema)
    wh.append("t", batch(0, 100))
    wh.deleteWhere("t", col("id") % 10 === 0)
    wh.morMerge("t", batch(3, 1).withColumn("props",
      parse_json(lit("""{"k": -1, "tag": "upd"}"""))), Seq("id"))

    val rows = wh.load("t")
      .select(col("id"), variant_get(col("props"), "$.k", "long").as("k"))
      .orderBy("id").collect()
    assert(rows.length == 90)
    assert(!rows.exists(_.getLong(0) % 10 == 0), "deleteWhere rows must not resurrect")
    assert(rows.find(_.getLong(0) == 3L).get.getLong(1) == -1L,
      "the upserted variant payload must win")
    assert(rows.find(_.getLong(0) == 7L).get.getLong(1) == 70L)
  }
}
