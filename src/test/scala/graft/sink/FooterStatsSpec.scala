package graft.sink

import java.nio.file.Paths

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Property pin for the footer-derived write stats (`Warehouse.writeData`):
  * the manifest a commit produces from parquet FOOTERS (+ hive partition
  * dirs) must be BIT-IDENTICAL — same row counts, same stat keys, same
  * rendered min/max strings, same "z" markers, same dropped columns — to
  * the one the legacy full grouped scan (`fileFactsViaScan`, kept as the
  * fallback) would produce. Covers every stat kind, nulls, all-null
  * columns, unicode/empty/oversized strings, NaN/±Inf/-0.0 floats, narrow
  * and wide decimals, pre-1970 timestamps, and hive-split nested paths
  * (including null partition values) across append/merge/morMerge/
  * deleteWhere/compact commits.
  */
class FooterStatsSpec extends graft.SparkSpec {
  import scala.jdk.CollectionConverters._

  /** Recompute every committed file's (rows, stats) with the scan oracle
    * and compare against the manifest writeData committed.
    */
  private def assertFooterEqualsScan(wh: Warehouse, root: String, name: String,
                                     wanted: Seq[String],
                                     checkNoMissingFiles: Boolean = false): Unit = {
    val man = wh.currentManifest(name)
    assert(man.files.nonEmpty, s"$name: no files to check")
    val scs = wh.statCols(man.schema, wanted)
    val td = Paths.get(root, name).toAbsolutePath.normalize
    val byDir = man.files.groupBy(_.path.split('/').head)
    val oracle: Map[String, (Long, Map[String, ColStat])] =
      byDir.keys.flatMap(d => wh.fileFactsViaScan(td.resolve(d), man.schema, scs, td)).toMap
    man.files.foreach { f =>
      val (rows, stats) = oracle.getOrElse(f.path, fail(s"${f.path}: not seen by scan oracle"))
      assert(f.rows == rows, s"${f.path}: rows ${f.rows} != scan $rows")
      // reserved pseudo-stats (sort marker, lineage-materialization marker)
      // are commit-path metadata, not column stats — the scan oracle never
      // produces them
      val colStats = f.stats.view.filterKeys(!_.startsWith("__graft_")).toMap
      // auto-discovered vget keys (undeclared shredded-leaf stats) are
      // ADDITIVE: the declared keys must match the scan bit-for-bit, and
      // every auto key that IS recorded must equal what the scan would
      // have produced for the same key — footer-proven never diverges
      val autoKeys = colStats.keySet.filterNot(stats.keySet)
      assert(autoKeys.forall(k => VariantStats.parseKey(k).nonEmpty),
        s"${f.path}: non-vget extras: $autoKeys")
      assert(colStats.view.filterKeys(!autoKeys(_)).toMap == stats,
        s"${f.path}:\n  footer: ${colStats.toSeq.sortBy(_._1)}\n  scan:   ${stats.toSeq.sortBy(_._1)}")
      if (autoKeys.nonEmpty) {
        val autoScs = wh.statCols(man.schema, autoKeys.toSeq.sorted)
        val dir = td.resolve(f.path.split('/').head)
        val rescan = wh.fileFactsViaScan(dir, man.schema, autoScs, td)
          .getOrElse(f.path, fail(s"${f.path}: auto-key rescan missed the file"))._2
        autoKeys.foreach(k => assert(colStats.get(k) == rescan.get(k),
          s"${f.path}: auto stat $k: footer ${colStats.get(k)} != scan ${rescan.get(k)}"))
      }
    }
    // and (append-only histories: no superseded files linger in shared
    // dirs) no file the oracle saw is missing from the manifest — 0-row
    // files excepted, neither path records them
    if (checkNoMissingFiles) oracle.foreach { case (p, (rows, _)) =>
      assert(rows == 0L || man.files.exists(_.path == p), s"$p: in scan oracle, not in manifest")
    }
  }

  private val kitchenSchema = StructType(Seq(
    StructField("s", StringType), StructField("b", ByteType),
    StructField("sh", ShortType), StructField("i", IntegerType),
    StructField("l", LongType), StructField("f", FloatType),
    StructField("d", DoubleType), StructField("dec", DecimalType(9, 2)),
    StructField("wide", DecimalType(25, 6)), StructField("ts", TimestampType),
    StructField("dt", DateType), StructField("bool", BooleanType),
    StructField("allnull", StringType)))
  private val kitchenCols = kitchenSchema.fieldNames.toSeq

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def dt(s: String) = java.sql.Date.valueOf(s)
  private def dec(s: String) = new java.math.BigDecimal(s)

  private def kitchenRows: Seq[Row] = Seq(
    Row("alpha", 1.toByte, 10.toShort, 100, 1000L, 1.5f, 2.5d, dec("12.34"),
      dec("1234567890123456789.123456"), ts("2024-03-01 10:00:00.123456"),
      dt("2024-03-01"), true, null),
    Row("Ωmega🦓", (-5).toByte, (-10).toShort, -100, -1000L, -0.0f, 0.0d,
      dec("-99.99"), dec("-0.000001"), ts("1969-12-31 23:00:00"),
      dt("1969-06-01"), false, null),
    Row("", 0.toByte, 0.toShort, 0, 0L, Float.NaN, Double.PositiveInfinity,
      dec("0.00"), dec("0.000000"), ts("2024-03-02 00:00:00"),
      dt("2024-03-02"), null, null),
    Row("z" * 300, null, null, null, null, null, null, null, null, null, null,
      null, null),
    Row(null, 7.toByte, 7.toShort, 7, 7L, 7.5f, -7.5d, dec("7.77"),
      dec("7.000007"), ts("2030-01-01 01:02:03"), dt("2030-01-01"), true, null))

  test("footer stats == scan stats: every type, nulls, NaN/Inf/-0.0, unicode, oversized strings") {
    val root = tmpDir("fs-kitchen")
    val wh = new Warehouse(spark, root)
    val df = spark.createDataFrame(kitchenRows.asJava, kitchenSchema)
    wh.append("t", df, statsCols = kitchenCols)
    assertFooterEqualsScan(wh, root, "t", kitchenCols, checkNoMissingFiles = true)
    // a second append (multiple files/dirs in one manifest) stays identical
    wh.append("t", df, statsCols = kitchenCols)
    assertFooterEqualsScan(wh, root, "t", kitchenCols, checkNoMissingFiles = true)
  }

  test("footer stats == scan stats across hive-split nested paths (partition transforms)") {
    val root = tmpDir("fs-part")
    val wh = new Warehouse(spark, root)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("cat", StringType),
      StructField("ts", TimestampType), StructField("v", DoubleType)))
    wh.create("t", schema, Seq("days(ts)", "bucket(4,id)", "truncate(2,cat)"))
    val rows = Seq(
      Row(1L, "apple", ts("2024-01-01 05:00:00"), 1.0),
      Row(2L, "apricot", ts("2024-01-01 23:59:59"), 2.0),
      Row(3L, "banana", ts("2024-01-03 00:00:00"), 3.0),
      Row(4L, null, ts("2024-01-03 12:00:00"), 4.0),       // null truncate value
      Row(5L, "", ts("2024-01-04 00:00:00"), 5.0),          // EMPTY string: hive default dir too
      Row(6L, "cherry", null, 6.0),                          // null days value
      Row(null, "date", ts("1969-01-05 00:00:00"), null))    // null bucket, pre-1970 days
    val wanted = Seq("id", "cat", "ts", "v", "days(ts)", "bucket(4,id)", "truncate(2,cat)")
    wh.append("t", spark.createDataFrame(rows.asJava, schema), statsCols = Seq("id", "cat", "ts", "v"))
    assertFooterEqualsScan(wh, root, "t", wanted)
    // merge rewrites + re-clusters under the spec; stats must stay identical
    wh.merge("t", spark.createDataFrame(Seq(
      Row(2L, "avocado", ts("2024-01-02 01:00:00"), 20.0),
      Row(8L, "berry", ts("2024-01-05 00:00:00"), 8.0)).asJava, schema), Seq("id"))
    assertFooterEqualsScan(wh, root, "t", wanted)
    // morMerge: data files + equality-delete key files in one commit
    wh.morMerge("t", spark.createDataFrame(Seq(
      Row(3L, "blueberry", ts("2024-01-06 00:00:00"), 30.0)).asJava, schema), Seq("id"))
    assertFooterEqualsScan(wh, root, "t", wanted)
  }

  test("footer stats == scan stats after deleteWhere and compact rewrites") {
    val root = tmpDir("fs-rewrite")
    val wh = new Warehouse(spark, root)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("g", StringType),
      StructField("ts", TimestampType)))
    wh.create("t", schema, Seq("bucket(2,id)"))
    val rows = (1L to 40L).map(i =>
      Row(i, if (i % 7 == 0) null else s"g${i % 3}",
        ts(f"2024-02-${(i % 28 + 1)}%02d 00:00:00")))
    wh.append("t", spark.createDataFrame(rows.asJava, schema), statsCols = Seq("id", "g", "ts"))
    wh.append("t", spark.createDataFrame(rows.take(10).asJava, schema), statsCols = Seq("id", "g", "ts"))
    val wanted = Seq("id", "g", "ts", "bucket(2,id)")
    wh.deleteWhere("t", col("id") > 35L)
    assertFooterEqualsScan(wh, root, "t", wanted)
    wh.compact("t")
    assertFooterEqualsScan(wh, root, "t", wanted)
  }

  test("footer stats == scan stats for variant-path (vget) keys") {
    val root = tmpDir("fs-vget")
    val wh = new Warehouse(spark, root)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("props", org.apache.spark.sql.types.VariantType)))
    val vKeys = Seq("vget(props,$.k,long)", "vget(props,$.tag,string)",
      "vget(props,$.x,double)", "vget(props,$.ghost,long)")
    def vbatch(rows: Seq[(Long, String)]): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(rows.map { case (i, js) => Row(i, js) }.asJava,
        StructType(Seq(StructField("id", LongType), StructField("props", StringType))))
        .select(org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.parse_json(
            org.apache.spark.sql.functions.col("props")).as("props"))
    wh.create("t", schema)
    // CLEAN batch (footer-provable: every field shreds typed, residuals
    // empty): long bounds + nulls (row 3 lacks k), string bounds, double
    // with -0.0, and `ghost` never present (AllNull -> "z")
    wh.append("t", vbatch(Seq(
      1L -> """{"k": 10, "tag": "alpha", "x": -0.0}""",
      2L -> """{"k": -5, "tag": "Ωmega🦓", "x": 7.25}""",
      3L -> """{"tag": "zzz", "x": 0.0}""")), statsCols = vKeys)
    assertFooterEqualsScan(wh, root, "t", vKeys)
    // DIRTY batch (footer must REFUSE, scan must serve): k as a string
    // ("7" -> field residual non-null: try-long still extracts 7 at query
    // time), a non-object row (top-level residual), and a null variant
    wh.append("t", vbatch(Seq(
      4L -> """{"k": "7", "tag": "beta"}""",
      5L -> """[1, 2, 3]""",
      6L -> null)))
    assertFooterEqualsScan(wh, root, "t", vKeys)
    // and the dirty batch's k stat really carries the try-extracted 7
    val dirty = wh.currentManifest("t").files
      .filter(_.stats.get("vget(props,$.k,long)").exists(_.kind == "n"))
      .flatMap(_.stats.get("vget(props,$.k,long)"))
    // (batches may split across files — check the value COVER, not layout)
    assert(dirty.map(st => BigDecimal(st.min)).min == BigDecimal(-5), dirty.toString)
    assert(dirty.map(st => BigDecimal(st.max)).max == BigDecimal(10), dirty.toString)
    assert(dirty.exists(st => st.min == "7" && st.max == "7"),
      s"the string-typed k must try-extract as 7 through the scan fallback: $dirty")

    // OBJECT-typed field: the shredded typed_value is a GROUP (no leaf at
    // the exact path) — the footer must refuse, NOT claim all-null: a
    // STRING-typed extraction of an object yields its JSON text, so a "z"
    // stat would wrongly prune IS NOT NULL / equality. Parity (above
    // harness) plus an explicit not-z pin on the string key.
    wh.append("t", vbatch(Seq(
      7L -> """{"k": {"nested": 1}, "tag": "gamma"}""",
      8L -> """{"k": {"nested": 2}, "tag": "delta"}""")))
    assertFooterEqualsScan(wh, root, "t", vKeys)
    val objFiles = wh.currentManifest("t").files
      .filter(_.stats.get("vget(props,$.tag,string)").exists(st =>
        st.kind == "s" && (st.min == "gamma" || st.min == "delta")))
    assert(objFiles.nonEmpty, "object-batch files not found")
    objFiles.foreach { f =>
      val kst = f.stats.get("vget(props,$.k,string)")
      assert(kst.forall(_.kind != "z"),
        s"object-valued k claimed all-null under a string key: $kst")
    }
  }
}
