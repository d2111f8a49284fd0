package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.{PartitionTransforms, Warehouse}

/** Hidden partitioning (Iceberg partition transforms): declared once at
  * create, writes cluster by the transform value and record per-file
  * transform bounds, scans prune from predicates on the SOURCE column —
  * `WHERE ts BETWEEN ...` reads only matching files, `WHERE id = k` reads
  * only `k`'s hash bucket, with the query never mentioning the layout.
  */
class PartitionTransformSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val root = {
    val dir = tmpDir("graft-pt")
    spark.conf.set("spark.sql.catalog.gpt", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gpt.root", dir)
    dir
  }
  private lazy val wh = { root; new Warehouse(spark, root) }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("v", StringType)))

  private def batch(day: String, ids: Range): DataFrame = {
    val rows = ids.map(i => Row(i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse(s"${day}T0${i % 10}:00:00Z")), s"v$i"))
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Scanned-file count from the pruning label in the plan ("all" = rule
    * did not prune; the physical tree nests AQE stages, so assert on text).
    */
  private def scannedFiles(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan.toString
    "\\[(\\d+) files\\]".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("all")
  }

  test("days(ts): a ts range scan reads only the matching day's file") {
    wh.create("pt_days", schema, Seq("days(ts)"))
    Seq("2020-01-01", "2020-01-02", "2020-01-03", "2020-01-04")
      .foreach(d => wh.append("pt_days", batch(d, 0 until 10).repartition(1)))
    assert(wh.dataFiles("pt_days").size == 4)
    // transform bounds only — no raw ts stats were requested, so any
    // pruning below is provably the days(ts) projection
    assert(wh.dataFiles("pt_days").flatMap(_.stats.keys).toSet == Set("days(ts)"))

    val q = spark.sql("SELECT id, v FROM gpt.pt_days " +
      "WHERE ts BETWEEN timestamp'2020-01-02 00:00:00' AND timestamp'2020-01-02 23:59:59'")
    assert(scannedFiles(q) == "1", q.queryExecution.executedPlan.toString)
    assert(q.count() == 10)
    // correctness vs the unpruned table scan
    val want = wh.load("pt_days")
      .filter(col("ts").between(lit("2020-01-02 00:00:00").cast("timestamp"),
        lit("2020-01-02 23:59:59").cast("timestamp"))).count()
    assert(want == 10)
  }

  test("months(ts) inclusive projection: >= keeps the boundary month, drops earlier ones") {
    wh.create("pt_months", schema, Seq("months(ts)"))
    Seq("2020-01-15", "2020-02-15", "2020-03-15", "2020-04-15")
      .foreach(d => wh.append("pt_months", batch(d, 0 until 5).repartition(1)))
    // mid-March cut: January + February files drop; March (same transform
    // value as the literal — `>` relaxes to `>=`) and April stay
    val q = spark.sql(
      "SELECT count(*) AS n FROM gpt.pt_months WHERE ts > timestamp'2020-03-20 00:00:00'")
    assert(scannedFiles(q) == "2", q.queryExecution.executedPlan.toString)
    assert(q.head().getLong(0) == 5) // only April rows actually match
  }

  test("bucket(4,id): equality prunes to the key's hash bucket — power raw min/max cannot have") {
    wh.create("pt_bucket", schema, Seq("bucket(4,id)"))
    wh.append("pt_bucket", batch("2021-06-01", 0 until 100))
    val files = wh.dataFiles("pt_bucket")
    assert(files.size > 1, s"need multiple files, got ${files.size}")
    assert(files.flatMap(_.stats.keys).toSet == Set("bucket(4,id)"))

    val q = spark.sql("SELECT id, v FROM gpt.pt_bucket WHERE id = 7")
    val scanned = scannedFiles(q)
    assert(scanned != "all" && scanned.toInt < files.size,
      s"expected bucket pruning, scanned $scanned of ${files.size}")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(7L))

    // IN list: each value prunes independently, union of buckets
    val q2 = spark.sql("SELECT id FROM gpt.pt_bucket WHERE id IN (7, 8)")
    assert(q2.collect().map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L))
  }

  test("truncate(2,v) strings: equality and range prune by prefix bounds") {
    val s2 = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    wh.create("pt_trunc", s2, Seq("truncate(2,v)"))
    val rows = (0 until 40).map(i => Row(i.toLong, f"${('a' + i % 4).toChar}x$i%02d"))
    wh.append("pt_trunc", spark.createDataFrame(rows.asJava, s2))
    val files = wh.dataFiles("pt_trunc")
    assert(files.size > 1)
    val q = spark.sql("SELECT id FROM gpt.pt_trunc WHERE v = 'cx02'")
    val scanned = scannedFiles(q)
    assert(scanned != "all" && scanned.toInt < files.size)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("SQL DDL: CREATE TABLE ... PARTITIONED BY lands the spec; INSERTs prune") {
    spark.sql("CREATE TABLE gpt.pt_sql (id BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (days(ts), bucket(4, id))")
    assert(wh.partitionSpec("pt_sql") == Seq("days(ts)", "bucket(4,id)"))
    spark.sql("INSERT INTO gpt.pt_sql VALUES " +
      "(1, timestamp'2022-05-01 08:00:00', 'a'), (2, timestamp'2022-05-02 08:00:00', 'b')")
    spark.sql("INSERT INTO gpt.pt_sql VALUES (3, timestamp'2022-05-03 08:00:00', 'c')")
    assert(wh.dataFiles("pt_sql").forall(f =>
      f.stats.contains("days(ts)") && f.stats.contains("bucket(4,id)")))
    val q = spark.sql(
      "SELECT id FROM gpt.pt_sql WHERE ts >= timestamp'2022-05-03 00:00:00'")
    assert(scannedFiles(q) != "all")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("merge on a partitioned table keeps collecting transform bounds; scans stay correct") {
    wh.create("pt_merge", schema, Seq("days(ts)"))
    wh.append("pt_merge", batch("2023-01-01", 0 until 10).repartition(1), Nil, Nil)
    wh.append("pt_merge", batch("2023-01-02", 10 until 20).repartition(1), Nil, Nil)
    // upsert five rows of day 2 + one new day-3 row
    val up = batch("2023-01-02", 10 until 15)
      .unionByName(batch("2023-01-03", 20 until 21))
    wh.merge("pt_merge", up, Seq("id"))
    assert(wh.dataFiles("pt_merge").forall(_.stats.contains("days(ts)")),
      wh.dataFiles("pt_merge").map(_.stats.keys).mkString("; "))
    val q = spark.sql("SELECT count(*) AS n FROM gpt.pt_merge " +
      "WHERE ts BETWEEN timestamp'2023-01-02 00:00:00' AND timestamp'2023-01-02 23:59:59'")
    assert(q.head().getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM gpt.pt_merge").head().getLong(0) == 21)
  }

  test("spec validation: bad transforms fail at create, loudly") {
    intercept[IllegalArgumentException](
      wh.create("pt_bad1", schema, Seq("bucket(0,id)")))
    intercept[IllegalArgumentException](
      wh.create("pt_bad2", schema, Seq("days(nope)")))
    intercept[IllegalArgumentException](
      wh.create("pt_bad3", schema, Seq("hours(v)"))) // hours of a string
    intercept[IllegalArgumentException](
      wh.create("pt_bad4", schema, Seq("frobnicate(ts)")))
  }

  test("non-UTC session: write-side bounds still agree with the UTC projection") {
    // 2020-01-02T01:00:00Z is still 2020-01-01 in America/Los_Angeles. A
    // write side built on session-tz to_date()/year() would record epoch day
    // 18262 while the prune side projects 18263 → the file with the matching
    // row is silently dropped. Pure-epoch arithmetic on both sides keeps them
    // bit-identical whatever the session tz is.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      wh.create("pt_tz", schema, Seq("days(ts)"))
      val rows = Seq(Row(1L, java.sql.Timestamp.from(
        java.time.Instant.parse("2020-01-02T01:00:00Z")), "v1"))
      wh.append("pt_tz", spark.createDataFrame(rows.asJava, schema).repartition(1))
      // recorded transform bound == prune-side projection for the same instant
      val stats = wh.dataFiles("pt_tz").head.stats("days(ts)")
      assert(stats.min == "18263" && stats.max == "18263", stats)
      val q = spark.sql("SELECT id FROM gpt.pt_tz " +
        "WHERE ts = timestamp'2020-01-02 01:00:00 UTC'")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(1L))
      // months under non-UTC: boundary instant lands in the UTC month
      wh.create("pt_tz_m", schema, Seq("months(ts)"))
      wh.append("pt_tz_m", spark.createDataFrame(Seq(Row(2L, java.sql.Timestamp.from(
        java.time.Instant.parse("2020-03-01T02:00:00Z")), "v2")).asJava, schema)
        .repartition(1))
      val mstats = wh.dataFiles("pt_tz_m").head.stats("months(ts)")
      assert(mstats.min == "602" && mstats.max == "602", mstats) // (2020-1970)*12 + 2
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("$partitions metadata table: per-transform-value rollup from manifest stats") {
    wh.create("pt_meta", schema, Seq("days(ts)"))
    Seq("2020-01-01", "2020-01-02")
      .foreach(d => wh.append("pt_meta", batch(d, 0 until 10).repartition(1)))
    wh.append("pt_meta", batch("2020-01-01", 10 until 15).repartition(1))
    val out = spark.sql(
      "SELECT partition['days(ts)'] AS day, file_count, row_count " +
        "FROM gpt.`pt_meta$partitions` ORDER BY day").collect()
    // epoch days: 2020-01-01 = 18262, 2020-01-02 = 18263
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("18262", 2L, 15L), ("18263", 1L, 10L)))
    // zero data IO: the rollup must come from the manifest, not a scan
    val plan = spark.sql("SELECT * FROM gpt.`pt_meta$partitions`")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") || plan.contains("LocalScan"), plan)
  }

  test("expireSnapshots sweeps hive-split layouts correctly: old files go, live data survives") {
    // partitioned writes nest parquet under __graft_p0=v/ dirs; the orphan
    // sweep must WALK them — a non-recursive listing would see zero parquets
    // in a live dir and wholesale-delete it (the r11 regression this pins)
    val root = tmpDir("pt-expire")
    val wh = new graft.sink.Warehouse(spark, root)
    val d1 = spark.range(0, 40).selectExpr("id", "cast(id % 4 as int) as g")
    wh.create("t", d1.schema, Seq("bucket(4,id)"))
    wh.append("t", d1)
    wh.replace("t", d1.filter(org.apache.spark.sql.functions.col("id") < 20)) // v1 files now dead
    val before = wh.load("t").collect().toSet
    wh.expireSnapshots("t", keepLast = 1, orphanGraceMs = 0L)
    assert(wh.load("t").collect().toSet == before)
    assert(wh.load("t").count() == 20)
    // v1's replaced files actually swept despite living one dir level down
    val td = java.nio.file.Paths.get(root, "t")
    val stray = {
      val s = java.nio.file.Files.walk(td)
      try {
        import scala.jdk.CollectionConverters._
        val live = wh.currentManifest("t").files.map(_.path).toSet
        s.iterator().asScala.filter(p => p.toString.endsWith(".parquet"))
          .map(p => td.relativize(p).toString).filterNot(live).toList
      } finally s.close()
    }
    assert(stray.isEmpty, s"unreferenced parquet files survived the sweep: $stray")
  }

  test("projection unit checks: literal side matches the column side, bit for bit") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // days: micros floor-division == unix_date(to_date(ts)) under UTC
    val ts = java.time.Instant.parse("2020-01-02T23:59:59Z")
    val us = ts.getEpochSecond * 1000000L
    val lit = Literal(us, TimestampType)
    val Some(("n", "=", d)) = PartitionTransforms.project("days(ts)", "ts", "=", lit)
    val colSide = spark.sql("SELECT unix_date(to_date(timestamp'2020-01-02 23:59:59'))")
      .head().getInt(0)
    assert(d.toInt == colSide)
    // bucket: Murmur3Hash(literal) == hash(col)
    val idLit = Literal(7L, LongType)
    val Some(("n", "=", b)) = PartitionTransforms.project("bucket(4,id)", "id", "=", idLit)
    val colBucket = spark.sql("SELECT pmod(hash(7L), 4)").head().getInt(0)
    assert(b.toInt == colBucket)
    // relax: < becomes <= in the transform domain; different column → None
    val Some((_, "<=", _)) = PartitionTransforms.project("days(ts)", "ts", "<", lit)
    assert(PartitionTransforms.project("days(ts)", "other", "=", lit).isEmpty)
    // bucket never projects ranges
    assert(PartitionTransforms.project("bucket(4,id)", "id", "<", idLit).isEmpty)
  }
}
