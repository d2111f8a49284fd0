package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.{BloomIndex, Warehouse}

/** Per-file Bloom sidecar index ([[graft.sink.BloomIndex]] +
  * `Warehouse.buildBloomIndex` + the `=`/`IN` consult in
  * `ManifestPruneRule`): point lookups on a high-cardinality key the table
  * is NOT clustered by — the case where every file's (min, max) spans the
  * whole domain and range stats prune nothing — plan only the files whose
  * filter might contain the value, and answers stay exactly equal to the
  * raw scan (no false negatives by construction).
  */
class BloomIndexSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("h", StringType), StructField("n", LongType)))

  /** md5-keyed rows: key ranges of every batch overlap almost entirely. */
  private def batch(lo: Long, hi: Long): DataFrame = {
    val rows = (lo until hi).map(i => Row(null: String, i))
    spark.createDataFrame(rows.asJava, schema)
      .withColumn("h", md5(col("n").cast("string")))
  }

  // scannedFiles: shared in SparkSpec

  private def md5Of(n: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(n.toString.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("point lookups prune to the owning file; answers equal the raw scan") {
    val root = tmpDir("bloom-pt")
    spark.conf.set("spark.sql.catalog.blm", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blm.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", StructType(schema.fields.map(_.copy(nullable = true))))
    // 4 appends, single file each; md5 keys overlap across all files
    for (b <- 0 until 4)
      wh.append("t", batch(b * 200L, b * 200L + 200L).coalesce(1), statsCols = Seq("h", "n"))
    val man = wh.currentManifest("t")
    assert(man.files.size >= 4)
    val written = wh.buildBloomIndex("t", Seq("h"))
    assert(written == man.files.size, s"one sidecar per file, wrote $written")
    // range stats CANNOT prune these lookups (premise): every file's h-range
    // spans the probe
    val probe = md5Of(377L) // lives in batch 1's file only
    val q = spark.sql(s"SELECT n FROM blm.t WHERE h = '$probe'")
    assert(scannedFiles(q, man.files.size) == 1,
      s"bloom must prune to the owning file:\n${q.queryExecution.executedPlan}")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(377L))
    // absent key: all files prune, zero rows
    val none = spark.sql(s"SELECT n FROM blm.t WHERE h = '${md5Of(999999L)}'")
    assert(scannedFiles(none, man.files.size) == 0 || none.count() == 0L)
    assert(none.count() == 0L)
    // IN over keys from two files → exactly those two files
    val in2 = spark.sql(
      s"SELECT n FROM blm.t WHERE h IN ('${md5Of(5L)}', '${md5Of(605L)}') ORDER BY n")
    assert(scannedFiles(in2, man.files.size) == 2)
    assert(in2.collect().map(_.getLong(0)).toSeq == Seq(5L, 605L))
    // 12-element IN: OptimizeIn rewrites to InSet (threshold 10) — pruning
    // must survive the rewrite (the batch-point-lookup shape)
    val twelve = (0L until 12L).map(md5Of) // all live in batch 0's file
    val inSet = spark.sql(
      s"SELECT n FROM blm.t WHERE h IN (${twelve.map(k => s"'$k'").mkString(",")}) ORDER BY n")
    assert(scannedFiles(inSet, man.files.size) == 1,
      s"InSet lookups must still bloom-prune:\n${inSet.queryExecution.executedPlan}")
    assert(inSet.collect().map(_.getLong(0)).toSeq == (0L until 12L))
  }

  test("property: random lookups (present and absent) are scan-identical") {
    val root = tmpDir("bloom-prop")
    spark.conf.set("spark.sql.catalog.blmp", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blmp.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", StructType(schema.fields.map(_.copy(nullable = true))))
    for (b <- 0 until 3)
      wh.append("t", batch(b * 100L, b * 100L + 100L).coalesce(1), statsCols = Seq("h"))
    wh.buildBloomIndex("t", Seq("h"))
    val raw = wh.load("t")
    val rnd = new scala.util.Random(7L)
    for (_ <- 0 until 12) {
      val n = rnd.nextLong(600L) // half present, half absent
      val k = md5Of(n)
      val got = spark.sql(s"SELECT n FROM blmp.t WHERE h = '$k'")
        .collect().map(_.getLong(0)).toSeq.sorted
      val want = raw.filter(col("h") === k).select("n").collect().map(_.getLong(0)).toSeq.sorted
      assert(got == want, s"lookup $n ($k)")
    }
  }

  test("incremental build: only unindexed files are scanned; partial index stays correct") {
    val root = tmpDir("bloom-incr")
    spark.conf.set("spark.sql.catalog.blmi", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blmi.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", StructType(schema.fields.map(_.copy(nullable = true))))
    wh.append("t", batch(0L, 100L).coalesce(1), statsCols = Seq("h"))
    assert(wh.buildBloomIndex("t", Seq("h")) == wh.currentManifest("t").files.size)
    // PARTIAL index: new unindexed batch must still be READ by lookups
    wh.append("t", batch(100L, 200L).coalesce(1), statsCols = Seq("h"))
    val total = wh.currentManifest("t").files.size
    val k = md5Of(150L) // lives in the UNINDEXED batch
    val q = spark.sql(s"SELECT n FROM blmi.t WHERE h = '$k'")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(150L),
      "an unindexed file must never be pruned")
    // second build touches only the new files (sidecars are field-id-keyed)
    val man2 = wh.currentManifest("t")
    val hKey = BloomIndex.keyFor(man2.schema, "h")
    val before = man2.files
      .count(f => BloomIndex.exists(wh.resolvePath("t", f.path), hKey))
    val written = wh.buildBloomIndex("t", Seq("h"))
    assert(before + written == total)
    assert(wh.buildBloomIndex("t", Seq("h")) == 0, "fully indexed: re-run is a no-op")
  }

  test("skewed file sizes: each sidecar is sized from its own file's rows") {
    val root = tmpDir("bloom-skew")
    val wh = new Warehouse(spark, root)
    wh.create("t", StructType(schema.fields.map(_.copy(nullable = true))))
    // one big file and one tiny file in the SAME build pass
    wh.append("t", batch(0L, 50000L).coalesce(1), statsCols = Seq("h"))
    wh.append("t", batch(50000L, 50010L).coalesce(1), statsCols = Seq("h"))
    assert(wh.buildBloomIndex("t", Seq("h")) == 2)
    val man = wh.currentManifest("t")
    val key = BloomIndex.keyFor(man.schema, "h")
    def sidecarBytes(f: graft.sink.DataFile): Long =
      java.nio.file.Files.size(BloomIndex.sidecar(wh.resolvePath("t", f.path), key))
    val big = man.files.maxBy(_.rows)
    val tiny = man.files.minBy(_.rows)
    assert(tiny.rows < 100 && big.rows >= 50000)
    // per-size-class sizing: the tiny file must not inherit the big file's
    // filter size (the old global-max sizing made them equal)
    assert(sidecarBytes(tiny) * 50 < sidecarBytes(big),
      s"tiny=${sidecarBytes(tiny)}B big=${sidecarBytes(big)}B")
    // and both still answer exactly
    val inTiny = md5Of(50005L)
    val inBig = md5Of(777L)
    val raw = wh.load("t")
    for (k <- Seq(inTiny, inBig, md5Of(999999L))) {
      val got = raw.filter(col("h") === k).count()
      val expect = if (k == md5Of(999999L)) 0L else 1L
      assert(got == expect, s"lookup $k")
    }
  }

  test("SQL face: CALL graft.system.build_bloom_index builds and lookups prune") {
    val root = tmpDir("bloom-call")
    spark.conf.set("spark.sql.catalog.blmq", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blmq.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", StructType(schema.fields.map(_.copy(nullable = true))))
    for (b <- 0 until 3)
      wh.append("t", batch(b * 100L, b * 100L + 100L).coalesce(1), statsCols = Seq("h"))
    val out = spark.sql("CALL blmq.system.build_bloom_index(tbl => 't', cols => 'h')").head()
    assert(out.getInt(0) == wh.currentManifest("t").files.size)
    val total = wh.currentManifest("t").files.size
    val q = spark.sql(s"SELECT n FROM blmq.t WHERE h = '${md5Of(42L)}'")
    assert(scannedFiles(q, total) == 1)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(42L))
  }

  test("schema evolution: rename keeps the index serving; drop+re-add maps to a fresh key") {
    val root = tmpDir("bloom-evo")
    spark.conf.set("spark.sql.catalog.blme", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blme.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", StructType(schema.fields.map(_.copy(nullable = true))))
    for (b <- 0 until 3)
      wh.append("t", batch(b * 100L, b * 100L + 100L).coalesce(1), statsCols = Seq("h"))
    wh.buildBloomIndex("t", Seq("h"))
    val total = wh.currentManifest("t").files.size
    wh.renameColumn("t", "h", "hh")
    // sidecars are field-id-keyed: the rename is metadata-only for the
    // index too — lookups under the NEW name keep pruning with zero IO
    val q = spark.sql(s"SELECT n FROM blme.t WHERE hh = '${md5Of(142L)}'")
    assert(scannedFiles(q, total) == 1,
      s"renamed column must keep bloom pruning:\n${q.queryExecution.executedPlan}")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(142L))
    assert(wh.buildBloomIndex("t", Seq("hh")) == 0,
      "rename must not orphan the sidecars (re-build would rescan)")
    // DROP un-marks the column; a re-added same name gets a FRESH field id,
    // so the dropped column's sidecars are unreachable by construction
    val oldKey = BloomIndex.keyFor(wh.currentManifest("t").schema, "hh")
    wh.dropColumn("t", "hh")
    val dir = java.nio.file.Paths.get(root, "t").toString
    assert(!BloomIndex.indexedCols(dir).contains("hh"), "drop must un-mark the column")
    wh.addColumns("t", Seq(StructField("hh", StringType, nullable = true)))
    val newKey = BloomIndex.keyFor(wh.currentManifest("t").schema, "hh")
    assert(newKey != oldKey, s"re-added column must get a fresh sidecar key ($oldKey == $newKey)")
    // correctness: the re-added column is all-null; a stale consult would
    // still answer 0 rows here, but the marker no longer lists hh at all
    assert(spark.sql(s"SELECT n FROM blme.t WHERE hh = '${md5Of(1L)}'").count() == 0L)
  }

  test("compaction rewrites drop stale sidecars with their files; rebuilt index serves") {
    val root = tmpDir("bloom-compact")
    spark.conf.set("spark.sql.catalog.blmc", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.blmc.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", StructType(schema.fields.map(_.copy(nullable = true))))
    for (b <- 0 until 3)
      wh.append("t", batch(b * 50L, b * 50L + 50L).coalesce(1), statsCols = Seq("h"))
    wh.buildBloomIndex("t", Seq("h"))
    wh.compact("t")
    // new files are unindexed: lookups read them (correct), build re-indexes
    val k = md5Of(77L)
    assert(spark.sql(s"SELECT n FROM blmc.t WHERE h = '$k'")
      .collect().map(_.getLong(0)).toSeq == Seq(77L))
    val w = wh.buildBloomIndex("t", Seq("h"))
    assert(w == wh.currentManifest("t").files.size)
    assert(spark.sql(s"SELECT n FROM blmc.t WHERE h = '$k'")
      .collect().map(_.getLong(0)).toSeq == Seq(77L))
  }
}
