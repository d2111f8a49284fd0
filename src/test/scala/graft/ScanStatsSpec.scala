package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

import graft.sink.Warehouse

/** Manifest-exact planning statistics (`GraftParquetScan.estimateStatistics`):
  * every warehouse scan reports the manifest's exact row count and a
  * read-schema-width size to the planner, so broadcast decisions run on the
  * real number — not Spark's stock on-disk-bytes guess, which is compressed
  * and blind to column pruning. Composes with manifest file pruning.
  */
class ScanStatsSpec extends SparkSpec {

  private def freshCatalog(tag: String): (Warehouse, String) = {
    val root = tmpDir(s"graft-stats-$tag")
    spark.conf.set(s"spark.sql.catalog.$tag", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.root", root)
    (new Warehouse(spark, root), tag)
  }

  /** The (single) V2 scan relation's catalyst stats in df's optimized plan. */
  private def scanStats(df: DataFrame) = {
    val rels = df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r
    }
    assert(rels.size == 1, s"expected one V2 scan, got ${rels.size}")
    rels.head.stats
  }

  test("scan reports the manifest's EXACT row count (stock FileScan leaves it empty)") {
    val (wh, cat) = freshCatalog("rc")
    val df = spark.range(0, 1234).select(col("id").as("k"), (col("id") % 7).as("v"))
    wh.create("t", df.schema)
    wh.append("t", df.filter(col("k") < 600), statsCols = Seq("k"))
    wh.append("t", df.filter(col("k") >= 600), statsCols = Seq("k"))
    val st = scanStats(spark.table(s"$cat.t"))
    assert(st.rowCount.contains(BigInt(1234)))
    // size = rows x full row width (two longs)
    assert(st.sizeInBytes == BigInt(1234L * 16))
  }

  test("column pruning shrinks the size estimate to the READ schema's width") {
    val (wh, cat) = freshCatalog("cp")
    val df = spark.range(0, 500).select(col("id").as("k"),
      concat_ws("", Seq.fill(8)(md5(col("id").cast("string"))): _*).as("pad"))
    wh.create("t", df.schema)
    wh.append("t", df, statsCols = Seq("k"))
    val full = scanStats(spark.table(s"$cat.t"))
    val narrow = scanStats(spark.table(s"$cat.t").select("k"))
    assert(narrow.rowCount.contains(BigInt(500)))
    assert(narrow.sizeInBytes == BigInt(500L * 8))
    assert(narrow.sizeInBytes < full.sizeInBytes)
  }

  test("manifest file pruning shrinks the reported stats to the surviving files") {
    val (wh, cat) = freshCatalog("pr")
    val df = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("v"))
    wh.create("t", df.schema)
    wh.append("t", df.filter(col("k") < 500), statsCols = Seq("k"))
    wh.append("t", df.filter(col("k") >= 500), statsCols = Seq("k"))
    val pruned = scanStats(spark.table(s"$cat.t").filter(col("k") >= 900))
    // the stat prune is FILE-grain (each append range-clusters into several
    // files), so the exact expectation comes from the manifest itself: the
    // rows of every file whose k-bounds overlap [900, inf)
    val expected = spark.sql(s"SELECT * FROM $cat.`t$$files`").collect()
      .filter(_.getMap[String, org.apache.spark.sql.Row](2)
        .get("k").exists(_.getString(2).toLong >= 900))
      .map(_.getLong(1)).sum
    assert(expected >= 100 && expected < 1000,
      s"test premise: the prune must keep the matching rows but drop files ($expected)")
    assert(pruned.rowCount.contains(BigInt(expected)))
    val full = scanStats(spark.table(s"$cat.t"))
    assert(full.rowCount.contains(BigInt(1000)))
    assert(pruned.sizeInBytes < full.sizeInBytes)
  }

  test("broadcast decision runs on manifest stats: narrow projection of a wide fat table broadcasts") {
    val (wh, cat) = freshCatalog("bc")
    // fat pad column of incompressible-ish digest text: on-disk parquet size
    // far above the broadcast threshold we set below
    val dim = spark.range(0, 4000).select(col("id").as("k"),
      concat_ws("", Seq.tabulate(16)(i =>
        md5((col("id") * 31 + i).cast("string"))): _*).as("pad"))
    wh.create("dim", dim.schema)
    wh.append("dim", dim, statsCols = Seq("k"))

    val dirBytes = {
      val p = java.nio.file.Paths.get(wh.resolvePath("dim", "."))
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum
      finally s.close()
    }
    val threshold = 256L * 1024
    assert(dirBytes > threshold,
      s"test premise: on-disk $dirBytes must exceed threshold $threshold " +
        "(else the stock bytes estimate would broadcast too and prove nothing)")
    // narrow projection: manifest estimate = 4000 rows x 8 bytes, far below
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
      conf.set("spark.sql.adaptive.enabled", "false") // pin the STATIC decision
      val fact = spark.range(0, 200000).select((col("id") % 4000).as("k"), col("id").as("x"))
      val joined = fact.join(spark.table(s"$cat.dim").select("k"), "k")
      val hasBhj = joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
      assert(hasBhj, "planner must broadcast the narrow warehouse projection " +
        "from its manifest-exact stats:\n" + joined.queryExecution.executedPlan)
      assert(joined.count() == 200000)
      // the mirror case: reading the fat VAR-WIDTH column must not shrink
      // to defaultSize-of-string and flip to a broadcast that materializes
      // the whole payload — the estimate charges the on-disk bytes instead
      val fat = fact.join(spark.table(s"$cat.dim"), "k")
      assert(!fat.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "a full read of the fat dim must NOT broadcast:\n" + fat.queryExecution.executedPlan)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
