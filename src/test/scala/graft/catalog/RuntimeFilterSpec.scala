package graft.catalog

import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec
import graft.sink.Warehouse

/** Runtime (join-driven) file pruning — `SupportsRuntimeV2Filtering` on
  * warehouse scans. The unit face: the scan's filter() must drop exactly the
  * files the manifest proves disjoint from the runtime IN-set, through BOTH
  * pruning channels (raw min/max bounds AND bucket-transform projection).
  * The integration face: a selective dim filter in a real join plants a
  * dynamic-pruning subquery on the fact scan and the answer is unchanged.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def scanOf(root: String, table: String): GraftParquetScan = {
    val cat = new GraftCatalog
    cat.initialize("rfspec", new CaseInsensitiveStringMap(java.util.Map.of("root", root)))
    cat.loadTable(Identifier.of(Array.empty, table)).asInstanceOf[SupportsRead]
      .newScanBuilder(CaseInsensitiveStringMap.empty()).build()
      .asInstanceOf[GraftParquetScan]
  }

  private def fileCount(s: GraftParquetScan): Int =
    s.planInputPartitions().map { case fp: FilePartition => fp.files.length }.sum

  private def survivingPaths(s: GraftParquetScan): Seq[String] =
    s.planInputPartitions().flatMap { case fp: FilePartition =>
      fp.files.map(_.filePath.toPath.toUri.getPath)
    }.toSeq

  private def samples[T](g: org.scalacheck.Gen[T], n: Int, seed0: Long): Seq[T] =
    (0 until n).map(i => g.pureApply(org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(seed0 + i)))

  test("property: runtime pruning never drops a file containing a matching key") {
    import org.scalacheck.Gen
    val caseGen = Gen.zip(
      Gen.listOfN(40, Gen.choose(-1000L, 1000L)),   // table keys (dups fine)
      Gen.listOfN(4, Gen.choose(-1000L, 1000L)),    // runtime IN-set
      Gen.oneOf(2, 4, 8))                           // bucket count
    for (((ks, probes, nb), i) <- samples(caseGen, 5, 1137L).zipWithIndex) {
      val root = tmpDir(s"rf-prop$i")
      val wh = new Warehouse(spark, root)
      import spark.implicits._
      val d = ks.toDF("k").select(col("k"), (col("k") * 2).as("v"))
      wh.create("t", d.schema, Seq(s"bucket($nb,k)"))
      // two appends: multiple files per bucket across commits
      wh.append("t", d.limit(20))
      wh.append("t", d)
      val s = scanOf(root, "t")
      s.filter(Array(new Predicate("IN",
        (Expressions.column("k") +: probes.map(p => Expressions.literal(p))).toArray)))
      val paths = survivingPaths(s)
      val survivors: Set[Long] =
        if (paths.isEmpty) Set.empty
        else spark.read.schema(d.schema).parquet(paths: _*)
          .select("k").collect().map(_.getLong(0)).toSet
      val mustSurvive = ks.toSet.intersect(probes.toSet)
      assert(mustSurvive.subsetOf(survivors),
        s"pruning dropped matching keys: ${mustSurvive -- survivors} (case $i, nb=$nb)")
    }
  }

  test("property: any append history stays SPJ-eligible (every file single-valued)") {
    import org.scalacheck.Gen
    val histGen = Gen.listOfN(3, Gen.listOfN(25, Gen.choose(-500L, 500L)))
    for ((batches, i) <- samples(histGen, 4, 2137L).zipWithIndex) {
      val root = tmpDir(s"rf-spj$i")
      val wh = new Warehouse(spark, root)
      import spark.implicits._
      val schema = batches.head.toDF("k").select(col("k"), col("k").as("v")).schema
      wh.create("t", schema, Seq("bucket(4,k)"))
      batches.foreach(b => wh.append("t", b.toDF("k").select(col("k"), col("k").as("v"))))
      for (f <- wh.currentManifest("t").files) {
        val st = f.stats("bucket(4,k)")
        assert(st.min == st.max, s"file ${f.path} straddles buckets: $st (case $i)")
      }
      // and the scan actually reports clustering (the KeyGrouped subclass)
      assert(scanOf(root, "t").isInstanceOf[KeyGroupedParquetScan])
    }
  }

  test("filter() prunes via bucket projection: IN-set keeps only matching buckets") {
    val root = tmpDir("rf-bucket")
    val wh = new Warehouse(spark, root)
    val d = spark.range(0, 400).select(col("id").as("k"), col("id").as("v"))
    wh.create("t", d.schema, Seq("bucket(4,k)"))
    wh.append("t", d)
    val all = fileCount(scanOf(root, "t"))
    assert(all >= 4, s"expected at least one file per bucket, got $all")

    val s = scanOf(root, "t")
    s.filter(Array(new Predicate("IN",
      Array(Expressions.column("k"), Expressions.literal(5L)))))
    val kept = fileCount(s)
    assert(kept < all, s"IN-set of one key must prune buckets ($kept vs $all)")
    // surviving files must still cover the key: the query stays correct
    val expectedBucket = spark.sql("SELECT pmod(hash(5L), 4)").head().getInt(0)
    val buckets = wh.currentManifest("t").files
      .filter(f => s.planInputPartitions().exists { case fp: FilePartition =>
        fp.files.exists(_.filePath.toPath.toUri.getPath.endsWith(f.path)) })
      .map(_.stats("bucket(4,k)").min.toInt).toSet
    assert(buckets == Set(expectedBucket))
  }

  test("filter() prunes via raw bounds on range-clustered tables; repeated filters intersect") {
    val root = tmpDir("rf-range")
    val wh = new Warehouse(spark, root)
    val d = spark.range(0, 4000).select(col("id").as("k"), col("id").as("v"))
    wh.create("t", d.schema, Nil)
    // two appends with disjoint ranges -> at least two files with disjoint
    // k-bounds (AQE may coalesce a single clustered batch into one file)
    wh.append("t", d.filter(col("k") < 2000), statsCols = Seq("k"), clusterBy = Seq("k"))
    wh.append("t", d.filter(col("k") >= 2000), statsCols = Seq("k"), clusterBy = Seq("k"))
    val all = fileCount(scanOf(root, "t"))
    assert(all >= 2)

    val s = scanOf(root, "t")
    s.filter(Array(new Predicate("IN",
      Array(Expressions.column("k"), Expressions.literal(1L), Expressions.literal(2L)))))
    val kept = fileCount(s)
    assert(kept == 1, s"two adjacent keys live in one range file, got $kept of $all")
    // a second (contradictory) filter intersects to zero files
    s.filter(Array(new Predicate("IN",
      Array(Expressions.column("k"), Expressions.literal(3999L)))))
    assert(fileCount(s) == 0)
  }

  test("filter() consults the Bloom index: runtime IN-sets prune where bounds cannot") {
    val root = tmpDir("rf-bloom")
    val wh = new Warehouse(spark, root)
    def md5Of(n: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(n.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // md5-keyed files: every file's (min, max) spans ~the whole key domain,
    // so bounds keep everything — only the sidecar probe can prune
    val d = spark.range(0, 300)
      .select(md5(col("id").cast("string")).as("h"), col("id").as("v"))
    wh.create("t", d.schema)
    for (b <- 0 until 3)
      wh.append("t", d.filter(col("v") >= b * 100L && col("v") < b * 100L + 100L).coalesce(1),
        statsCols = Seq("h"))
    val all = fileCount(scanOf(root, "t"))
    assert(all >= 3)
    def inSet(keys: Seq[String]) = Array(new Predicate("IN",
      (Expressions.column("h") +: keys.map(k =>
        Expressions.literal(org.apache.spark.unsafe.types.UTF8String.fromString(k)))).toArray))

    // premise: WITHOUT the index, bounds keep every file
    val s0 = scanOf(root, "t")
    s0.filter(inSet(Seq(md5Of(42L))))
    assert(fileCount(s0) == all, "un-indexed: bounds cannot prune md5 keys")

    wh.buildBloomIndex("t", Seq("h"))
    // one key from one file → that file only
    val s1 = scanOf(root, "t")
    s1.filter(inSet(Seq(md5Of(42L))))
    assert(fileCount(s1) == 1, s"bloom must prune the runtime lookup to 1 file of $all")
    // keys from two files → those two; answers never lose rows
    val s2 = scanOf(root, "t")
    s2.filter(inSet(Seq(md5Of(5L), md5Of(205L))))
    assert(fileCount(s2) == 2)
    val got = spark.read.schema(d.schema).parquet(survivingPaths(s2): _*)
      .filter(col("h").isin(md5Of(5L), md5Of(205L)))
      .select("v").collect().map(_.getLong(0)).toSet
    assert(got == Set(5L, 205L))
    // absent key: every file pruned (exact-on-miss, no false negatives)
    val s3 = scanOf(root, "t")
    s3.filter(inSet(Seq(md5Of(999999L))))
    assert(fileCount(s3) == 0)
  }

  test("unknown predicate shapes keep every file (conservative)") {
    val root = tmpDir("rf-cons")
    val wh = new Warehouse(spark, root)
    val d = spark.range(0, 100).select(col("id").as("k"))
    wh.create("t", d.schema, Seq("bucket(4,k)"))
    wh.append("t", d)
    val s = scanOf(root, "t")
    val all = fileCount(s)
    s.filter(Array(new Predicate("ALWAYS_TRUE", Array.empty)))
    assert(fileCount(s) == all)
  }

  test("end-to-end: selective dim filter plants dynamic pruning on the fact scan, answer unchanged") {
    val root = tmpDir("rf-e2e")
    spark.conf.set("spark.sql.catalog.rfe2e", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rfe2e.root", root)
    val wh = new Warehouse(spark, root)
    val fact = spark.range(0, 5000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val dim = spark.range(0, 100)
      .select(col("id").as("k"), when(col("id") === 7, "x").otherwise("y").as("tag"))
    wh.create("fact", fact.schema, Seq("bucket(8,k)"))
    wh.create("dim", dim.schema, Nil)
    wh.append("fact", fact)
    wh.append("dim", dim)
    val saved = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    try {
      // v2 stats undercount selectivity here; the fallback-ratio heuristic
      // is what a fresh catalog without ANALYZE would use in production too
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val df = spark.sql(
        "SELECT f.k, f.v FROM rfe2e.fact f JOIN rfe2e.dim d ON f.k = d.k WHERE d.tag = 'x'")
      val rows = df.collect()
      assert(rows.toSeq == Seq(org.apache.spark.sql.Row(7L, 14L)))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"), s"expected a runtime filter on the fact scan:\n$plan")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
      case None    => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }
}
