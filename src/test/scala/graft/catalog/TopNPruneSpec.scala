package graft.catalog

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder => V2SortOrder}
import org.apache.spark.sql.connector.read.{SupportsPushDownLimit, SupportsPushDownTopN}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sink.{ColStat, DataFile, Warehouse}

/** LIMIT / ORDER-BY-LIMIT (top-k) file pruning over warehouse scans
  * ([[TopNPruning]] + [[SpjScanBuilder]]): the scan plans only a
  * provably-sufficient file subset selected from manifest bounds + null
  * counts, and every query still returns the exact answer (Spark keeps the
  * Sort/Limit on top — the push is PARTIAL by contract).
  *
  * The selection math is property-tested against a brute-force oracle over
  * generated file profiles (overlapping ranges, nulls, all-null files,
  * unknown null counts, missing stats); the builder path is pinned by
  * driving `pushTopN`/`pushLimit` + `planInputPartitions` directly.
  */
class TopNPruneSpec extends graft.SparkSpec {
  import scala.jdk.CollectionConverters._

  // ---------------------------------------------------------- pure math --

  /** Brute-force oracle: materialize rows implied by a synthetic file
    * profile (values spread across [min, max] plus nulls), compute the true
    * top-k row set for every possible value assignment... impossible in
    * general — instead check SOUNDNESS directly: simulate the WORST-CASE
    * placement (every in-range value is possible), so a kept set is sound
    * iff for every pruned file and every value v it could hold, v can never
    * be in the top-k given the kept files' guaranteed contents.
    * Equivalent, testable form used here: generate CONCRETE tables, derive
    * the file profile from them, and check the top-k of the concrete rows
    * is contained in the kept files' rows.
    */
  private case class GenFile(path: String, vals: Seq[Option[Long]], statted: Boolean,
                             nullsKnown: Boolean)

  private def profile(f: GenFile): DataFile = {
    val nonNull = f.vals.flatten
    val nulls = f.vals.count(_.isEmpty).toLong
    val st =
      if (!f.statted) Map.empty[String, ColStat]
      else if (nonNull.isEmpty) Map("v" -> ColStat("z", "", "", if (f.nullsKnown) nulls else -1L))
      else Map("v" -> ColStat("n", nonNull.min.toString, nonNull.max.toString,
        if (f.nullsKnown) nulls else -1L))
    DataFile(f.path, f.vals.size.toLong, st)
  }

  private def topKRows(files: Seq[GenFile], asc: Boolean, nullsFirst: Boolean,
                       k: Int): Seq[(String, Option[Long])] = {
    val all = files.flatMap(f => f.vals.map(v => f.path -> v))
    val keyed = all.map { case (p, v) =>
      val nullGroup = if (v.isEmpty) (if (nullsFirst) 0 else 2) else 1
      val valKey = v.map(x => if (asc) x else -x).getOrElse(0L)
      ((nullGroup, valKey), (p, v))
    }
    keyed.sortBy(_._1).take(k).map(_._2)
  }

  test("property: topNKeep is sound on generated profiles (all four null orderings)") {
    val rnd = new scala.util.Random(20260815L)
    var pruned = 0
    for (trial <- 0 until 300) {
      val nFiles = 1 + rnd.nextInt(6)
      val files = (0 until nFiles).map { i =>
        val n = 1 + rnd.nextInt(5)
        val vals = Seq.fill(n)(
          if (rnd.nextInt(4) == 0) None else Some(rnd.nextInt(30).toLong - 10L))
        GenFile(s"f$i", vals, statted = rnd.nextInt(8) != 0, nullsKnown = rnd.nextInt(6) != 0)
      }
      val k = 1 + rnd.nextInt(8)
      val asc = rnd.nextBoolean()
      val nullsFirst = rnd.nextBoolean()
      TopNPruning.topNKeep(files.map(profile), "v", asc, nullsFirst, k.toLong).foreach { keep =>
        pruned += 1
        val top = topKRows(files, asc, nullsFirst, k)
        // SOUND: every top-k row must live in a kept file. (Ties make many
        // valid top-k sets; rows tying the k-th are never pruned, so the
        // sorted take is as adversarial as any.)
        val bad = top.filterNot { case (p, _) => keep.contains(p) }
        assert(bad.isEmpty,
          s"trial $trial: pruned rows that belong to the top-$k " +
            s"(asc=$asc nullsFirst=$nullsFirst): $bad\nfiles=$files\nkeep=$keep")
      }
    }
    assert(pruned > 50, s"test premise: pruning must actually fire often, fired $pruned/300")
  }

  test("property: limitKeep always covers k rows with the fewest files") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 0 until 100) {
      val files = (0 until 1 + rnd.nextInt(6)).map(i =>
        DataFile(s"f$i", 1L + rnd.nextInt(10), Map.empty))
      val k = 1 + rnd.nextInt(20)
      TopNPruning.limitKeep(files, k.toLong) match {
        case Some(keep) =>
          val kept = files.filter(f => keep.contains(f.path))
          assert(kept.map(_.rows).sum >= k, s"kept files must cover $k rows")
          assert(keep.size < files.size)
        case None =>
          // legal only when every file is needed
          val maxDrop = files.map(_.rows).sum - files.map(_.rows).min
          assert(files.size <= 1 || maxDrop < k || files.map(_.rows).sum < k)
      }
    }
  }

  // ------------------------------------------------------- builder path --

  private def builderOf(cat: String, root: String, table: String): SpjScanBuilder = {
    val c = new GraftCatalog
    c.initialize(cat, new CaseInsensitiveStringMap(Map("root" -> root).asJava))
    c.asInstanceOf[TableCatalog].loadTable(Identifier.of(Array.empty, table))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
      .asInstanceOf[SpjScanBuilder]
  }

  private def sortV2(col: String, asc: Boolean, nullsFirst: Boolean): V2SortOrder =
    Expressions.sort(Expressions.column(col),
      if (asc) SortDirection.ASCENDING else SortDirection.DESCENDING,
      if (nullsFirst) NullOrdering.NULLS_FIRST else NullOrdering.NULLS_LAST)

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))

  private def mkTable(root: String): Warehouse = {
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // 10 appends of 100 rows each, disjoint ascending ranges of v — the
    // range-clustered layout a real ingest produces
    for (b <- 0 until 10) {
      val rows = (0 until 100).map(i => Row(b * 100L + i, b * 1000L + i))
      wh.append("t", spark.createDataFrame(rows.asJava, schema).coalesce(1),
        statsCols = Seq("k", "v"))
    }
    wh
  }

  test("pushTopN plans only the threshold-covering files; pushLimit the fewest") {
    val root = tmpDir("topn-build")
    val wh = mkTable(root)
    val total = wh.currentManifest("t").files.size
    assert(total >= 10, s"premise: multi-file table, got $total")

    // ORDER BY v DESC LIMIT 50 → only the top range's file(s)
    val bTop = builderOf("tnb", root, "t")
    assert(bTop.asInstanceOf[SupportsPushDownTopN]
      .pushTopN(Array(sortV2("v", asc = false, nullsFirst = false)), 50))
    assert(bTop.isPartiallyPushed())
    val topParts = bTop.build().asInstanceOf[GraftParquetScan]
    assert(topParts.keepPaths.isDefined, "top-k selection must fire")
    val nTop = topParts.planInputPartitions().map {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files.length
    }.sum
    assert(nTop < total && nTop <= 2, s"DESC top-50 over disjoint ranges must plan ~1 file, got $nTop")

    // ORDER BY v ASC LIMIT 150 → the two lowest files
    val bAsc = builderOf("tnb2", root, "t")
    bAsc.asInstanceOf[SupportsPushDownTopN]
      .pushTopN(Array(sortV2("v", asc = true, nullsFirst = true)), 150)
    val ascScan = bAsc.build().asInstanceOf[GraftParquetScan]
    val nAsc = ascScan.planInputPartitions().map {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files.length
    }.sum
    assert(nAsc < total && nAsc <= 3, s"ASC top-150 must plan ~2 files, got $nAsc")

    // bare LIMIT 120 → 2 files of 100 rows
    val bLim = builderOf("tnb3", root, "t")
    assert(bLim.asInstanceOf[SupportsPushDownLimit].pushLimit(120))
    val limScan = bLim.build().asInstanceOf[GraftParquetScan]
    val nLim = limScan.planInputPartitions().map {
      case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files.length
    }.sum
    assert(nLim < total && nLim <= 2, s"LIMIT 120 must plan 2 files, got $nLim")

    // a limit-pruned scan must refuse runtime-filter composition
    assert(limScan.filterAttributes().isEmpty,
      "limit-pruned scans must not accept runtime filters")
  }

  test("end-to-end SQL: top-k answers are exact under pruning, all orderings") {
    val root = tmpDir("topn-sql")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // values with nulls sprinkled in; several files
    for (b <- 0 until 5) {
      val rows = (0 until 40).map { i =>
        Row(b * 40L + i, if ((b * 40 + i) % 7 == 0) null else b * 100L + i)
      }
      wh.append("t", spark.createDataFrame(rows.asJava, schema).coalesce(1),
        statsCols = Seq("k", "v"))
    }
    spark.conf.set("spark.sql.catalog.tne2e", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tne2e.root", root)
    val raw = wh.load("t")
    for ((dir, no) <- Seq("ASC" -> "NULLS FIRST", "ASC" -> "NULLS LAST",
      "DESC" -> "NULLS FIRST", "DESC" -> "NULLS LAST")) {
      val got = spark.sql(
        s"SELECT k, v FROM tne2e.t ORDER BY v $dir $no, k LIMIT 11").collect().toSeq
      val vcol = (dir, no) match {
        case ("ASC", "NULLS FIRST")  => col("v").asc_nulls_first
        case ("ASC", _)              => col("v").asc_nulls_last
        case ("DESC", "NULLS FIRST") => col("v").desc_nulls_first
        case _                       => col("v").desc_nulls_last
      }
      val want = raw.orderBy(vcol, col("k")).limit(11).collect().toSeq
      assert(got == want, s"ORDER BY v $dir $no mismatch")
    }
    // and the SQL path genuinely reaches pushTopN: the planned scan carries
    // a file selection (sparkPlan: pre-AQE, so collect can traverse)
    val probe = spark.sql("SELECT k, v FROM tne2e.t ORDER BY v DESC LIMIT 11")
    val scans = probe.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(scans.size == 1)
    assert(scans.head.asInstanceOf[GraftParquetScan].keepPaths.isDefined,
      "ORDER BY + LIMIT through SQL must trigger the top-k file selection")
  }

  test("guards: pushed filters or SPJ eligibility suppress the file selection") {
    val root = tmpDir("topn-guard")
    val wh = mkTable(root)
    // filter present → builder must NOT select files even with a limit
    val b = builderOf("tng", root, "t")
    b.asInstanceOf[SupportsPushDownLimit].pushLimit(10)
    // push a data filter the way Spark would (catalyst predicate on v)
    val attr = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "v", LongType)(org.apache.spark.sql.catalyst.expressions.ExprId(9990L))
    b.pushFilters(Seq(org.apache.spark.sql.catalyst.expressions.GreaterThan(
      attr, org.apache.spark.sql.catalyst.expressions.Literal(5000L))))
    val scan = b.build().asInstanceOf[GraftParquetScan]
    assert(scan.keepPaths.isEmpty, "a filtered scan must not limit-prune files")
  }

  test("comparator contract: many all-null creditable files sort strictly (no TimSort violation)") {
    // ≥32 None-bound entries under nulls-first exercise TimSort's contract
    // check: a comparator answering true for BOTH orderings of two all-null
    // entries threw 'Comparison method violates its general contract' at
    // planning time. The sort must complete and the selection stay sound.
    val files = (0 until 40).map(i =>
      DataFile(s"z$i", 3L, Map("v" -> ColStat("z", "", "", 3L)))) :+
      DataFile("vals", 5L, Map("v" -> ColStat("n", "0", "4", 0L)))
    val keep = TopNPruning.topNKeep(files, "v", asc = true, nullsFirst = true, 10L)
    // 120 null rows credit before any value: the null-free value file prunes
    assert(keep.contains(files.init.map(_.path).toSet), s"got $keep")
  }
}
