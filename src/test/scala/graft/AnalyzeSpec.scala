package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** ANALYZE (Warehouse.analyzeTable): NDV accuracy, exact null counts and
  * length stats, the stored-file round trip, the CALL procedure face, and
  * the DSv2 columnStats surface into Catalyst plan statistics.
  */
class AnalyzeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val root = {
    val dir = tmpDir("graft-analyze")
    spark.conf.set("spark.sql.catalog.gana", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gana.root", dir)
    dir
  }
  private lazy val wh = { root; new Warehouse(spark, root) }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("score", DoubleType)))

  private def seed(): Unit = if (!wh.exists("facts")) {
    // 5000 rows: id unique, grp has 37 distinct, score has 500 distinct,
    // every 10th grp is null
    val rows = (0 until 5000).map { i =>
      Row(i.toLong, if (i % 10 == 0) null else s"g${i % 37}", (i % 500) / 7.0)
    }
    wh.replace("facts", spark.createDataFrame(rows.asJava, schema))
  }

  test("analyze: NDV within HLL tolerance, null/length stats exact, round-trips") {
    seed()
    val r = wh.analyzeTable("facts")
    assert(r.rows == 5000 && r.version == wh.currentVersion("facts"))
    assert(r.cols.keySet == Set("id", "grp", "score"))
    def within(est: Long, exact: Long, tol: Double) =
      math.abs(est - exact) <= math.max(1, (exact * tol).toLong)
    assert(within(r.cols("id").ndv, 5000, 0.05), s"id ndv ${r.cols("id").ndv}")
    assert(within(r.cols("grp").ndv, 37, 0.05), s"grp ndv ${r.cols("grp").ndv}")
    assert(within(r.cols("score").ndv, 500, 0.05), s"score ndv ${r.cols("score").ndv}")
    assert(r.cols("grp").nullCount == 500 && r.cols("id").nullCount == 0)
    // grp values are g0..g36: max length 3, avg ceil > 0; fixed-width cols -1
    assert(r.cols("grp").maxLen == 3 && r.cols("grp").avgLen >= 2)
    assert(r.cols("id").avgLen == -1 && r.cols("id").maxLen == -1)
    // stored file serves the same record
    assert(wh.columnStats("facts").contains(r))
  }

  test("CALL graft.system.analyze runs it; cols subset respected") {
    seed()
    val out = spark.sql("CALL gana.system.analyze(tbl => 'facts', cols => 'id,grp')").head()
    assert(out.getLong(1) == 5000 && out.getInt(2) == 2)
    assert(wh.columnStats("facts").get.cols.keySet == Set("id", "grp"))
    intercept[Exception](
      spark.sql("CALL gana.system.analyze(tbl => 'facts', cols => 'nope')"))
  }

  test("columnStats surface into Catalyst plan statistics (distinctCount, nullCount)") {
    seed()
    wh.analyzeTable("facts")
    val plan = spark.sql("SELECT id, grp FROM gana.facts").queryExecution.optimizedPlan
    val att = plan.stats.attributeStats
    assert(att.nonEmpty, s"no attribute stats: ${plan.stats}")
    val byName = att.toSeq.map { case (a, st) => a.name -> st }.toMap
    assert(byName.contains("grp") && byName("grp").nullCount.exists(_.toLong == 500L),
      byName.toString)
    assert(byName("grp").distinctCount.exists(d => math.abs(d.toLong - 37L) <= 2),
      byName("grp").toString)
    // a time-travel scan is a different population: no served column stats
    val v = wh.currentVersion("facts")
    val ttPlan = spark.sql(s"SELECT id, grp FROM gana.facts VERSION AS OF $v")
      .queryExecution.optimizedPlan
    assert(ttPlan.stats.attributeStats.isEmpty, ttPlan.stats.toString)
  }

  test("staleness is versioned, a re-analyze refreshes") {
    seed()
    val before = wh.analyzeTable("facts")
    wh.append("facts",
      spark.createDataFrame(Seq(Row(99999L, "brandnew", 1.0)).asJava, schema))
    assert(wh.columnStats("facts").get.version == before.version) // stale, visibly
    val after = wh.analyzeTable("facts")
    assert(after.version == wh.currentVersion("facts") && after.rows == 5001)
  }

  test("incremental ANALYZE: append-only refresh scans only new files; union tracks the full pass") {
    val rows0 = (0 until 4000).map { i =>
      Row(i.toLong, if (i % 10 == 0) null else s"g${i % 37}", (i % 400) / 7.0)
    }
    wh.replace("inc", spark.createDataFrame(rows0.asJava, schema))
    val r0 = wh.analyzeIncremental("inc")
    assert(!r0.incremental, "no stored stats: must fall back to the full pass")
    val filesBefore = wh.currentManifest("inc").files.size
    // append: 500 rows, 500 NEW ids, new grp values, some nulls
    val rows1 = (10000 until 10500).map { i =>
      Row(i.toLong, if (i % 5 == 0) null else s"h${i % 11}", (i % 400) / 7.0)
    }
    wh.append("inc", spark.createDataFrame(rows1.asJava, schema))
    val added = wh.currentManifest("inc").files.size - filesBefore
    assert(added >= 1)
    val r1 = wh.analyzeIncremental("inc")
    assert(r1.incremental, "append-only window must refresh incrementally")
    assert(r1.scannedFiles == added,
      s"must scan ONLY the ${added} new file(s), scanned ${r1.scannedFiles}")
    // exact fields match a full re-analyze exactly; NDV (HLL union) tracks
    // the one-pass sketch within tolerance
    val snapshot = r1.stats
    val full = wh.analyzeTable("inc")
    assert(snapshot.rows == full.rows && snapshot.version == full.version)
    for (c <- Seq("id", "grp", "score")) {
      assert(snapshot.cols(c).nullCount == full.cols(c).nullCount, s"$c nulls")
      assert(snapshot.cols(c).maxLen == full.cols(c).maxLen, s"$c maxLen")
      val (a, b) = (snapshot.cols(c).ndv, full.cols(c).ndv)
      assert(math.abs(a - b) <= math.max(3, (b * 0.06).toLong), s"$c ndv $a vs $b")
    }
    // nothing new: a refresh is free (and restamps the version)
    val r2 = wh.analyzeIncremental("inc")
    assert(r2.incremental && r2.scannedFiles == 0)
    // a delete makes the window non-append-only: falls back, stays correct
    wh.equalityDelete("inc", spark.createDataFrame(
      Seq(Row(7L, null, 0.0)).asJava, schema).select("id"))
    val r3 = wh.analyzeIncremental("inc")
    assert(!r3.incremental, "pending deletes must force the full pass")
    assert(r3.stats.rows == full.rows - 1)
    // the SQL face reports the same contract (re-baseline at a clean state
    // first: the pending delete above blocks the incremental window)
    wh.compactDeletes("inc")
    wh.analyzeTable("inc")
    wh.append("inc", spark.createDataFrame(rows1.take(50).asJava, schema))
    val out = spark.sql("CALL gana.system.analyze_incremental(tbl => 'inc')").head()
    assert(out.getBoolean(4), out.toString)
  }

  test("histogram bucket math: an exact-mode KLL sketch yields equal-count buckets with true bounds") {
    // 160 distinct values, well under the sketch's k = 200 ⇒ the sketch has
    // never compacted and is EXACT: the bucket math is hand-checkable
    val s2 = StructType(Seq(StructField("v", LongType)))
    wh.replace("hist_exact", spark.createDataFrame(
      (1 to 160).map(i => Row(i.toLong)).asJava, s2))
    val st = wh.analyzeTable("hist_exact")
    val e = st.cols("v")
    assert(e.minV == "1" && e.maxV == "160", s"exact bounds: ${e.minV}..${e.maxV}")
    assert(e.kllB64.nonEmpty, "numeric columns must record a KLL sketch")
    val Some((height, bins)) = graft.sink.ColStatsHistogram.bins(e.kllB64, 160L, e.ndv, 8)
    assert(height == 20.0, s"equi-height: 160 rows / 8 buckets, got $height")
    assert(bins.length == 8)
    assert(bins.head._1 == 1.0 && bins.last._2 == 160.0,
      s"buckets must span the exact bounds: ${bins.head._1}..${bins.last._2}")
    // boundaries non-decreasing; every bucket's TRUE row count (first bucket
    // inclusive of its lo, the rest (lo, hi]) within ±1 of the height
    bins.sliding(2).foreach { case Array(a, b) => assert(a._2 == b._1) }
    bins.zipWithIndex.foreach { case ((lo, hi, _), i) =>
      val cnt = (1 to 160).count(v => (v > lo || (i == 0 && v >= lo)) && v <= hi)
      assert(math.abs(cnt - 20) <= 1, s"bucket $i [$lo,$hi] holds $cnt, want 20±1")
    }
    // strings record PREFIX-KEY histogram state (StringPrefixKey domain),
    // but never typed bounds — so Catalyst is never served a string
    // histogram; only the scan's own LIKE-prefix estimate reads the KLL
    wh.replace("hist_str", spark.createDataFrame(
      (1 to 10).map(i => Row(i.toLong)).asJava, s2))
  }

  test("string prefix KLL: key projection is binary-ordered; prefix mass measured") {
    val ss = StructType(Seq(StructField("name", StringType)))
    wh.replace("pfx_keys", spark.createDataFrame(
      ((1 to 90).map(i => s"aa${"%03d".format(i)}") ++
        (1 to 10).map(i => s"zq${"%03d".format(i)}")).map(Row(_)).asJava, ss))
    val e = wh.analyzeTable("pfx_keys").cols("name")
    assert(e.kllB64.nonEmpty, "string columns must record the prefix-key KLL")
    // 'zq%' holds exactly 10 of 100 values
    val (lo, hi) = graft.sink.StringPrefixKey.range("zq".getBytes("UTF-8"))
    val m = graft.sink.StringPrefixKey.mass(e.kllB64, lo, hi).get
    assert(math.abs(m - 0.10) < 0.03, s"prefix mass of zq%%: $m, want ~0.10")
    // 'aa%' holds the other 90
    val (lo2, hi2) = graft.sink.StringPrefixKey.range("aa".getBytes("UTF-8"))
    val m2 = graft.sink.StringPrefixKey.mass(e.kllB64, lo2, hi2).get
    assert(math.abs(m2 - 0.90) < 0.03, s"prefix mass of aa%%: $m2, want ~0.90")
    // a prefix nothing starts with has ~zero mass
    val (lo3, hi3) = graft.sink.StringPrefixKey.range("mm".getBytes("UTF-8"))
    assert(graft.sink.StringPrefixKey.mass(e.kllB64, lo3, hi3).get < 0.02)
  }

  test("LIKE-prefix selectivity: the string KLL flips the filtered side to broadcast") {
    // 20k-row table, 10 names under 'zq%', the rest 'aa%'; every file holds
    // both prefixes so manifest pruning cannot shrink the scan — only the
    // ANALYZE estimate can. Catalyst's FilterEstimation has no StartsWith
    // arm, so without the scan-side discount the filtered side is costed at
    // full size and stays on the sort-merge path.
    val fs = StructType(Seq(StructField("k", LongType), StructField("name", StringType),
      StructField("pay", StringType)))
    val ds = StructType(Seq(StructField("k", LongType), StructField("dv", LongType)))
    wh.replace("pfx_fact", spark.createDataFrame(
      (0 until 20000).map { i =>
        val nm = if (i % 2000 == 0) s"zq$i" else s"aa$i"
        Row(i.toLong, nm, s"payload-$i-${"x" * 30}")
      }.asJava, fs))
    wh.replace("pfx_dim", spark.createDataFrame(
      (0 until 20000).map(i => Row(i.toLong, i.toLong * 7)).asJava, ds))
    val q = "SELECT f.k, f.name, d.dv FROM gana.pfx_dim d " +
      "JOIN gana.pfx_fact f ON d.k = f.k WHERE f.name LIKE 'zq%'"
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val before = spark.sql(q).queryExecution.executedPlan.toString
      assert(!before.contains("BroadcastHashJoin"),
        s"premise: unanalyzed prefix filter must not broadcast:\n$before")
      val rowsBefore = spark.sql(q).collect().map(_.toSeq).toSet
      assert(rowsBefore.size == 10)
      wh.analyzeTable("pfx_fact")
      val after = spark.sql(q).queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"measured prefix mass (10 of 20000) must flip to broadcast:\n$after")
      assert(spark.sql(q).collect().map(_.toSeq).toSet == rowsBefore, "same rows both plans")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("LIKE-prefix discount goes STALE: heavy post-ANALYZE ingest reverts the estimate") {
    // the sketch reflects the distribution at the last ANALYZE; ingest
    // since then concentrated under the probed prefix could make the
    // discounted side arbitrarily larger than estimated and flip a
    // too-big side into a broadcast. The discount must switch off once
    // the row-lineage high-water drifts past ~25% of the analyzed count.
    val fs = StructType(Seq(StructField("k", LongType), StructField("name", StringType),
      StructField("pay", StringType)))
    val ds = StructType(Seq(StructField("k", LongType), StructField("dv", LongType)))
    wh.replace("stale_fact", spark.createDataFrame(
      (0 until 20000).map { i =>
        val nm = if (i % 2000 == 0) s"zq$i" else s"aa$i"
        Row(i.toLong, nm, s"payload-$i-${"x" * 30}")
      }.asJava, fs))
    wh.replace("stale_dim", spark.createDataFrame(
      (0 until 20000).map(i => Row(i.toLong, i.toLong * 7)).asJava, ds))
    val q = "SELECT f.k, f.name, d.dv FROM gana.stale_dim d " +
      "JOIN gana.stale_fact f ON d.k = f.k WHERE f.name LIKE 'zq%'"
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val st = wh.analyzeTable("stale_fact")
      assert(st.hwm >= st.rows, "analyze must stamp the row-lineage hwm")
      assert(spark.sql(q).queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "premise: fresh stats must discount")
      // ingest 50% more rows, ALL under the probed prefix, without re-analyze
      wh.append("stale_fact", spark.createDataFrame(
        (20000 until 30000).map(i =>
          Row(i.toLong, s"zq$i", s"payload-$i-${"x" * 30}")).asJava, fs))
      val after = spark.sql(q).queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastHashJoin"),
        s"stale sketch (50% growth) must not discount:\n$after")
      // re-analyze re-stamps the hwm (fresh again) — and the re-measured
      // mass is now ~33% (10,010 of 30,000 under 'zq%'), so the correctly
      // sized discount still doesn't broadcast a genuinely large side
      val st2 = wh.analyzeTable("stale_fact")
      assert(st2.hwm > st.hwm && st2.rows == 30000L, st2.toString)
      assert(!spark.sql(q).queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "a truly large prefix mass must not broadcast even when fresh")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("incremental ANALYZE merges histogram state: bounds and quantiles track both batches") {
    val s2 = StructType(Seq(StructField("v", LongType)))
    wh.replace("hist_inc", spark.createDataFrame(
      (0 until 100).map(i => Row(i.toLong)).asJava, s2))
    wh.analyzeTable("hist_inc")
    wh.append("hist_inc", spark.createDataFrame(
      (100 until 200).map(i => Row(i.toLong)).asJava, s2))
    val rep = wh.analyzeIncremental("hist_inc")
    assert(rep.incremental, "append-only window must refresh incrementally")
    val e = rep.stats.cols("v")
    assert(e.minV == "0" && e.maxV == "199",
      s"bounds must combine across batches: ${e.minV}..${e.maxV}")
    val Some((_, bins)) = graft.sink.ColStatsHistogram.bins(e.kllB64, 200L, e.ndv, 4)
    assert(bins.head._1 == 0.0 && bins.last._2 == 199.0)
    // the merged sketch's median must sit near the COMBINED population's
    // (a lost batch would put it near 50 or 150)
    val median = bins(1)._2
    assert(median >= 90 && median <= 110, s"merged median drifted: $median")
  }

  test("CBO range selectivity: the served histogram flips a skewed range-filtered join to broadcast") {
    // dim x is SKEWED: 3990 rows in [0, 10), 10 outliers up to ~104k. For
    // the filter x > 50000, uniform min/max interpolation keeps ≈ 52% of
    // the dim (~2076 rows ≈ 100 KB > the 64 KB threshold ⇒ sort-merge);
    // the equi-height histogram puts all mass below 50000 except a slice
    // of the last bucket (≈ 16 rows ⇒ broadcast). The plan flip — and the
    // estimated row count — therefore prove the HISTOGRAM, not NDV or
    // bounds alone.
    val fs = StructType(Seq(StructField("k", LongType), StructField("fv", LongType)))
    val ds = StructType(Seq(StructField("k", LongType), StructField("x", LongType),
      StructField("p1", LongType), StructField("p2", LongType),
      StructField("p3", LongType), StructField("p4", LongType)))
    wh.replace("hcbo_fact", spark.createDataFrame(
      (0 until 20000).map(i => Row(i.toLong % 4000L, i.toLong)).asJava, fs))
    wh.replace("hcbo_dim", spark.createDataFrame(
      (0 until 4000).map { i =>
        val x = if (i < 3990) (i % 10).toLong else 100000L + i
        Row(i.toLong, x, 1L, 2L, 3L, 4L)
      }.asJava, ds))
    val q = "SELECT f.k, f.fv, d.x FROM gana.hcbo_fact f " +
      "JOIN gana.hcbo_dim d ON f.k = d.k WHERE d.x > 50000"
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val before = spark.sql(q).queryExecution.executedPlan.toString
      assert(!before.contains("BroadcastHashJoin"),
        s"premise: unanalyzed dim must not broadcast:\n$before")
      val rowsBefore = spark.sql(q).collect().map(_.toSeq).toSet
      assert(rowsBefore.size == 50) // 10 dim outliers × 5 fact rows each
      wh.analyzeTable("hcbo_dim")
      wh.analyzeTable("hcbo_fact")
      val qe = spark.sql(q).queryExecution
      val after = qe.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"histogram-estimated range filter (≈16 of 4000 rows) must flip to broadcast:\n$after")
      // the estimate itself: uniform interpolation would keep ≈ 2076 rows —
      // anything under 100 can only come from the histogram's mass profile
      val est = qe.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
            if f.condition.toString.contains("50000") => f.stats.rowCount
      }.flatten
      assert(est.nonEmpty && est.head <= 100,
        s"histogram range estimate must be far below uniform's ~2076: $est")
      assert(spark.sql(q).collect().map(_.toSeq).toSet == rowsBefore, "same rows both plans")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("temporal histograms live in the INTERNAL domain: skewed timestamp ranges estimate from measured mass") {
    // 3990 timestamps in 1995, 10 outliers in 2020+. For ts > 2010-01-01,
    // uniform min/max interpolation keeps ≈ 40% (~1600 rows); the histogram
    // puts all mass in 1995 except a last-bucket slice. The estimate only
    // works if sketch, bounds, and the literal share ONE domain — catalyst
    // epoch MICROS (cast-to-double seconds would be off by 10⁶ and
    // silently estimate garbage).
    val ts = StructType(Seq(StructField("k", LongType), StructField("ts", TimestampType)))
    wh.replace("hcbo_ts", spark.createDataFrame(
      (0 until 4000).map { i =>
        val sec = if (i < 3990) 800000000L + i else 1600000000L + i
        Row(i.toLong, new java.sql.Timestamp(sec * 1000L))
      }.asJava, ts))
    wh.analyzeTable("hcbo_ts")
    val e = wh.columnStats("hcbo_ts").get.cols("ts")
    assert(e.minV == (800000000L * 1000000L).toString,
      s"timestamp bounds must be epoch MICROS: ${e.minV}")
    val confs = Seq("spark.sql.cbo.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val qe = spark.sql(
        "SELECT k FROM gana.hcbo_ts WHERE ts > TIMESTAMP '2010-01-01 00:00:00'")
        .queryExecution
      val est = qe.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.stats.rowCount
      }.flatten
      assert(est.nonEmpty && est.head <= 100,
        s"micros-domain histogram must see the skew (uniform says ~1600): $est")
      assert(spark.sql(
        "SELECT count(*) FROM gana.hcbo_ts WHERE ts > TIMESTAMP '2010-01-01 00:00:00'")
        .head().getLong(0) == 10L)
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
    // dates record epoch DAYS
    val ds2 = StructType(Seq(StructField("d", DateType)))
    wh.replace("hist_date", spark.createDataFrame(
      (0 until 10).map(i => Row(java.sql.Date.valueOf(f"2020-01-${i + 1}%02d"))).asJava, ds2))
    wh.analyzeTable("hist_date")
    val de = wh.columnStats("hist_date").get.cols("d")
    assert(de.minV == java.time.LocalDate.of(2020, 1, 1).toEpochDay.toString,
      s"date bounds must be epoch DAYS: ${de.minV}")
    assert(de.kllB64.nonEmpty)
  }

  test("CBO proof-of-benefit: ANALYZE's NDV flips the join to a broadcast (same rows)") {
    // fact 20k × 2 longs (≈320 KB est), dim 4k × 6 longs (≈192 KB est) —
    // both above the 64 KB broadcast threshold. The dim filter hits a
    // 2000-distinct column: WITHOUT column stats CBO cannot estimate the
    // equality's selectivity (the filter keeps the dim's full size → sort
    // merge); WITH the ANALYZE NDV the filter estimates ≈2 rows → the dim
    // broadcasts. The plan CHANGE is the proof the stats pay rent.
    val fs = StructType(Seq(StructField("k", LongType), StructField("fv", LongType)))
    val ds = StructType(Seq(StructField("k", LongType), StructField("x", LongType),
      StructField("p1", LongType), StructField("p2", LongType),
      StructField("p3", LongType), StructField("p4", LongType)))
    wh.replace("cbo_fact", spark.createDataFrame(
      (0 until 20000).map(i => Row(i.toLong % 4000L, i.toLong)).asJava, fs))
    wh.replace("cbo_dim", spark.createDataFrame(
      (0 until 4000).map(i => Row(i.toLong, (i % 2000).toLong, 1L, 2L, 3L, 4L)).asJava, ds))
    val q = "SELECT f.k, f.fv, d.x FROM gana.cbo_fact f " +
      "JOIN gana.cbo_dim d ON f.k = d.k WHERE d.x = 7"
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val before = spark.sql(q).queryExecution.executedPlan.toString
      assert(!before.contains("BroadcastHashJoin"),
        s"premise: unanalyzed dim (192 KB estimated) must not broadcast:\n$before")
      val rowsBefore = spark.sql(q).collect().map(_.toSeq).toSet
      assert(rowsBefore.nonEmpty)
      wh.analyzeTable("cbo_dim")
      wh.analyzeTable("cbo_fact")
      val after = spark.sql(q).queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"NDV-estimated filter (≈2 of 4000 rows) must flip the dim to broadcast:\n$after")
      assert(spark.sql(q).collect().map(_.toSeq).toSet == rowsBefore, "same rows both plans")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
