package graft.catalog

import java.nio.file.Paths

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sink.{Manifest, Warehouse}

/** SEGMENT-LEVEL manifest pruning on the SQL read path — the Iceberg
  * manifest-list analog ([[graft.sink.Manifest.readPruned]] wired through
  * [[ManifestPruneRule]]): planning a predicate-pruned query over a
  * many-segment table parses O(relevant segments) of metadata, not
  * O(every file entry of the table). At millions of files this is the
  * difference between a constant-ish driver cost per query and a full
  * table-metadata replay for every one-partition probe.
  *
  * The companion soundness property (segment skipping plans the
  * bit-identical file set as the full parse) lives in
  * `graft.sink.ManifestSegmentSpec`.
  */
class SegmentPruneSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def batch(lo: Long, n: Long): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      (lo until lo + n).map(i => Row(i, s"r$i")).asJava, schema)

  test("a point query over a 24-segment table parses O(1) segments; answers stay exact") {
    val root = tmpDir("segprune")
    spark.conf.set("spark.sql.catalog.sgp", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sgp.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // 24 appends with DISJOINT key ranges: one fresh segment per commit,
    // each summary-bounded to its range (arrival-clustered — the natural
    // shape of time-correlated ingest)
    (0 until 24).foreach(i => wh.append("t", batch(i * 100L, 100L), statsCols = Seq("k")))
    val man = wh.currentManifest("t")
    val segs = Manifest.segmentRefs(Paths.get(root, "t",
      s"m${wh.currentVersion("t")}.manifest"))
    assert(segs.size == 24, s"expected one segment per append, got ${segs.size}")

    val c0 = Manifest.prunedSegConsults.get()
    val s0 = Manifest.prunedSegSkips.get()
    val q = spark.sql("SELECT v FROM sgp.t WHERE k = 1234")
    assert(q.collect().map(_.getString(0)).toSeq == Seq("r1234"))
    val consulted = Manifest.prunedSegConsults.get() - c0
    val skipped = Manifest.prunedSegSkips.get() - s0
    assert(consulted <= 2,
      s"a one-range probe must parse O(1) segments, parsed $consulted")
    assert(skipped >= 22, s"expected ~23 segments skipped, got $skipped")
    // and the scan itself pruned to the owning file
    assert(scannedFiles(q, man.files.size) <= math.max(1, man.files.size / 24),
      q.queryExecution.executedPlan.toString)

    // a RANGE probe touching 3 segments parses ~3
    val c1 = Manifest.prunedSegConsults.get()
    val r = spark.sql("SELECT count(*) AS n FROM sgp.t WHERE k >= 500 AND k < 800")
    assert(r.head().getLong(0) == 300L)
    assert(Manifest.prunedSegConsults.get() - c1 <= 4,
      "a three-range probe must parse ~3 segments")

    // an unselective predicate keeps everything — same answer as the raw scan
    val all = spark.sql("SELECT count(*) AS n FROM sgp.t WHERE k >= 0")
    assert(all.head().getLong(0) == 2400L)
  }

  test("pending MOR deletes: refuted delete segments skip too; reads stay MOR-exact") {
    val root = tmpDir("segprune-mor")
    spark.conf.set("spark.sql.catalog.sgm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sgm.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 6).foreach(i => wh.append("t", batch(i * 100L, 100L), statsCols = Seq("k")))
    // pending equality delete of k=130 (lives in segment 1's range)
    wh.equalityDelete("t", spark.createDataFrame(
      Seq(Row(130L, null: String)).asJava, schema).select(col("k")))
    assert(wh.manifestHeader("t").deleteCount == 1)
    // filtered read over the deleted key's range: the delete segment is
    // consulted and the MOR overlay applies
    val got = spark.sql("SELECT k FROM sgm.t WHERE k >= 125 AND k < 135 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(125L, 126L, 127L, 128L, 129L, 131L, 132L, 133L, 134L))
    // a read far from the delete still answers exactly (the SQL path now
    // segment-prunes BEFORE the MOR swap — MorReadRule runs after
    // ManifestPruneRule in the optimizer fixed point)
    assert(spark.sql("SELECT sum(k) AS s FROM sgm.t WHERE k >= 400").head().getLong(0)
      == (400L until 600L).sum)
    // the MANIFEST layer skips refuted delete segments (round-15 #6): a
    // probe disjoint from both data AND delete bounds parses only its
    // owning data segments — the delete-carrying segment included in the
    // skip count, and its delete entry absent from the planned manifest
    val c0 = Manifest.prunedSegConsults.get()
    val s0 = Manifest.prunedSegSkips.get()
    def keepRange(lo: Long): graft.sink.SegSummary => Boolean = s =>
      s.stats.get("k").forall(st =>
        graft.sink.StatsPruning.mayMatch(st, ">=", "n", lo.toString))
    val (pruned, skipped) = wh.manifestPruned("t", None, keepRange(400L))
    assert(pruned.deletes.isEmpty, s"refuted delete must skip: ${pruned.deletes}")
    assert(pruned.files.forall(_.stats("k").min.toLong >= 400L))
    assert(skipped >= 5 && Manifest.prunedSegSkips.get() - s0 >= 5,
      "4 disjoint data segments + the refuted delete segment must skip")
    assert(Manifest.prunedSegConsults.get() - c0 <= 2)
    // a probe AT the deleted key keeps the delete entry
    val (prunedAt, _) = wh.manifestPruned("t", None, s =>
      s.stats.get("k").forall(st =>
        graft.sink.StatsPruning.mayMatch(st, "=", "n", "130")))
    assert(prunedAt.deletes.size == 1, "overlapping delete must survive")
    wh.compactDeletes("t")
    assert(wh.manifestHeader("t").deleteCount == 0)
    assert(spark.sql("SELECT count(*) AS n FROM sgm.t").head().getLong(0) == 599L)
  }

  test("SQL face of a pending-MOR table: O(relevant segments) planning, pushdown kept") {
    // the round-16 deferred item: MorReadRule used to swap the overlay in
    // at ANALYSIS time, before filters were adjacent, so every SQL read of
    // a table with pending deletes planned from the FULL manifest — the
    // last O(table-files) planning path, paid exactly by the steady-MOR
    // workload (continuous upserts between compactions). The swap now runs
    // in the optimizer fixed point AFTER ManifestPruneRule: the overlay
    // plans from the delete-aware segment-pruned manifest, and the fixed
    // point re-pushes the query's filters into the overlay's scans.
    val root = tmpDir("segprune-morsql")
    spark.conf.set("spark.sql.catalog.sgq", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sgq.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 24).foreach(i => wh.append("t", batch(i * 100L, 100L), statsCols = Seq("k")))
    // pending equality delete in segment 1's range — the table is now MOR
    wh.equalityDelete("t", spark.createDataFrame(
      Seq(Row(130L, null: String)).asJava, schema).select(col("k")))
    assert(wh.manifestHeader("t").deleteCount == 1)

    // (a) point query FAR from the delete: O(1) segments parsed on the SQL
    // face — the delete-delta segment refutes and skips too
    val c0 = Manifest.prunedSegConsults.get()
    val s0 = Manifest.prunedSegSkips.get()
    val far = spark.sql("SELECT v FROM sgq.t WHERE k = 1234")
    assert(far.collect().map(_.getString(0)).toSeq == Seq("r1234"))
    val consulted = Manifest.prunedSegConsults.get() - c0
    assert(consulted <= 2,
      s"pending-MOR point query must parse O(1) segments, parsed $consulted")
    assert(Manifest.prunedSegSkips.get() - s0 >= 22)
    // (b) pushdown unchanged: the overlay's parquet scans carry the pushed
    // filter (the hazard of deferring the swap was losing exactly this)
    val plan = far.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,1234)]"),
      s"query filter must reach the overlay scan:\n$plan")

    // (c) point query AT the deleted key: its segment consults, the delete
    // applies (MOR-exact answer), and planning stays O(relevant segments)
    val c1 = Manifest.prunedSegConsults.get()
    assert(spark.sql("SELECT count(*) AS n FROM sgq.t WHERE k = 130").head().getLong(0) == 0L)
    assert(Manifest.prunedSegConsults.get() - c1 <= 3,
      "deleted-key probe must still plan O(relevant segments)")

    // (d) unfiltered aggregate stays MOR-exact (bare-relation swap path)
    assert(spark.sql("SELECT count(*) AS n FROM sgq.t").head().getLong(0) == 2399L)

    // (e) SELF-JOIN of the pending table: each relation occurrence swaps
    // to its own fresh overlay plan (shared exprIds across the two sides
    // would fail analysis or mis-resolve) — answers stay MOR-exact
    val sj = spark.sql(
      "SELECT a.k FROM sgq.t a JOIN sgq.t b ON a.k = b.k + 1 " +
        "WHERE a.k BETWEEN 128 AND 133 ORDER BY a.k")
      .collect().map(_.getLong(0)).toSeq
    // 130 deleted: a.k=130 gone (left side), and a.k=131 needs b.k=130 (gone)
    assert(sj == Seq(128L, 129L, 132L, 133L), s"self-join over pending MOR: $sj")
  }

  test("per-file eq-delete pruning fires on filtered MOR reads (transformDown order)") {
    // REGRESSION: MorReadRule.rewrite used transformUp, so the bare-relation
    // case rewrote the child before its parent Filter was visited and the
    // Filter case — the per-file equality-delete prune — was unreachable
    // dead code. The rule now descends (transformDown); this test pins the
    // prune actually firing via the eqDeletesPruned counter, with the
    // answers staying MOR-exact on both the refuting and the covering probe.
    val root = tmpDir("segprune-perfile")
    spark.conf.set("spark.sql.catalog.sgf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sgf.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 6).foreach(i => wh.append("t", batch(i * 100L, 100L), statsCols = Seq("k")))
    // two pending equality-delete FILES in DISJOINT key ranges inside ONE
    // delta segment (one commit, range-partitioned keys → one file per
    // key): segment-level pruning keeps the whole segment (its aggregate
    // delete bounds overlap the probe), so only the per-file pass can
    // separate them
    wh.equalityDelete("t", spark.createDataFrame(
        Seq(Row(130L, null: String), Row(430L, null: String)).asJava, schema)
      .select(col("k")).repartitionByRange(2, col("k")))
    assert(wh.manifestHeader("t").deleteCount == 2)

    // probe INSIDE delete #1's range and FAR from delete #2: the overlay
    // must drop the k=430 delete file (its bounds refute k<200) while the
    // k=130 delete still applies
    val p0 = MorReadRule.eqDeletesPruned.get()
    val got = spark.sql("SELECT k FROM sgf.t WHERE k >= 128 AND k < 133 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(128L, 129L, 131L, 132L),
      s"covering delete must apply under per-file pruning: $got")
    assert(MorReadRule.eqDeletesPruned.get() - p0 >= 1,
      "the refuted eq-delete file must be dropped from the overlay")

    // probe covering BOTH ranges keeps both deletes
    val n = spark.sql(
      "SELECT count(*) AS n FROM sgf.t WHERE k IN (130, 430)").head().getLong(0)
    assert(n == 0L, "both deletes must survive a covering probe")
  }

  test("inferred IsNotNull conjuncts never skip a live delete (delRows probe)") {
    // REGRESSION: the delete-side skip probe used to present the segment's
    // DATA row count (0 for the delete-only delta segments equalityDelete
    // commits) as `rows`, so mayMatch's IsNotNull arm "proved" nulls(0) ==
    // rows(0) all-null and dropped the delete — resurrecting the deleted
    // row for ANY query with a predicate on the key, because Spark's
    // InferFiltersFromConstraints adds isnotnull(k) to every one of those.
    // The probe must carry the delete files' own tuple count (delRows).
    import org.apache.spark.sql.catalyst.expressions.{
      And, AttributeReference, EqualTo, IsNotNull, Literal => CLit}
    val root = tmpDir("segprune-innull")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 4).foreach(i => wh.append("t", batch(i * 100L, 100L), statsCols = Seq("k")))
    wh.equalityDelete("t", spark.createDataFrame(
      Seq(Row(130L, null: String)).asJava, schema).select(col("k")))

    val kAttr = AttributeReference("k", LongType)()
    def keepOf(cond: org.apache.spark.sql.catalyst.expressions.Expression)
        : graft.sink.SegSummary => Boolean =
      s => ManifestPruneRule.mayMatch(graft.sink.DataFile("", s.rows, s.stats), cond)

    // probe AT the deleted key, in the exact conjunct shape the optimizer
    // hands ManifestPruneRule: the delete entry MUST survive pruning
    val atKey = And(EqualTo(kAttr, CLit(130L)), IsNotNull(kAttr))
    val (prunedAt, _) = wh.manifestPruned("t", None, keepOf(atKey))
    assert(prunedAt.deletes.size == 1,
      s"isnotnull conjunct skipped a live delete: ${prunedAt.deletes}")
    // and the planned file set still answers without the deleted row
    assert(prunedAt.files.exists(_.stats("k").min.toLong <= 130L))

    // a probe DISJOINT from the delete bounds still skips it — the
    // isnotnull conjunct must not block sound delete-side refutation
    val farKey = And(EqualTo(kAttr, CLit(330L)), IsNotNull(kAttr))
    val (prunedFar, skippedFar) = wh.manifestPruned("t", None, keepOf(farKey))
    assert(prunedFar.deletes.isEmpty,
      s"refuted delete must still skip: ${prunedFar.deletes}")
    assert(skippedFar >= 4, s"3 data segments + the delete segment, got $skippedFar")

    // end-to-end: the SQL answer at the deleted key stays MOR-exact
    spark.conf.set("spark.sql.catalog.sgn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sgn.root", root)
    assert(spark.sql("SELECT count(*) AS n FROM sgn.t WHERE k = 130").head().getLong(0) == 0L)
  }

  test("schema served from the root header; evolution + pruning compose") {
    val root = tmpDir("segprune-evo")
    spark.conf.set("spark.sql.catalog.sge", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sge.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 4).foreach(i => wh.append("t", batch(i * 100L, 100L), statsCols = Seq("k")))
    wh.addColumns("t", Seq(StructField("extra", StringType)))
    assert(spark.table("sge.t").schema.fieldNames.toSeq == Seq("k", "v", "extra"))
    // predicate on the pre-evolution column still segment-prunes; the added
    // column null-fills on old files
    val q = spark.sql("SELECT v, extra FROM sge.t WHERE k = 250")
    val rows = q.collect()
    assert(rows.length == 1 && rows(0).getString(0) == "r250" && rows(0).isNullAt(1))
    // rename keeps values and pruning (stats are field-id/remapped keys)
    wh.renameColumn("t", "k", "key")
    val q2 = spark.sql("SELECT v FROM sge.t WHERE key = 310")
    assert(q2.collect().map(_.getString(0)).toSeq == Seq("r310"))
  }
}
