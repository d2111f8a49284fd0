package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Incremental change feed: file-grain added-data reads are exact for
  * appends, a documented superset across merges (rewritten files carry
  * survivors), and the row-level diff is exact everywhere.
  */
class ChangeFeedSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType),
    StructField("Amount", LongType)))

  private def df(rows: (String, Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private def ids(d: org.apache.spark.sql.DataFrame): Seq[String] =
    d.collect().map(_.getString(0)).sorted.toSeq

  test("appends: readAdded returns exactly the batches between the versions") {
    val wh = new Warehouse(spark, tmpDir("cf-append"))
    val v1 = wh.append("t", df(("a", 1), ("b", 2)))
    val v2 = wh.append("t", df(("c", 3)))
    val v3 = wh.append("t", df(("d", 4), ("e", 5)))
    assert(ids(wh.readAdded("t", v1, v2)) == Seq("c"))
    assert(ids(wh.readAdded("t", v1, v3)) == Seq("c", "d", "e"))
    assert(ids(wh.readAdded("t", v3, v3)) == Seq.empty)
    // the feed reads only the new files, not the table
    assert(wh.addedFiles("t", v1, v3).map(_.rows).sum == 3)
  }

  test("merge: file feed is a superset containing the incoming rows; diffRows is exact") {
    val wh = new Warehouse(spark, tmpDir("cf-merge"))
    val v1 = wh.replace("t", df(("a", 1), ("b", 2), ("c", 3)))
    val v2 = wh.merge("t", df(("b", 20), ("d", 40)), Seq("Id"))
    val feed = wh.readAdded("t", v1, v2)
    assert(Set("b", "d").subsetOf(ids(feed).toSet),
      "incoming rows must appear in the file-grain feed")
    val (added, removed) = wh.diffRows("t", v1, v2)
    assert(added.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("b", 20L), ("d", 40L)))
    assert(removed.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("b", 2L)))
  }

  private def bag(d: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    d.collect().toSeq.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap

  /** readChanges must equal the two-full-scan arbiter, both directions. */
  private def assertMatchesDiff(wh: Warehouse, t: String, from: Long, to: Long): Unit = {
    import org.apache.spark.sql.functions.col
    val ch = wh.readChanges(t, from, to)
    val (add, rem) = wh.diffRows(t, from, to)
    assert(bag(ch.filter(col("_change_type") === "+I").drop("_change_type")) == bag(add),
      s"+I mismatch for $from -> $to")
    assert(bag(ch.filter(col("_change_type") === "-D").drop("_change_type")) == bag(rem),
      s"-D mismatch for $from -> $to")
  }

  test("readChanges equals diffRows across append/merge/delete/compact/WAP history") {
    val wh = new Warehouse(spark, tmpDir("cf-exact"))
    val vs = scala.collection.mutable.ArrayBuffer[Long]()
    vs += wh.append("t", df(("a", 1), ("b", 2), ("c", 3)), statsCols = Seq("Id"))
    vs += wh.append("t", df(("d", 4), ("e", 5)), statsCols = Seq("Id"))
    vs += wh.merge("t", df(("b", 20), ("f", 60)), Seq("Id")) // rewrite carry-over
    vs += wh.equalityDelete("t", df(("a", 0), ("d", 0)).select("Id")) // pending MOR
    vs += wh.compactDeletes("t") // delete materialization: no row change
    vs += wh.compactFiles("t") // pure rewrite: no row change
    vs += wh.publishStage("t", wh.stageAppend("t", df(("g", 7)))) // WAP adoption
    for (i <- vs.indices; j <- vs.indices)
      assertMatchesDiff(wh, "t", vs(i), vs(j))
    // the no-row-change commits yield an empty exact feed
    assert(wh.readChanges("t", vs(3), vs(5)).count() == 0)
  }

  test("readChanges reads only changed files, not the table") {
    import org.apache.spark.sql.functions.col
    val wh = new Warehouse(spark, tmpDir("cf-cost"))
    val v1 = wh.append("t", df(("a", 1), ("b", 2)), statsCols = Seq("Id"))
    val v2 = wh.append("t", df(("c", 3)), statsCols = Seq("Id"))
    // append-only window: exactly the new batch's files are opened
    val addedOnly = wh.readChanges("t", v1, v2)
    assert(addedOnly.inputFiles.length == wh.addedFiles("t", v1, v2).size,
      s"expected only added files, read ${addedOnly.inputFiles.length}")
    // MOR-delete window: the untouched file is proven disjoint by stats and
    // never opened — only the hit file plus the delete-key file are read
    val v3 = wh.equalityDelete("t", df(("c", 0)).select("Id"))
    val win = wh.readChanges("t", v2, v3)
    assert(bag(win.drop("_change_type")) == bag(df(("c", 3))) &&
      win.select("_change_type").distinct().collect().map(_.getString(0)).toSeq == Seq("-D"))
    assert(win.inputFiles.length <= 2,
      s"stats-disjoint shared file must not be read: ${win.inputFiles.toSeq}")
    // a window delete CAN hit a shared file the feed must then read
    val v4 = wh.equalityDelete("t", df(("a", 0)).select("Id"))
    assertMatchesDiff(wh, "t", v3, v4)
  }

  test("scoped t$changes: consumer filter drives delete-aware segment pruning") {
    // the scoped-replication shape: a consumer reading `t$changes WHERE
    // key ...` must pay O(matching segments) window planning — including
    // skipping delete-delta segments whose key bounds are disjoint (the
    // SegSummary.delStats contract) — and still see exactly the unscoped
    // feed's matching rows.
    import org.apache.spark.sql.functions.col
    val kSchema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    def kdf(lo: Long, n: Long) = spark.createDataFrame(
      (lo until lo + n).map(i => Row(i, s"r$i")).asJava, kSchema)
    val root = tmpDir("cf-scoped")
    spark.conf.set("spark.sql.catalog.cfs", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cfs.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", kSchema)
    (0 until 12).foreach(i => wh.append("t", kdf(i * 100L, 100L), statsCols = Seq("k")))
    val vMid = wh.currentVersion("t")
    // window commits: one in-range append, one out-of-range append, one
    // out-of-range delete-delta (its segment must SKIP on the scoped read)
    wh.append("t", kdf(1200L, 50L), statsCols = Seq("k"))
    wh.equalityDelete("t", kdf(730L, 1L).select(col("k")))
    val vEnd = wh.currentVersion("t")

    def read() = spark.read.option("from-version", vMid).option("to-version", vEnd)
      .table("cfs.`t$changes`").filter(col("k") >= 1200 && col("k") < 1300)
    val c0 = graft.sink.Manifest.prunedSegConsults.get()
    val rows = read().select("k", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(rows == (1200L until 1250L).map(_ -> "+I"), s"got ${rows.take(5)}...")
    val consulted = graft.sink.Manifest.prunedSegConsults.get() - c0
    // both side's manifests plan pruned: a handful of segments, never 14
    assert(consulted <= 6,
      s"scoped window planning must parse O(matching segments), parsed $consulted")

    // a filter AT the deleted key sees the -D row (delete segment consults)
    val hit = spark.read.option("from-version", vMid).option("to-version", vEnd)
      .table("cfs.`t$changes`").filter(col("k") === 730L)
      .select("k", "_change_type").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(hit == Seq((730L, "-D")), s"scoped read must keep matching deletes: $hit")

    // scoped staging never poisons the unscoped cache: the full window
    // still carries every change
    val full = spark.read.option("from-version", vMid).option("to-version", vEnd)
      .table("cfs.`t$changes`")
    assert(full.count() == 51L, s"unscoped window must stage all changes: ${full.count()}")
  }

  test("readChanges across additive schema evolution; destructive refuses") {
    import org.apache.spark.sql.functions.col
    val wh = new Warehouse(spark, tmpDir("cf-evolve"))
    val v1 = wh.append("t", df(("a", 1)))
    val v2 = wh.addColumns("t", Seq(StructField("Extra", StringType)))
    // evolution alone changes no rows
    assert(wh.readChanges("t", v1, v2).count() == 0)
    val evolved = spark.createDataFrame(
      Seq(Row("b", 2L, "x")).asJava,
      StructType(schema.fields :+ StructField("Extra", StringType)))
    val v3 = wh.append("t", evolved)
    val ch = wh.readChanges("t", v1, v3)
    assert(ch.columns.toSeq == Seq("Id", "Amount", "Extra", "_change_type"))
    assert(bag(ch) == Map(Seq[Any]("b", 2L, "x", "+I") -> 1))
    // the REVERSE window is a drop-shaped feed now (column-id evolution,
    // round 12): the evolved column is absent from the to-side schema and
    // projects away, so the feed emits v1's schema — no refusal
    val back = wh.readChanges("t", v3, v1)
    assert(back.columns.toSeq == Seq("Id", "Amount", "_change_type"))
    assert(bag(back) == Map(Seq[Any]("b", 2L, "-D") -> 1))
  }

  test("commitChangedEntryCount: O(delta) root-line path for delta-shaped commits, agrees with the full diff") {
    val wh = new Warehouse(spark, tmpDir("cf-count"))
    wh.create("t", schema)
    wh.append("t", df(("a", 1), ("b", 2)), statsCols = Seq("Id"))
    wh.append("t", df(("c", 3)), statsCols = Seq("Id"))
    wh.morMerge("t", df(("b", 20), ("d", 40)), Seq("Id"))
    wh.equalityDelete("t", df(("a", 0)).select("Id"))
    wh.compactDeletes("t")
    wh.renameColumn("t", "Amount", "Amt")
    val head = wh.currentVersion("t")

    // reference: the full two-manifest path-set diff
    def fullDiff(v: Long): Int = {
      val cur = wh.manifestAt("t", v)
      val prev = if (v == 0) graft.sink.Manifest(cur.schema, Nil, Nil)
                 else wh.manifestAt("t", v - 1)
      val pp = prev.files.map(_.path).toSet
      val cp = cur.files.map(_.path).toSet
      cp.count(!pp(_)) + pp.count(!cp(_)) +
        (cur.deletes.map(_.path).toSet -- prev.deletes.map(_.path)).size
    }
    val before = Warehouse.changeCountFullDiffs.get()
    (1L to head).foreach { v =>
      // the line-diff may only ever OVERCOUNT (superseded-entry tombstones),
      // and for plain delta-shaped commits must agree exactly
      assert(wh.commitChangedEntryCount("t", v) >= fullDiff(v),
        s"v=$v undercounted")
    }
    // appends and MOR-delta commits stay on the O(delta) root-line path;
    // only coalescing commits (rename rewrites every stats key; delete
    // compaction rewrites most entries) may fall back to the full replay
    val fallbacks = Warehouse.changeCountFullDiffs.get() - before
    assert(fallbacks <= 2, s"expected at most the 2 coalescing commits to fall back, got $fallbacks")
    assert(wh.commitChangedEntryCount("t", 1) == fullDiff(1))
    assert(wh.commitChangedEntryCount("t", 2) == fullDiff(2))
    assert(wh.commitChangedEntryCount("t", 3) == fullDiff(3))
  }

  test("empty diff yields an empty frame with the snapshot schema") {
    val wh = new Warehouse(spark, tmpDir("cf-empty"))
    val v1 = wh.append("t", df(("a", 1)))
    val out = wh.readAdded("t", v1, v1)
    assert(out.schema.fieldNames.toSeq == Seq("Id", "Amount"))
    assert(out.count() == 0)
  }
}
