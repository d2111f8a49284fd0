package graft

import java.nio.file.Paths

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.{Manifest, Warehouse}

/** SQL stored procedures (`CALL graft.system.*` — Spark 4 ProcedureCatalog
  * face, [[graft.catalog.GraftProcedures]]): each maintenance operation is
  * SQL-addressable with named/positional/default arguments, returns a
  * one-row outcome, and lands through the same commit protocol as the
  * programmatic face.
  */
class ProcedureSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def freshCatalog(tag: String): (Warehouse, String, String) = {
    val root = tmpDir(s"proc-$tag")
    val cat = s"proc$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (new Warehouse(spark, root), cat, root)
  }

  private val schema = StructType(Seq(StructField("k", LongType)))
  private def df(n: Long, from: Long = 0L) = TestSpark.spark.createDataFrame(
    (from until from + n).map(Row(_)).asJava, schema)

  test("compact: named args, defaults, one-row outcome; rows intact") {
    val (wh, cat, root) = freshCatalog("compact")
    wh.create("t", schema)
    (0 until 6).foreach(i => wh.append("t", df(10, i * 10), statsCols = Seq("k")))
    val before = wh.currentManifest("t").files.size
    val out = spark.sql(s"CALL $cat.system.compact(tbl => 't', target_mb => 64)").head()
    assert(out.getAs[Int]("files_before") == before)
    assert(out.getAs[Int]("files_after") < before)
    assert(wh.load("t").count() == 60)
  }

  test("expire_snapshots + restore: history trimmed, rollback committed as a new version") {
    val (wh, cat, root) = freshCatalog("expire")
    wh.create("t", schema)
    (0 until 5).foreach(i => wh.append("t", df(2, i * 10)))
    val rv = spark.sql(s"CALL $cat.system.restore(tbl => 't', version => 2)")
      .head().getLong(0)
    assert(rv == 6L && wh.load("t").count() == 4)
    val kept = spark.sql(s"CALL $cat.system.expire_snapshots(tbl => 't', keep_last => 2)")
      .head().getInt(0)
    assert(kept == 2 && wh.history("t").size == 2)
    assert(wh.load("t").count() == 4)
  }

  test("rewrite_manifests: coalesces segments metadata-only; content identical") {
    val (wh, cat, root) = freshCatalog("rwm")
    wh.create("t", schema)
    (0 until 10).foreach(i => wh.append("t", df(3, i * 10), statsCols = Seq("k")))
    val td = Paths.get(root, "t")
    val before = wh.currentManifest("t")
    val segsBefore = Manifest.segmentRefs(
      td.resolve(s"m${wh.currentVersion("t")}.manifest"))
    assert(segsBefore.size > 1)
    val v = spark.sql(s"CALL $cat.system.rewrite_manifests(tbl => 't')").head().getLong(0)
    val segsAfter = Manifest.segmentRefs(td.resolve(s"m$v.manifest"))
    assert(segsAfter.size == 1, s"expected one segment, got ${segsAfter.size}")
    val after = wh.currentManifest("t")
    assert(after.files.toSet == before.files.toSet && after.deletes == before.deletes)
    assert(wh.load("t").count() == 30)
  }

  test("compact_deletes + maintain: MOR deletes materialize; healthy table is a no-op") {
    val (wh, cat, root) = freshCatalog("cdel")
    wh.create("t", schema)
    wh.append("t", df(20), statsCols = Seq("k"))
    wh.equalityDelete("t", df(5))
    val out = spark.sql(s"CALL $cat.system.compact_deletes(tbl => 't')").head()
    assert(out.getAs[Int]("pending_deletes_before") == 1)
    assert(wh.currentManifest("t").deletes.isEmpty)
    assert(wh.load("t").count() == 15)
    val m = spark.sql(s"CALL $cat.system.maintain(tbl => 't')").head()
    assert(!m.getAs[Boolean]("deletes_compacted") && !m.getAs[Boolean]("files_compacted"))
    assert(m.getAs[Long]("pending_drained") == 0L &&
      m.getAs[String]("index_compacted") == "")
  }

  test("maintain_all sweeps the whole catalog: one row per table, actions where signals fire") {
    val (wh, cat, _) = freshCatalog("mall")
    // healthy table, fragmented table, MOR-delete table
    wh.create("ok", schema)
    wh.append("ok", df(20), statsCols = Seq("k"))
    wh.create("frag", schema)
    (0 until 10).foreach(i => wh.append("frag", df(3, i * 3), statsCols = Seq("k")))
    wh.create("mor", schema)
    wh.append("mor", df(20), statsCols = Seq("k"))
    wh.equalityDelete("mor", df(5))
    val rows = spark.sql(s"CALL $cat.system.maintain_all()").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("ok", "frag", "mor"), rows.keySet.toString)
    assert(!rows("ok").getAs[Boolean]("files_compacted") &&
      !rows("ok").getAs[Boolean]("deletes_compacted"))
    assert(rows("frag").getAs[Boolean]("files_compacted"))
    assert(rows("mor").getAs[Boolean]("deletes_compacted"))
    assert(wh.currentManifest("mor").deletes.isEmpty)
    assert(wh.load("frag").count() == 30 && wh.load("mor").count() == 15)
    // idempotent: a second sweep over the now-healthy catalog does nothing
    assert(spark.sql(s"CALL $cat.system.maintain_all()").collect().forall(r =>
      !r.getAs[Boolean]("files_compacted") && !r.getAs[Boolean]("deletes_compacted")))
  }

  test("maintain drains a stream-maintained rollup's pending extremes over SQL") {
    // the round-17 gap: a SQL-only operator could never repair a
    // stream-maintained extremal rollup — drainPendingExtremes was
    // programmatic-only. CALL maintain now reaches it via the recorded
    // fact/spec sidecars.
    import graft.sink.IncrementalRollup
    import graft.streaming.ChangeFeedStream
    val (wh, cat, _) = freshCatalog("pend")
    val facts = StructType(Seq(
      StructField("k", LongType), StructField("v", LongType)))
    def kv(rows: (Long, Long)*) = TestSpark.spark.createDataFrame(
      rows.map(r => Row(r._1, r._2)).asJava, facts)
    val spec = IncrementalRollup.Spec(Nil, Seq(
      IncrementalRollup.CountStar("n"), IncrementalRollup.MaxOf(col("v"), "hi")))
    wh.create("fact", facts)
    wh.append("fact", kv((1L, 9L), (2L, 3L)), statsCols = Seq("k"))
    ChangeFeedStream.maintainRollup(wh, "fact", "roll", spec, "sql")
    wh.deleteWhere("fact", col("k") === 1L) // the max goes → pending
    ChangeFeedStream.maintainRollup(wh, "fact", "roll", spec, "sql")
    val m = spark.sql(s"CALL $cat.system.maintain(tbl => 'roll')").head()
    assert(m.getAs[Long]("pending_drained") == 1L, m.toString)
    val got = IncrementalRollup.read(wh, "roll", spec).head()
    assert(got.getAs[Long]("n") == 1L && got.getAs[Long]("hi") == 3L, got.toString)
  }

  test("create_tag / drop_tag: positional args, default version, tag-travel works") {
    val (wh, cat, root) = freshCatalog("tag")
    wh.create("t", schema)
    wh.append("t", df(3))
    spark.sql(s"CALL $cat.system.create_tag('t', 'audited')")
    wh.append("t", df(3, 100))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t VERSION AS OF 'audited'")
      .head().getLong(0) == 3)
    assert(spark.sql(s"CALL $cat.system.drop_tag('t', 'audited')").head().getBoolean(0))
    assert(wh.tags("t").isEmpty)
  }

  test("expire_snapshots older_than_ms: a past instant drops nothing, a future instant trims to keep_last") {
    val (wh, cat, root) = freshCatalog("older")
    wh.create("t", schema)
    (0 until 4).foreach(i => wh.append("t", df(2, i * 10)))
    assert(wh.history("t").size == 5)
    // every commit is newer than epoch-ms 1000 => nothing droppable
    spark.sql(s"CALL $cat.system.expire_snapshots(tbl => 't', keep_last => 1, older_than_ms => 1000)")
    assert(wh.history("t").size == 5)
    val future = System.currentTimeMillis() + 3600000L
    spark.sql(s"CALL $cat.system.expire_snapshots(tbl => 't', keep_last => 2, older_than_ms => $future)")
    assert(wh.history("t").size == 2)
    assert(wh.load("t").count() == 8)
  }

  test("expire_cdc_stages: sweeps aged staged windows and tmp-*; swept windows re-materialize") {
    val (wh, cat, root) = freshCatalog("cdcstage")
    wh.create("t", schema)
    wh.append("t", df(3), statsCols = Seq("k"))
    // a batch $changes read stages its window under <t>/_cdc
    val expected = spark.read.table(s"$cat.`t$$changes`").collect().length
    assert(expected == 3)
    val cdc = Paths.get(root, "t", "_cdc")
    java.nio.file.Files.createDirectories(cdc.resolve("tmp-crashed"))
    def entries() = {
      val s = java.nio.file.Files.list(cdc)
      try { val b = Seq.newBuilder[String]; s.forEach(p => b += p.getFileName.toString); b.result() }
      finally s.close()
    }
    assert(entries().exists(_.startsWith("w")) && entries().exists(_.startsWith("tmp-")))
    // default retention (24 h): fresh stages survive
    assert(spark.sql(s"CALL $cat.system.expire_cdc_stages(tbl => 't')")
      .head().getAs[Int]("swept") == 0)
    // older_than_ms => 0: published windows age out immediately, but a
    // tmp-* dir may be a CONCURRENT stager's in-flight write — it keeps a
    // minimum age floor so an aggressive manual sweep can't fail a racing
    // publish mid-write
    assert(spark.sql(s"CALL $cat.system.expire_cdc_stages(tbl => 't', older_than_ms => 0)")
      .head().getAs[Int]("swept") == 1)
    assert(entries() == Seq("tmp-crashed"))
    // an AGED tmp-* (a genuinely crashed stager) does sweep
    java.nio.file.Files.setLastModifiedTime(cdc.resolve("tmp-crashed"),
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    assert(spark.sql(s"CALL $cat.system.expire_cdc_stages(tbl => 't', older_than_ms => 0)")
      .head().getAs[Int]("swept") == 1)
    assert(entries().isEmpty)
    // a swept window simply re-materializes: same deterministic bag
    assert(spark.read.table(s"$cat.`t$$changes`").collect().length == expected)
  }

  test("$manifests metadata table: root/segment storage facts per snapshot") {
    val (wh, cat, root) = freshCatalog("mmeta")
    wh.create("t", schema)
    (0 until 4).foreach(i => wh.append("t", df(2, i * 10), statsCols = Seq("k")))
    val rows = spark.sql(s"SELECT * FROM $cat.`t$$manifests` ORDER BY version").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val head = rows.last
    assert(head.getAs[Long]("n_segments") == 4L) // one fresh segment per append
    assert(head.getAs[Long]("n_tombstones") == 0L)
    val segs = head.getAs[scala.collection.Seq[Row]]("segments")
    assert(segs.size == 4 && segs.forall(_.getAs[Long]("bytes") > 0))
    // rewrite_manifests collapses the head root to one segment, visible here
    spark.sql(s"CALL $cat.system.rewrite_manifests(tbl => 't')")
    val after = spark.sql(
      s"SELECT n_segments FROM $cat.`t$$manifests` ORDER BY version DESC LIMIT 1").head()
    assert(after.getLong(0) == 1L)
  }

  test("SHOW PROCEDURES / DESCRIBE PROCEDURE surface the registry") {
    val (wh, cat, root) = freshCatalog("show")
    wh.create("t", schema)
    val names = spark.sql(s"SHOW PROCEDURES IN $cat.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    assert(names == Set("compact", "compact_files", "compact_deletes",
      "expire_snapshots", "expire_cdc_stages", "maintain", "maintain_all",
      "rewrite_manifests", "restore", "create_tag", "drop_tag", "create_branch",
      "publish_branch", "drop_branch", "analyze", "analyze_incremental",
      "build_bloom_index"))
    val desc = spark.sql(s"DESCRIBE PROCEDURE $cat.system.maintain")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("maintain") && desc.contains("policy-driven"))
  }

  test("unknown procedure and wrong namespace fail loudly with the known list") {
    val (wh, cat, root) = freshCatalog("unknown")
    wh.create("t", schema)
    val e = intercept[Exception](spark.sql(s"CALL $cat.system.vacuum(tbl => 't')"))
    assert(e.getMessage.contains("no such procedure") ||
      e.getMessage.contains("vacuum"))
  }
}
