package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** Column-id schema evolution (RENAME, then DROP): warehouse scans resolve
  * columns by the parquet field ids the writer stamps into every file, so
  * a rename is one metadata-only manifest commit — files never rewrite,
  * old snapshots keep their old labels over the same bytes, manifest
  * stats/spec/delete-keys remap, and a dropped column's id is never
  * reused (a re-added namesake reads null, not the dead bytes).
  */
class ColumnEvolutionSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", LongType)))
  private def kv(rows: (Long, Long)*) = spark.createDataFrame(
    rows.map(r => Row(r._1, r._2)).asJava, schema)
  // post-rename batches must carry the NEW column name (target-schema-wins
  // conform drops unknown columns, it does not guess renames)
  private def kw(rows: (Long, Long)*) = spark.createDataFrame(
    rows.map(r => Row(r._1, r._2)).asJava,
    StructType(Seq(StructField("k", LongType), StructField("w", LongType))))
  private def bag(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("rename is metadata-only: mixed old/new files resolve by id, time travel keeps old labels") {
    val root = tmpDir("ce-rename")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", kv((1L, 10L), (2L, 20L)), statsCols = Seq("k", "v")) // v1: files named (k, v)
    val preRename = wh.currentVersion("t")
    val filesBefore = wh.dataFiles("t").map(_.path).toSet
    wh.renameColumn("t", "v", "w")
    // zero data rewrite: identical file paths
    assert(wh.dataFiles("t").map(_.path).toSet == filesBefore)
    // new writes land files physically named (k, w); the scan mixes both
    wh.append("t", kw((3L, 30L)), statsCols = Seq("k", "w"))
    assert(wh.load("t").columns.toSeq == Seq("k", "w"))
    assert(bag(wh.load("t")) == Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, 30L)))
    // merge upserts THROUGH the renamed column over pre-rename files
    wh.merge("t", kw((1L, 111L)), Seq("k"))
    assert(bag(wh.load("t").filter(col("k") === 1L)) == Seq(Seq(1L, 111L)))
    // time travel: the pre-rename snapshot serves its OLD label, same bytes
    val old = wh.loadVersion("t", preRename)
    assert(old.columns.toSeq == Seq("k", "v"))
    assert(bag(old) == Seq(Seq(1L, 10L), Seq(2L, 20L)))
  }

  test("manifest stats survive the rename: pruning works under the new name") {
    val root = tmpDir("ce-stats")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // two well-separated files so bounds can prove disjointness
    wh.append("t", kv((1L to 10L).map(i => (i, i)): _*), statsCols = Seq("k", "v"))
    wh.append("t", kv((100L to 110L).map(i => (i, i)): _*), statsCols = Seq("k", "v"))
    wh.renameColumn("t", "v", "w")
    // stat keys remapped in place
    assert(wh.dataFiles("t").forall(f => f.stats.contains("w") && !f.stats.contains("v")))
    // a predicate on the NEW name prunes the disjoint file
    val r = wh.deleteWhere("t", col("w") >= 100L)
    assert(r.prunedFiles > 0, s"expected stat pruning under the renamed column, got $r")
    assert(wh.load("t").count() == 10L)
  }

  test("partition transforms follow the rename: spec, stat keys, and hive-split writes") {
    val root = tmpDir("ce-spec")
    val wh = new Warehouse(spark, root)
    val s2 = StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType)))
    wh.create("t", s2, Seq("days(ts)"))
    val ts = (d: String) => java.sql.Timestamp.valueOf(d)
    wh.append("t", spark.createDataFrame(Seq(
      Row(1L, ts("2024-01-01 00:00:00")), Row(2L, ts("2024-01-05 00:00:00"))).asJava, s2),
      statsCols = Seq("id"))
    wh.renameColumn("t", "ts", "event_ts")
    assert(wh.partitionSpec("t") == Seq("days(event_ts)"))
    assert(wh.dataFiles("t").forall(f =>
      f.stats.contains("days(event_ts)") && !f.stats.contains("days(ts)")))
    // the next write still hive-splits on the (renamed) transform
    wh.append("t", spark.createDataFrame(Seq(
      Row(3L, ts("2024-01-09 00:00:00"))).asJava,
      StructType(Seq(StructField("id", LongType), StructField("event_ts", TimestampType)))),
      statsCols = Seq("id"))
    val newest = wh.dataFiles("t").maxBy(_.seq)
    val st = newest.stats.get("days(event_ts)")
    assert(st.exists(c => c.min == c.max), s"new file must be single-valued per transform: $newest")
  }

  test("pending equality deletes keep applying across the rename (key files resolve by id)") {
    val root = tmpDir("ce-del")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", kv((1L, 10L), (2L, 20L), (3L, 30L)), statsCols = Seq("v"))
    wh.equalityDelete("t", kv((2L, 20L)).select("v")) // keyed on the about-to-be-renamed column
    wh.renameColumn("t", "v", "w")
    assert(wh.currentManifest("t").deletes.forall(_.cols == Seq("w")))
    assert(bag(wh.load("t").select("k")) == Seq(Seq(1L), Seq(3L)))
    // and materialization still resolves the old-named key file by id
    wh.compactDeletes("t")
    assert(bag(wh.load("t").select("k")) == Seq(Seq(1L), Seq(3L)))
  }

  test("readChanges works across a rename (same field id diffs by value under the new name)") {
    val root = tmpDir("ce-feed")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", kv((1L, 10L), (2L, 20L)), statsCols = Seq("k"))
    wh.renameColumn("t", "v", "w")
    wh.merge("t", kw((2L, 222L)), Seq("k"))
    val ch = wh.readChanges("t", 0L, wh.currentVersion("t"))
    assert(ch.columns.toSeq == Seq("k", "w", "_change_type"))
    val got = bag(ch)
    assert(got == Seq(Seq(1L, 10L, "+I"), Seq(2L, 222L, "+I")),
      s"rename must not fabricate a diff for untouched rows: $got")
  }

  test("drop then re-add: the old id is never reused, the namesake reads null") {
    val root = tmpDir("ce-drop")
    val wh = new Warehouse(spark, root)
    val s3 = StructType(Seq(StructField("k", LongType), StructField("v", LongType),
      StructField("extra", StringType)))
    wh.create("t", s3)
    wh.append("t", spark.createDataFrame(Seq(
      Row(1L, 10L, "secret"), Row(2L, 20L, "hidden")).asJava, s3), statsCols = Seq("k"))
    val preDrop = wh.currentVersion("t")
    wh.dropColumn("t", "extra")
    assert(wh.load("t").columns.toSeq == Seq("k", "v"))
    // time travel still reads the dropped bytes under the old schema
    assert(bag(wh.loadVersion("t", preDrop).select("extra")) ==
      Seq(Seq("hidden"), Seq("secret")))
    // re-added namesake gets a FRESH id: old files' 'extra' bytes stay dead
    wh.addColumns("t", Seq(StructField("extra", StringType)))
    assert(bag(wh.load("t").select("extra")) == Seq(Seq(null), Seq(null)))
    // readChanges across the drop: rows differing only in the dropped
    // column collapse; nothing else changed, so the feed is empty
    assert(wh.readChanges("t", preDrop, preDrop + 1).isEmpty)
  }

  test("drop then re-add on a FIRST-APPEND auto-created table: id still never reused") {
    // auto-create (no explicit create()) is the path that historically never
    // wrote the id high-water mark — without the dropColumn/writeBatch
    // reservations, addColumns would hand the dropped id to the new column
    // and scans would resurrect the dead column's bytes from pre-drop files
    val root = tmpDir("ce-autocreate-drop")
    val wh = new Warehouse(spark, root)
    wh.append("t", kv((1L, 10L), (2L, 20L)), statsCols = Seq("k")) // auto-create
    wh.dropColumn("t", "v")
    wh.addColumns("t", Seq(StructField("v2", LongType)))
    val got = wh.load("t").orderBy("k").collect().toSeq
    assert(got.forall(_.isNullAt(1)),
      s"re-added column must read NULL, not the dropped column's bytes: $got")
    // and the ids really are distinct in the manifest schema
    val ids = wh.currentManifest("t").schema.fields
      .map(f => f.metadata.getLong("parquet.field.id")).toSeq
    assert(ids.distinct.size == ids.size && ids.max >= 3L,
      s"dropped id reused: $ids")
  }

  test("refusals: collision, partition source, pending-delete key, last column") {
    val root = tmpDir("ce-refuse")
    val wh = new Warehouse(spark, root)
    val s2 = StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType)))
    wh.create("t", s2, Seq("days(ts)"))
    intercept[IllegalArgumentException](wh.renameColumn("t", "id", "ts"))
    intercept[IllegalArgumentException](wh.dropColumn("t", "ts"))   // partition source
    wh.create("u", schema)
    wh.append("u", kv((1L, 10L)), statsCols = Seq("v"))
    wh.equalityDelete("u", kv((1L, 10L)).select("v"))
    intercept[IllegalArgumentException](wh.dropColumn("u", "v"))    // pending delete key
    wh.create("w1", StructType(Seq(StructField("only", LongType))))
    intercept[IllegalArgumentException](wh.dropColumn("w1", "only")) // last column
  }

  test("SQL DDL faces: ALTER TABLE RENAME COLUMN and DROP COLUMN") {
    val root = tmpDir("ce-sql")
    spark.conf.set("spark.sql.catalog.cevo", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cevo.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", kv((1L, 10L), (2L, 20L)), statsCols = Seq("k"))
    spark.sql("ALTER TABLE cevo.t RENAME COLUMN v TO amount")
    assert(bag(spark.sql("SELECT k, amount FROM cevo.t ORDER BY k")) ==
      Seq(Seq(1L, 10L), Seq(2L, 20L)))
    spark.sql("ALTER TABLE cevo.t DROP COLUMN amount")
    assert(spark.sql("SELECT * FROM cevo.t").columns.toSeq == Seq("k"))
  }
}
