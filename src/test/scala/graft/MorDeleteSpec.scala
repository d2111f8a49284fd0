package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Merge-on-read equality deletes: O(batch) delete commits that rewrite no
  * data file, seq-aware reads (re-inserted rows survive), time travel to
  * pre-delete snapshots, stat-pruned compaction, auto-materialization
  * before rewrite ops, SQL-face application via MorReadRule, and expiry
  * retention of referenced delete files.
  */
class MorDeleteSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", LongType)))

  private def df(rows: (Long, String, Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)

  private def keys(ids: Long*) =
    spark.createDataFrame(ids.map(Row(_)).asJava,
      StructType(Seq(StructField("id", LongType))))

  private def ids(wh: Warehouse, t: String) =
    wh.load(t).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("equality delete: O(batch) commit, no data file rewritten, rows gone on read") {
    val wh = new Warehouse(spark, tmpDir("mor-basic"))
    wh.replace("t", df((1, "a", 10), (2, "a", 20), (3, "b", 30)), statsCols = Seq("id"))
    val before = wh.dataFiles("t").map(_.path)
    val v = wh.equalityDelete("t", keys(2))
    assert(v == wh.currentVersion("t"))
    assert(wh.dataFiles("t").map(_.path) == before, "no data file may be rewritten")
    assert(wh.currentManifest("t").deletes.size == 1)
    assert(ids(wh, "t") == Seq(1L, 3L))
    // empty key set is a no-op commit
    assert(wh.equalityDelete("t", keys()) == v)
  }

  test("seq shielding: rows re-inserted AFTER the delete survive reads") {
    val wh = new Warehouse(spark, tmpDir("mor-seq"))
    wh.replace("t", df((1, "a", 10), (2, "a", 20)), statsCols = Seq("id"))
    wh.equalityDelete("t", keys(2))
    wh.append("t", df((2, "a", 99)), statsCols = Seq("id")) // re-insert
    assert(wh.load("t").filter(col("id") === 2).collect().map(_.getLong(2)).toSeq ==
      Seq(99L), "the re-inserted row must survive the earlier delete")
    assert(ids(wh, "t") == Seq(1L, 2L))
    // a LATER delete takes out both the old and the re-inserted row
    wh.equalityDelete("t", keys(2))
    assert(ids(wh, "t") == Seq(1L))
  }

  test("time travel: pre-delete snapshots still show the rows; restore carries deletes") {
    val wh = new Warehouse(spark, tmpDir("mor-tt"))
    wh.replace("t", df((1, "a", 10), (2, "a", 20)))
    val v0 = wh.currentVersion("t")
    val vDel = wh.equalityDelete("t", keys(1))
    assert(wh.loadVersion("t", v0).count() == 2)
    assert(wh.loadVersion("t", vDel).count() == 1)
    wh.restore("t", v0)
    assert(wh.load("t").count() == 2)
    wh.restore("t", vDel)
    assert(ids(wh, "t") == Seq(2L))
  }

  test("composite keys and multiple delete files chain; null keys never match") {
    val wh = new Warehouse(spark, tmpDir("mor-multi"))
    wh.replace("t", df((1, "a", 10), (2, "a", 20), (3, "b", 30), (4, null, 40)))
    // composite-key delete (id, grp) then a single-key delete on id
    val cks = spark.createDataFrame(
      Seq(Row(1L, "a"), Row(3L, "zzz"), Row(null, "b")).asJava,
      StructType(Seq(StructField("id", LongType), StructField("grp", StringType))))
    wh.equalityDelete("t", cks)
    assert(ids(wh, "t") == Seq(2L, 3L, 4L),
      "only the full-tuple match deletes; null key tuples match nothing")
    wh.equalityDelete("t", keys(3))
    assert(ids(wh, "t") == Seq(2L, 4L))
    assert(wh.currentManifest("t").deletes.size == 2)
  }

  test("compactDeletes: stat-disjoint files carry byte-identical, reads unchanged") {
    val wh = new Warehouse(spark, tmpDir("mor-compact"))
    // two appends with disjoint id ranges -> per-file id stats
    wh.append("t", df((1, "a", 10), (2, "a", 20)).repartition(1), statsCols = Seq("id"))
    wh.append("t", df((100, "b", 1), (101, "b", 2)).repartition(1), statsCols = Seq("id"))
    wh.equalityDelete("t", keys(2))
    val snapshot = wh.load("t").collect().toSet
    val untouchedPath = wh.dataFiles("t").find(_.stats("id").min == "100").get.path
    wh.compactDeletes("t")
    val man = wh.currentManifest("t")
    assert(man.deletes.isEmpty, "compaction clears the delete list")
    assert(man.files.exists(_.path == untouchedPath),
      "stat-disjoint file must carry over byte-identical")
    assert(wh.load("t").collect().toSet == snapshot, "reads unchanged by compaction")
    assert(ids(wh, "t") == Seq(1L, 100L, 101L))
  }

  test("rewrite ops materialize pending deletes first — no resurrection") {
    val wh = new Warehouse(spark, tmpDir("mor-rewrite"))
    wh.replace("t", df((1, "a", 10), (2, "a", 20), (3, "b", 30)), statsCols = Seq("id"))
    wh.equalityDelete("t", keys(2))
    // merge on an unrelated key: the rewrite must not resurrect id=2
    wh.merge("t", df((3, "b", 31)), Seq("id"))
    assert(wh.currentManifest("t").deletes.isEmpty)
    assert(ids(wh, "t") == Seq(1L, 3L))
    assert(wh.load("t").filter(col("id") === 3).head().getLong(2) == 31L)

    wh.equalityDelete("t", keys(1))
    wh.compact("t") // bin-pack path
    assert(wh.currentManifest("t").deletes.isEmpty && ids(wh, "t") == Seq(3L))
  }

  test("SQL face: SELECT through the catalog applies pending deletes (MorReadRule)") {
    val root = tmpDir("mor-sql")
    spark.conf.set("spark.sql.catalog.gmor", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmor.root", root)
    val wh = new Warehouse(spark, root)
    wh.replace("t", df((1, "a", 10), (2, "a", 20), (3, "b", 30)))
    val v0 = wh.currentVersion("t")
    wh.equalityDelete("t", keys(2))
    assert(spark.sql("SELECT id FROM gmor.t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(spark.sql("SELECT sum(v) FROM gmor.t").head().getLong(0) == 40L)
    // time travel to the pre-delete snapshot through SQL
    assert(spark.sql(s"SELECT count(*) FROM gmor.t VERSION AS OF $v0").head().getLong(0) == 3)
    // INSERT while deletes are pending: new rows shielded, then visible
    spark.sql("INSERT INTO gmor.t VALUES (2, 'a', 77)")
    assert(spark.sql("SELECT v FROM gmor.t WHERE id = 2").collect()
      .map(_.getLong(0)).toSeq == Seq(77L))
    // pending deletes are inspectable via the $deletes metadata table
    val md = spark.sql("SELECT file_path, key_count, key_columns FROM gmor.`t$deletes`").collect()
    assert(md.length == 1 && md(0).getLong(1) == 1 &&
      md(0).getSeq[String](2) == Seq("id"))
  }

  test("SQL DELETE FROM: stat-pruned copy-on-write; untranslatable predicates fail loudly") {
    val root = tmpDir("mor-sqldel")
    spark.conf.set("spark.sql.catalog.gdel", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdel.root", root)
    val wh = new Warehouse(spark, root)
    wh.replace("t", df((1, "a", 10), (2, "a", 20), (3, "b", 30)), statsCols = Seq("id"))
    spark.sql("DELETE FROM gdel.t WHERE id = 2 OR grp = 'b'")
    assert(ids(wh, "t") == Seq(1L))
    // complex predicate shapes: IN, IS NULL, inequality
    wh.replace("t", df((1, "a", 10), (2, null, 20), (3, "b", 30), (4, "c", 40)))
    spark.sql("DELETE FROM gdel.t WHERE id IN (1, 4) AND v >= 10")
    assert(ids(wh, "t") == Seq(2L, 3L))
    spark.sql("DELETE FROM gdel.t WHERE grp IS NULL")
    assert(ids(wh, "t") == Seq(3L))
    // a predicate the source cannot express (subquery) must error, not
    // silently delete the wrong rows
    intercept[Exception](
      spark.sql("DELETE FROM gdel.t WHERE id IN (SELECT id FROM gdel.t)"))
    assert(ids(wh, "t") == Seq(3L))
    // unconditional DELETE = truncate
    spark.sql("DELETE FROM gdel.t")
    assert(wh.load("t").count() == 0)
  }

  test("MERGE INTO ... WHEN MATCHED THEN DELETE commits an O(batch) equality delete") {
    val root = tmpDir("mor-mergedel")
    spark.conf.set("spark.sql.catalog.gmd", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmd.root", root)
    val wh = new Warehouse(spark, root)
    wh.replace("t", df((1, "a", 10), (2, "a", 20), (3, "b", 30)), statsCols = Seq("id"))
    val before = wh.dataFiles("t").map(_.path)
    df((2, "x", 0), (3, "y", 0), (99, "z", 0)).createOrReplaceTempView("mdel_src")
    spark.sql(
      """MERGE INTO gmd.t t USING mdel_src s ON t.id = s.id
        |WHEN MATCHED THEN DELETE""".stripMargin)
    assert(ids(wh, "t") == Seq(1L), "matched rows deleted; unmatched source keys inert")
    assert(wh.dataFiles("t").map(_.path) == before,
      "merge-delete must be MOR: no data file rewritten")
    assert(wh.currentManifest("t").deletes.nonEmpty)
    // DELETE + INSERT now combines (replace-shaped rewrite): the target read
    // inside the rewrite sees the PENDING MOR deletes (rows 2/3 stay gone —
    // nothing matches), so the unmatched source rows insert
    spark.sql(
      """MERGE INTO gmd.t t USING mdel_src s ON t.id = s.id
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(ids(wh, "t") == Seq(1L, 2L, 3L, 99L),
      "MOR-deleted rows must stay deleted; unmatched source rows insert")
  }

  test("expiry keeps referenced delete files; sweeps them with their snapshots") {
    val root = tmpDir("mor-expire")
    val wh = new Warehouse(spark, root)
    wh.replace("t", df((1, "a", 10), (2, "a", 20)))
    wh.equalityDelete("t", keys(1))
    val delPath = wh.currentManifest("t").deletes.head.path
    wh.expireSnapshots("t", keepLast = 1, orphanGraceMs = 0L)
    assert(Files.exists(Paths.get(root, "t", delPath)), "referenced delete file retained")
    assert(ids(wh, "t") == Seq(2L))
    // compaction drops the reference; expiry then sweeps the delete file
    wh.compactDeletes("t")
    wh.expireSnapshots("t", keepLast = 1, orphanGraceMs = 0L)
    assert(!Files.exists(Paths.get(root, "t", delPath)), "unreferenced delete file swept")
    assert(ids(wh, "t") == Seq(2L))
  }
}
