package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** POSITIONAL merge-on-read deletes as DELETION VECTORS
  * (`Warehouse.positionDelete` + `functions.expressions.DeletionVector`):
  * commit per-target-file roaring bitmaps of deleted ordinals instead of
  * keys, pairs, or rewrites; reads probe the bitmap inside the scan's
  * codegen span via `_metadata.row_index` (no anti-join), and re-deleting
  * from a file MERGES into one superseding vector (Iceberg-v3 DV
  * semantics). Pins the delete semantics, re-insert shielding,
  * materialization, composition with equality deletes, rename survival,
  * the nested (hive-split) path form, delete-churn metadata boundedness,
  * and readChanges/diffRows exactness across a positional-delete commit.
  */
class PositionalDeleteSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType), StructField("Amount", LongType)))

  private def df(rows: (String, Long)*): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private def rowsOf(d: DataFrame): Set[(String, Long)] =
    d.collect().map(r => (r.getString(0), r.getLong(1))).toSet

  test("positionDelete removes exactly the predicate's rows; prior snapshot intact") {
    val wh = new Warehouse(spark, tmpDir("pd-basic"))
    val v1 = wh.append("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L), statsCols = Seq("Amount"))
    val rep = wh.positionDelete("t", col("Amount") % 2 === 0)
    assert(rep.positions == 2L)
    assert(rowsOf(wh.load("t")) == Set("a" -> 1L, "c" -> 3L))
    assert(rowsOf(wh.loadVersion("t", v1)).size == 4) // time travel unaffected
    // deletes are pending (MOR), no data file rewritten
    val man = wh.currentManifest("t")
    assert(man.deletes.nonEmpty && man.deletes.forall(_.kind == "dv"))
    assert(man.files.map(_.path) == wh.manifestAt("t", v1).files.map(_.path))
  }

  test("re-inserted rows with the same values survive (ordinals reference old files only)") {
    val wh = new Warehouse(spark, tmpDir("pd-shield"))
    wh.append("t", df("a" -> 1L, "b" -> 2L))
    wh.positionDelete("t", col("Id") === "b")
    wh.append("t", df("b" -> 2L)) // same VALUE, new file, new ordinal
    assert(rowsOf(wh.load("t")) == Set("a" -> 1L, "b" -> 2L))
  }

  test("SQL null semantics: rows where the predicate is NULL are kept") {
    val wh = new Warehouse(spark, tmpDir("pd-null"))
    wh.append("t", spark.createDataFrame(
      Seq(Row("a", 1L), Row("b", null), Row("c", 3L)).asJava, schema))
    wh.positionDelete("t", col("Amount") > 2L) // NULL for b
    assert(wh.load("t").count() == 2)
  }

  test("no-match predicate commits nothing; unresolvable-free path prunes files") {
    val wh = new Warehouse(spark, tmpDir("pd-noop"))
    val v = wh.append("t", df("a" -> 1L, "b" -> 2L), statsCols = Seq("Amount"))
    val rep = wh.positionDelete("t", col("Amount") > 100L)
    assert(rep.version == v && rep.positions == 0L)
    assert(rep.prunedFiles >= 1) // stat bounds excluded every file
    assert(wh.currentManifest("t").deletes.isEmpty)
  }

  test("compactDeletes materializes: rows unchanged, pending cleared, disjoint files carried") {
    val wh = new Warehouse(spark, tmpDir("pd-compact"))
    wh.append("t", df("a" -> 1L, "b" -> 2L), statsCols = Seq("Id"))
    wh.append("t", df("c" -> 3L, "d" -> 4L), statsCols = Seq("Id"))
    val before = wh.currentManifest("t").files.map(_.path).toSet
    wh.positionDelete("t", col("Id") === "d") // touches only the second append's file(s)
    val expect = rowsOf(wh.load("t"))
    wh.compactDeletes("t")
    assert(rowsOf(wh.load("t")) == expect)
    val man = wh.currentManifest("t")
    assert(man.deletes.isEmpty)
    // files outside the delete's path bounds carried byte-identical (path-preserved)
    val carried = man.files.map(_.path).toSet.intersect(before)
    assert(carried.nonEmpty, "expected provably-untouched files to carry over")
  }

  test("equality and positional deletes pending together compose correctly") {
    val wh = new Warehouse(spark, tmpDir("pd-mixed"))
    wh.append("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
    wh.equalityDelete("t", df("a" -> 0L).select("Id"))
    wh.positionDelete("t", col("Amount") === 3L)
    assert(rowsOf(wh.load("t")) == Set("b" -> 2L, "d" -> 4L))
    wh.compactDeletes("t")
    assert(rowsOf(wh.load("t")) == Set("b" -> 2L, "d" -> 4L))
  }

  test("positional deletes survive table rename (pairs are table-relative)") {
    val root = tmpDir("pd-rename")
    val wh = new Warehouse(spark, root)
    wh.append("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L))
    wh.positionDelete("t", col("Id") === "b")
    wh.rename("t", "t2")
    assert(rowsOf(wh.load("t2")) == Set("a" -> 1L, "c" -> 3L))
  }

  test("hive-split (partitioned) tables: nested data-file paths match exactly") {
    val wh = new Warehouse(spark, tmpDir("pd-part"))
    val d = spark.range(0, 200).select(concat(lit("k"), col("id")).as("Id"), col("id").as("Amount"))
    wh.create("t", d.schema, Seq("bucket(4,Amount)"))
    wh.append("t", d)
    val rep = wh.positionDelete("t", col("Amount") >= 150L)
    assert(rep.positions == 50L)
    assert(wh.load("t").count() == 150L)
    assert(wh.load("t").agg(max("Amount")).head().getLong(0) == 149L)
  }

  test("readChanges equals diffRows across a positional-delete history, both directions") {
    val wh = new Warehouse(spark, tmpDir("pd-cdc"))
    def bag(d: DataFrame): Map[Seq[Any], Int] =
      d.collect().toSeq.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val vs = scala.collection.mutable.ArrayBuffer[Long]()
    vs += wh.append("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L), statsCols = Seq("Id"))
    vs += wh.append("t", df("d" -> 4L, "e" -> 5L), statsCols = Seq("Id"))
    vs += wh.positionDelete("t", col("Amount") % 2 === 0).version // pending pos delete
    vs += wh.append("t", df("b" -> 2L), statsCols = Seq("Id")) // re-insert post-delete
    vs += wh.compactDeletes("t") // materialization: no row change
    for (i <- vs.indices; j <- vs.indices) {
      val ch = wh.readChanges("t", vs(i), vs(j))
      val (add, rem) = wh.diffRows("t", vs(i), vs(j))
      assert(bag(ch.filter(col("_change_type") === "+I").drop("_change_type")) == bag(add),
        s"+I mismatch ${vs(i)} -> ${vs(j)}")
      assert(bag(ch.filter(col("_change_type") === "-D").drop("_change_type")) == bag(rem),
        s"-D mismatch ${vs(i)} -> ${vs(j)}")
    }
  }

  test("URI-escapable characters in the warehouse path: pairs still match exactly") {
    // _metadata.file_path is URI-ENCODED ('pd space' -> 'pd%20space');
    // matching joins on the exact encoded form and stores DECODED relative
    // paths, so a root with spaces/percents must behave identically
    val base = java.nio.file.Files.createTempDirectory("pd space %odd")
    val wh = new Warehouse(spark, base.toString)
    wh.append("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L), statsCols = Seq("Id"))
    wh.append("t", df("d" -> 4L), statsCols = Seq("Id"))
    val rep = wh.positionDelete("t", col("Amount") % 2 === 0)
    assert(rep.positions == 2L)
    assert(rowsOf(wh.load("t")) == Set("a" -> 1L, "c" -> 3L))
    // pair bounds live in the decoded manifest-path domain: compaction's
    // disjointness proof must not falsely skip (resurrect) anything
    wh.compactDeletes("t")
    assert(rowsOf(wh.load("t")) == Set("a" -> 1L, "c" -> 3L))
  }

  test("expireSnapshots sweeps orphaned and expired pdel* delete files") {
    val root = tmpDir("pd-expire")
    val wh = new Warehouse(spark, root)
    wh.append("t", df("a" -> 1L, "b" -> 2L), statsCols = Seq("Id"))
    wh.positionDelete("t", col("Id") === "b")
    wh.compactDeletes("t") // pairs now unreferenced by the CURRENT manifest
    wh.expireSnapshots("t", keepLast = 1, orphanGraceMs = 0L)
    val stray = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "t"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.toString)
          .filter(p => p.contains("/pdel") && p.endsWith(".parquet")).toList
      } finally s.close()
    }
    assert(stray.isEmpty, s"expired positional-delete files survived the sweep: $stray")
    assert(rowsOf(wh.load("t")) == Set("a" -> 1L))
  }

  test("a table column named __pdel_file is refused loudly") {
    val wh = new Warehouse(spark, tmpDir("pd-reserved"))
    val bad = spark.createDataFrame(Seq(Row("x", 1L)).asJava,
      StructType(Seq(StructField("__pdel_file", StringType), StructField("Amount", LongType))))
    wh.append("t", bad)
    val e = intercept[IllegalArgumentException](wh.positionDelete("t", col("Amount") === 1L))
    assert(e.getMessage.contains("reserves column names"))
  }

  test("positionUpdate == updateWhere: same content, old-row SET semantics (swap works)") {
    val cow = new Warehouse(spark, tmpDir("pu-cow"))
    val mor = new Warehouse(spark, tmpDir("pu-mor"))
    val base = spark.createDataFrame(Seq(
      Row("a", 1L), Row("b", 2L), Row("c", 3L), Row("d", 4L)).asJava, schema)
    cow.append("t", base, statsCols = Seq("Amount"))
    mor.append("t", base, statsCols = Seq("Amount"))
    // swap-flavored SET: Amount must be computed from the OLD Id, and Id
    // from the OLD Amount — one-projection semantics, not sequential
    val set = Map(
      "Id" -> concat(col("Id"), col("Amount").cast("string")),
      "Amount" -> (col("Amount") * 10L))
    cow.updateWhere("t", col("Amount") % 2 === 0, set)
    val rep = mor.positionUpdate("t", col("Amount") % 2 === 0, set)
    assert(rep.updated == 2L)
    def bag(w: Warehouse) = w.load("t").collect().toSeq.map(_.toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(bag(mor) == bag(cow))
    mor.compactDeletes("t")
    assert(bag(mor) == bag(cow))
  }

  test("positionUpdate is O(matched): prior files carry; chained updates compose unmaterialized") {
    val wh = new Warehouse(spark, tmpDir("pu-chain"))
    wh.append("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L), statsCols = Seq("Id"))
    val before = wh.currentManifest("t").files.map(_.path).toSet
    wh.positionUpdate("t", col("Id") === "b", Map("Amount" -> (col("Amount") + 100L)))
    val man1 = wh.currentManifest("t")
    assert(before.subsetOf(man1.files.map(_.path).toSet), "positionUpdate must not rewrite")
    assert(man1.deletes.forall(_.kind == "dv"))
    // second update hits the UPDATED copy (102), not the dead original (2),
    // and must not force a materialization first
    wh.positionUpdate("t", col("Id") === "b", Map("Amount" -> (col("Amount") * 2L)))
    assert(wh.currentManifest("t").deletes.size > man1.deletes.size, "still merge-on-read")
    assert(rowsOf(wh.load("t")) == Set("a" -> 1L, "b" -> 204L, "c" -> 3L))
    wh.compactDeletes("t")
    assert(rowsOf(wh.load("t")) == Set("a" -> 1L, "b" -> 204L, "c" -> 3L))
  }

  test("positionUpdate never resurrects rows dead to a pending delete") {
    val wh = new Warehouse(spark, tmpDir("pu-dead"))
    wh.append("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L))
    wh.equalityDelete("t", df("b" -> 0L).select("Id")) // b is dead, pending
    // predicate matches the DEAD row's values too — it must not come back
    wh.positionUpdate("t", col("Amount") <= 2L, Map("Amount" -> (col("Amount") + 10L)))
    assert(rowsOf(wh.load("t")) == Set("a" -> 11L, "c" -> 3L))
    wh.compactDeletes("t")
    assert(rowsOf(wh.load("t")) == Set("a" -> 11L, "c" -> 3L))
  }

  test("positionUpdate no-match and null-condition behavior mirrors updateWhere") {
    val wh = new Warehouse(spark, tmpDir("pu-noop"))
    wh.append("t", spark.createDataFrame(
      Seq(Row("a", 1L), Row("b", null)).asJava, schema), statsCols = Seq("Amount"))
    val v = wh.currentVersion("t")
    val rep = wh.positionUpdate("t", col("Amount") > 100L, Map("Amount" -> lit(0L)))
    assert(rep.version == v && rep.updated == 0L)
    // NULL condition rows untouched
    wh.positionUpdate("t", col("Amount") >= 1L, Map("Amount" -> (col("Amount") + 1L)))
    assert(wh.load("t").collect().map(r => Option(r.get(1))).toSet == Set(Some(2L), None))
  }

  test("delete churn: metadata stays O(files) across many delete commits; reads probe, never anti-join") {
    val wh = new Warehouse(spark, tmpDir("pd-churn"))
    wh.append("t", df((0 until 200).map(i => s"k$i" -> i.toLong): _*), statsCols = Seq("Amount"))
    val nFiles = wh.currentManifest("t").files.size
    // 30 separate single-row delete commits against the SAME files: pair
    // files would accrete one entry per commit; vectors MERGE ON WRITE and
    // supersede, so the manifest's delete list stays bounded by file count
    for (i <- 0 until 30) wh.positionDelete("t", col("Amount") === i.toLong)
    val man = wh.currentManifest("t")
    assert(man.deletes.size <= nFiles,
      s"per-file delete state must stay O(files): ${man.deletes.size} entries over $nFiles files")
    assert(man.deletes.forall(_.kind == "dv"))
    // every commit's deletions live in the merged vectors
    assert(wh.load("t").count() == 170L)
    assert(rowsOf(wh.load("t")).forall(_._2 >= 30L))
    // the MOR read plan is a bitmap PROBE inside the scan, not an anti-join
    val plan = wh.load("t").queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"), s"DV read must not anti-join pair files:\n$plan")
    assert(plan.contains("dv_deleted"), s"DV probe missing from the plan:\n$plan")
    // cardinality accounting: the live vector reports all merged positions
    assert(man.deletes.map(_.rows).sum == 30L)
    wh.compactDeletes("t")
    assert(wh.currentManifest("t").deletes.isEmpty)
    assert(wh.load("t").count() == 170L)
  }

  test("descriptor broadcast past the gate: results identical, a 1-of-N-files scan decodes 1 vector") {
    val gateKey = "spark.graft.dv.broadcastMaxPositions"
    val wh = new Warehouse(spark, tmpDir("pd-lazy"))
    // four files (one append each), one commit deleting a row from EVERY
    // file — all four vectors land in one dv parquet, sorted by target
    (0 until 4).foreach(i => wh.append("t",
      df((0 until 10).map(j => s"f$i-$j" -> (i * 10 + j).toLong): _*),
      statsCols = Seq("Amount")))
    wh.positionDelete("t", col("Amount") % 10 === 3)
    val eager = rowsOf(wh.load("t"))
    assert(eager.size == 36)
    try {
      spark.conf.set(gateKey, "0") // force the descriptor + lazy-read path
      assert(rowsOf(wh.load("t")) == eager,
        "lazy descriptor path must read identically to the bytes broadcast")
      // a stat-pruned scan touching ONE deleted file decodes ONE vector:
      // the broadcast carries descriptors only, tasks point-read on demand
      val before = graft.functions.expressions.DvLazyLookup.decodes.get()
      val got = rowsOf(wh.load("t").filter(col("Amount") >= 10 && col("Amount") < 20))
      assert(got == (0 until 10).filter(_ % 10 != 3).map(j => s"f1-$j" -> (10 + j).toLong).toSet)
      val decoded = graft.functions.expressions.DvLazyLookup.decodes.get() - before
      assert(decoded == 1, s"expected exactly 1 vector decode, got $decoded")
    } finally spark.conf.unset(gateKey)
  }

  test("$deletes metadata table reports the kind column") {
    val root = tmpDir("pd-meta")
    val wh = new Warehouse(spark, root)
    wh.append("t", df("a" -> 1L, "b" -> 2L))
    wh.equalityDelete("t", df("a" -> 0L).select("Id"))
    wh.positionDelete("t", col("Id") === "b")
    spark.conf.set("spark.sql.catalog.pdm", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pdm.root", root)
    val kinds = spark.sql("SELECT kind, key_count FROM pdm.`t$deletes` ORDER BY kind")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(kinds == Seq(("dv", 1L), ("eq", 1L)))
  }
}
