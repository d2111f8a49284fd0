package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** Branches (`t@branch`): per-ref manifest ledgers inside one table dir,
  * sharing data files by path — fork is a hard link (zero IO), every
  * warehouse verb works on the branch name, publish is an atomic
  * fast-forward commit, and expiry treats every ref's manifests as live
  * references. The WAP pattern generalized to multi-commit workflows.
  */
class BranchSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val cat = "brc"
  private lazy val root: String = {
    val r = tmpDir("graft-branch")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", r)
    r
  }
  private def wh = new Warehouse(spark, root)

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def frame(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private def asMap(name: String): Map[Long, String] =
    wh.load(name).collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("fork is zero-copy: branch v0 IS the fork snapshot (same files, same content)") {
    wh.create("t1", schema)
    wh.append("t1", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    wh.append("t1", frame(3L -> "c"), statsCols = Seq("k"))
    wh.createBranch("t1", "dev")
    assert(wh.branches("t1") == Seq("dev"))
    assert(wh.forkVersion("t1", "dev") == 2L)
    assert(wh.currentVersion("t1@dev") == 0L)
    // identical content, identical data-file paths — nothing was copied
    assert(asMap("t1@dev") == asMap("t1"))
    assert(wh.currentManifest("t1@dev").files.map(_.path).toSet ==
      wh.currentManifest("t1").files.map(_.path).toSet)
  }

  test("refs advance independently: branch writes invisible to main and vice versa") {
    wh.create("t2", schema)
    wh.append("t2", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    wh.createBranch("t2", "dev")
    // branch-side: append + MOR upsert + equality delete
    wh.append("t2@dev", frame(3L -> "c"), statsCols = Seq("k"))
    wh.morMerge("t2@dev", frame(2L -> "B2"), Seq("k"))
    wh.equalityDelete("t2@dev", frame(1L -> "a").select("k"))
    assert(asMap("t2@dev") == Map(2L -> "B2", 3L -> "c"))
    assert(asMap("t2") == Map(1L -> "a", 2L -> "b"), "main must not see branch writes")
    // main-side advance is equally invisible to the branch
    wh.append("t2", frame(9L -> "z"), statsCols = Seq("k"))
    assert(asMap("t2@dev") == Map(2L -> "B2", 3L -> "c"))
    // branch time travel reads the branch LEDGER's versions
    assert(wh.loadVersion("t2@dev", 0L).count() == 2L)
    assert(wh.loadVersion("t2@dev", 1L).count() == 3L)
  }

  test("branch-local schema evolution: rename on the branch, main untouched") {
    wh.create("t3", schema)
    wh.append("t3", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("t3", "dev")
    wh.renameColumn("t3@dev", "v", "label")
    assert(wh.load("t3@dev").columns.toSeq == Seq("k", "label"))
    assert(wh.load("t3").columns.toSeq == Seq("k", "v"))
    // values ride the rename (field-id resolution)
    assert(wh.load("t3@dev").select("label").collect().map(_.getString(0)).toSeq == Seq("a"))
  }

  test("publish is an atomic fast-forward: main jumps to the branch head, fork advances, cycle repeats") {
    wh.create("t4", schema)
    wh.append("t4", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    wh.createBranch("t4", "wap")
    wh.append("t4@wap", frame(3L -> "c"), statsCols = Seq("k"))
    wh.morMerge("t4@wap", frame(1L -> "A1"), Seq("k"))
    val before = wh.currentVersion("t4")
    val pub = wh.publishBranch("t4", "wap")
    assert(pub == before + 1, "publish is exactly ONE commit on main")
    assert(asMap("t4") == Map(1L -> "A1", 2L -> "b", 3L -> "c"))
    assert(wh.forkVersion("t4", "wap") == pub)
    // pre-publish main history is preserved (time travel still works)
    assert(wh.loadVersion("t4", before).count() == 2L)
    // second build→publish cycle on the same branch
    wh.append("t4@wap", frame(4L -> "d"), statsCols = Seq("k"))
    val pub2 = wh.publishBranch("t4", "wap")
    assert(pub2 == pub + 1)
    assert(asMap("t4") == Map(1L -> "A1", 2L -> "b", 3L -> "c", 4L -> "d"))
  }

  test("diverged main refuses to publish (it would drop main's commits)") {
    wh.create("t5", schema)
    wh.append("t5", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("t5", "dev")
    wh.append("t5@dev", frame(2L -> "b"), statsCols = Seq("k"))
    wh.append("t5", frame(9L -> "z"), statsCols = Seq("k")) // main moves on
    val e = intercept[java.util.ConcurrentModificationException] {
      wh.publishBranch("t5", "dev")
    }
    assert(e.getMessage.contains("not a fast-forward"))
    assert(asMap("t5") == Map(1L -> "a", 9L -> "z"), "refused publish changes nothing")
  }

  test("expiry on main keeps branch-referenced files and segments alive") {
    wh.create("t6", schema)
    wh.append("t6", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    wh.createBranch("t6", "keep")
    // main REPLACES its content: old files now referenced only by history + branch
    wh.replace("t6", frame(7L -> "x"), statsCols = Seq("k"))
    wh.expireSnapshots("t6", keepLast = 1, orphanGraceMs = 0L)
    // the fork snapshot's manifest is gone from main's ledger...
    assert(wh.history("t6") == Seq(2L))
    // ...but the branch still reads its full content (files + hard-linked
    // manifest + shared segments all survived the sweep)
    assert(asMap("t6@keep") == Map(1L -> "a", 2L -> "b"))
    assert(asMap("t6") == Map(7L -> "x"))
  }

  test("dropBranch abandons the ledger; the next expiry reclaims branch-only files") {
    wh.create("t7", schema)
    wh.append("t7", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("t7", "tmp")
    wh.append("t7@tmp", frame(2L -> "b"), statsCols = Seq("k"))
    val branchOnly = wh.currentManifest("t7@tmp").files.map(_.path).toSet --
      wh.currentManifest("t7").files.map(_.path).toSet
    assert(branchOnly.nonEmpty)
    assert(wh.dropBranch("t7", "tmp"))
    assert(wh.branches("t7").isEmpty)
    assert(!wh.exists("t7@tmp"))
    wh.expireSnapshots("t7", keepLast = 1, orphanGraceMs = 0L)
    branchOnly.foreach { rel =>
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(wh.resolvePath("t7", rel))), s"orphan not reclaimed: $rel")
    }
    // main untouched throughout
    assert(asMap("t7") == Map(1L -> "a"))
    assert(!wh.dropBranch("t7", "tmp"), "double drop reports false")
  }

  test("branch expiry trims the branch ledger only; shared files survive") {
    wh.create("t8", schema)
    wh.append("t8", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("t8", "dev")
    wh.append("t8@dev", frame(2L -> "b"), statsCols = Seq("k"))
    wh.append("t8@dev", frame(3L -> "c"), statsCols = Seq("k"))
    wh.expireSnapshots("t8@dev", keepLast = 1, orphanGraceMs = 0L)
    assert(wh.history("t8@dev") == Seq(2L))
    assert(asMap("t8@dev") == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    assert(asMap("t8") == Map(1L -> "a"))
  }

  test("SQL face: backticked branch identifier and VERSION AS OF 'branch'") {
    wh.create("t9", schema)
    wh.append("t9", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("t9", "dev")
    wh.append("t9@dev", frame(2L -> "b"), statsCols = Seq("k"))
    root // force catalog conf registration
    val viaIdent = spark.sql(s"SELECT k, v FROM $cat.`t9@dev` ORDER BY k").collect()
    assert(viaIdent.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    val viaRef = spark.sql(s"SELECT k FROM $cat.t9 VERSION AS OF 'dev' ORDER BY k").collect()
    assert(viaRef.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // main stays main
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t9").head().getLong(0) == 1L)
    // branch-ledger time travel through SQL
    val v0 = spark.sql(s"SELECT count(*) AS n FROM $cat.`t9@dev` VERSION AS OF 0").head()
    assert(v0.getLong(0) == 1L)
  }

  test("SQL procedures: CALL create_branch / publish_branch / drop_branch drive the full WAP cycle") {
    wh.create("t12", schema)
    wh.append("t12", frame(1L -> "a"), statsCols = Seq("k"))
    root // force catalog conf registration
    val cb = spark.sql(
      s"CALL $cat.system.create_branch(tbl => 't12', branch => 'wap')").head()
    assert(cb.getLong(0) == 0L && cb.getLong(1) == 1L) // branch v0, fork at main v1
    wh.append("t12@wap", frame(2L -> "b"), statsCols = Seq("k"))
    val pub = spark.sql(
      s"CALL $cat.system.publish_branch(tbl => 't12', branch => 'wap')").head()
    assert(pub.getLong(0) == 2L)
    assert(asMap("t12") == Map(1L -> "a", 2L -> "b"))
    assert(spark.sql(s"CALL $cat.system.drop_branch(tbl => 't12', branch => 'wap')")
      .head().getBoolean(0))
    assert(wh.branches("t12").isEmpty)
    // dropping the published branch loses nothing: main owns the head
    assert(asMap("t12") == Map(1L -> "a", 2L -> "b"))
  }

  test("change feed works per ledger: branch readChanges sees exactly the branch's commits") {
    wh.create("t10", schema)
    wh.append("t10", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("t10", "dev")
    wh.append("t10@dev", frame(2L -> "b"), statsCols = Seq("k"))
    wh.morMerge("t10@dev", frame(1L -> "A"), Seq("k"))
    val ch = wh.readChanges("t10@dev", 0L, wh.currentVersion("t10@dev"))
    val byType = ch.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("+I" -> 2L, "-D" -> 1L)) // +b, +A, -a
  }

  test("guards: no branch auto-create, no create/drop/rename/tag at ref names, no branch-of-branch") {
    wh.create("t11", schema)
    wh.append("t11", frame(1L -> "a"), statsCols = Seq("k"))
    intercept[IllegalArgumentException] { wh.append("t11@ghost", frame(2L -> "b")) }
    intercept[IllegalArgumentException] { wh.create("t11@dev", schema) }
    intercept[IllegalArgumentException] { wh.drop("t11@dev") }
    intercept[IllegalArgumentException] { wh.rename("t11@dev", "t12") }
    intercept[IllegalArgumentException] { wh.tagSnapshot("t11@dev", "x") }
    wh.createBranch("t11", "dev")
    intercept[IllegalArgumentException] { wh.createBranch("t11@dev", "sub") }
    intercept[IllegalArgumentException] { wh.createBranch("t11", "dev") } // duplicate
    intercept[IllegalArgumentException] { wh.publishBranch("t11", "nope") }
  }

  test("a failed duplicate createBranch touches nothing: fork point survives, divergence still refuses") {
    wh.create("t13", schema)
    wh.append("t13", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("t13", "dev")
    wh.append("t13@dev", frame(2L -> "b"), statsCols = Seq("k"))
    wh.append("t13", frame(3L -> "c"), statsCols = Seq("k")) // main diverges
    val forkBefore = wh.forkVersion("t13", "dev")
    // a retry/race loser must not clobber the live branch's fork point —
    // that would let the next publish pass the fast-forward guard and
    // silently drop main's post-fork commit
    intercept[IllegalArgumentException] { wh.createBranch("t13", "dev") }
    assert(wh.forkVersion("t13", "dev") == forkBefore)
    intercept[java.util.ConcurrentModificationException] { wh.publishBranch("t13", "dev") }
    assert(asMap("t13") == Map(1L -> "a", 3L -> "c"), "main intact after refused publish")
  }

  test("forkVersion self-repairs the createBranch crash window from the v0 hard link") {
    wh.create("t14", schema)
    wh.append("t14", frame(1L -> "a"), statsCols = Seq("k"))
    wh.append("t14", frame(2L -> "b"), statsCols = Seq("k"))
    wh.createBranch("t14", "dev", version = 1L)
    val fp = java.nio.file.Paths.get(root, "t14", "_fork@dev")
    java.nio.file.Files.delete(fp) // simulate the crash between link and fork write
    assert(wh.forkVersion("t14", "dev") == 1L, "recovered from the v0 hard link's inode")
    assert(java.nio.file.Files.exists(fp), "repair persists so it runs once")
    assert(java.nio.file.Files.readString(fp).trim == "1")
  }

  test("publishBranch rolls forward a crashed fork-point advance instead of wedging") {
    wh.create("t15", schema)
    wh.append("t15", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("t15", "dev")
    wh.append("t15@dev", frame(2L -> "b"), statsCols = Seq("k"))
    val published = wh.publishBranch("t15", "dev")
    val fp = java.nio.file.Paths.get(root, "t15", "_fork@dev")
    java.nio.file.Files.writeString(fp, "1") // simulate: main commit landed, fork advance didn't
    // the re-driven publish must recognize main's head IS the branch head,
    // repair the fork point, and commit NOTHING new
    assert(wh.publishBranch("t15", "dev") == published)
    assert(wh.currentVersion("t15") == published, "no duplicate commit from the roll-forward")
    assert(wh.forkVersion("t15", "dev") == published)
    assert(asMap("t15") == Map(1L -> "a", 2L -> "b"))
  }

  test("name collisions with VERSION AS OF are refused in both directions; tags never resolve through branch names") {
    wh.create("t16", schema)
    wh.append("t16", frame(1L -> "a"), statsCols = Seq("k"))
    wh.tagSnapshot("t16", "gold")
    intercept[IllegalArgumentException] { wh.createBranch("t16", "7") }      // parses as a version
    intercept[IllegalArgumentException] { wh.createBranch("t16", "gold") }   // tag shadows branch
    wh.createBranch("t16", "dev")
    intercept[IllegalArgumentException] { wh.tagSnapshot("t16", "dev") }     // branch shadows tag
    // a main tag must not resolve through a branch identifier: the tag's
    // number names a MAIN snapshot, not the branch-ledger version
    intercept[IllegalArgumentException] { wh.resolveTag("t16@dev", "gold") }
    wh.append("t16@dev", frame(2L -> "b"), statsCols = Seq("k"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.`t16@dev` VERSION AS OF 'gold'").collect()
    }
    // numeric branch-ledger time travel stays available
    assert(spark.sql(s"SELECT * FROM $cat.`t16@dev` VERSION AS OF 1").count() == 2L)
  }

  test("$refs metadata table lists main, branches (with fork points), and tags") {
    wh.create("t17", schema)
    wh.append("t17", frame(1L -> "a"), statsCols = Seq("k"))
    wh.tagSnapshot("t17", "gold")
    wh.createBranch("t17", "dev")
    wh.append("t17@dev", frame(2L -> "b"), statsCols = Seq("k"))
    val refs = spark.sql(s"SELECT name, type, version, fork_version FROM $cat.`t17$$refs`")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(refs == Set(
      ("main", "branch", 1L, -1L),     // main head: create v0 + append v1
      ("dev", "branch", 1L, 1L),       // branch head v1 IN ITS LEDGER, forked from main v1
      ("gold", "tag", 1L, -1L)))
    // a metadata scan reads no data files
    val plan = spark.sql(s"SELECT * FROM $cat.`t17$$refs`")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("Parquet"), plan)
    // the ref axis is not a version axis: time travel on it is refused
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(s"SELECT * FROM $cat.`t17$$refs` VERSION AS OF 0").collect()
    }
  }
}
