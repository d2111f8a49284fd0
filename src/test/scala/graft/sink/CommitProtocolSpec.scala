package graft.sink

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.{SparkSpec, TestSpark}

/** The snapshot-commit protocol's optimistic-concurrency guard: a commit
  * whose base version was overtaken by another writer must fail loudly
  * (ConcurrentModificationException) instead of silently dropping the other
  * writer's snapshot — the single-writer analog of Iceberg's catalog CAS.
  * (In-package spec: the guard lives in the private commit step, below the
  * public dispositions, which each re-read the version at call time.)
  */
class CommitProtocolSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(StructField("x", LongType)))
  private def df(n: Long) = TestSpark.spark.createDataFrame(
    (0L until n).map(Row(_)).asJava, schema)

  test("stale commit is rejected, table state intact") {
    val wh = new Warehouse(spark, tmpDir("wh-occ"))
    wh.replace("t", df(3)) // v0
    val man = wh.currentManifest("t")
    wh.append("t", df(2))  // v1: a concurrent writer wins the race
    // our commit, computed against v0, must NOT clobber v1
    val e = intercept[java.util.ConcurrentModificationException] {
      wh.commitManifest("t", 1L, man)
    }
    assert(e.getMessage.contains("concurrent writer"))
    assert(wh.currentVersion("t") == 1L)
    assert(wh.load("t").count() == 5)
    // retry against the fresh version succeeds (the documented recovery)
    assert(wh.append("t", df(1)) == 2L)
  }

  test("two racing committers: the manifest CAS admits exactly one, no pre-check needed") {
    // Both writers enter commitManifest simultaneously (barrier), so both can
    // pass the version pre-check; the hard-link CREATE_NEW on m1.manifest is
    // what must serialize them. Repeated to actually exercise interleavings.
    (1 to 10).foreach { round =>
      val wh = new Warehouse(spark, tmpDir(s"wh-cas$round"))
      wh.replace("t", df(3)) // v0
      val base = wh.currentManifest("t")
      // two distinguishable manifests for the same next version
      val mA = base
      val mB = base.copy(files = Nil)
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[(String, Option[Throwable])]()
      val threads = Seq("A" -> mA, "B" -> mB).map { case (tag, m) =>
        new Thread(() => {
          barrier.await()
          val err = try { wh.commitManifest("t", 1L, m); None }
          catch { case e: Throwable => Some(e) }
          outcomes.add(tag -> err)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      val results = outcomes.iterator().asScala.toMap
      val winners = results.collect { case (tag, None) => tag }.toSeq
      val losers = results.collect { case (tag, Some(e)) => (tag, e) }.toSeq
      assert(winners.size == 1, s"round $round: expected exactly one winner, got $results")
      assert(losers.forall(_._2.isInstanceOf[java.util.ConcurrentModificationException]),
        s"round $round: loser must fail with CME, got ${losers.map(_._2)}")
      // the committed manifest is the WINNER's, never a torn or mixed state
      val committed = wh.currentManifest("t")
      val expected = if (winners.head == "A") mA else mB
      assert(committed.files.map(_.path) == expected.files.map(_.path),
        s"round $round: committed manifest is not the winner's")
      assert(wh.currentVersion("t") == 1L)
    }
  }

  test("crash during the very FIRST commit (no pointer yet): table visible, heals on next commit") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("wh-crash0")
    val wh = new Warehouse(spark, dir)
    // build a real v0 elsewhere, then transplant only its manifest + data —
    // pointer never written, as if the creator died right after the link
    val donor = new Warehouse(spark, dir + "-donor")
    donor.replace("t", df(2))
    val src = Paths.get(dir + "-donor", "t")
    val dst = Paths.get(dir, "t")
    // Files.walk yields the root's children in directory-stream (hash) order:
    // a top-level file can precede the data subdir, so dst must exist up front.
    Files.createDirectories(dst)
    Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      if (!rel.toString.startsWith("_current") && rel.toString.nonEmpty) {
        if (Files.isDirectory(p)) Files.createDirectories(dst.resolve(rel))
        else Files.copy(p, dst.resolve(rel))
      }
    }
    assert(!Files.exists(dst.resolve("_current")))
    assert(wh.exists("t") && wh.currentVersion("t") == 0L)
    assert(wh.listTables() == Seq("t"))
    assert(wh.load("t").count() == 2)
    // the next commit succeeds (no CME wedge) and repairs the pointer
    assert(wh.append("t", df(1)) == 1L)
    assert(Files.readString(dst.resolve("_current")).trim == "1")
  }

  test("crash between manifest link and pointer write: readers recover, next commit works") {
    import java.nio.file.{Files, Paths}
    val dir = tmpDir("wh-crash")
    val wh = new Warehouse(spark, dir)
    wh.replace("t", df(2)) // v0
    val m0 = wh.currentManifest("t")
    // simulate the crashed committer: v1 manifest linked, pointer never updated
    Manifest.write(Paths.get(dir, "t", "m1.manifest"), m0)
    Files.writeString(Paths.get(dir, "t", "_current"), "0")
    // the forward scan sees the committed v1 despite the stale hint
    assert(wh.currentVersion("t") == 1L)
    assert(wh.load("t").count() == 2)
    // and the next commit builds on v1 instead of wedging on a taken version
    assert(wh.append("t", df(1)) == 2L)
    assert(wh.load("t").count() == 3)
  }

  // ------------------------------------------------------ automatic rebase --
  // commitOrRebase: a lost CAS race rebases append-shaped commits onto the
  // winner's manifest (metadata-only, zero data rewrite) and re-VALIDATES
  // read-set-dependent commits, aborting loudly on true conflict. The
  // preCommitHook seam lands an interfering commit deterministically inside
  // the race window (between data write and first CAS attempt).

  private val kvSchema = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
  private def kv(rows: (Long, Long)*) = TestSpark.spark.createDataFrame(
    rows.map(r => Row(r._1, r._2)).asJava, kvSchema)

  /** Run `body` with a ONE-SHOT interfering action fired at wh's next
    * commit attempt; always uninstalls the hook.
    */
  private def withInterference(wh: Warehouse)(interfere: => Unit)(body: => Unit): Unit = {
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    wh.preCommitHook = (_, _) => if (fired.compareAndSet(false, true)) interfere
    try body finally wh.preCommitHook = (_, _) => ()
    assert(fired.get(), "interference never fired — race window not exercised")
  }

  test("rebase: two concurrent appends both land, zero data rewrite") {
    val root = tmpDir("wh-rb-append")
    val wh1 = new Warehouse(spark, root)
    val wh2 = new Warehouse(spark, root)
    wh1.replace("t", kv((1L, 10L)), statsCols = Seq("k")) // v0
    withInterference(wh1)(wh2.append("t", kv((2L, 20L), (3L, 30L)), statsCols = Seq("k"))) {
      val v = wh1.append("t", kv((4L, 40L)), statsCols = Seq("k"))
      assert(v == 2L, s"loser rebases onto the winner's v1 and commits v2, got v$v")
    }
    assert(wh1.load("t").count() == 4) // nobody's rows lost
    val man = wh1.currentManifest("t")
    // BOTH writers computed next=1 and wrote d1b-* dirs; the loser kept its
    // ORIGINAL data file (zero rewrite) — only its manifest entry's seq was
    // restamped to the landed v2. Identify the loser's file by its k=4 stat.
    val rebased = man.files.filter(_.stats.get("k").exists(st => st.min == "4"))
    assert(rebased.nonEmpty && rebased.forall(f => f.seq == 2L && f.path.startsWith("d1b")),
      s"rebased entries must be restamped in place, got ${man.files.map(f => (f.path, f.seq))}")
    // and the winner's files are untouched at their committed seq
    val winners = man.files.filter(_.stats.get("k").exists(st => Set("2", "3").contains(st.min)))
    assert(winners.nonEmpty && winners.forall(_.seq == 1L))
  }

  test("rebase: append aborts on a concurrent schema change (batch conformed to the old schema)") {
    val root = tmpDir("wh-rb-schema")
    val wh1 = new Warehouse(spark, root)
    val wh2 = new Warehouse(spark, root)
    wh1.replace("t", kv((1L, 10L)))
    withInterference(wh1)(wh2.addColumns("t", Seq(StructField("extra", StringType)))) {
      val e = intercept[java.util.ConcurrentModificationException](wh1.append("t", kv((2L, 20L))))
      assert(e.getMessage.contains("redo the operation"))
    }
    assert(wh1.load("t").count() == 1) // aborted commit left no rows behind
  }

  test("rebase: merge over a concurrently-REWRITTEN victim aborts loudly") {
    val root = tmpDir("wh-rb-mergeconf")
    val wh1 = new Warehouse(spark, root)
    val wh2 = new Warehouse(spark, root)
    // ONE data file holding both keys: the two merges then fight over the
    // same victim (per-row files would let them commute — and they may)
    wh1.replace("t", kv((1L, 10L), (2L, 20L)).coalesce(1), statsCols = Seq("k"))
    // interferer rewrites the same victim file (merges key 2)
    withInterference(wh1)(wh2.merge("t", kv((2L, 222L)), Seq("k"))) {
      val e = intercept[java.util.ConcurrentModificationException](
        wh1.merge("t", kv((1L, 111L)), Seq("k")))
      assert(e.getMessage.contains("redo the operation"))
    }
    // table state is exactly the winner's
    assert(wh1.load("t").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 222L)))
    // and the documented recovery — redo the merge — converges
    wh1.merge("t", kv((1L, 111L)), Seq("k"))
    assert(wh1.load("t").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 111L), (2L, 222L)))
  }

  test("rebase: merge lands over a concurrent key-DISJOINT append and aborts on an overlapping one") {
    val root = tmpDir("wh-rb-mergedisj")
    val wh1 = new Warehouse(spark, root)
    val wh2 = new Warehouse(spark, root)
    wh1.replace("t", kv((1L, 10L), (2L, 20L)), statsCols = Seq("k"))
    // disjoint: appended keys 100.. can't match merge keys 1..2 (stat-proven)
    withInterference(wh1)(wh2.append("t", kv((100L, 1000L), (101L, 1010L)), statsCols = Seq("k"))) {
      assert(wh1.merge("t", kv((2L, 222L)), Seq("k")) == 2L)
    }
    assert(wh1.load("t").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 10L), (2L, 222L), (100L, 1000L), (101L, 1010L)))
    // overlapping: the winner appended a row with a key THIS merge upserts —
    // carrying it would resurrect the old version; must abort
    withInterference(wh1)(wh2.append("t", kv((5L, 50L)), statsCols = Seq("k"))) {
      val e = intercept[java.util.ConcurrentModificationException](
        wh1.merge("t", kv((5L, 555L)), Seq("k")))
      assert(e.getMessage.contains("redo the operation"))
    }
    // redo converges
    wh1.merge("t", kv((5L, 555L)), Seq("k"))
    assert(wh1.load("t").filter("k = 5").collect().map(_.getLong(1)).toSeq == Seq(555L))
  }

  test("rebase: morMerge row-delta applies over a concurrent append, winner's duplicate key dies") {
    val root = tmpDir("wh-rb-mor")
    val wh1 = new Warehouse(spark, root)
    val wh2 = new Warehouse(spark, root)
    wh1.replace("t", kv((1L, 10L)), statsCols = Seq("k"))
    // winner appends ANOTHER row for key 1 plus a new key 3
    withInterference(wh1)(wh2.append("t", kv((1L, 99L), (3L, 30L)), statsCols = Seq("k"))) {
      wh1.morMerge("t", kv((1L, 111L)), Seq("k"))
    }
    // serial order is winner-then-upsert: BOTH old copies of key 1 are dead
    assert(wh1.load("t").orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 111L), (3L, 30L)))
  }

  test("rebase: deleteWhere lands over a predicate-disjoint append, aborts on a may-match one") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("wh-rb-del")
    val wh1 = new Warehouse(spark, root)
    val wh2 = new Warehouse(spark, root)
    wh1.replace("t", kv((1L, 10L), (2L, 20L), (3L, 30L)), statsCols = Seq("k"))
    withInterference(wh1)(wh2.append("t", kv((100L, 1000L)), statsCols = Seq("k"))) {
      val r = wh1.deleteWhere("t", col("k") <= 2L)
      assert(r.deleted == 2L)
    }
    assert(wh1.load("t").orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(3L, 100L))
    // may-match append (k=1 inside the predicate range) must abort the
    // delete; k=2 is re-appended first so the delete has a live victim and
    // actually reaches its commit
    wh1.append("t", kv((2L, 22L)), statsCols = Seq("k"))
    withInterference(wh1)(wh2.append("t", kv((1L, 11L)), statsCols = Seq("k"))) {
      val e = intercept[java.util.ConcurrentModificationException](
        wh1.deleteWhere("t", col("k") <= 2L))
      assert(e.getMessage.contains("redo the operation"))
    }
    // redo converges: the winner's k=1 row is now visible to the predicate
    assert(wh1.deleteWhere("t", col("k") <= 2L).deleted == 2L)
    assert(wh1.load("t").orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(3L, 100L))
  }

  test("rebase: positionDelete restamps over a disjoint append, aborts when a victim is rewritten") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("wh-rb-pdel")
    val wh1 = new Warehouse(spark, root)
    val wh2 = new Warehouse(spark, root)
    wh1.replace("t", kv((1L, 10L), (2L, 20L)), statsCols = Seq("k"))
    withInterference(wh1)(wh2.append("t", kv((100L, 1000L)), statsCols = Seq("k"))) {
      val r = wh1.positionDelete("t", col("k") === 1L)
      assert(r.positions == 1L)
    }
    assert(wh1.load("t").orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(2L, 100L))
    // victim rewritten by a concurrent merge -> stale (file, ordinal) pairs must abort
    withInterference(wh1)(wh2.merge("t", kv((2L, 222L)), Seq("k"))) {
      val e = intercept[java.util.ConcurrentModificationException](
        wh1.positionDelete("t", col("k") === 2L))
      assert(e.getMessage.contains("redo the operation"))
    }
    // redo converges against the rewritten file
    assert(wh1.positionDelete("t", col("k") === 2L).positions == 1L)
    assert(wh1.load("t").orderBy("k").collect().map(_.getLong(0)).toSeq == Seq(100L))
  }

  test("rebase: compaction carries a concurrent append through and keeps every row") {
    val root = tmpDir("wh-rb-compact")
    val wh1 = new Warehouse(spark, root)
    val wh2 = new Warehouse(spark, root)
    wh1.replace("t", kv((1L, 10L)), statsCols = Seq("k"))
    wh1.append("t", kv((2L, 20L)), statsCols = Seq("k"))
    wh1.append("t", kv((3L, 30L)), statsCols = Seq("k"))
    withInterference(wh1)(wh2.append("t", kv((4L, 40L)), statsCols = Seq("k"))) {
      wh1.compact("t")
    }
    assert(wh1.load("t").orderBy("k").collect().map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("stress: racing writers with NO test hook — every commit lands or aborts loudly, nothing is lost") {
    // 4 threads × 3 appends each, disjoint key ranges, all starting together
    // on one table: the rebase loop must land ALL of them (append-shaped
    // commits always rebase) with every row present exactly once and a
    // strictly serial version history.
    val root = tmpDir("wh-rb-stress")
    val seed = new Warehouse(spark, root)
    seed.create("t", kvSchema)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(4)
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        try {
          val wh = new Warehouse(spark, root)
          barrier.await()
          (0 until 3).foreach { b =>
            val base = (w * 3 + b) * 100L
            wh.append("t", kv((0 until 5).map(i => (base + i, base + i)): _*),
              statsCols = Seq("k"))
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"appends are rebase-safe and must all land: ${errors.peek()}")
    val rows = seed.load("t").collect().map(_.getLong(0)).sorted.toSeq
    val want = (for (w <- 0 until 4; b <- 0 until 3; i <- 0 until 5)
      yield ((w * 3 + b) * 100L + i)).sorted
    assert(rows == want, s"lost or duplicated rows: got ${rows.size}, want ${want.size}")
    assert(seed.currentVersion("t") == 12L, "12 appends over v0 => serial history to v12")
    // manifests form a chain: every version's file set is a superset of the
    // previous one (append-only history, no clobbered commits)
    (1L to 12L).foreach { v =>
      val prev = seed.manifestAt("t", v - 1).files.map(_.path).toSet
      val cur = seed.manifestAt("t", v).files.map(_.path).toSet
      assert(prev.subsetOf(cur), s"v$v dropped files committed by v${v - 1}")
    }
  }
}
