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
}
