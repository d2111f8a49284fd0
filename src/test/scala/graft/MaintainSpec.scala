package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Policy-driven auto-maintenance (Warehouse.maintain): each manifest signal
  * triggers exactly its action, results are bit-identical across every
  * maintenance pass, and a healthy table commits nothing (idempotence).
  */
class MaintainSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", LongType), StructField("Amount", LongType)))

  private def df(ids: Range) =
    spark.createDataFrame(ids.map(i => Row(i.toLong, i.toLong * 10)).asJava, schema)

  private def content(wh: Warehouse, t: String): Set[(Long, Long)] =
    wh.load(t).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("delete-ratio signal: pending MOR keys past the ratio materialize") {
    val wh = new Warehouse(spark, tmpDir("mt-del"))
    wh.append("t", df(0 until 100), statsCols = Seq("Id"))
    // 10 of 100 keys pending: past a 5% ratio, below the file-count arm
    wh.equalityDelete("t", df(0 until 10).select("Id"))
    val before = content(wh, "t")
    assert(wh.currentManifest("t").deletes.nonEmpty)
    val rep = wh.maintain("t")
    assert(rep.deletesCompacted && !rep.snapshotsExpired)
    assert(wh.currentManifest("t").deletes.isEmpty, "deletes must materialize")
    assert(content(wh, "t") == before, "maintenance changed results")
  }

  test("below-ratio deletes stay pending (no premature rewrite)") {
    val wh = new Warehouse(spark, tmpDir("mt-del-low"))
    wh.append("t", df(0 until 1000), statsCols = Seq("Id"))
    wh.equalityDelete("t", df(0 until 3).select("Id")) // 0.3% < 5%, 1 file < 8
    val rep = wh.maintain("t")
    assert(!rep.deletesCompacted)
    assert(wh.currentManifest("t").deletes.nonEmpty, "small delete must stay pending")
  }

  test("delete-file-count arm: many tiny deletes trigger regardless of ratio") {
    val wh = new Warehouse(spark, tmpDir("mt-del-files"))
    wh.append("t", df(0 until 10000), statsCols = Seq("Id"))
    (0 until 8).foreach(i => wh.equalityDelete("t", df(i until i + 1).select("Id")))
    val before = content(wh, "t")
    val rep = wh.maintain("t")
    assert(rep.deletesCompacted)
    assert(wh.currentManifest("t").deletes.isEmpty)
    assert(content(wh, "t") == before)
  }

  test("small-file signal: buildup compacts, content identical, then healthy") {
    val wh = new Warehouse(spark, tmpDir("mt-files"))
    (0 until 10).foreach(i => wh.append("t", df(i * 10 until (i + 1) * 10)))
    val before = content(wh, "t")
    val filesBefore = wh.dataFiles("t").size
    assert(filesBefore >= 10)
    val rep = wh.maintain("t", wh.MaintenancePolicy(keepSnapshots = 100))
    assert(rep.filesCompacted && !rep.snapshotsExpired)
    assert(wh.dataFiles("t").size < filesBefore)
    assert(content(wh, "t") == before)
    // now healthy: a second pass commits nothing
    val v = wh.currentVersion("t")
    val rep2 = wh.maintain("t", wh.MaintenancePolicy(keepSnapshots = 100))
    assert(!rep2.deletesCompacted && !rep2.filesCompacted && !rep2.snapshotsExpired)
    assert(rep2.version == v, "healthy maintain must not commit")
  }

  test("snapshot signal: history past keepSnapshots expires, tags protected") {
    val wh = new Warehouse(spark, tmpDir("mt-expire"))
    (0 until 12).foreach(i => wh.append("t", df(i until i + 1)))
    val tagged = wh.currentVersion("t") - 8
    wh.tagSnapshot("t", "pinned", tagged)
    val rep = wh.maintain("t", wh.MaintenancePolicy(
      smallFileCount = 1000, keepSnapshots = 5))
    assert(rep.snapshotsExpired)
    val hist = wh.history("t")
    assert(hist.size <= 6, s"history ${hist.size} not trimmed") // 5 kept + tagged
    assert(hist.contains(tagged), "tagged snapshot must survive expiry")
    assert(wh.loadTag("t", "pinned").count() == tagged + 1)
  }

  test("full lifecycle: all three signals in one pass, results unchanged") {
    val wh = new Warehouse(spark, tmpDir("mt-all"))
    (0 until 12).foreach(i => wh.append("t", df(i * 10 until (i + 1) * 10), statsCols = Seq("Id")))
    wh.equalityDelete("t", df(0 until 20).select("Id"))
    val before = content(wh, "t")
    val rep = wh.maintain("t", wh.MaintenancePolicy(keepSnapshots = 3))
    assert(rep.deletesCompacted && rep.filesCompacted && rep.snapshotsExpired, rep.toString)
    assert(content(wh, "t") == before, "maintenance changed results")
    assert(wh.history("t").size <= 3)
    // and the pass converged: a second one is a full no-op
    val rep2 = wh.maintain("t", wh.MaintenancePolicy(keepSnapshots = 3))
    assert(!rep2.deletesCompacted && !rep2.filesCompacted && !rep2.snapshotsExpired)
    assert(rep2.version == rep.version)
  }

  test("positional deletes drive the same delete signals (kind-generic policy)") {
    import org.apache.spark.sql.functions.col
    val wh = new Warehouse(spark, tmpDir("mt-pos"))
    wh.append("t", df(0 until 100), statsCols = Seq("Id"))
    wh.positionDelete("t", col("Id") < 10L) // 10% of rows as position pairs
    val before = content(wh, "t")
    assert(wh.currentManifest("t").deletes.exists(_.kind == "dv"))
    val rep = wh.maintain("t")
    assert(rep.deletesCompacted)
    assert(wh.currentManifest("t").deletes.isEmpty)
    assert(content(wh, "t") == before)
    assert(before.size == 90)
  }

  test("stats-freshness arm: opted-in stale stats refresh incrementally; never behind the user's back") {
    import graft.sink.Warehouse
    val wh = new Warehouse(spark, tmpDir("mt-stats"))
    val policy = wh.MaintenancePolicy(analyzeStaleCommits = 2,
      smallFileCount = 100, keepSnapshots = 100)
    wh.append("t", df(0 until 50), statsCols = Seq("Id"))
    // no stored stats = never opted in: the arm must not fire
    assert(!wh.maintain("t", policy).statsRefreshed)
    assert(wh.columnStats("t").isEmpty)
    // opt in (subset!), then lag the head by two commits
    wh.analyzeTable("t", Seq("Id"))
    wh.append("t", df(50 until 80), statsCols = Seq("Id"))
    assert(!wh.maintain("t", policy).statsRefreshed, "one commit behind: fresh enough")
    wh.append("t", df(80 until 100), statsCols = Seq("Id"))
    val rep = wh.maintain("t", policy)
    assert(rep.statsRefreshed, "two commits behind must refresh")
    val cs = wh.columnStats("t").get
    assert(cs.version == wh.currentVersion("t"), "refresh must track the head")
    assert(cs.rows == 100L, "incremental union must count both appends")
    assert(cs.cols.keySet == Set("Id"), "the ORIGINAL analyzed column set is preserved")
    // default policy (arm off) never analyzes
    wh.append("t", df(100 until 110), statsCols = Seq("Id"))
    wh.append("t", df(110 until 120), statsCols = Seq("Id"))
    assert(!wh.maintain("t", wh.MaintenancePolicy(smallFileCount = 100,
      keepSnapshots = 100)).statsRefreshed)
  }
}
