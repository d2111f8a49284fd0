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

  test("pending-extremes arm: maintain drains a stream-maintained rollup from its recorded spec") {
    import org.apache.spark.sql.functions._
    import graft.sink.IncrementalRollup
    import graft.streaming.ChangeFeedStream
    val wh = new Warehouse(spark, tmpDir("mt-pend"))
    val facts = StructType(Seq(
      StructField("k", LongType), StructField("g", StringType),
      StructField("v", DecimalType(10, 2))))
    def kv(rows: (Long, String, String)*) = spark.createDataFrame(
      rows.map(r => Row(r._1, r._2, new java.math.BigDecimal(r._3))).asJava, facts)
    val spec = IncrementalRollup.Spec(Seq("g"), Seq(
      IncrementalRollup.CountStar("n"), IncrementalRollup.MaxOf(col("v"), "hi")))
    wh.create("fact", facts)
    wh.append("fact", kv((1L, "a", "5.00"), (2L, "a", "1.00"), (3L, "b", "2.00")),
      statsCols = Seq("k"))
    ChangeFeedStream.maintainRollup(wh, "fact", "roll", spec, "mt")
    wh.deleteWhere("fact", col("k") === 1L) // delete a's max → pending
    ChangeFeedStream.maintainRollup(wh, "fact", "roll", spec, "mt")
    val pend = ChangeFeedStream.pendingTable("roll")
    assert(wh.load(pend).count() == 1L, "premise: a group pends")
    // POLICY maintenance — not the maintainer process — repairs the rollup
    // from the recorded fact/spec sidecars (a SQL-only operator's path)
    val rep = wh.maintain("roll",
      wh.MaintenancePolicy(smallFileCount = 100, keepSnapshots = 100))
    assert(rep.pendingDrained == 1L, rep.toString)
    assert(wh.load(pend).count() == 0L, "maintain must clear the pending set")
    val got = IncrementalRollup.read(wh, "roll", spec).filter(col("n") =!= 0L)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getAs[java.math.BigDecimal]("hi").doubleValue())).toSet
    assert(got == Set(("a", 1L, 1.0), ("b", 1L, 2.0)), got.toString)
    // healthy rollup: second pass drains nothing
    assert(wh.maintain("roll", wh.MaintenancePolicy(smallFileCount = 100,
      keepSnapshots = 100)).pendingDrained == 0L)
    // a rollup with pending but NO sidecars (not stream-maintained by this
    // discipline) is left alone rather than mis-repaired
    wh.create("plain", facts)
    wh.append(ChangeFeedStream.pendingTable("plain"),
      kv((9L, "x", "0.00")), statsCols = Seq("k"))
    assert(wh.maintain("plain", wh.MaintenancePolicy(smallFileCount = 100,
      keepSnapshots = 100)).pendingDrained == 0L)
  }

  test("index-family arm: fragmented probe tables compact clustered on their keys") {
    import graft.sink.NearDupIngest
    val wh = new Warehouse(spark, tmpDir("mt-idx"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def doc(id: Long, t: String) = spark.createDataFrame(
      Seq(Row(id, t)).asJava, docSchema)
    val ing = new NearDupIngest(wh, "doc_id", "text")
    // many tiny ingests: one band/sig file per batch → fragmented ranges
    (0 until 6).foreach(i => ing.ingest("corpus",
      doc(i.toLong, (1 to 40).map(j => s"w${i}t$j").mkString(" "))))
    val bandsBefore = wh.currentManifest("corpus__bands").files.size
    val sigsBefore = wh.currentManifest("corpus__sigs").files.size
    assert(bandsBefore >= 6 && sigsBefore >= 6, s"premise: $bandsBefore/$sigsBefore")
    val pairsBefore = ing.pairs("corpus").collect().map(_.toSeq).toSet
    val rep = wh.maintain("corpus",
      wh.MaintenancePolicy(smallFileCount = 4, keepSnapshots = 100))
    assert(rep.indexCompacted.toSet == Set("corpus__bands", "corpus__sigs"),
      rep.toString)
    assert(wh.currentManifest("corpus__bands").files.size < bandsBefore)
    assert(wh.currentManifest("corpus__sigs").files.size < sigsBefore)
    assert(ing.pairs("corpus").collect().map(_.toSeq).toSet == pairsBefore,
      "index compaction must be content-preserving")
    // probes keep working (admission dedup through the compacted index)
    val again = ing.ingest("corpus",
      doc(99L, (1 to 40).map(j => s"w0t$j").mkString(" ")))
    assert(again.dupVsCorpus == 1L, again.toString)
    // healthy: second pass compacts nothing
    assert(wh.maintain("corpus", wh.MaintenancePolicy(smallFileCount = 4,
      keepSnapshots = 100)).indexCompacted.isEmpty)
  }

  test("maintain TARGETED at an index-family table keeps its probe-key clustering") {
    // maintainAll (and any operator) may name "corpus__bands" directly; the
    // generic small-file arm used to compact WITHOUT clusterBy, merging
    // files that span every band_key range — correct results, destroyed
    // probe pruning. The targeted pass now picks the family's cluster key.
    import graft.sink.NearDupIngest
    val wh = new Warehouse(spark, tmpDir("mt-idxself"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val ing = new NearDupIngest(wh, "doc_id", "text")
    (0 until 6).foreach(i => ing.ingest("corpus", spark.createDataFrame(
      Seq(Row(i.toLong, (1 to 40).map(j => s"w${i}t$j").mkString(" "))).asJava,
      docSchema)))
    val before = wh.currentManifest("corpus__bands").files.size
    assert(before >= 6)
    val rep = wh.maintain("corpus__bands",
      wh.MaintenancePolicy(smallFileCount = 4, keepSnapshots = 100))
    assert(rep.filesCompacted, rep.toString)
    val files = wh.currentManifest("corpus__bands").files
    assert(files.size < before)
    // range-clustered rewrite ⇒ pairwise-DISJOINT band_key ranges (an
    // unclustered compact merges overlapping full-range files)
    val ranges = files.flatMap(_.stats.get("band_key")).map(s => (s.min, s.max))
    val sortedR = ranges.sortBy(_._1)
    assert(sortedR.zip(sortedR.drop(1)).forall { case ((_, aMax), (bMin, _)) =>
      aMax <= bMin }, s"band_key ranges must stay disjoint: $sortedR")
    assert(ing.pairs("corpus").collect() != null) // probe path intact
  }

  test("rollup spec round-trips through its durable encoding") {
    import org.apache.spark.sql.functions._
    import graft.sink.IncrementalRollup._
    val spec = Spec(Seq("g", "region id"), Seq(
      CountStar("n"),
      SumOf(col("v").cast("decimal(20,4)"), "sv"),
      MinOf(col("v"), "lo"),
      MaxOf(col("ts"), "hi:colon")))
    val rt = specFromString(specToString(spec))
    assert(rt.keys == spec.keys)
    assert(rt.measures.map(_.name) == Seq("n", "sv", "lo", "hi:colon"))
    // expressions round-trip through their SQL: re-encode must be stable
    assert(specToString(rt) == specToString(spec))
    // keyless spec (global rollup) round-trips too
    val g = Spec(Nil, Seq(CountStar("n")))
    assert(specFromString(specToString(g)) == g)
  }
}
