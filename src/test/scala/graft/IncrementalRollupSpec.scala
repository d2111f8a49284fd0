package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sink.{IncrementalRollup, Warehouse}
import graft.sink.IncrementalRollup._
import graft.queries.Tables.dec

/** Incremental materialized-rollup maintenance: for ANY split of the fact
  * into ingest batches, with compactions interleaved at any point, the
  * maintained rollup equals the direct aggregate over the whole fact —
  * exactly (DECIMAL sums, association-free fold).
  */
class IncrementalRollupSpec extends SparkSpec {

  private val spec = Spec(
    keys = Seq("event_type"),
    measures = Seq(
      CountStar("n"),
      SumOf(dec(col("value")), "total"),
      MinOf(col("value"), "lo"),
      MaxOf(col("value"), "hi")))

  private def fact: DataFrame =
    graft.schema.SchemaOps.normalizeNanos(
      spark.read.parquet(s"$sf/events.parquet"), Seq("ts"))

  private def canon(df: DataFrame): Seq[String] =
    df.orderBy("event_type").collect().map(_.toSeq.mkString("|")).toSeq

  test("rollup over N batches == direct aggregate, with mid-stream compaction") {
    val wh = new Warehouse(spark, tmpDir("ivm"))
    val full = fact
    val direct = canon(IncrementalRollup.partial(full, spec))

    // three uneven batches, split by a deterministic hash of event_id
    val batches = Seq(
      full.filter(pmod(col("event_id"), lit(4)) === 0),
      full.filter(pmod(col("event_id"), lit(4)) === 1),
      full.filter(pmod(col("event_id"), lit(4)) >= 2))

    IncrementalRollup.maintain(wh, "r", batches(0), spec)
    IncrementalRollup.maintain(wh, "r", batches(1), spec)
    // partial-frame equality already here for the first two batches' slice
    IncrementalRollup.compact(wh, "r", spec) // merged rows are valid partials
    IncrementalRollup.maintain(wh, "r", batches(2), spec)

    assert(canon(IncrementalRollup.read(wh, "r", spec)) == direct)
  }

  test("compact bounds the table at O(distinct keys) and preserves values") {
    val wh = new Warehouse(spark, tmpDir("ivm-compact"))
    val full = fact
    (0L to 3L).foreach { i =>
      IncrementalRollup.maintain(wh, "r", full.filter(pmod(col("event_id"), lit(4)) === i), spec)
    }
    val before = canon(IncrementalRollup.read(wh, "r", spec))
    val nKeys = full.select("event_type").distinct().count()
    assert(wh.load("r").count() > nKeys) // partials accumulated
    IncrementalRollup.compact(wh, "r", spec)
    assert(wh.load("r").count() == nKeys) // folded to one row per key
    assert(canon(IncrementalRollup.read(wh, "r", spec)) == before)
  }

  test("maintenance never scans the fact: partial rows are key-bounded") {
    val batch = fact.limit(500)
    val p = IncrementalRollup.partial(batch, spec)
    assert(p.count() <= 5) // 5 event types; 500-row batch folds to <= 5 rows
  }

  test("streaming maintenance: replayed micro-batch ids are skipped, result exact") {
    import graft.streaming.RollupStream
    val wh = new Warehouse(spark, tmpDir("ivm-stream"))
    val full = fact
    val direct = canon(IncrementalRollup.partial(full, spec))
    val apply = RollupStream.applyBatch(wh, "r", spec, "s1") _
    val b0 = full.filter(pmod(col("event_id"), lit(2)) === 0)
    val b1 = full.filter(pmod(col("event_id"), lit(2)) === 1)
    apply(b0, 0L)
    apply(b1, 1L)
    apply(b1, 1L) // crash-replay of the last batch: must not double count
    apply(b0, 0L) // stale re-delivery below the watermark: skipped too
    assert(canon(IncrementalRollup.read(wh, "r", spec)) == direct)
  }

  test("feed-driven maintenance: fact appends flow in, retries are no-ops, result exact") {
    val wh = new Warehouse(spark, tmpDir("ivm-feed"))
    val full = fact.select("event_type", "value")
    val direct = canon(IncrementalRollup.partial(full, spec))
    wh.append("fact", full.filter(pmod(col("value").cast("long"), lit(3)) === 0))
    IncrementalRollup.maintainFromFeed(wh, "fact", "r", spec)
    IncrementalRollup.maintainFromFeed(wh, "fact", "r", spec) // no new version: no-op
    wh.append("fact", full.filter(pmod(col("value").cast("long"), lit(3)) === 1))
    wh.append("fact", full.filter(pmod(col("value").cast("long"), lit(3)) === 2))
    IncrementalRollup.maintainFromFeed(wh, "fact", "r", spec) // folds BOTH new versions
    IncrementalRollup.maintainFromFeed(wh, "fact", "r", spec) // retry: no-op
    assert(canon(IncrementalRollup.read(wh, "r", spec)) == direct)
  }

  // ---- min/max under the change feed: targeted group rescan ----

  private val mmSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("k",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value",
      org.apache.spark.sql.types.LongType)))
  private val mmSpec = Spec(Seq("k"), Seq(
    CountStar("n"), SumOf(dec(col("value")), "total"),
    MinOf(col("value"), "lo"), MaxOf(col("value"), "hi")))

  private def mmRows(rows: (String, Long)*): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava, mmSchema)
  }

  private def mmCanon(df: DataFrame): Seq[String] =
    df.orderBy("k").collect().map(_.toSeq.mkString("|")).toSeq
  private def mmDirect(wh: Warehouse): Seq[String] =
    mmCanon(IncrementalRollup.partial(wh.load("fact"), mmSpec))

  test("change feed + min/max: delete-the-extreme rescans ONLY that group") {
    val wh = new Warehouse(spark, tmpDir("ivm-mm"))
    wh.create("fact", mmSchema)
    wh.append("fact", mmRows("a" -> 1L, "a" -> 5L, "a" -> 9L, "b" -> 10L, "b" -> 20L),
      statsCols = Seq("k"))
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec) // bootstrap
    assert(mmCanon(IncrementalRollup.read(wh, "r", mmSpec)) == mmDirect(wh))

    wh.append("fact", mmRows("a" -> 7L, "b" -> 30L), statsCols = Seq("k"))
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    assert(mmCanon(IncrementalRollup.read(wh, "r", mmSpec)) == mmDirect(wh))
    val aRows0 = wh.load("r").filter(col("k") === "a").count()
    assert(aRows0 == 2L, "one partial per window so far")

    // INSIDE-bounds delete (a:5 is not an extreme): no rescan, no
    // consolidation — group a's fold history stays intact and just gains
    // the window's signed partial
    wh.deleteWhere("fact", col("k") === "a" && col("value") === 5L)
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    assert(mmCanon(IncrementalRollup.read(wh, "r", mmSpec)) == mmDirect(wh))
    assert(wh.load("r").filter(col("k") === "a").count() == 3L,
      "inside-bounds delete must not consolidate the group")

    // delete-the-MAX of group a: exactly that group consolidates to ONE
    // recomputed row; group b's history is untouched
    val bRows = wh.load("r").filter(col("k") === "b").count()
    wh.deleteWhere("fact", col("k") === "a" && col("value") === 9L)
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    assert(mmCanon(IncrementalRollup.read(wh, "r", mmSpec)) == mmDirect(wh))
    assert(wh.load("r").filter(col("k") === "a").count() == 1L,
      "affected group consolidates to one recomputed row")
    assert(wh.load("r").filter(col("k") === "b").count() == bRows,
      "unaffected group's history untouched")
    val aRow = IncrementalRollup.read(wh, "r", mmSpec)
      .filter(col("k") === "a").collect().head
    assert(aRow.getAs[Long]("n") == 2L && aRow.getAs[Long]("lo") == 1L &&
      aRow.getAs[Long]("hi") == 7L, aRow.toString)

    // delete ALL of group b: the group vanishes from the rollup
    wh.deleteWhere("fact", col("k") === "b")
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    assert(IncrementalRollup.read(wh, "r", mmSpec)
      .filter(col("k") === "b").count() == 0L)
    assert(mmCanon(IncrementalRollup.read(wh, "r", mmSpec)) == mmDirect(wh))

    // replay: no-op
    val v = wh.currentVersion("r")
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    assert(wh.currentVersion("r") == v)
  }

  test("change feed + min/max: targeted rescan is ONE atomic rollup commit") {
    // REGRESSION: retract (deleteWhere) + append used to be two commits; a
    // crash between them lost the affected groups' history permanently
    // (replay found no tie and appended only the window partial). The
    // rescan now lands as one transaction commit: retraction is a staged
    // equality delete that cannot touch the same transaction's rows.
    val wh = new Warehouse(spark, tmpDir("ivm-atomic"))
    wh.create("fact", mmSchema)
    wh.append("fact", mmRows("a" -> 1L, "a" -> 9L, "b" -> 5L), statsCols = Seq("k"))
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    wh.append("fact", mmRows("a" -> 3L), statsCols = Seq("k"))
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)

    val v0 = wh.currentVersion("r")
    wh.deleteWhere("fact", col("k") === "a" && col("value") === 9L) // the max
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    assert(wh.currentVersion("r") == v0 + 1,
      s"targeted rescan must land as ONE commit, took ${wh.currentVersion("r") - v0}")
    assert(mmCanon(IncrementalRollup.read(wh, "r", mmSpec)) == mmDirect(wh))
    // the retraction rides as a MOR equality delete — fold state must read
    // exactly one surviving row for the consolidated group
    assert(IncrementalRollup.read(wh, "r", mmSpec)
      .filter(col("k") === "a").collect().head.getAs[Long]("hi") == 3L)
  }

  test("change feed + min/max: NULL-keyed affected group takes the replace, stays exact") {
    // staged equality deletes are plain-equality (null keys never match),
    // so a null-keyed affected group cannot retract through the transaction
    // path — the maintenance must fall back to the single-commit
    // consolidation replace and still converge to the direct aggregate
    val wh = new Warehouse(spark, tmpDir("ivm-nullkey"))
    wh.create("fact", mmSchema)
    wh.append("fact", mmRows((null: String) -> 2L, (null: String) -> 8L, "b" -> 4L),
      statsCols = Seq("k"))
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    wh.deleteWhere("fact", col("k").isNull && col("value") === 8L) // null group's max
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    assert(mmCanon(IncrementalRollup.read(wh, "r", mmSpec)) == mmDirect(wh))
    val nullRow = IncrementalRollup.read(wh, "r", mmSpec)
      .filter(col("k").isNull).collect().head
    assert(nullRow.getAs[Long]("n") == 1L && nullRow.getAs[Long]("hi") == 2L,
      nullRow.toString)
  }

  test("change feed + min/max: mass-delete window takes the consolidation replace") {
    val wh = new Warehouse(spark, tmpDir("ivm-mass"))
    wh.create("fact", mmSchema)
    val groups = (0 until (IncrementalRollup.MaxRescanGroups + 44)).map(i => s"g$i")
    wh.append("fact", mmRows(groups.flatMap(g =>
      Seq(g -> 1L, g -> 2L)): _*), statsCols = Seq("k"))
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    // delete every group's max in one commit — affected >> the gate
    wh.deleteWhere("fact", col("value") === 2L)
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", mmSpec)
    assert(mmCanon(IncrementalRollup.read(wh, "r", mmSpec)) == mmDirect(wh))
    assert(wh.load("r").count() == groups.size,
      "consolidation replace leaves one row per surviving group")
  }

  test("change feed + min/max: global (no-key) rollup replaces on extreme delete") {
    val g = Spec(Nil, Seq(CountStar("n"), MaxOf(col("value"), "hi")))
    val wh = new Warehouse(spark, tmpDir("ivm-global"))
    wh.create("fact", mmSchema)
    wh.append("fact", mmRows("a" -> 1L, "a" -> 9L, "b" -> 4L), statsCols = Seq("k"))
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", g)
    wh.deleteWhere("fact", col("value") === 9L)
    IncrementalRollup.maintainFromChangeFeed(wh, "fact", "r", g)
    val row = IncrementalRollup.read(wh, "r", g).collect().head
    assert(row.getAs[Long]("n") == 2L && row.getAs[Long]("hi") == 4L, row.toString)
  }

  test("streaming maintenance end-to-end over a MemoryStream") {
    import graft.streaming.RollupStream
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val wh = new Warehouse(spark, tmpDir("ivm-stream-e2e"))
    val rows = fact.select("event_type", "value")
      .as[(String, Double)].collect().toSeq
    val direct = canon(IncrementalRollup.partial(fact, spec))
    val input = MemoryStream[(String, Double)]
    val q = RollupStream.maintain(
      input.toDF().toDF("event_type", "value"),
      wh, "r", spec, "s1", tmpDir("ivm-ckpt")).start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      input.addData(a); q.processAllAvailable()
      input.addData(b); q.processAllAvailable()
      assert(canon(IncrementalRollup.read(wh, "r", spec)) == direct)
    } finally q.stop()
  }
}
