package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** `spark.readStream.table("cat.t")` — the DSv2 micro-batch read of a
  * warehouse table (`GraftMicroBatchStream`): offsets ARE snapshot versions,
  * each batch is exactly the files its commit window added, restarts replay
  * from Spark's offset log with zero re-delivery, and non-append commits
  * refuse loudly (or are skipped with `stream-skip-changes`).
  */
class StreamTableReadSpec extends SparkSpec {

  private val cat = "strc"
  private lazy val root: String = {
    val r = tmpDir("graft-streamread")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", r)
    r
  }
  private def wh = new Warehouse(spark, root)

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))
  private def frame(rows: (Long, String)*) =
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows.map(r => Row(r._1, r._2))).asJava,
      schema)

  private def memRows(name: String): Set[(Long, String)] =
    spark.table(name).collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("delivers history, then follows appends; restart from checkpoint re-delivers nothing") {
    wh.create("s1", schema)
    wh.append("s1", frame(1L -> "a"), statsCols = Seq("k"))
    wh.append("s1", frame(2L -> "b"), statsCols = Seq("k"))
    val ckpt = tmpDir("ckpt-s1")
    // foreachBatch (checkpoint-recoverable, unlike the memory sink) into a
    // shared buffer — restart proves the offset log, the buffer the rows
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def start() = spark.readStream.table(s"$cat.s1")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.collect().foreach(r => got.add((r.getLong(0), r.getString(1))))
      }
      .option("checkpointLocation", ckpt).start()
    import scala.jdk.CollectionConverters._

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(got.asScala.toSet == Set(1L -> "a", 2L -> "b"), "full history as the first batches")
      wh.append("s1", frame(3L -> "c"), statsCols = Seq("k"))
      q1.processAllAvailable()
      assert(got.asScala.toSet == Set(1L -> "a", 2L -> "b", 3L -> "c"))
    } finally q1.stop()

    // a rebuilt query on the SAME checkpoint must re-deliver nothing:
    // offsets are snapshot versions in Spark's offset log
    got.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.isEmpty, "no re-delivery after restart")
      wh.append("s1", frame(4L -> "d"), statsCols = Seq("k"))
      q2.processAllAvailable()
      assert(got.asScala.toSet == Set(4L -> "d"), "only the new commit after restart")
    } finally q2.stop()
  }

  test("streaming projection and filter ride the scan: pruned columns, pushed predicates") {
    wh.create("s2", schema)
    wh.append("s2", frame(1L -> "a", 2L -> "b", 3L -> "c"), statsCols = Seq("k"))
    val q = spark.readStream.table(s"$cat.s2")
      .filter(col("k") >= 2).select("v")
      .writeStream.outputMode("append").format("memory").queryName("s2_m")
      .option("checkpointLocation", tmpDir("ckpt-s2")).start()
    try {
      q.processAllAvailable()
      assert(spark.table("s2_m").collect().map(_.getString(0)).toSet == Set("b", "c"))
    } finally q.stop()
  }

  test("stream-start-version=latest skips existing data and follows only new commits") {
    wh.create("s3", schema)
    wh.append("s3", frame(1L -> "old"), statsCols = Seq("k"))
    val q = spark.readStream.option("stream-start-version", "latest").table(s"$cat.s3")
      .writeStream.outputMode("append").format("memory").queryName("s3_m")
      .option("checkpointLocation", tmpDir("ckpt-s3")).start()
    try {
      q.processAllAvailable()
      assert(memRows("s3_m").isEmpty)
      wh.append("s3", frame(2L -> "new"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(memRows("s3_m") == Set(2L -> "new"))
    } finally q.stop()
  }

  test("a non-append commit refuses loudly; stream-skip-changes skips it and keeps following") {
    wh.create("s4", schema)
    wh.append("s4", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    val strict = spark.readStream.table(s"$cat.s4")
      .writeStream.outputMode("append").format("memory").queryName("s4_strict")
      .option("checkpointLocation", tmpDir("ckpt-s4a")).start()
    try {
      strict.processAllAvailable()
      wh.compactFiles("s4") // rewrites small files -> removes files from the manifest
      wh.append("s4", frame(3L -> "c"), statsCols = Seq("k"))
      val ex = intercept[StreamingQueryException] { strict.processAllAvailable() }
      assert(ex.getMessage.contains("append-only") ||
        Option(ex.getCause).exists(_.getMessage.contains("append-only")), ex.getMessage)
    } finally strict.stop()

    // skip mode: the compaction commit delivers nothing (its rows were
    // already delivered from the pre-compaction files), the append follows
    val lax = spark.readStream.option("stream-skip-changes", "true").table(s"$cat.s4")
      .writeStream.outputMode("append").format("memory").queryName("s4_lax")
      .option("checkpointLocation", tmpDir("ckpt-s4b")).start()
    try {
      lax.processAllAvailable()
      // v0 create + v1 append delivered; compaction v2 skipped ENTIRELY
      // (its rewritten file would double-deliver rows 1,2 otherwise)
      assert(memRows("s4_lax") == Set(1L -> "a", 2L -> "b", 3L -> "c"))
      wh.append("s4", frame(4L -> "d"), statsCols = Seq("k"))
      lax.processAllAvailable()
      assert(memRows("s4_lax") == Set(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d"))
    } finally lax.stop()
  }

  test("stream-max-files-per-trigger drains a backlog in bounded micro-batches") {
    wh.create("s6", schema)
    (1L to 4L).foreach(i => wh.append("s6", frame(i -> s"v$i"), statsCols = Seq("k")))
    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val q = spark.readStream.option("stream-max-files-per-trigger", "1").table(s"$cat.s6")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val n = df.count().toInt
        if (n > 0) batchSizes.add(n)
        ()
      }
      .option("checkpointLocation", tmpDir("ckpt-s6")).start()
    try {
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      // four single-file commits, budget 1 file/trigger -> four bounded
      // batches, never one catch-up mega-batch
      assert(batchSizes.asScala.toList == List(1, 1, 1, 1),
        s"expected 4 bounded batches, got $batchSizes")
    } finally q.stop()
  }

  // ------------------------------------------------- $changes (CDC) face --

  /** Signed net of a +I/-D row bag: the fold every CDC consumer computes. */
  private def net(rows: Seq[(Long, String, String)]): Map[(Long, String), Int] =
    rows.groupBy(r => (r._1, r._2))
      .view.mapValues(_.map(r => if (r._3 == "+I") 1 else -1).sum)
      .filter(_._2 != 0).toMap

  private def cdcRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("$changes stream: every commit kind delivers exact +I/-D; fold ≡ one-shot readChanges") {
    wh.create("c1", schema)
    val ckpt = tmpDir("ckpt-c1")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    def start() = spark.readStream.table(s"$cat.`c1$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val rows = cdcRows(df.toDF())
        if (rows.nonEmpty) batches.incrementAndGet()
        rows.foreach(got.add)
      }
      .option("checkpointLocation", ckpt).start()
    import scala.jdk.CollectionConverters._

    val q = start()
    try {
      wh.append("c1", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet == Set((1L, "a", "+I"), (2L, "b", "+I")))
      // morMerge upsert: old row -D, new row +I, plus the fresh insert
      wh.morMerge("c1", frame(2L -> "B", 3L -> "c"), Seq("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet.contains((2L, "b", "-D")), s"upsert must retract the old row: $got")
      assert(got.asScala.toSet.contains((2L, "B", "+I")))
      assert(got.asScala.toSet.contains((3L, "c", "+I")))
      // row-level delete arrives as -D
      wh.equalityDelete("c1", frame(1L -> "x").select("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet.contains((1L, "a", "-D")), s"delete must deliver -D: $got")
      // compaction is a NO-OP in the feed (rewrite carry-over cancels)
      val before = got.size()
      wh.compactFiles("c1")
      q.processAllAvailable()
      assert(got.size() == before, s"compaction must deliver nothing: $got")
      wh.append("c1", frame(4L -> "d"), statsCols = Seq("k"))
      q.processAllAvailable()
      // the windowed deliveries FOLD to the one-shot feed (cancellation
      // pairs like 2,b +I then -D net out of readChanges(0, head))
      val head = wh.currentVersion("c1")
      assert(net(got.asScala.toSeq) == net(cdcRows(wh.readChanges("c1", 0, head))),
        s"stream fold must equal one-shot readChanges: $got")
    } finally q.stop()

    // restart on the same checkpoint: nothing re-delivers; a new commit
    // delivers exactly its own window
    got.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.isEmpty, s"no re-delivery after restart: $got")
      val h1 = wh.currentVersion("c1")
      wh.morMerge("c1", frame(4L -> "D2"), Seq("k"))
      q2.processAllAvailable()
      val h2 = wh.currentVersion("c1")
      assert(got.asScala.toSet == cdcRows(wh.readChanges("c1", h1, h2)).toSet,
        s"post-restart delivery must be exactly the new window: $got")
    } finally q2.stop()
  }

  test("$changes: batch face serves windows; streaming admission bounds batches") {
    wh.create("c2", schema)
    wh.append("c2", frame(1L -> "a"), statsCols = Seq("k"))
    wh.append("c2", frame(2L -> "b"), statsCols = Seq("k"))
    wh.equalityDelete("c2", frame(1L -> "x").select("k"))
    val head = wh.currentVersion("c2")
    // batch default: full net history from empty (all surviving rows +I)
    assert(cdcRows(spark.read.table(s"$cat.`c2$$changes`")).toSet ==
      Set((2L, "b", "+I")))
    // explicit window ≡ readChanges on the same bounds
    val win = cdcRows(spark.read.option("from-version", 1)
      .option("to-version", head).table(s"$cat.`c2$$changes`")).sorted
    assert(win == cdcRows(wh.readChanges("c2", 1, head)).sorted)
    // SQL face reads it too
    assert(spark.sql(s"SELECT count(*) FROM $cat.`c2$$changes`").head().getLong(0) == 1L)

    // admission: 1 changed file per trigger → one batch per commit window
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.option("stream-max-files-per-trigger", "1")
      .table(s"$cat.`c2$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (df.count() > 0) nBatches.incrementAndGet()
        ()
      }
      .option("checkpointLocation", tmpDir("ckpt-c2")).start()
    try {
      q.processAllAvailable()
      assert(nBatches.get() >= 2,
        s"bounded admission must split the backlog, got ${nBatches.get()} batches")
    } finally q.stop()
  }

  test("$changes end-to-end: a readStream mirror converges to the source across every commit kind") {
    wh.create("c4", schema)
    val ckpt = tmpDir("ckpt-c4")
    // the downstream-replication shape, in PURE Spark APIs: consume the
    // changes stream, apply +I as upsert and -D as delete to a copy table
    def start() = spark.readStream.table(s"$cat.`c4$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val rows = df.toDF().persist()
        try {
          val dels = rows.filter(col("_change_type") === "-D").select("k")
          val ins = rows.filter(col("_change_type") === "+I").drop("_change_type")
          if (!wh.exists("c4_copy")) wh.create("c4_copy", schema)
          if (dels.count() > 0) wh.equalityDelete("c4_copy", dels)
          if (ins.count() > 0) wh.morMerge("c4_copy", ins, Seq("k"))
          ()
        } finally rows.unpersist()
      }
      .option("checkpointLocation", ckpt).start()
    def copyRows() = wh.load("c4_copy").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    def srcRows() = wh.load("c4").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val q = start()
    try {
      wh.append("c4", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(copyRows() == srcRows())
      wh.morMerge("c4", frame(2L -> "B", 3L -> "c"), Seq("k"))
      q.processAllAvailable()
      assert(copyRows() == srcRows() && copyRows() == Set(1L -> "a", 2L -> "B", 3L -> "c"))
      wh.equalityDelete("c4", frame(1L -> "x").select("k"))
      wh.compactFiles("c4")
      wh.append("c4", frame(4L -> "d"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(copyRows() == srcRows() && copyRows() == Set(2L -> "B", 3L -> "c", 4L -> "d"))
    } finally q.stop()
  }

  test("$changes follows a BRANCH ledger: per-ref windows, main unaffected") {
    wh.create("c3", schema)
    wh.append("c3", frame(1L -> "a"), statsCols = Seq("k"))
    wh.createBranch("c3", "dev")
    wh.append("c3@dev", frame(2L -> "b"), statsCols = Seq("k"))
    wh.equalityDelete("c3@dev", frame(1L -> "x").select("k"))
    val head = wh.currentVersion("c3@dev")
    // batch face over the branch ref: the branch's own history
    val got = cdcRows(spark.read.table(s"$cat.`c3@dev$$changes`")).toSet
    assert(got == Set((2L, "b", "+I")),
      s"branch net history must reflect branch commits: $got")
    val win = cdcRows(spark.read.option("from-version", 1)
      .option("to-version", head).table(s"$cat.`c3@dev$$changes`")).sorted
    assert(win == cdcRows(wh.readChanges("c3@dev", 1, head)).sorted)
    // main's feed never sees branch commits
    assert(cdcRows(spark.read.table(s"$cat.`c3$$changes`")).toSet ==
      Set((1L, "a", "+I")))
  }

  test("$changes staged windows are swept by expireSnapshots and re-materialize on demand") {
    wh.create("c5", schema)
    wh.append("c5", frame(1L -> "a"), statsCols = Seq("k"))
    wh.morMerge("c5", frame(1L -> "A"), Seq("k"))
    val expected = cdcRows(spark.read.table(s"$cat.`c5$$changes`")).toSet
    val cdcDir = java.nio.file.Paths.get(root, "c5", "_cdc")
    def stages(): Seq[String] = {
      if (!java.nio.file.Files.isDirectory(cdcDir)) return Nil
      val s = java.nio.file.Files.list(cdcDir)
      try {
        val b = Seq.newBuilder[String]
        s.forEach(p => if (p.getFileName.toString.startsWith("w"))
          b += p.getFileName.toString)
        b.result()
      } finally s.close()
    }
    assert(stages().nonEmpty, "the batch read must have staged its window")
    // expiry is the batch-only consumer's backstop (streams sweep on commit)
    wh.expireSnapshots("c5", keepLast = 10, orphanGraceMs = 0L)
    assert(stages().isEmpty, "aged stages must be swept")
    // a swept window simply re-materializes: same deterministic bag
    assert(cdcRows(spark.read.table(s"$cat.`c5$$changes`")).toSet == expected)
  }

  test("$changes over EXPIRED history: default nets from the oldest retained snapshot; explicit starts refuse clearly") {
    wh.create("c6", schema)
    (1 to 4).foreach(i => wh.append("c6", frame(i.toLong -> s"v$i"), statsCols = Seq("k")))
    wh.expireSnapshots("c6", keepLast = 2, orphanGraceMs = 0L)
    val retained = wh.history("c6")
    assert(retained == Seq(3L, 4L), retained.toString)

    // batch: an explicit window into expired history refuses with the fix
    // spelled out (no stage can exist — the fingerprinted dirs are fresh)
    val ex = intercept[Exception] {
      spark.read.option("from-version", 1).option("to-version", 4)
        .table(s"$cat.`c6$$changes`").collect()
    }
    val msg = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(msg.contains("oldest retained"), msg)
    // batch default (net history from empty) keeps working: expired commits'
    // net effect is inside the retained snapshot
    assert(cdcRows(spark.read.table(s"$cat.`c6$$changes`")).toSet ==
      (1 to 4).map(i => (i.toLong, s"v$i", "+I")).toSet)

    // stream: an explicit start whose from-manifest is expired fails AT INIT
    // with the valid options listed
    val bad = spark.readStream.option("stream-start-version", "2")
      .table(s"$cat.`c6$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch((_: org.apache.spark.sql.Dataset[Row], _: Long) => ())
      .option("checkpointLocation", tmpDir("ckpt-c6bad")).start()
    try {
      val sex = intercept[StreamingQueryException] { bad.processAllAvailable() }
      val smsg = Iterator.iterate(sex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
      assert(smsg.contains("expired") && smsg.contains("oldest retained"), smsg)
    } finally bad.stop()

    // stream default with bounded admission: the expired prefix arrives as
    // ONE net window ending at the oldest retained snapshot, then per-commit
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    val q = spark.readStream.option("stream-max-files-per-trigger", "1")
      .table(s"$cat.`c6$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        cdcRows(df.toDF()).foreach(got.add)
      }
      .option("checkpointLocation", tmpDir("ckpt-c6")).start()
    import scala.jdk.CollectionConverters._
    try {
      q.processAllAvailable()
      assert(got.asScala.toSet ==
        (1 to 4).map(i => (i.toLong, s"v$i", "+I")).toSet, got.toString)
      wh.append("c6", frame(5L -> "v5"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet.contains((5L, "v5", "+I")))
    } finally q.stop()
  }

  test("$changes janitors collect crashed stagers' tmp-* dirs; window dirs are schema-fingerprinted") {
    wh.create("c7", schema)
    wh.append("c7", frame(1L -> "a"), statsCols = Seq("k"))
    val head = wh.currentVersion("c7")
    assert(cdcRows(spark.read.table(s"$cat.`c7$$changes`")).nonEmpty)
    val cdcDir = java.nio.file.Paths.get(root, "c7", "_cdc")
    def entries(): Seq[String] = {
      val s = java.nio.file.Files.list(cdcDir)
      try { val b = Seq.newBuilder[String]; s.forEach(p => b += p.getFileName.toString); b.result() }
      finally s.close()
    }
    // staged dirs carry the load-time schema fingerprint
    assert(entries().exists(_.matches("w-1_" + head + "-[0-9a-f]{8}")), entries().toString)
    // a consumer whose load-time schema differs stages the SAME window
    // separately (never reuses files that lack / mis-name its columns)
    wh.addColumns("c7", Seq(StructField("extra", StringType)))
    assert(cdcRows(spark.read.option("to-version", head.toString)
      .table(s"$cat.`c7$$changes`").select("k", "v", "_change_type")).nonEmpty)
    val windows = entries().filter(_.startsWith(s"w-1_$head-"))
    assert(windows.size == 2 && windows.distinct.size == 2,
      s"evolved consumer must stage separately: $windows")
    // crashed-stager leftovers (tmp-*) are collected by BOTH janitors
    val tmp1 = cdcDir.resolve("tmp-deadbeef")
    java.nio.file.Files.createDirectories(tmp1)
    java.nio.file.Files.setLastModifiedTime(tmp1,
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    wh.expireSnapshots("c7", keepLast = 10, orphanGraceMs = 0L)
    assert(!java.nio.file.Files.exists(tmp1), "expireSnapshots must sweep aged tmp-*")
    val tmp2 = cdcDir.resolve("tmp-cafebabe")
    java.nio.file.Files.createDirectories(tmp2)
    java.nio.file.Files.setLastModifiedTime(tmp2,
      java.nio.file.attribute.FileTime.fromMillis(1000L))
    val q = spark.readStream.option("stream-stage-retention-ms", "60000")
      .table(s"$cat.`c7$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch((_: org.apache.spark.sql.Dataset[Row], _: Long) => ())
      .option("checkpointLocation", tmpDir("ckpt-c7")).start()
    try {
      q.processAllAvailable()
      // the source's offset commit fires when the NEXT batch is constructed
      // (Spark cleans up the previous batch lazily) — drive one more window
      wh.append("c7", frame(9L -> "z"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(!java.nio.file.Files.exists(tmp2),
        "the stream's offset-commit sweep must collect aged tmp-*")
    } finally q.stop()
  }

  test("$changes_lineage: ids ride the feed, stay stable across compaction, pair updates across a KEY-column rename") {
    wh.create("cl1", schema)
    val ckpt = tmpDir("ckpt-cl1")
    // (batch, row_id, change_type, k, v)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String, Long, String)]()
    val q = spark.readStream.option("update-images", "true")
      .table(s"$cat.`cl1$$changes_lineage`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], b: Long) =>
        df.select("_row_id", "_change_type", "k", "v").collect().foreach(r =>
          got.add((b, r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))))
      }
      .option("checkpointLocation", ckpt).start()
    import scala.jdk.CollectionConverters._
    try {
      wh.append("cl1", frame(1L -> "a", 2L -> "b", 3L -> "c"), statsCols = Seq("k"))
      q.processAllAvailable()
      val inserts = got.asScala.filter(_._3 == "+I").map(r => r._4 -> r._2).toMap
      assert(inserts.keySet == Set(1L, 2L, 3L), got.asScala.toString)
      // compaction mid-stream: content-preserving, contributes NOTHING
      val before = got.size()
      wh.compactFiles("cl1")
      q.processAllAvailable()
      assert(got.size() == before, "compaction must cancel in the lineage feed")
      // rename the KEY column mid-stream — name-based identifier pairing is
      // impossible now; id pairing must not notice
      wh.renameColumn("cl1", "k", "kk")
      q.processAllAvailable()
      wh.updateWhere("cl1", col("kk") === 2L, Map("v" -> lit("B2")))
      q.processAllAvailable()
      val us = got.asScala.filter(r => r._3 == "-U" || r._3 == "+U").toSeq
      assert(us.map(_._3).sorted == Seq("+U", "-U"), s"exactly one pair: $us")
      // the pair shares ONE id — and it is the id k=2 was BORN with, still
      // alive across the compaction rewrite and the rename
      assert(us.map(_._2).distinct.size == 1, s"pair must share an id: $us")
      assert(us.head._2 == inserts(2L), "updated row keeps its birth id")
      // values: pre-image old v, post-image new v, under the LOAD-TIME name
      assert(us.collect { case (_, _, "-U", k, v) => (k, v) } == Seq(2L -> "b"))
      assert(us.collect { case (_, _, "+U", k, v) => (k, v) } == Seq(2L -> "B2"))
      // a delete reports -D with the dying row's id
      wh.equalityDelete("cl1", frame(3L -> "ignored").select(col("k").as("kk")))
      q.processAllAvailable()
      val ds = got.asScala.filter(_._3 == "-D").toSeq
      assert(ds.map(r => (r._4, r._2)) == Seq(3L -> inserts(3L)), s"-D carries the id: $ds")
    } finally q.stop()
    // identifier-columns on the lineage face refuses loudly (pairing is by id)
    val ex = intercept[Exception] {
      spark.read.option("update-images", "true").option("identifier-columns", "kk")
        .table(s"$cat.`cl1$$changes_lineage`").collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("_row_id"), ex.getMessage)
  }

  test("$changes update-images: upserts pair as -U/+U, deletes stay -D; pairing survives restart") {
    wh.create("u1", schema)
    val ckpt = tmpDir("ckpt-u1")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    def start() = spark.readStream.option("update-images", "true")
      .table(s"$cat.`u1$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        cdcRows(df.toDF()).foreach(got.add)
      }
      .option("checkpointLocation", ckpt).start()
    import scala.jdk.CollectionConverters._

    val q = start()
    try {
      wh.append("u1", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet == Set((1L, "a", "+I"), (2L, "b", "+I")))
      // morMerge: the old/new rows of key 2 arrive PAIRED as -U/+U; the
      // fresh key 3 is a plain +I
      wh.morMerge("u1", frame(2L -> "B", 3L -> "c"), Seq("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet == Set((1L, "a", "+I"), (2L, "b", "+I"),
        (2L, "b", "-U"), (2L, "B", "+U"), (3L, "c", "+I")), got.toString)
      // a genuine delete stays -D (no arriving row to pair with)
      wh.equalityDelete("u1", frame(1L -> "x").select("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet.contains((1L, "a", "-D")))
      assert(!got.asScala.exists(r => r._1 == 1L && (r._3 == "-U" || r._3 == "+U")))
    } finally q.stop()

    // restart on the same checkpoint: nothing re-delivers, and a new
    // upsert window pairs exactly as the pre-restart ones did
    got.clear()
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.isEmpty, s"no re-delivery after restart: $got")
      wh.morMerge("u1", frame(3L -> "C"), Seq("k"))
      q2.processAllAvailable()
      assert(got.asScala.toSet == Set((3L, "c", "-U"), (3L, "C", "+U")), got.toString)
    } finally q2.stop()

    // batch face: same option, same labels on an explicit window; and the
    // PLAIN feed over the same window still reads -D/+I (mode is opt-in,
    // fingerprint-separated stages)
    val head = wh.currentVersion("u1")
    val imaged = cdcRows(spark.read.option("update-images", "true")
      .option("from-version", 1).option("to-version", head)
      .table(s"$cat.`u1$$changes`")).toSet
    assert(imaged.contains((2L, "b", "-U")) && imaged.contains((2L, "B", "+U")), imaged.toString)
    val plain = cdcRows(spark.read.option("from-version", 1).option("to-version", head)
      .table(s"$cat.`u1$$changes`")).toSet
    assert(plain.contains((2L, "b", "-D")) && !plain.exists(_._3 == "-U"), plain.toString)
    // explicit identifier columns behave identically to the inferred key
    val explicit = cdcRows(spark.read.option("update-images", "true")
      .option("identifier-columns", "k")
      .option("from-version", 1).option("to-version", head)
      .table(s"$cat.`u1$$changes`")).toSet
    assert(explicit == imaged, explicit.toString)
  }

  test("$changes update-images mirror: a replicator consuming -U/+U directly converges") {
    wh.create("u2", schema)
    val ckpt = tmpDir("ckpt-u2")
    // the replicator shape the images exist for: +U/+I upsert by key, -D
    // deletes, -U pre-images are informational and must be ignorable
    def start() = spark.readStream.option("update-images", "true")
      .table(s"$cat.`u2$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val rows = df.toDF().persist()
        try {
          val dels = rows.filter(col("_change_type") === "-D").select("k")
          val ups = rows.filter(col("_change_type").isin("+I", "+U")).drop("_change_type")
          if (!wh.exists("u2_copy")) wh.create("u2_copy", schema)
          if (dels.count() > 0) wh.equalityDelete("u2_copy", dels)
          if (ups.count() > 0) wh.morMerge("u2_copy", ups, Seq("k"))
          ()
        } finally rows.unpersist()
      }
      .option("checkpointLocation", ckpt).start()
    def rowsIn(t: String) = wh.load(t).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val q = start()
    try {
      wh.append("u2", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(rowsIn("u2_copy") == rowsIn("u2"))
      wh.morMerge("u2", frame(2L -> "B", 3L -> "c"), Seq("k"))
      q.processAllAvailable()
      assert(rowsIn("u2_copy") == rowsIn("u2") &&
        rowsIn("u2_copy") == Set(1L -> "a", 2L -> "B", 3L -> "c"))
      wh.equalityDelete("u2", frame(1L -> "x").select("k"))
      wh.append("u2", frame(4L -> "d"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(rowsIn("u2_copy") == rowsIn("u2") &&
        rowsIn("u2_copy") == Set(2L -> "B", 3L -> "c", 4L -> "d"))
    } finally q.stop()
  }

  test("$changes admission over a 50-commit backlog stays O(commits): zero full-manifest replays in the count") {
    wh.create("c8", schema)
    (1 to 50).foreach(i => wh.append("c8", frame(i.toLong -> s"v$i"), statsCols = Seq("k")))
    val before = Warehouse.changeCountFullDiffs.get()
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = spark.readStream.option("stream-max-files-per-trigger", "1")
      .table(s"$cat.`c8$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        if (df.count() > 0) nBatches.incrementAndGet()
        ()
      }
      .option("checkpointLocation", tmpDir("ckpt-c8")).start()
    try {
      q.processAllAvailable()
      assert(nBatches.get() == 50, s"1-file budget must deliver per-commit windows: ${nBatches.get()}")
      // every admission count rode the segmented-root LINE diff — draining a
      // K-commit backlog over an F-file table does O(K) root/segment reads,
      // never O(K·F) manifest replays
      assert(Warehouse.changeCountFullDiffs.get() == before,
        "append-backlog admission must never fall back to full manifest diffs")
    } finally q.stop()
  }

  test("$changes STREAMING consumer filter scopes per-trigger window planning (O(matching segments))") {
    // round-17 brief #2: the batch face's SupportsPushDownFilters never
    // runs for micro-batch relations, so a filtered streaming consumer
    // paid FULL window planning per trigger. CdcStreamScopeRule now reads
    // the consumer's Filter from each trigger's optimized plan and the
    // stager plans readChangesScoped's slice.
    import graft.sink.Manifest
    wh.create("c9", schema)
    // 24 disjoint-range segments of history
    (0 until 24).foreach { i =>
      wh.append("c9", frame(((i * 100) until (i * 100 + 5)).map(k =>
        k.toLong -> s"v$k"): _*), statsCols = Seq("k"))
    }
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.table(s"$cat.`c9$$changes`")
      .filter(col("k") >= 100L && col("k") < 200L) // segment 1's range
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.collect().foreach(r => got.add(r.getLong(0)))
        ()
      }
      .option("checkpointLocation", tmpDir("ckpt-c9")).start()
    try {
      // catch-up window (pre-history sentinel): delivers exactly the slice
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == (100L until 105L).toSet,
        s"scoped catch-up must deliver the predicate's slice: ${got.asScala.toSet}")
      // steady state: new commits — one inside the consumer's range, one
      // far away — plan their windows SCOPED: O(matching segments) parsed
      got.clear()
      val c0 = Manifest.prunedSegConsults.get()
      val s0 = Manifest.prunedSegSkips.get()
      wh.append("c9", frame(150L -> "in"), statsCols = Seq("k"))
      q.processAllAvailable()
      wh.append("c9", frame(9000L -> "out"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet == Set(150L),
        s"scoped windows must deliver matching rows only: ${got.asScala.toSet}")
      val consulted = Manifest.prunedSegConsults.get() - c0
      val skipped = Manifest.prunedSegSkips.get() - s0
      // two windows × two manifest loads each, each parsing O(1) of 25+
      // segments — unscoped planning would consult every segment
      assert(consulted <= 10,
        s"scoped triggers must parse O(matching) segments, parsed $consulted")
      assert(skipped >= 40, s"expected most segments skipped, got $skipped")
      // the staged window dirs are predicate-fingerprinted (never shared
      // with an unscoped consumer of the same window)
      val cdc = java.nio.file.Paths.get(root, "c9", "_cdc")
      val scoped = java.nio.file.Files.list(cdc).iterator().asScala
        .count(_.getFileName.toString.matches("w\\d+_\\d+-.*-p[0-9a-f]{8}"))
      assert(scoped >= 2, s"scoped windows must stage under -p dirs: $scoped")
    } finally q.stop()

    // an UNSCOPED consumer of the same feed still sees everything (its
    // windows stage separately from the scoped ones)
    val all = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q2 = spark.readStream.table(s"$cat.`c9$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        df.collect().foreach(r => all.add(r.getLong(0)))
        ()
      }
      .option("checkpointLocation", tmpDir("ckpt-c9u")).start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      assert(all.asScala.toSet.size == 24 * 5 + 2,
        s"unscoped consumer must see the full history: ${all.asScala.size}")
    } finally q2.stop()
  }

  test("$changes update-images: load-time identifier columns resolve across a rename by field id") {
    wh.create("u3", schema) // (k, v)
    wh.append("u3", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    wh.morMerge("u3", frame(2L -> "B"), Seq("k"))
    val preRename = wh.currentVersion("u3")
    wh.renameColumn("u3", "k", "kid")
    // the consumer names the key by its LOAD-TIME name `kid`; the window
    // ends BEFORE the rename, where the field was still `k` — pairing must
    // translate by field id, not crash on an unresolvable name
    val got = spark.read.option("update-images", "true")
      .option("identifier-columns", "kid")
      .option("from-version", 1).option("to-version", preRename.toString)
      .table(s"$cat.`u3$$changes`")
      .select("kid", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((2L, "b", "-U"), (2L, "B", "+U")), got.toString)
    // an identifier column that did not exist at the window end refuses
    // with the fix spelled out
    wh.addColumns("u3", Seq(StructField("extra", StringType)))
    val ex = intercept[Exception] {
      spark.read.option("update-images", "true")
        .option("identifier-columns", "extra")
        .option("from-version", 1).option("to-version", preRename.toString)
        .table(s"$cat.`u3$$changes`").collect()
    }
    val msg = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(msg.contains("does not exist at the window-end schema"), msg)
  }

  test("$changes schema evolution: pre-rename windows carry values by FIELD ID; added/readded columns null-fill") {
    wh.create("e1", schema) // (k, v)
    wh.append("e1", frame(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    val preEvo = wh.currentVersion("e1")
    wh.renameColumn("e1", "v", "v2")
    wh.addColumns("e1", Seq(StructField("w", StringType)))
    // a post-evolution consumer reading the PRE-evolution window: the
    // renamed column is the same field id relabeled — values CARRY under
    // the new name (a by-name conform would silently null them); the added
    // column null-fills (those rows predate it)
    val win = spark.read.option("to-version", preEvo.toString)
      .table(s"$cat.`e1$$changes`")
      .select("k", "v2", "w", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)), r.getString(3))).toSet
    assert(win == Set((1L, "a", None, "+I"), (2L, "b", None, "+I")), win.toString)
    // drop-then-readd under the SAME NAME is a DIFFERENT field id: the old
    // column's values must never resurface under the reused name
    wh.dropColumn("e1", "v2")
    wh.addColumns("e1", Seq(StructField("v2", StringType)))
    val reused = spark.read.option("to-version", preEvo.toString)
      .table(s"$cat.`e1$$changes`")
      .select("k", "v2").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(reused == Set((1L, None), (2L, None)),
      s"a reused column NAME must not inherit the dropped field's values: $reused")
  }

  test("$changes timestamp bounds: batch windows and stream starts resolve against commit times") {
    wh.create("t1", schema)
    wh.append("t1", frame(1L -> "a"), statsCols = Seq("k"))
    Thread.sleep(10)
    wh.append("t1", frame(2L -> "b"), statsCols = Seq("k"))
    Thread.sleep(10)
    wh.append("t1", frame(3L -> "c"), statsCols = Seq("k"))
    val ct2 = wh.commitTimeMillis("t1", 2)
    // batch: from-timestamp = commit 2's exact instant delivers commits 2..head
    val fromTs = cdcRows(spark.read.option("from-timestamp-ms", ct2.toString)
      .table(s"$cat.`t1$$changes`")).toSet
    assert(fromTs == Set((2L, "b", "+I"), (3L, "c", "+I")), fromTs.toString)
    // to-timestamp bounds the other end: exactly commit 2's window
    val win = cdcRows(spark.read.option("from-timestamp-ms", ct2.toString)
      .option("to-timestamp-ms", ct2.toString)
      .table(s"$cat.`t1$$changes`")).toSet
    assert(win == Set((2L, "b", "+I")), win.toString)
    // a from-timestamp later than every commit is an empty window
    assert(cdcRows(spark.read
      .option("from-timestamp-ms", (wh.commitTimeMillis("t1", 3) + 60000).toString)
      .table(s"$cat.`t1$$changes`")).isEmpty)
    // version+timestamp forms of the same bound refuse together
    val ex = intercept[Exception] {
      spark.read.option("from-version", "1").option("from-timestamp-ms", "0")
        .table(s"$cat.`t1$$changes`").collect()
    }
    assert(Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString.contains("mutually exclusive"))

    // stream: start at commit 3's instant → only commit 3 and later deliver
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    val q = spark.readStream
      .option("stream-start-timestamp-ms", wh.commitTimeMillis("t1", 3).toString)
      .table(s"$cat.`t1$$changes`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        cdcRows(df.toDF()).foreach(got.add)
      }
      .option("checkpointLocation", tmpDir("ckpt-t1")).start()
    import scala.jdk.CollectionConverters._
    try {
      q.processAllAvailable()
      assert(got.asScala.toSet == Set((3L, "c", "+I")), got.toString)
      wh.append("t1", frame(4L -> "d"), statsCols = Seq("k"))
      q.processAllAvailable()
      assert(got.asScala.toSet.contains((4L, "d", "+I")))
    } finally q.stop()
  }

  test("$changes_by_commit: rows carry _commit_version/_commit_timestamp; multi-commit windows attribute per commit") {
    wh.create("b1", schema)
    wh.append("b1", frame(1L -> "a"), statsCols = Seq("k"))
    wh.morMerge("b1", frame(1L -> "A", 2L -> "b"), Seq("k"))
    wh.equalityDelete("b1", frame(2L -> "x").select("k"))
    val head = wh.currentVersion("b1")
    def attributed(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String, Long)] =
      df.select("k", "v", "_change_type", "_commit_version").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    // ONE batch spanning the whole history still attributes per commit —
    // including the cancellation pairs a net window would fold away
    val got = attributed(spark.read.table(s"$cat.`b1$$changes_by_commit`"))
    assert(got == Set(
      (1L, "a", "+I", 1L),
      (1L, "a", "-D", 2L), (1L, "A", "+I", 2L), (2L, "b", "+I", 2L),
      (2L, "b", "-D", 3L)), got.toString)
    // commit timestamps are the ledger's own commit times
    val ts = spark.read.table(s"$cat.`b1$$changes_by_commit`")
      .select("_commit_version", "_commit_timestamp").distinct().collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    (1L to head).foreach(v =>
      assert(!ts.contains(v) || ts(v) == wh.commitTimeMillis("b1", v),
        s"v=$v: ${ts.get(v)} vs ${wh.commitTimeMillis("b1", v)}"))
    // update-images composes: the upsert commit pairs as -U/+U, attributed
    val imaged = attributed(spark.read.option("update-images", "true")
      .table(s"$cat.`b1$$changes_by_commit`"))
    assert(imaged.contains((1L, "a", "-U", 2L)) && imaged.contains((1L, "A", "+U", 2L)),
      imaged.toString)
    // streaming face serves the same schema
    val sgot = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String, Long)]()
    val q = spark.readStream.table(s"$cat.`b1$$changes_by_commit`")
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Row], _: Long) =>
        attributed(df.toDF()).foreach(sgot.add)
      }
      .option("checkpointLocation", tmpDir("ckpt-b1")).start()
    import scala.jdk.CollectionConverters._
    try {
      q.processAllAvailable()
      assert(sgot.asScala.toSet == got, sgot.toString)
    } finally q.stop()
    // expired attribution refuses with the fix spelled out
    wh.append("b1", frame(9L -> "z"), statsCols = Seq("k"))
    wh.expireSnapshots("b1", keepLast = 2, orphanGraceMs = 0L)
    val ex = intercept[Exception] {
      spark.read.table(s"$cat.`b1$$changes_by_commit`").collect()
    }
    val msg = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(msg.contains("cannot be ATTRIBUTED"), msg)
  }

  test("$changes_by_commit: a 50-commit manual window stages per commit — no union-chain plan") {
    wh.create("b2", schema)
    (1 to 50).foreach(i => wh.append("b2", frame(i.toLong -> s"v$i"), statsCols = Seq("k")))
    // one batch read over the WHOLE history: staged as one write job per
    // commit into the window dir (the reduce(unionByName) form built a
    // 50-deep plan whose analysis cost grew quadratically with the range)
    val rows = spark.read.table(s"$cat.`b2$$changes_by_commit`")
      .select("k", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 50)
    // every commit attributed exactly its own append
    assert(rows.toSet == (1 to 50).map(i => (i.toLong, "+I", i.toLong)).toSet)
  }

  test("guards: time-travel snapshots cannot stream; pending MOR deletes fail at scan build") {
    wh.create("s5", schema)
    wh.append("s5", frame(1L -> "a"), statsCols = Seq("k"))
    wh.morMerge("s5", frame(1L -> "A"), Seq("k"))
    val q = spark.readStream.table(s"$cat.s5")
      .writeStream.outputMode("append").format("memory").queryName("s5_m")
      .option("checkpointLocation", tmpDir("ckpt-s5")).start()
    try {
      val ex = intercept[StreamingQueryException] { q.processAllAvailable() }
      val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString("\n")
      assert(msgs.contains("pending equality-delete") || msgs.contains("append-only"), msgs)
    } finally q.stop()
  }
}
