package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.EventStream
import graft.streaming.EventStream.{Event, Session}

/** Structured Streaming semantics driven synchronously with MemoryStream:
  * watermarked tumbling windows finalize exactly once; sessionization state
  * closes sessions on gap; batch/stream duality of the q41/q42 logic.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  test("hourly windowed aggregation with watermark finalizes closed windows") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.hourlyKpis(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("hourly_out").start()
    try {
      input.addData(
        Event(1, ts(5), 1, "click", 1.0),
        Event(2, ts(20), 1, "click", 2.0),
        Event(3, ts(61), 2, "view", 5.0))   // second hour opens
      q.processAllAvailable()
      // advance watermark far past hour 1 so its window finalizes
      input.addData(Event(4, ts(200), 2, "view", 1.0))
      q.processAllAvailable()
      val out = spark.table("hourly_out").as[(Timestamp, String, Long, Double)].collect()
      val hour1 = out.find(_._2 == "click")
      assert(hour1.exists(r => r._3 == 2 && r._4 == 3.0))
    } finally q.stop()
  }

  test("stream-static decontamination flags only docs overlapping the benchmark grams") {
    implicit val sc = spark.sqlContext
    import graft.functions.TextFns.{shingles, tokens}
    import org.apache.spark.sql.functions.{array_distinct, col, explode}
    // static benchmark side: the grams of one eval document
    val evalGrams = Seq("the quick brown fox jumps").toDF("text")
      .select(explode(array_distinct(shingles(tokens(col("text")), 3))).as("g"))
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = EventStream.decontaminateStream(docs, evalGrams, w = 3)
      .writeStream.outputMode("update").format("memory")
      .queryName("decon_out").start()
    try {
      input.addData(
        (1L, "totally unrelated text about warehouses and manifests"),
        (2L, "he saw the quick brown fox jumps over things"), // shares 3-grams
        (3L, "quick brown dog sleeps all day"))
      q.processAllAvailable()
      val out = spark.table("decon_out").as[(Long, Long)].collect().toMap
      assert(out.keySet == Set(2L), s"only doc 2 overlaps; got $out")
      assert(out(2L) >= 1L)
    } finally q.stop()
  }

  test("decontaminateStream micro-batch plan: eval grams broadcast, no HOF re-run in a Filter") {
    implicit val sc = spark.sqlContext
    import graft.functions.TextFns.{shingles, tokens}
    import org.apache.spark.sql.functions.{array_distinct, col, explode}
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    val evalGrams = Seq("the quick brown fox jumps").toDF("text")
      .select(explode(array_distinct(shingles(tokens(col("text")), 3))).as("g"))
    val input = MemoryStream[(Long, String)]
    val q = EventStream.decontaminateStream(input.toDF().toDF("doc_id", "text"), evalGrams, w = 3)
      .writeStream.outputMode("update").format("memory")
      .queryName("decon_plan_out").start()
    try {
      input.addData((2L, "he saw the quick brown fox jumps over things"))
      q.processAllAvailable()
      // the executed micro-batch plan, via the classic-session wrapper
      val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      val s = plan.toString
      assert(s.contains("BroadcastHashJoin"),
        s"eval gram side must broadcast (stateless per-batch join):\n${s.take(2000)}")
      // the pre-tokenize shape: no optimizer-cloned shingle lambda may run
      // inside a Filter (the q72 regression class, streaming edition)
      val hofFilters = plan.collect {
        case f: FilterExec if f.condition.collectFirst { case h: HigherOrderFunction => h }.nonEmpty => f
      }
      assert(hofFilters.isEmpty,
        s"HOF-bearing Filter in the micro-batch plan: ${hofFilters.map(_.condition.sql).mkString("; ")}")
    } finally q.stop()
  }

  test("sessionize closes a session after the inactivity gap") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    // session 1: minutes 0..10; then 40-min silence; session 2 at minute 50
    input.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "click", 2.0),
      Event(3, ts(50), 7, "click", 4.0))
    // NoTimeout + AvailableNow: drain the input then stop — a
    // ProcessingTimeTimeout query keeps re-firing timeout batches and a test
    // can never drain it.
    val q = EventStream.sessionize(input.toDS(), gapMinutes = 30,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(60000), "stream did not drain in 60s")
      val out = spark.table("sessions_out").as[Session].collect()
      // first session must have closed with 2 events and value 3.0
      assert(out.exists(s => s.user_id == 7 && s.n_events == 2 && s.total_value == 3.0))
    } finally q.stop()
  }

  test("batch/stream duality: hourlyKpis runs unchanged on a batch frame") {
    val batch = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0)).toDF()
    val out = EventStream.hourlyKpis(batch).collect()
    assert(out.length == 1 && out.head.getLong(2) == 2)
  }

  test("stream-stream interval join: purchases pick up same-user clicks in window") {
    implicit val sc = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    clicks.addData(
      Event(10, ts(0), 1, "click", 0.0),
      Event(11, ts(30), 1, "click", 0.0),
      Event(12, ts(5), 2, "click", 0.0))
    purchases.addData(
      Event(20, ts(40), 1, "purchase", 9.0), // joins clicks 10 and 11 (user 1)
      Event(21, ts(90), 2, "purchase", 5.0)) // click 12 is 85min earlier: outside window
    val q = EventStream.clickToPurchase(clicks.toDF(), purchases.toDF(), windowMinutes = 60)
      .writeStream.outputMode("append").format("memory")
      .queryName("attr_out").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(60000), "stream did not drain in 60s")
      val out = spark.table("attr_out")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set((20L, 10L), (20L, 11L)), s"got $out")
    } finally q.stop()
  }

  test("dedupStream drops duplicate event_ids within the watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(1, ts(1), 1, "click", 1.0),  // duplicate id, later arrival
      Event(2, ts(2), 1, "view", 2.0),
      Event(2, ts(2), 1, "view", 2.0))   // exact duplicate
    val q = EventStream.dedupStream(input.toDF())
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").trigger(Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(60000), "stream did not drain in 60s")
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == Seq(1L, 2L), s"got $ids")
    } finally q.stop()
  }

  test("incrementalLoad is exactly-once per FILE, surviving checkpoint loss") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import graft.model.{ResourceDef, WriteMode}
    import graft.sink.Warehouse

    val watch = tmpDir("watch")
    val wh = new Warehouse(spark, tmpDir("whroot"))
    val res = ResourceDef("evdrops", WriteMode.Append)
    val schema = StructType(Seq(StructField("x", LongType)))

    def drain(checkpoint: String): Unit = {
      val q = EventStream.incrementalLoad(spark, watch, schema, wh, res,
        checkpointDir = Some(checkpoint)).trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(60000), "stream did not drain in 60s")
      finally q.stop()
    }

    spark.range(5).select(col("id").as("x")).write.mode("append").parquet(watch)
    val cp1 = tmpDir("cp1")
    drain(cp1)
    assert(wh.load("evdrops").count() == 5)

    // THE hard case: checkpoint lost AND a new file arrived. The rebuilt
    // checkpoint bundles old+new files into one batch 0 — a batch-id guard
    // would either double-load the old file or silently drop the new one;
    // the file ledger must skip exactly the replayed file.
    spark.range(5).select((col("id") + 100).as("x")).write.mode("append").parquet(watch)
    drain(tmpDir("cp2"))
    val after = wh.load("evdrops").orderBy("x").collect().map(_.getLong(0)).toSeq
    assert(after == ((0L until 5L) ++ (100L until 105L)),
      s"lost-checkpoint replay mishandled: $after")

    // Pure replay with yet another fresh checkpoint: no change.
    drain(tmpDir("cp3"))
    assert(wh.load("evdrops").count() == 10, "replayed files double-applied")

    // Continuing on a retained checkpoint still ingests new drops.
    spark.range(5).select((col("id") + 200).as("x")).write.mode("append").parquet(watch)
    drain(cp1)
    assert(wh.load("evdrops").count() == 15)
  }

  test("funnelStages: strict ordering, one advance per stage, no stage skipping") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.funnelStages(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_out").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 0), // click before any view: ignored
        Event(2, ts(1), 1, "view", 0), // stage 1
        Event(3, ts(1), 2, "purchase", 0), // user 2 never views: ignored
        Event(4, ts(2), 1, "view", 0)) // second view: ignored
      q.processAllAvailable()
      input.addData(
        Event(5, ts(3), 1, "click", 0), // stage 2 (after t1)
        Event(6, ts(3), 1, "purchase", 0), // same ts as click: NOT strictly after
        Event(7, ts(9), 1, "purchase", 0)) // stage 3
      q.processAllAvailable()
      val out = spark.table("funnel_out")
        .as[EventStream.StageAdvance].collect().sortBy(a => (a.user_id, a.stage))
      assert(out.map(a => (a.user_id, a.stage)).toSeq ==
        Seq((1L, 1), (1L, 2), (1L, 3)), s"got ${out.toSeq}")
      assert(out.map(_.ts).toSeq == Seq(ts(1), ts(3), ts(9)))
    } finally q.stop()
  }

  test("funnelStages advance counts == batch q87 stage counts on the fixture") {
    implicit val sc = spark.sqlContext
    val fixture = graft.schema.SchemaOps
      .normalizeNanos(spark.read.parquet(s"$sf/events.parquet"), Seq("ts"))
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event]
    val q = EventStream.funnelStages(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_fixture").start()
    try {
      // two chunks: state must carry stages across micro-batches
      val (a, b) = fixture.splitAt(fixture.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      val streamed = spark.table("funnel_fixture")
        .groupBy("stage").count().as[(Int, Long)].collect().toMap
      val batch = SparkEntry.queries("q87_funnel")(spark, sf)
        .select("stage", "n_users").as[(Int, Long)].collect().toMap
      assert(streamed == batch,
        s"stream advances $streamed != batch funnel $batch")
    } finally q.stop()
  }

  test("heavyHitters: exact counts when shards never evict, across micro-batches") {
    implicit val sc = spark.sqlContext
    val fixture = graft.schema.SchemaOps
      .normalizeNanos(spark.read.parquet(s"$sf/events.parquet"), Seq("ts"))
      .selectExpr("event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event]
    // capacity >= users per shard: eviction never fires => counts exact
    val q = EventStream.heavyHitters(input.toDS(), k = 1000, capacity = 10000, nShards = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("hh_exact").start()
    try {
      val (a, b) = fixture.splitAt(fixture.length / 2)
      input.addData(a.toSeq); q.processAllAvailable()
      input.addData(b.toSeq); q.processAllAvailable()
      val rows = spark.table("hh_exact").as[EventStream.HeavyHitter].collect()
      // current summary = rows at each shard's max n_seen (monotone marker)
      val latest = rows.groupBy(_.shard).values.flatMap { sh =>
        val last = sh.map(_.n_seen).max; sh.filter(_.n_seen == last)
      }
      val streamed = latest.map(h => h.user_id -> h.count).toMap
      val exact = fixture.groupBy(_.user_id).view.mapValues(_.length.toLong).toMap
      assert(latest.forall(_.err == 0L), "no eviction => zero overestimate")
      assert(streamed == exact, "un-evicted space-saving counts must be exact")
    } finally q.stop()
  }

  test("heavyHitters: under eviction the true heavy hitter survives within its error bound") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    // one shard, capacity 3, a stream where user 1 dominates: 40 of 70 events
    val events = (1 to 40).map(i => Event(i, ts(i), 1L, "click", 0)) ++
      (1 to 30).map(i => Event(100 + i, ts(40 + i), 1L + (i % 10 + 1), "click", 0))
    val q = EventStream.heavyHitters(input.toDS(), k = 3, capacity = 3, nShards = 1)
      .writeStream.outputMode("append").format("memory")
      .queryName("hh_evict").start()
    try {
      input.addData(events); q.processAllAvailable()
      val rows = spark.table("hh_evict").as[EventStream.HeavyHitter].collect()
      val last = rows.map(_.n_seen).max
      val top = rows.filter(r => r.n_seen == last && r.rank == 1).head
      assert(last == 70L)
      assert(top.user_id == 1L, s"dominant user must hold rank 1, got $top")
      assert(top.count >= 40L && top.count - top.err <= 40L,
        s"reported ${top.count} (err ${top.err}) must bracket the true 40")
      assert(top.err <= last / 3, "space-saving bound: err <= n_seen/capacity")
    } finally q.stop()
  }

  test("rateAnomalies: spike flagged once vs EWMA baseline; recursion exact; gap zero-fill") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.rateAnomalies(input.toDS(), alpha = 0.3, zThreshold = 4.0,
        warmup = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("rate_out").start()
    // per-minute counts: 8 alternating baseline minutes, a 100-event spike,
    // a SKIPPED minute (zero-fill), then closers to finalize everything
    val counts = Seq(10, 11, 10, 11, 10, 11, 10, 11, 100)
    var id = 0L
    def minuteEvents(minute: Int, n: Int): Seq[Event] =
      (1 to n).map { _ => id += 1
        Event(id, new Timestamp(1704067200000L + minute * 60000L), 1, "click", 1.0) }
    try {
      // split across micro-batches at a minute boundary: state must carry over
      val evs = counts.zipWithIndex.flatMap { case (n, m) => minuteEvents(m, n) }
      val (b1, b2) = evs.splitAt(counts.take(4).sum)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // minute 9 skipped entirely; minute 10 closes the spike AND the gap
      input.addData(minuteEvents(10, 10)); q.processAllAvailable()
      val rows = spark.table("rate_out").as[EventStream.RateAlert].collect()
        .sortBy(_.minute.getTime)
      // finalized: minutes 0..8 plus the zero-filled minute 9 (minute 10 open)
      assert(rows.length == 10, s"expected 10 finalized minutes, got ${rows.length}")
      assert(rows.map(_.n).toSeq == counts.map(_.toLong) :+ 0L,
        s"per-minute counts wrong: ${rows.map(_.n).toSeq}")
      // the recursion must equal a driver-side fold of the same definition
      var (mean, variance, n) = (0.0, 0.0, 0L)
      val expected = rows.map(_.n).map { cnt =>
        val delta = cnt.toDouble - mean
        val sd = math.sqrt(variance)
        val z = if (n >= 5 && sd > 0) delta / sd else 0.0
        val flag = n >= 5 && math.abs(z) > 4.0
        mean += 0.3 * delta
        variance = 0.7 * (variance + 0.3 * delta * delta)
        n += 1
        (z, flag)
      }
      rows.zip(expected).foreach { case (r, (z, flag)) =>
        assert(r.z == z, s"z mismatch at ${r.minute}: ${r.z} vs $z")
        assert(r.anomalous == flag, s"flag mismatch at ${r.minute}")
      }
      // exactly the spike minute is flagged within warmed-up region; the
      // zero-fill minute follows a baseline already absorbed toward 100, so
      // assert only on what the reference fold says (checked above) plus:
      assert(rows(8).anomalous && rows(8).n == 100, "spike minute must be flagged")
      assert(rows.take(5).forall(!_.anomalous), "warmup minutes must never flag")
    } finally q.stop()
  }
}
