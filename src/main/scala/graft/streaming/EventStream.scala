package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mutable-session accumulator state for EventStream.sessionize. Top-level
  * (not object-nested): Spark's state-encoder codegen resolves nested case
  * classes' accessors unreliably under Janino.
  */
final case class SessionBuf(startMs: Long, endMs: Long, nEvents: Long, totalValue: Double)

/** Per-user funnel progression state (EventStream.funnelStages): epoch-ms of
  * the first qualifying event per stage, 0 = stage not reached. Top-level
  * for the same encoder reason as SessionBuf.
  */
final case class FunnelBuf(t1: Long, t2: Long, t3: Long)

/** Space-saving summary state for EventStream.heavyHitters: parallel arrays
  * (key, count, overestimate-error) — arrays because Spark's state encoder
  * handles them reliably where nested Maps don't; top-level for the same
  * Janino reason as SessionBuf. nSeen counts every event the shard has
  * absorbed (the error bound's denominator and the test's trigger marker).
  */
final case class HHState(keys: Array[Long], counts: Array[Long],
    errs: Array[Long], nSeen: Long)

/** EWMA rate-monitor state for EventStream.rateAnomalies: the open (not yet
  * finalized) minute bucket plus the exponentially-weighted mean/variance of
  * finalized per-minute counts. Top-level for the same encoder reason as
  * SessionBuf. O(1) per key — the whole monitor's state is 5 scalars no
  * matter how many events flow through.
  */
final case class EwmaState(pendingMs: Long, pendingN: Long,
    mean: Double, variance: Double, n: Long)

/** Structured Streaming duals of the incremental/batch semantics
  * (SURVEY.md §2.9): the reference's micro-batch replication becomes a real
  * stream here — watermarked tumbling-window aggregation (I1/I3 dual) and
  * gap-based sessionization via typed state (the streaming form of
  * EventQueries.q42).
  *
  * These transforms are plan-shape-agnostic: the same function body works on
  * a batch DataFrame or a streaming one, which is how Structured Streaming is
  * meant to be used (declare the plan; the engine handles state/watermarks).
  * Tested with MemoryStream in StreamingSpec — no long-running cluster needed.
  */
object EventStream {

  /** Event row as extracted (matches the events table). */
  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** One closed session per (user, inactivity-gap) — streaming q42 output. */
  final case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Tumbling 1-hour windowed KPIs with a 10-minute watermark: late events
    * beyond the watermark are dropped, each window finalizes once (append
    * mode) — the streaming dual of q41_hourly_windows.
    */
  def hourlyKpis(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Gap-based sessionization with typed per-key state
    * (flatMapGroupsWithState): a session closes after `gapMinutes` of
    * inactivity or on state timeout. Streaming dual of q42_sessions.
    *
    * @param timeout ProcessingTimeTimeout (default) also closes idle sessions
    *                wall-clock; NoTimeout closes only via the event-time gap
    *                (deterministic — what the tests drive, since timeout
    *                batches re-fire continuously and never let a test drain).
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    // setTimeoutDuration is only legal under ProcessingTimeTimeout — an
    // EventTimeTimeout caller would otherwise crash on the first keyed batch
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout

    def fn(userId: Long, batch: Iterator[Event],
        state: GroupState[SessionBuf]): Iterator[Session] = {
      var closed = List.empty[Session]
      var cur = state.getOption
      batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.endMs > gapMs =>
            closed ::= Session(userId, new java.sql.Timestamp(s.startMs),
              new java.sql.Timestamp(s.endMs), s.nEvents, s.totalValue)
            cur = Some(SessionBuf(t, t, 1, e.value))
          case Some(s) =>
            cur = Some(SessionBuf(s.startMs, t, s.nEvents + 1, s.totalValue + e.value))
          case None =>
            cur = Some(SessionBuf(t, t, 1, e.value))
        }
      }
      if (state.hasTimedOut) {
        cur.foreach(s => closed ::= Session(userId, new java.sql.Timestamp(s.startMs),
          new java.sql.Timestamp(s.endMs), s.nEvents, s.totalValue))
        state.remove()
      } else {
        cur.foreach { s =>
          state.update(s)
          if (useTimeout) state.setTimeoutDuration(gapMs)
        }
      }
      closed.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)
  }

  /** A user advancing to funnel `stage` at `ts` (funnelStages output). */
  final case class StageAdvance(user_id: Long, stage: Int, ts: java.sql.Timestamp)

  /** Streaming funnel state machine — the streaming dual of q87: per-user
    * typed state holds the first qualifying timestamp of each stage
    * (view -> click -> purchase, each strictly after the previous stage),
    * and a row is emitted the moment a user ADVANCES a stage — the
    * real-time form of the batch conversion rollup.
    *
    * Under in-order delivery (per-user timestamp order, which the spec
    * drives and a watermarked upstream sort guarantees) the advance counts
    * equal q87's stage counts exactly. State is three longs per user —
    * bounded by the user population, not stream length — and never expires
    * (a funnel is a lifetime property; callers wanting windowed funnels
    * bound it upstream by filtering the time range).
    */
  def funnelStages(events: Dataset[Event]): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, batch: Iterator[Event],
        state: GroupState[FunnelBuf]): Iterator[StageAdvance] = {
      var buf = state.getOption.getOrElse(FunnelBuf(0L, 0L, 0L))
      var out = List.empty[StageAdvance]
      batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val t = e.ts.getTime
        e.event_type match {
          case "view" if buf.t1 == 0L =>
            buf = buf.copy(t1 = t); out ::= StageAdvance(userId, 1, e.ts)
          case "click" if buf.t1 != 0L && buf.t2 == 0L && t > buf.t1 =>
            buf = buf.copy(t2 = t); out ::= StageAdvance(userId, 2, e.ts)
          case "purchase" if buf.t2 != 0L && buf.t3 == 0L && t > buf.t2 =>
            buf = buf.copy(t3 = t); out ::= StageAdvance(userId, 3, e.ts)
          case _ => ()
        }
      }
      state.update(buf)
      out.reverseIterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** One heavy-hitter candidate from a shard's space-saving summary:
    * `count` overestimates the true count by at most `err`; `n_seen` is the
    * shard's lifetime event total (monotone per shard — consumers keep the
    * rows with the max n_seen per shard as the current summary).
    */
  final case class HeavyHitter(shard: Int, user_id: Long, count: Long,
      err: Long, n_seen: Long, rank: Int)

  /** Streaming approximate top-k users by event count — the space-saving
    * sketch (Metwally et al.) in typed keyed state, SHARDED so the operator
    * scales: state is keyed by hash-shard, each shard summarizes only the
    * users that hash to it (a user never splits across shards, so shard
    * summaries are over DISJOINT key sets and the global top-k is a plain
    * fold of shard top-ks — no single-key state bottleneck, no cross-shard
    * double counting). Per shard the classic guarantees hold: at most
    * `capacity` tracked keys, every true count c reported within
    * [c, c + err] with err ≤ n_seen/capacity, and any user with true count
    * > n_seen/capacity is guaranteed present. When a shard sees at most
    * `capacity` distinct users, eviction never fires and counts are EXACT
    * (spec-checked against the batch groupBy).
    *
    * Each trigger re-emits the shard's current top-k (append mode) tagged
    * with the monotone n_seen; batch processing order is pinned to
    * (ts, event_id) and eviction ties break on the smallest key, so output
    * is deterministic for a given stream content.
    */
  def heavyHitters(events: Dataset[Event], k: Int = 10, capacity: Int = 64,
      nShards: Int = 16): Dataset[HeavyHitter] = {
    import events.sparkSession.implicits._

    def fn(shard: Int, batch: Iterator[Event],
        state: GroupState[HHState]): Iterator[HeavyHitter] = {
      val prev = state.getOption.getOrElse(HHState(Array.empty, Array.empty, Array.empty, 0L))
      val counts = scala.collection.mutable.LongMap.empty[(Long, Long)] // key -> (count, err)
      prev.keys.indices.foreach(i => counts(prev.keys(i)) = (prev.counts(i), prev.errs(i)))
      var seen = prev.nSeen
      batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        seen += 1
        counts.get(e.user_id) match {
          case Some((c, err)) => counts(e.user_id) = (c + 1, err)
          case None if counts.size < capacity => counts(e.user_id) = (1L, 0L)
          case None =>
            // evict the min-count entry (smallest key on ties): the new key
            // inherits count+1 with the evicted count as its overestimate
            val (minK, (minC, _)) = counts.minBy { case (key, (c, _)) => (c, key) }
            counts.remove(minK)
            counts(e.user_id) = (minC + 1, minC)
        }
      }
      val entries = counts.toArray.sortBy { case (key, (c, _)) => (-c, key) }
      state.update(HHState(entries.map(_._1), entries.map(_._2._1), entries.map(_._2._2), seen))
      entries.take(k).zipWithIndex.iterator.map { case ((key, (c, err)), i) =>
        HeavyHitter(shard, key, c, err, seen, i + 1)
      }
    }

    events.groupByKey(e => (math.floorMod(e.user_id.hashCode, nShards)))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** One finalized minute of the per-type rate monitor: the minute's event
    * count, the EWMA mean/sd the minute was judged AGAINST (pre-update —
    * an anomaly is a deviation from history, so the spike must not first
    * inflate the baseline it is compared to), its z-score, and the verdict.
    */
  final case class RateAlert(event_type: String, minute: java.sql.Timestamp,
      n: Long, ewma_mean: Double, z: Double, anomalous: Boolean)

  /** Streaming rate-anomaly detection: per event-type EWMA mean/variance of
    * per-minute event counts, flagging minutes whose count deviates more
    * than `zThreshold` standard deviations from the running baseline — the
    * pipeline-health monitor an ingest stream runs beside itself.
    *
    * Semantics:
    *   - a minute finalizes when a LATER minute's first event arrives for
    *     that key (counts are never judged half-full mid-minute);
    *   - empty minutes between two observed ones finalize as zero-count
    *     observations (a silent source IS an anomaly — rate monitors that
    *     only see arriving data can't detect absence), bounded by
    *     `maxGapFill` so one event after a year of silence can't spin the
    *     state loop;
    *   - the first `warmup` finalized minutes train the baseline and are
    *     never flagged (n < warmup ⇒ z reported as 0);
    *   - EWMA recursion (West 1979 exponential form): δ = x − μ;
    *     μ' = μ + αδ; σ²' = (1−α)(σ² + αδ²) — judged with the PRE-update
    *     μ/σ, then updated, so a genuine spike is flagged once and then
    *     absorbed at rate α rather than poisoning every later minute;
    *   - events for minutes at or before the last finalized one are dropped
    *     (the watermark analog; state stays O(1) per key: 5 scalars).
    *
    * At scale: state is O(event types), not O(events) — the shape that
    * survives an unbounded stream. Batch order inside a micro-batch is
    * canonicalized by (ts, event_id) sort, so results are deterministic
    * under any partitioning of the input into micro-batches that preserves
    * minute boundaries.
    */
  def rateAnomalies(events: Dataset[Event], alpha: Double = 0.3,
      zThreshold: Double = 4.0, warmup: Int = 5,
      maxGapFill: Int = 1440): Dataset[RateAlert] = {
    import events.sparkSession.implicits._
    val minuteMs = 60000L

    def fn(key: String, batch: Iterator[Event],
        state: GroupState[EwmaState]): Iterator[RateAlert] = {
      var st = state.getOption.getOrElse(EwmaState(Long.MinValue, 0L, 0.0, 0.0, 0L))
      val out = scala.collection.mutable.ArrayBuffer.empty[RateAlert]

      def finalizeMinute(ms: Long, cnt: Long): Unit = {
        val delta = cnt.toDouble - st.mean
        val sd = math.sqrt(st.variance)
        val z = if (st.n >= warmup && sd > 0) delta / sd else 0.0
        out += RateAlert(key, new java.sql.Timestamp(ms), cnt, st.mean, z,
          st.n >= warmup && math.abs(z) > zThreshold)
        st = st.copy(mean = st.mean + alpha * delta,
          variance = (1 - alpha) * (st.variance + alpha * delta * delta),
          n = st.n + 1)
      }

      batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val m = Math.floorDiv(e.ts.getTime, minuteMs) * minuteMs
        if (st.pendingMs == Long.MinValue) st = st.copy(pendingMs = m, pendingN = 1L)
        else if (m == st.pendingMs) st = st.copy(pendingN = st.pendingN + 1)
        else if (m > st.pendingMs) {
          finalizeMinute(st.pendingMs, st.pendingN)
          var g = st.pendingMs + minuteMs
          var filled = 0
          while (g < m && filled < maxGapFill) {
            finalizeMinute(g, 0L); g += minuteMs; filled += 1
          }
          st = st.copy(pendingMs = m, pendingN = 1L)
        } // m < pendingMs: late beyond the open bucket — dropped
      }
      state.update(st)
      out.iterator
    }

    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Stream-stream interval join — the streaming dual of the batch as-of
    * join (q45): each purchase joins the clicks of the SAME user within the
    * preceding `windowMinutes`. Watermarks on both sides bound the join
    * state (clicks older than the window + watermark are evicted), which is
    * what makes an unbounded two-stream join feasible at all: state is
    * O(users active in the window), not O(stream history).
    */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 60): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    p.join(c,
      col("user_id") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** Streaming exact dedup — the streaming member of the dedup family
    * (batch dual: q54): duplicate `event_id`s arriving within the watermark
    * window are dropped with bounded state (per-key state expires once the
    * watermark passes, so a 100 TB/day stream holds only the window's keys,
    * not all history).
    */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming decontamination — the streaming dual of q72 and the third
    * join mode of the surface (stream-STATIC, after q45's batch as-of and
    * clickToPurchase's stream-stream): incoming documents are checked
    * in-flight against a static benchmark n-gram set, the admission filter
    * an ingest pipeline runs BEFORE contaminated text ever reaches training
    * storage. The static side is a gram table (`g` column, pre-hashed like
    * TextFns.shingles output) — tiny next to the stream, so it broadcasts;
    * the join itself is stateless (each micro-batch joins independently),
    * and only the per-doc overlap count keeps state (update mode). Works
    * unchanged on a batch frame (plan-shape-agnostic, like hourlyKpis).
    */
  def decontaminateStream(docs: DataFrame, evalGrams: DataFrame, w: Int = 8): DataFrame = {
    import graft.functions.TextFns.{shingles, tokens}
    // Pre-tokenize into a column (q72/q57 pattern): inlining tokens() into
    // the shingle lambda re-runs the split/regex per try_element_at.
    docs.withColumn("tk", tokens(col("text")))
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("tk"), w))).as("g"))
      .join(broadcast(evalGrams.select(col("g"))), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** File-source incremental ingestion: watch a directory of parquet drops
    * and merge each micro-batch into the warehouse via foreachBatch — the
    * streaming form of the reference's whole pipeline (extract loop +
    * merge disposition per batch).
    *
    * Restart-safe at FILE granularity: a default checkpointLocation (under
    * the watch dir — underscore-prefixed, so the file source's hidden-path
    * filter never ingests it) makes source offsets durable, and a
    * warehouse-side loaded-files ledger filters every micro-batch down to
    * rows from not-yet-loaded files. Unlike a batch-id high-watermark, this
    * stays exactly-once across a LOST/REBUILT checkpoint: the new
    * checkpoint renumbers batches from 0 and bundles old+new files into one
    * batch, but the ledger keeps the replayed files out while admitting the
    * new ones. The guard applies to every disposition — Append obviously
    * double-loads on replay, and merge is not idempotent either (null-PK
    * rows append-but-never-match by contract; a batch missing the PK
    * columns falls back to plain append).
    */
  def incrementalLoad(spark: SparkSession, watchDir: String,
      schema: org.apache.spark.sql.types.StructType,
      wh: graft.sink.Warehouse, res: graft.model.ResourceDef,
      checkpointDir: Option[String] = None, streamId: String = "incremental") = {
    spark.readStream.schema(schema).parquet(watchDir)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        checkpointDir.getOrElse(s"${watchDir.stripSuffix("/")}/_checkpoint_$streamId"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seen = wh.loadedFiles(res.name, streamId)
        // a micro-batch's file list is bounded (maxFilesPerTrigger), so the
        // distinct-collect is driver-side metadata, not data
        val batchFiles = batch.select(input_file_name().as("f"))
          .distinct().collect().map(_.getString(0))
        val fresh = batchFiles.filterNot(seen)
        if (fresh.nonEmpty) {
          val sub =
            if (fresh.length == batchFiles.length) batch
            else batch.filter(input_file_name().isin(fresh.toSeq: _*))
          wh.write(res, sub)
          wh.recordFiles(res.name, streamId, fresh.toSeq)
        }
        ()
      }
  }
}
