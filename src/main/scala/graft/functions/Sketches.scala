package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental sketch maintenance — approximate-distinct state carried AS A
  * COLUMN across warehouse commits (q44 computes one-shot sketches; this is
  * the form a 100 TB incremental pipeline actually ships): each ingest
  * batch aggregates its own per-day Datasketches HLL sketch of the user
  * set, the warehouse appends those bounded sketch rows (never raw events),
  * and reads merge the sketches per day. Re-counting distinct users over N
  * ingests costs O(days x sketch size) — no rescan of any event batch.
  *
  * Determinism: Datasketches HLL is a deterministic function of the input
  * VALUE SET, and union is order-insensitive, so merged-across-batches ==
  * single-shot over the union (spec-checked exactly, not approximately) and
  * any retry/re-partitioning produces identical estimates.
  */
object Sketches {

  /** Per-day HLL user sketches + exact event counts for ONE ingest batch.
    * Output is bounded (days x sketch bytes) regardless of batch size.
    */
  def dailyUserSketches(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("users_hll"),
        count(lit(1)).as("n_events"))

  /** Merge a frame of per-batch sketch rows (the warehouse table's content)
    * into per-day approximate distinct users + exact event totals.
    */
  def mergeDaily(sketches: DataFrame): DataFrame =
    sketches.groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("users_hll"))).as("approx_users"),
        sum("n_events").as("n_events"))

  /** Roll the per-day table up to one global approximate distinct count —
    * sketches compose across BOTH batches and days (the same union algebra),
    * so corpus-lifetime cardinality is one tiny aggregate over sketch rows.
    */
  def mergeAll(sketches: DataFrame): DataFrame =
    sketches.agg(hll_sketch_estimate(hll_union_agg(col("users_hll"))).as("approx_users"),
      sum("n_events").as("n_events"))

  // ---- KLL quantile state (native KllSketchAgg/KllMergeAgg expressions) --

  import graft.functions.expressions.KllFns

  /** Per-day KLL sketches of `events.value` for ONE ingest batch — the
    * quantile analog of [[dailyUserSketches]]: bounded sketch bytes per day
    * instead of raw values, carriable as a warehouse column.
    */
  def dailyValueSketches(events: DataFrame): DataFrame = {
    KllFns.register(events.sparkSession)
    events.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(KllFns.kllSketch(col("value").cast("double")).as("value_kll"),
        count(lit(1)).as("n_events"))
  }

  /** Merge per-batch sketch rows into per-day percentiles: distinct-batch
    * history folds in one tiny aggregate, no event rescan — the mergeable
    * answer to the measure IncrementalRollup documents as non-additive
    * (exact medians need the raw distribution; KLL bounds the error at
    * ~1.65% rank for k=200 instead).
    */
  def mergeDailyQuantiles(sketches: DataFrame, probs: Seq[Double]): DataFrame = {
    KllFns.register(sketches.sparkSession)
    val merged = sketches.groupBy("day")
      .agg(KllFns.kllMerge(col("value_kll")).as("kll"),
        sum("n_events").as("n_events"))
    val qCols = probs.map(p =>
      KllFns.kllQuantile(col("kll"), p).as(s"p${(p * 100).round}"))
    merged.select(col("day") +: col("n_events") +: qCols: _*)
  }

  // ---- frequent-items state (native FreqSketchAgg/FreqMergeAgg) ----------

  import graft.functions.expressions.FreqFns

  /** Per-day frequent-items sketches of `events.event_type` for ONE ingest
    * batch — mergeable heavy-hitter state (the batch dual of
    * EventStream.heavyHitters' streaming shards).
    */
  def dailyTypeSketches(events: DataFrame): DataFrame = {
    FreqFns.register(events.sparkSession)
    events.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(FreqFns.freqSketch(col("event_type")).as("types_fi"),
        count(lit(1)).as("n_events"))
  }

  /** Merge per-batch sketch rows into per-day top-k items with error
    * bounds — hot keys over N ingests from sketch rows alone.
    */
  def mergeDailyTopTypes(sketches: DataFrame, k: Int): DataFrame = {
    FreqFns.register(sketches.sparkSession)
    sketches.groupBy("day")
      .agg(FreqFns.freqMerge(col("types_fi")).as("fi"),
        sum("n_events").as("n_events"))
      .select(col("day"), col("n_events"),
        FreqFns.freqTopItems(col("fi"), k).as("top_items"))
  }
}
