package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for ADDITIVE rollups — the
  * exact-aggregate sibling of [[graft.functions.Sketches]]'s HLL columns.
  *
  * The scale problem: a 100 TB fact table's dashboard rollup (revenue per
  * day × type, say) cannot be recomputed by rescanning the fact on every
  * ingest. Additive aggregates (count / sum / min / max) decompose over
  * unions, so the rollup is maintainable from batches alone:
  *
  *   - [[partial]] aggregates ONE ingest batch to (keys → partial state) —
  *     output is bounded by the batch's key diversity, never its row count;
  *   - the partial rows are APPENDED to a rollup table (O(batch) commit,
  *     same append-only protocol as every other write — no read-modify-write
  *     race with concurrent maintainers, the manifest CAS serializes them);
  *   - [[read]] folds whatever partial rows exist with each measure's MERGE
  *     function (sum-of-counts, sum-of-sums, min-of-mins, max-of-maxs);
  *   - [[compact]] replaces accumulated partials with their fold, bounding
  *     the table at O(distinct keys) rows between ingests.
  *
  * Correctness invariant (spec-checked): for any split of the fact into
  * batches, and compactions at any points, `read(rollup)` equals the direct
  * aggregate over the whole fact — exactly, because sums run in DECIMAL and
  * the fold tree of exact values is association-free.
  *
  * Not expressible this way: non-decomposable measures (exact distinct,
  * exact median). Those need state columns that grow with the data — HLL
  * sketch columns ([[graft.functions.Sketches]]) are the bounded-error
  * version of distinct; medians need the raw distribution.
  */
object IncrementalRollup {

  /** One rollup measure: how a batch aggregates it ([[partial]]) and how
    * partial rows fold at read/compact time ([[merge]]). Both sides alias
    * to the same `name`, so partial and merged frames share a schema.
    *
    * `signedPartial` is the DELETE-INVERTIBLE form over a row-level change
    * feed (a frame carrying `_change_type`): `-D` rows fold with inverted
    * sign, so an update/delete on the fact subtracts exactly what its
    * insert added. Defined only for count/sum — min/max are not invertible
    * under deletes (None ⇒ [[maintainFromChangeFeed]] refuses).
    */
  sealed trait Measure {
    def name: String
    def partial: Column
    def merge: Column
    def signedPartial: Option[Column] = None
  }

  private def isDelete: Column = col("_change_type") === "-D"

  /** count(*) — merges by summing. */
  final case class CountStar(name: String) extends Measure {
    def partial: Column = count(lit(1)).as(name)
    def merge: Column = sum(col(name)).as(name)
    override def signedPartial: Option[Column] =
      Some(sum(when(isDelete, -1L).otherwise(1L)).as(name))
  }

  /** Exact decimal sum of `expr` (pass a DECIMAL-cast column for double
    * inputs — see `Tables.dec` — so the fold is association-free).
    */
  final case class SumOf(expr: Column, name: String) extends Measure {
    def partial: Column = sum(expr).as(name)
    def merge: Column = sum(col(name)).as(name)
    // negate (unary minus) keeps the operand's exact type — a `* -1` would
    // widen DECIMAL precision and drift the partial schema
    override def signedPartial: Option[Column] =
      Some(sum(when(isDelete, negate(expr)).otherwise(expr)).as(name))
  }

  final case class MinOf(expr: Column, name: String) extends Measure {
    def partial: Column = min(expr).as(name)
    def merge: Column = min(col(name)).as(name)
  }

  final case class MaxOf(expr: Column, name: String) extends Measure {
    def partial: Column = max(expr).as(name)
    def merge: Column = max(col(name)).as(name)
  }

  /** A rollup definition: grouping keys + additive measures. */
  final case class Spec(keys: Seq[String], measures: Seq[Measure]) {
    require(measures.nonEmpty, "rollup needs at least one measure")
    require(measures.map(_.name).distinct.size == measures.size,
      "measure output names must be unique")
  }

  /** Aggregate one ingest batch to its partial rollup rows. */
  def partial(batch: DataFrame, spec: Spec): DataFrame =
    batch.groupBy(spec.keys.map(col): _*)
      .agg(spec.measures.head.partial, spec.measures.tail.map(_.partial): _*)

  /** Fold partial rows into the current rollup values. */
  def merge(partials: DataFrame, spec: Spec): DataFrame =
    partials.groupBy(spec.keys.map(col): _*)
      .agg(spec.measures.head.merge, spec.measures.tail.map(_.merge): _*)

  /** Maintain `table` with one ingest batch: aggregate and append the
    * partial rows. O(batch) work + an O(manifest) commit; the fact table is
    * never read. Returns the committed rollup version.
    *
    * The table is created EXPLICITLY with the partial frame's exact schema:
    * auto-create would push it through the widening lattice
    * ([[graft.schema.SchemaOps.widen]]), which demotes DECIMAL to double —
    * fine for ingested source data, fatal here (the whole invariant rests
    * on association-free DECIMAL folds).
    */
  def maintain(wh: Warehouse, table: String, batch: DataFrame, spec: Spec): Long = {
    val p = partial(batch, spec)
    if (!wh.exists(table))
      wh.create(table, org.apache.spark.sql.types.StructType(
        p.schema.fields.map(_.copy(nullable = true))))
    wh.append(table, p, statsCols = spec.keys)
  }

  /** Current rollup values: fold all partial rows committed so far. The
    * frame scanned is O(batches × keys-per-batch), not O(fact rows).
    */
  def read(wh: Warehouse, table: String, spec: Spec): DataFrame =
    merge(wh.load(table), spec)

  /** Replace accumulated partials with their fold, so the table returns to
    * O(distinct keys) rows. Safe at any point: merged rows are themselves
    * valid partials (the measure algebra is idempotent over folding).
    */
  def compact(wh: Warehouse, table: String, spec: Spec): Long =
    wh.replace(table, read(wh, table, spec), statsCols = spec.keys)

  /** Self-driving maintenance off an APPEND-ONLY fact table's change feed:
    * reads the files committed to `fact` since the last call (the
    * [[Warehouse.readAdded]] feed), folds them in, and records the fact
    * version in the warehouse batch ledger (streamId `rollup:<fact>`) so a
    * crashed/retried call is a no-op — the caller never tracks batches.
    *
    * Append-only is a REQUIREMENT, not a hint: across merge/compact commits
    * the file feed re-reads surviving rows (documented superset) and an
    * additive rollup would double-count them. Returns the fact version now
    * covered.
    */
  def maintainFromFeed(wh: Warehouse, fact: String, table: String, spec: Spec): Long = {
    val sid = s"rollup:$fact"
    val last = wh.lastCommittedBatchId(table, sid) // -1 when never run
    val now = wh.currentVersion(fact)
    if (now > last) {
      // first ever call (-1): a fresh table's FIRST append commits version 0
      // WITH data, so the feed must be the whole snapshot, not a version diff
      val feed = if (last < 0) wh.loadVersion(fact, now)
        else wh.readAdded(fact, last, now)
      maintain(wh, table, feed, spec)
      wh.recordBatchId(table, sid, now)
    }
    now
  }

  /** [[maintainFromFeed]] for facts that MUTATE: folds the exact row-level
    * change feed ([[Warehouse.readChanges]]) with SIGNED partials — `+I`
    * rows add, `-D` rows subtract — so deletes and update retractions on
    * the fact keep the rollup exact where the append-only file feed would
    * silently miss the subtraction. Same ledger (streamId `rollup:<fact>`,
    * same idempotence), and over append-only windows the two forms fold
    * identical values, so a fact can switch to this path mid-life. Every
    * measure must be delete-invertible (count/sum); min/max refuse — a
    * deleted extremum cannot be un-folded without the raw distribution.
    */
  def maintainFromChangeFeed(wh: Warehouse, fact: String, table: String, spec: Spec): Long = {
    val bad = spec.measures.filter(_.signedPartial.isEmpty)
    require(bad.isEmpty,
      s"maintainFromChangeFeed: measure(s) ${bad.map(_.name).mkString(", ")} are not " +
        "delete-invertible (min/max) — recompute or use an append-only fact")
    val sid = s"rollup:$fact"
    val last = wh.lastCommittedBatchId(table, sid)
    val now = wh.currentVersion(fact)
    if (now > last) {
      val feed = if (last < 0)
        wh.loadVersion(fact, now).withColumn("_change_type", lit("+I"))
      else wh.readChanges(fact, last, now)
      val p = feed.groupBy(spec.keys.map(col): _*)
        .agg(spec.measures.head.signedPartial.get,
          spec.measures.tail.map(_.signedPartial.get): _*)
      if (!wh.exists(table))
        wh.create(table, org.apache.spark.sql.types.StructType(
          p.schema.fields.map(_.copy(nullable = true))))
      wh.append(table, p, statsCols = spec.keys)
      wh.recordBatchId(table, sid, now)
    }
    now
  }
}
