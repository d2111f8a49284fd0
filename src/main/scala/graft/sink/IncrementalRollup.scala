package graft.sink

import org.apache.spark.sql.{Column, DataFrame, Row}
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
    * under deletes (None ⇒ [[maintainFromChangeFeed]] maintains them by
    * targeted group rescan instead).
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

  // ---- durable Spec serialization ----------------------------------------
  // A stream-maintained rollup's spec must survive the maintainer process:
  // policy-driven maintenance ([[Warehouse.maintain]]) repairs the pending-
  // extremes side table from the recorded spec, so a SQL-only operator can
  // drain a rollup they did not build. Measure expressions round-trip via
  // their generated SQL (`Column.expr.sql` → `functions.expr`), every
  // variable field base64-wrapped so arbitrary column names and expression
  // text can never corrupt the line format.

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  // Column.toString renders the column node as parseable SQL text in
  // Spark 4 ("CAST(v AS DECIMAL(20,4))"); the classic ExpressionUtils
  // route yields a lazy ColumnNodeExpression whose .sql does not re-parse
  private def sqlOf(c: Column): String = c.toString

  /** One-line-per-field durable encoding of `spec` (see [[specFromString]]). */
  def specToString(spec: Spec): String = {
    val keys = s"keys:${spec.keys.map(b64).mkString(",")}"
    val ms = spec.measures.map {
      case CountStar(n)  => s"m:count:${b64(n)}"
      case SumOf(e, n)   => s"m:sum:${b64(n)}:${b64(sqlOf(e))}"
      case MinOf(e, n)   => s"m:min:${b64(n)}:${b64(sqlOf(e))}"
      case MaxOf(e, n)   => s"m:max:${b64(n)}:${b64(sqlOf(e))}"
    }
    ("v1" +: keys +: ms).mkString("\n")
  }

  /** Inverse of [[specToString]]; throws on an unrecognized encoding. */
  def specFromString(s: String): Spec = {
    val lines = s.linesIterator.toSeq
    require(lines.headOption.contains("v1"), s"unknown rollup-spec encoding: $s")
    val keys = lines.find(_.startsWith("keys:")).map(_.stripPrefix("keys:"))
      .map(ks => if (ks.isEmpty) Nil else ks.split(',').toSeq.map(unb64))
      .getOrElse(Nil)
    val measures = lines.filter(_.startsWith("m:")).map { l =>
      l.split(':').toSeq match {
        case Seq("m", "count", n)   => CountStar(unb64(n))
        case Seq("m", "sum", n, e)  => SumOf(expr(unb64(e)), unb64(n))
        case Seq("m", "min", n, e)  => MinOf(expr(unb64(e)), unb64(n))
        case Seq("m", "max", n, e)  => MaxOf(expr(unb64(e)), unb64(n))
        case other => throw new IllegalArgumentException(
          s"unknown rollup-spec measure line: $l")
      }
    }
    Spec(keys, measures)
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

  /** Affected-group ceiling for the targeted rescan: above it a window
    * switches to the consolidation replace (see [[maintainFromChangeFeed]]).
    */
  private[graft] val MaxRescanGroups = 256

  /** Scan predicates of a bounded affected-group set (all keys NON-NULL):
    * `(groupPred, perCol)` — the exact null-safe group disjunction, and the
    * per-column IN conjunction that pushes into the parquet scan so a
    * key-clustered fact rescans O(affected-group files). Shared by the
    * batch rescan and the streaming drain
    * ([[graft.streaming.ChangeFeedStream.drainPendingExtremes]]).
    */
  private[graft] def groupPredicates(keys: Seq[String],
                                     rows: Seq[Row]): (Column, Column) = {
    val groupPred = rows.map(r =>
      keys.map(k => col(k) <=> lit(r.getAs[Any](k))).reduce(_ && _)).reduce(_ || _)
    val perCol = keys.map(k =>
      col(k).isin(rows.map(_.getAs[Any](k)): _*)).reduce(_ && _)
    (groupPred, perCol)
  }

  /** [[maintainFromFeed]] for facts that MUTATE: folds the exact row-level
    * change feed ([[Warehouse.readChanges]]) with SIGNED partials — `+I`
    * rows add, `-D` rows subtract — so deletes and update retractions on
    * the fact keep the rollup exact where the append-only file feed would
    * silently miss the subtraction. Same ledger (streamId `rollup:<fact>`,
    * same idempotence), and over append-only windows the two forms fold
    * identical values, so a fact can switch to this path mid-life.
    *
    * Count/sum measures fold signed — always O(window). Min/max are NOT
    * delete-invertible (a deleted extremum cannot be un-folded without the
    * raw distribution), so they maintain by TARGETED RESCAN instead of
    * refusing: a window's `-D` rows mark a group AFFECTED only when some
    * deleted value TIES the group's stored extreme (a delete strictly
    * inside the bounds can't move them, and a `-D` value outside them is
    * impossible — the row existed at the covered version). Affected groups
    * are recomputed from the fact's CURRENT snapshot scoped to exactly
    * those groups — per-column IN predicates reach the parquet scan, so a
    * fact clustered by the group key rescans O(affected-group files), never
    * the table — and their rollup history is retracted-and-replaced in the
    * same maintenance (fold history must FORGET the dead extremum: min-of-
    * mins over stale partials would resurrect it). Unaffected groups append
    * one partial row exactly as before, with the window's `+I` rows as
    * min/max candidates. Groups whose rows are all deleted vanish from the
    * rollup, matching the direct aggregate.
    *
    * Above [[MaxRescanGroups]] affected groups (a mass delete), the
    * targeted predicates would dwarf the plan: the maintenance switches to
    * one consolidation REPLACE (unaffected history + window partials +
    * semi-join-scoped recomputes) — O(rollup rows + affected fact scan),
    * still never an unscoped fact rescan.
    */
  def maintainFromChangeFeed(wh: Warehouse, fact: String, table: String, spec: Spec): Long = {
    val sid = s"rollup:$fact"
    val last = wh.lastCommittedBatchId(table, sid)
    val now = wh.currentVersion(fact)
    if (now <= last) return now
    val feed0 = if (last < 0)
      wh.loadVersion(fact, now).withColumn("_change_type", lit("+I"))
    else wh.readChanges(fact, last, now)
    val extremal = spec.measures.filter(_.signedPartial.isEmpty)
    extremal.foreach {
      case _: MinOf | _: MaxOf => ()
      case m => throw new IllegalArgumentException(
        s"maintainFromChangeFeed: measure ${m.name} is neither delete-invertible " +
          "nor an extremal (min/max) — no maintenance strategy exists for it")
    }
    val keys = spec.keys

    def ensureTable(p: DataFrame): Unit =
      if (!wh.exists(table))
        wh.create(table, org.apache.spark.sql.types.StructType(
          p.schema.fields.map(_.copy(nullable = true))))

    if (extremal.isEmpty) {
      // the pure count/sum path — byte-identical to the pre-rescan form
      val p = feed0.groupBy(keys.map(col): _*)
        .agg(spec.measures.head.signedPartial.get,
          spec.measures.tail.map(_.signedPartial.get): _*)
      ensureTable(p)
      wh.append(table, p, statsCols = keys)
      wh.recordBatchId(table, sid, now)
      return now
    }

    // bootstrap (whole snapshot as +I) has no deletes by construction — no
    // checkpoint, no affected groups, one pass
    val bootstrap = last < 0
    val feed = if (bootstrap) feed0
               else feed0.localCheckpoint() // consumers: window partial, -D extremes
    // window partial: signed where invertible, +I-candidates-only for min/max
    def windowPartial(m: Measure): Column = m.signedPartial.getOrElse(m match {
      case MinOf(e, n) => min(when(!isDelete, e)).as(n)
      case MaxOf(e, n) => max(when(!isDelete, e)).as(n)
      case other       => throw new IllegalStateException(other.name) // unreachable
    })
    val part = feed.groupBy(keys.map(col): _*)
      .agg(windowPartial(spec.measures.head), spec.measures.tail.map(windowPartial): _*)
    ensureTable(part)

    // affected groups: a -D value null-safe-ties the stored extreme
    val delRows = if (bootstrap) feed.limit(0).filter(isDelete)
                  else feed.filter(isDelete)
    val exCols = extremal.map {
      case MinOf(e, n) => min(e).as(s"__d_$n")
      case MaxOf(e, n) => max(e).as(s"__d_$n")
      case m           => throw new IllegalStateException(m.name) // unreachable
    }
    val stored = read(wh, table, spec).alias("st")
    val delExt = delRows.groupBy(keys.map(col): _*)
      .agg(exCols.head, exCols.tail: _*).alias("dx")
    val keyCond =
      if (keys.isEmpty) lit(true)
      else keys.map(k => col(s"dx.$k") <=> col(s"st.$k")).reduce(_ && _)
    val tie = extremal.map(m => col(s"__d_${m.name}") <=> col(s"st.${m.name}"))
      .reduce(_ || _)
    val affected = delExt.join(stored, keyCond).filter(tie)
      .select(keys.map(k => col(s"dx.$k")): _*).localCheckpoint()
    val nAffected = affected.count()

    if (nAffected == 0) {
      wh.append(table, part, statsCols = keys)
      wh.recordBatchId(table, sid, now)
      return now
    }

    val factNow = wh.loadVersion(fact, now)
    val plainAgg = (df: DataFrame) => df.groupBy(keys.map(col): _*)
      .agg(spec.measures.head.partial, spec.measures.tail.map(_.partial): _*)
    var rescanRows: Array[Row] = Array.empty
    if (keys.isEmpty) {
      // global rollup: the one group is affected — consolidate by replace
      wh.replace(table, plainAgg(factNow), statsCols = keys)
    } else if (nAffected <= MaxRescanGroups && {
               rescanRows = affected.collect() // bounded by the gate — metadata-scale
               !rescanRows.exists(r => keys.exists(r.getAs[Any](_) == null)) }) {
      val rows = rescanRows
      // per-column IN predicates push into the parquet scan (the real
      // prune); the null-safe group disjunction is the exact residual.
      // Plain col() refs: each filter resolves against its own frame
      val (groupPred, perCol) = groupPredicates(keys, rows.toSeq)
      val recomputed = plainAgg(factNow.filter(perCol && groupPred))
      val unaff = part.filter(!groupPred)
      // retraction of the affected groups' fold history and the landing of
      // the replacement (unaffected window partials + consolidated rows)
      // must be ONE commit: two commits left a crash window in which the
      // retracted history was gone but its replacement absent — replay then
      // found no tie (nAffected == 0) and silently dropped the groups'
      // pre-window history. The staged equality delete applies to
      // pre-transaction rows only ([[Warehouse.transact]] snapshot-at-start
      // semantics), so it cannot touch the same transaction's appended
      // replacement rows. Null group keys never reach this branch (staged
      // equality deletes are plain-equality — a null key tuple would not
      // retract); those windows take the consolidation replace below,
      // which is a single commit by construction.
      wh.transact { tx =>
        tx.equalityDelete(table, affected)
        tx.append(table, unaff.unionByName(recomputed), statsCols = keys)
      }
    } else {
      // mass-delete window: one consolidation replace
      def nullSafe(l: DataFrame, r: DataFrame): Column =
        keys.map(k => l(k) <=> r(k)).reduce(_ && _)
      val recomputed = plainAgg(
        factNow.join(affected, nullSafe(factNow, affected), "left_semi"))
      val hist = wh.load(table)
      val unaffHist = hist.join(affected, nullSafe(hist, affected), "left_anti")
      val unaffPart = part.join(affected, nullSafe(part, affected), "left_anti")
      wh.replace(table, unaffHist.unionByName(unaffPart).unionByName(recomputed),
        statsCols = keys)
    }
    wh.recordBatchId(table, sid, now)
    now
  }
}
