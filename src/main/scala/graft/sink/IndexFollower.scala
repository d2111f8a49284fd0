package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `idxfollow:` ledger discipline shared by the three warehouse-resident
  * index followers ([[SearchIndexIngest]] BM25 postings, [[VectorIndexIngest]]
  * IVF-PQ codes, [[NearDupIngest]] MinHash bands/sigs) — ONE implementation of
  * the rules that keep a mutating corpus and its index convergent at
  * O(changes) per tick. Previously three verbatim copies; a race fix in the
  * advance rule had to land three times, which is exactly the defect class
  * this object removes.
  *
  * The discipline:
  *
  *   - '''advance''' (after an ingest's own corpus append): the index is
  *     synchronous with the corpus THROUGH the ingest's commit, so the
  *     follower may start past it — but ONLY when nothing foreign is
  *     pending. Judged on the corpus head itself, not the pre-capture: a
  *     foreign deleteWhere/morMerge landing DURING the ingest (after the
  *     capture, before this call) must not be fast-forwarded over — the
  *     ledger advances only when the head is EXACTLY `preAppendVersion + 1`
  *     (our append and nothing else) and the ledger already covered the
  *     pre-append head. Anything else stays in the next [[window]];
  *     re-indexing the ingest's own rows there no-ops through each
  *     follower's idempotent anti-joins.
  *   - '''window''' (a followChanges tick): the un-consumed corpus window
  *     as (retraction pks, insertion rows). Bootstrap — a corpus never
  *     ingested through the follower (ledger unset) — treats the WHOLE
  *     current snapshot as insertions; rows deleted before that first call
  *     were never indexed, so there is nothing to retract. A pk column
  *     renamed inside the window refuses loudly with a prescriptive
  *     message (followers pair by pk NAME).
  *   - '''record''' (after the tick's commits): the consumed head, making
  *     crashed/replayed ticks converge — re-deleting deleted pks is a
  *     no-op MOR overlay, re-indexing anti-joins to empty.
  *
  * The ledger rides [[Warehouse.recordBatchId]] on the follower's own index
  * table (`ledgerTable`), NOT the corpus: the corpus must stay writable by
  * parties that know nothing of the index.
  */
private[sink] object IndexFollower {

  private def sid(corpus: String) = s"idxfollow:$corpus"

  /** One un-consumed corpus window. `ins` rows carry the corpus schema
    * (change-type column already dropped); `delPks` is the distinct pk
    * frame of the window's `-D` rows, checkpointed (ticks commit against
    * the tables it was derived from).
    */
  final case class FollowWindow(now: Long, delPks: DataFrame, nDel: Long,
                                ins: DataFrame)

  /** Highest corpus version the follower has consumed (−1 = never). */
  def lastCovered(wh: Warehouse, corpus: String, ledgerTable: String): Long =
    if (wh.exists(ledgerTable)) wh.lastCommittedBatchId(ledgerTable, sid(corpus))
    else -1L

  /** The un-consumed window, or None when the ledger already covers the
    * corpus head (the tick is a no-op).
    */
  def window(wh: Warehouse, corpus: String, ledgerTable: String,
             pkCol: String): Option[FollowWindow] = {
    val last = lastCovered(wh, corpus, ledgerTable)
    val now = wh.currentVersion(corpus)
    if (now <= last) return None
    val changes = (
      if (last < 0) wh.load(corpus).withColumn("_change_type", lit("+I"))
      else wh.readChanges(corpus, last, now)
      ).localCheckpoint()
    require(changes.columns.contains(pkCol),
      s"pk column '$pkCol' absent from $corpus at v$now — renamed in the window? " +
        "index followers pair by pk NAME; rebuild the index (or a new follower) " +
        "under the new name, or use the $changes_lineage face for rename-immune pairing")
    val delPks = changes.filter(col("_change_type") === "-D")
      .select(col(pkCol)).distinct().localCheckpoint()
    val ins = changes.filter(col("_change_type") === "+I").drop("_change_type")
    Some(FollowWindow(now, delPks, delPks.count(), ins))
  }

  /** Record the consumed head after a tick's commits. */
  def record(wh: Warehouse, corpus: String, ledgerTable: String, now: Long): Unit =
    if (wh.exists(ledgerTable)) wh.recordBatchId(ledgerTable, sid(corpus), now)

  /** Advance past an ingest's own corpus append — see the object doc for
    * the head == preAppendVersion + 1 rule and why it is judged on the
    * head, not the pre-capture.
    */
  def advance(wh: Warehouse, corpus: String, ledgerTable: String,
              preAppendVersion: Long): Unit = {
    val ledgerClean = preAppendVersion < 0 ||
      wh.lastCommittedBatchId(ledgerTable, sid(corpus)) >= preAppendVersion
    val head = wh.currentVersion(corpus)
    if (ledgerClean && head == preAppendVersion + 1)
      wh.recordBatchId(ledgerTable, sid(corpus), head)
  }
}
