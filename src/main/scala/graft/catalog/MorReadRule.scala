package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sink.Warehouse

/** SQL-face reads of tables with PENDING merge-on-read deletes
  * ([[Warehouse.equalityDelete]]): a graft relation whose snapshot manifest
  * carries equality-delete files cannot be served by the plain file scan —
  * the deletes live beside the data, not in it. This resolution rule
  * replaces such a relation with the engine's MOR frame
  * ([[Warehouse.morFrame]]): the seq-aware grouped scan anti-joined against
  * the delete-key files, projected back onto the relation's own attribute
  * ids so the surrounding plan never notices the substitution.
  *
  * Write plans are left alone on the TARGET side: only the query side of a
  * `V2WriteCommand` (and the source side of `MERGE INTO`) is rewritten —
  * the write target must stay a relation for the write builders, and the
  * warehouse write path materializes pending deletes itself before any file
  * rewrite. Once [[Warehouse.compactDeletes]] (or any rewrite op) clears
  * the delete list, relations resolve to the plain pruned scan again and
  * [[ManifestPruneRule]]'s file skipping applies as before; while deletes
  * are pending, parquet row-group pruning still applies inside the MOR
  * frame's scans.
  */
object MorReadRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case w: V2WriteCommand => w.withNewQuery(rewrite(w.query))
    case m: MergeIntoTable => m.copy(sourceTable = rewrite(m.sourceTable))
    // DELETE FROM / UPDATE: the target must stay a relation for their
    // planning paths (the warehouse ops materialize pending MOR deletes
    // themselves)
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable => d
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable => u
    case other => rewrite(other)
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    // hasPendingDeletes answers from the root HEADER (O(2 lines)) — this
    // gate runs on EVERY graft relation at analysis time and must not force
    // a full manifest replay of a millions-of-files table just to learn
    // there is nothing to overlay.
    //
    // Known trade-off: this swap happens at ANALYSIS time (the morFrame
    // plan must flow through the whole optimizer so query filters push into
    // its internal scans/joins), which is BEFORE filters are adjacent — so
    // a pending-delete table plans from its FULL manifest and segment
    // pruning (ManifestPruneRule + the delete-aware
    // [[graft.sink.Manifest.readPruned]]) does not apply on this path.
    // Deferring the swap to the optimizer would regain segment pruning but
    // lose predicate pushdown into the overlay's parquet scans
    // (PushDownPredicates never re-runs after the pre-CBO batch), a worse
    // trade at scale. The mitigation is operational and already automated:
    // compactDeletes ([[graft.sink.Warehouse.maintain]]'s delete-ratio arm)
    // returns the table to the zero-pending fast path, where every scan is
    // segment-pruned again
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] &&
        r.table.asInstanceOf[GraftTable].hasPendingDeletes =>
      val gt = r.table.asInstanceOf[GraftTable]
      val wh = new Warehouse(SparkSession.active, gt.root)
      val mor = wh.morFrame(gt.table, gt.manifest).queryExecution.analyzed
      // re-key the MOR plan's output onto the relation's attribute ids so
      // references above the substitution keep resolving
      Project(r.output.zip(mor.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier) }, mor)
  }
}
