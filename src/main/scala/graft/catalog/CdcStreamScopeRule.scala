package graft.catalog

import org.apache.spark.sql.catalyst.expressions.{Expression, Or}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation
import org.apache.spark.sql.types.{StructField, StructType}

/** Per-trigger window SCOPING for the CDC STREAMING source — the streaming
  * sibling of the `t$changes` batch face's `SupportsPushDownFilters` path
  * (round-16 brief #6), which Spark's planner never exercises for
  * micro-batch relations: `V2ScanRelationPushDown` matches only batch
  * `DataSourceV2Relation`s, so a filtered streaming consumer
  * (`readStream.table("...$changes").filter(...)`) paid FULL window
  * planning on every trigger — O(all segments) manifest parsing and the
  * whole change bag staged, for a consumer that reads one key range of a
  * 100 TB table.
  *
  * This rule runs in the operator-optimization batch of EVERY trigger's
  * `IncrementalExecution` (extensions share the session optimizer): it
  * reads the consumer's own `Filter` standing directly on the stream's
  * scan relation (after `PushDownPredicates`, the filter is adjacent),
  * translates the stat-domain conjuncts with [[CdcScope.translateExpr]]
  * (real table columns only, AND partial-translation conservative), and
  * installs the scope on the [[ChangesMicroBatchStream]] BEFORE physical
  * planning forces `planInputPartitions` — which then stages
  * `readChangesScoped`'s slice (delete-aware segment-pruned manifests +
  * per-file refutation) under a predicate-fingerprinted window dir.
  *
  * Soundness gates, all falling back to the UNSCOPED full window:
  *   - the plan is never rewritten — the rule only observes; the
  *     consumer's filter still applies above the scan, so correctness
  *     never rides the scope (the readChangesScoped contract: the scoped
  *     bag guarantees exactly the rows MATCHING the predicate);
  *   - a relation occurrence with NO enclosing filter anywhere in the
  *     plan (a self-union mixing filtered and unfiltered branches) forces
  *     scope None — every consumer of the stream must be covered;
  *   - multiple filtered occurrences OR their translated conjunctions
  *     (a row matching either branch must be staged);
  *   - pair-label faces (update-images, lineage) never scope — the
  *     stream's own gate ([[ChangesMicroBatchStream.updateScope]]) drops
  *     the install.
  */
object CdcStreamScopeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // collect, per stream instance: translated scopes of FILTERED
    // occurrences, and whether any occurrence stands unfiltered
    val scopes = collection.mutable.Map
      .empty[ChangesMicroBatchStream, List[Option[Expression]]]
    val occurrences = collection.mutable.Map.empty[ChangesMicroBatchStream, Int]
    plan.foreach {
      case Filter(cond, r: StreamingDataSourceV2ScanRelation)
          if r.stream.isInstanceOf[ChangesMicroBatchStream] =>
        val s = r.stream.asInstanceOf[ChangesMicroBatchStream]
        val schema = StructType(r.output.map(a => StructField(a.name, a.dataType)))
        scopes(s) = CdcScope.translateExpr(cond, schema) :: scopes.getOrElse(s, Nil)
      case r: StreamingDataSourceV2ScanRelation
          if r.stream.isInstanceOf[ChangesMicroBatchStream] =>
        val s = r.stream.asInstanceOf[ChangesMicroBatchStream]
        occurrences(s) = occurrences.getOrElse(s, 0) + 1
      case _ => ()
    }
    occurrences.foreach { case (stream, n) =>
      val filtered = scopes.getOrElse(stream, Nil)
      val scope =
        if (filtered.size != n || filtered.exists(_.isEmpty)) None
        else filtered.flatten.reduceOption(Or(_, _))
      // always install (including None): a consumer whose filter vanished
      // from the plan must revert to the full window
      stream.updateScope(scope)
    }
    plan
  }
}
