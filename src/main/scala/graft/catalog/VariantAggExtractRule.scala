package graft.catalog

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.variant.VariantGet
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Pull pushable variant extractions OUT of Aggregate into a Project below.
  *
  *   Aggregate [sum(variant_get(v, '$.k', 'long'))]          Aggregate [sum(_vg_0)]
  *   +- child                                          ==>   +- Project [child.*, variant_get(v,...) AS _vg_0]
  *                                                              +- child
  *
  * Two reasons, one semantic rewrite (deterministic scalar, bit-identical):
  *
  *   1. It is the shape Spark's variant pushdown actually absorbs into the
  *      scan. Both PushVariantIntoScan (V1) and
  *      V2ScanRelationPushDown.pushDownVariants rewrite extractions they
  *      find in Project/Filter nodes adjacent to the relation; an
  *      extraction buried in aggregate expressions stays a full-variant
  *      read at best.
  *   2. It WORKS AROUND a Spark 4.1.2 defect on the DSv2 path: with an
  *      Aggregate above a pushed filter, pushDownVariants rewrites the
  *      scan schema (variant -> struct of requested fields) and the
  *      filter-restoration projection, but MISSES the `variant_get` inside
  *      the Aggregate — the stale attribute keeps its variant type under
  *      an exprId whose provider is now long-typed, and the optimizer's
  *      later RemoveRedundantAliases run fails plan validation
  *      (PLAN_VALIDATION_FAILED_RULE_IN_BATCH; reproduced during
  *      development against a VANILLA DSv2 parquet scan via
  *      `spark.sql.sources.useV1SourceList=""` — no engine rule involved —
  *      and pinned by VariantStoreSpec's DSv2 agg-over-filter test). With
  *      the extraction already in a
  *      Project below the Aggregate, pushdown only ever sees the shape it
  *      handles correctly.
  *
  * Runs in the operator-optimization batch (before the early-pushdown
  * batch). Guards: only `variant_get` whose input is a bare column
  * reference from the child's own output (the pushable shape — anything
  * computed or correlated is left alone) with a foldable path; duplicate
  * extractions (GROUP BY key repeated in the output list) share one
  * canonical projected column. Idempotent: rewritten aggregates reference
  * plain attributes, which the match ignores.
  */
object VariantAggExtractRule extends Rule[LogicalPlan] {

  private def pushable(e: Expression, child: LogicalPlan): Boolean = e match {
    case VariantGet(a: AttributeReference, path, _, _, _) =>
      e.resolved && path.foldable && child.outputSet.contains(a)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate =>
      val found = mutable.LinkedHashMap.empty[Expression, Alias]
      def collect(e: Expression): Unit = e.foreach {
        case vg if pushable(vg, agg.child) =>
          found.getOrElseUpdate(vg.canonicalized, Alias(vg, s"_vg_${found.size}")())
        case _ => ()
      }
      (agg.groupingExpressions ++ agg.aggregateExpressions).foreach(collect)
      if (found.isEmpty) agg
      else {
        def replace(e: Expression): Expression = e.transformUp {
          case vg if pushable(vg, agg.child) => found(vg.canonicalized).toAttribute
        }
        agg.copy(
          groupingExpressions = agg.groupingExpressions.map(replace),
          aggregateExpressions =
            agg.aggregateExpressions.map(replace(_).asInstanceOf[NamedExpression]),
          child = Project(agg.child.output ++ found.values.toSeq, agg.child))
      }
  }
}
