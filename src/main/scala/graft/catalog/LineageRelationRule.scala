package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.sink.Warehouse

/** SQL face of ROW LINEAGE: `SELECT ... FROM cat.`t$lineage`` serves the
  * current snapshot's rows with their stable `_row_id`
  * ([[Warehouse.loadWithLineage]]). Substituted at ANALYSIS time — the
  * [[MorReadRule]] pattern: the lineage read is a multi-file PLAN (MOR
  * overlay + per-file id bases + the materialized-column coalesce), not a
  * per-file DSv2 scan, so the relation resolves to that plan directly and
  * everything downstream (filters, joins, aggregates) applies as if the
  * user had called the API. Branch refs (`t@dev$lineage`) resolve in their
  * own ledger; a non-graft catalog or a missing table leaves the relation
  * untouched for Spark's ordinary resolution errors.
  */
class LineageRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming && u.options.isEmpty() =>
        lineageOf(u.multipartIdentifier).getOrElse(u)
    }

  private def lineageOf(parts: Seq[String]): Option[LogicalPlan] = {
    val resolved = parts match {
      case Seq(cat, n) => Some((cat, n))
      case Seq(n) => Some((spark.sessionState.catalogManager.currentCatalog.name(), n))
      case _ => None
    }
    for {
      (cat, n) <- resolved
      (base, suffix) <- MetaTables.parse(n)
      if suffix == "lineage"
      root <- graftRoot(cat)
      wh = new Warehouse(spark, root)
      if wh.exists(base)
    } yield SubqueryAlias(n, wh.loadWithLineage(base).queryExecution.analyzed)
  }

  private def graftRoot(cat: String): Option[String] =
    try spark.sessionState.catalogManager.catalog(cat) match {
      case g: GraftCatalog => Some(g.root)
      case _ => None
    } catch { case _: Exception => None }
}
