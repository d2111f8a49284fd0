package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** Analysis-time substitution of graft views: an [[UnresolvedRelation]]
  * naming a stored view is replaced by its defining SQL's parsed plan —
  * fully expanded (nested views resolve here too, with an explicit
  * seen-set so a REPLACE-created cycle fails with a real error instead of
  * exhausting analyzer iterations), relation names qualified against the
  * view's CREATION catalog (a view must keep meaning what its author saw,
  * whatever the reader's current catalog), and the stored column aliases
  * applied positionally ([[UnresolvedSubqueryColumnAliases]], the `FROM t
  * AS x(a,b)` node). Substitution yields ordinary unresolved SQL, so
  * everything downstream — time travel inside the view text, MOR overlay,
  * manifest pruning, SPJ — applies exactly as if the user had inlined the
  * query. Views never shadow tables (creation refuses the collision), so a
  * relation that IS a table never reaches the store probe's positive arm.
  */
class GraftViewSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if !u.isStreaming && u.options.isEmpty() =>
        viewOf(u.multipartIdentifier)
          .map { case (cat, name, rec) => expand(cat, name, rec, Set.empty) }
          .getOrElse(u)
    }

  /** (catalog, view, record) when `parts` names a stored graft view. */
  private def viewOf(parts: Seq[String])
      : Option[(String, String, ViewStore.ViewRecord)] = {
    def graftRoot(cat: String): Option[String] =
      try spark.sessionState.catalogManager.catalog(cat) match {
        case g: GraftCatalog => Some(g.root)
        case _ => None
      } catch { case _: Exception => None }
    val resolved = parts match {
      case Seq(cat, v) => Some((cat, v))
      case Seq(v)      => Some((spark.sessionState.catalogManager.currentCatalog.name(), v))
      case _           => None
    }
    for {
      (cat, v) <- resolved
      root <- graftRoot(cat)
      rec <- new ViewStore(root).load(v)
    } yield (cat, v, rec)
  }

  private def expand(cat: String, name: String, rec: ViewStore.ViewRecord,
      seen: Set[(String, String)]): LogicalPlan = {
    if (seen((cat, name))) throw new IllegalStateException(
      s"recursive view: $cat.$name references itself (via ${seen.map(p => p._1 + "." + p._2).mkString(" -> ")})")
    val parsed = spark.sessionState.sqlParser.parsePlan(rec.sql)
    val expanded = parsed.transformUp {
      case ur: UnresolvedRelation if !ur.isStreaming && ur.options.isEmpty() =>
        // bare names resolve in the view's CREATION catalog, not the reader's
        val parts =
          if (ur.multipartIdentifier.length == 1) rec.currentCatalog +: ur.multipartIdentifier
          else ur.multipartIdentifier
        viewOf(parts) match {
          case Some((c2, n2, r2)) => expand(c2, n2, r2, seen + ((cat, name)))
          case None =>
            if (parts eq ur.multipartIdentifier) ur
            else new UnresolvedRelation(parts, ur.options, ur.isStreaming)
        }
    }
    val aliased =
      if (rec.columnAliases.isEmpty) expanded
      else UnresolvedSubqueryColumnAliases(rec.columnAliases, expanded)
    SubqueryAlias(name, aliased)
  }
}
