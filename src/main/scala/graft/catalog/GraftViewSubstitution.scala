package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedRelation, UnresolvedSubqueryColumnAliases}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UnresolvedWith}
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
    // CTEs first: substitution runs in the Resolution batch, AFTER Spark's
    // own CTESubstitution, so a spliced UnresolvedWith would never resolve —
    // and a CTE name must never be catalog-qualified (it is not a table).
    // Inlining each definition at its use sites (bottom-up: inner WITH
    // scopes first, so shadowing resolves inner-most, matching the
    // analyzer) removes both hazards before qualification runs.
    // transformUpWithSubqueries everywhere: view bodies reference tables,
    // views and CTEs inside IN/EXISTS/scalar subqueries too. One thing it
    // does NOT reach: UnresolvedWith keeps its CTE definitions as
    // innerChildren, so a WITH nested INSIDE another CTE's definition
    // (`WITH a AS (WITH b AS ... SELECT ... FROM b) ...`) is invisible to
    // the traversal — each definition is therefore inlined RECURSIVELY
    // before its own uses are substituted, or the leftover UnresolvedWith
    // would survive past Spark's once-only CTESubstitution batch and fail
    // analysis with an unresolved-operator error.
    def inlineCtes(plan: LogicalPlan): LogicalPlan = plan.transformUpWithSubqueries {
      case UnresolvedWith(child, ctes, allowRecursion) =>
        if (allowRecursion) throw new UnsupportedOperationException(
          s"view $cat.$name uses a recursive CTE, which graft views do not support")
        // later definitions may reference earlier ones in the same clause;
        // the parser already folded `WITH t(a,b) AS` column aliases into
        // each definition's SubqueryAlias, so the tuple needs no more care
        var defs = Map.empty[String, LogicalPlan]
        ctes.foreach { case (cteName, defn, _) =>
          defs += cteName.toLowerCase(java.util.Locale.ROOT) ->
            substituteCtes(inlineCtes(defn), defs)
        }
        substituteCtes(child, defs)
    }
    val noCtes = inlineCtes(parsed)
    val expanded = noCtes.transformUpWithSubqueries {
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

  /** Replace single-part relations naming a CTE in `defs` with that CTE's
    * (already-inlined) definition. Case-insensitive, Spark's default CTE
    * resolution; multi-part names can never be CTE references.
    */
  private def substituteCtes(plan: LogicalPlan,
      defs: Map[String, LogicalPlan]): LogicalPlan =
    if (defs.isEmpty) plan
    else plan.transformUpWithSubqueries {
      case ur: UnresolvedRelation if ur.multipartIdentifier.length == 1 &&
          defs.contains(ur.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT)) =>
        defs(ur.multipartIdentifier.head.toLowerCase(java.util.Locale.ROOT))
    }
}
