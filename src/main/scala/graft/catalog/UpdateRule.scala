package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sink.Warehouse

/** SQL `UPDATE graft.t SET ... WHERE ...` — [[GraftMergeRule]]'s sibling
  * for the last DML verb. Spark's own row-level rewrite requires
  * `SupportsRowLevelOperations`; instead the resolved `UpdateTable` is
  * rewritten to a runnable command that lands in
  * [[graft.sink.Warehouse.updateWhere]] — the same stat-pruned
  * copy-on-write rewrite as `DELETE FROM` (only files the condition may
  * touch are rewritten; every SET expression sees the OLD row).
  *
  * The resolved assignment/condition expressions reference the relation's
  * attribute ids, which cannot bind against the engine-side scan — they are
  * re-keyed to plain column names (the relation IS the table, so names
  * resolve identically). Subqueries in SET/WHERE are rejected at planning
  * rather than mis-executed.
  */
object GraftUpdateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u: UpdateTable if u.resolved =>
      EliminateSubqueryAliases(u.table) match {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          rewrite(u, r.table.asInstanceOf[GraftTable])
        case _ => u
      }
  }

  private def fail(msg: String): Nothing = throw new UnsupportedOperationException(
    s"graft UPDATE supports plain column assignments with subquery-free expressions — $msg")

  /** Subquery guard runs at PLANNING (loud, early); the by-name re-keying
    * happens at EXECUTION ([[GraftUpdateCommand.run]]): the command must
    * carry the RESOLVED originals, because CheckAnalysis walks a command's
    * expression arguments and an `UnresolvedAttribute` stored here fails
    * analysis of the whole statement (latent until the first plain
    * `UPDATE ... WHERE col = ...` — the MERGE face never hit it).
    */
  private def checked(e: Expression): Expression = {
    if (SubqueryExpression.hasSubquery(e)) fail("subqueries are not supported here")
    e
  }

  private def rewrite(u: UpdateTable, gt: GraftTable): LogicalPlan = {
    val sets = u.assignments.map {
      case Assignment(k: Attribute, v) => k.name -> checked(v)
      case a => fail(s"SET target ${a.key.sql} is not a plain column")
    }
    if (sets.map(_._1.toLowerCase).distinct.size != sets.size)
      fail("a column is assigned more than once")
    GraftUpdateCommand(gt.root, gt.table, sets, u.condition.map(checked))
  }
}

/** Eagerly-executed carrier of one UPDATE: runs the warehouse op at
  * execution time (like every `LeafRunnableCommand`), returning no rows.
  */
private[catalog] case class GraftUpdateCommand(root: String, table: String,
    sets: Seq[(String, Expression)], cond: Option[Expression])
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val wh = new Warehouse(spark, root)
    // re-key the RESOLVED attribute references to by-name lookups here, at
    // execution, so they bind against the engine-side scan of the same
    // table (storing unresolved names in the command fails CheckAnalysis)
    def toCol(e: Expression) = org.apache.spark.sql.graft.ColumnBridge.column(
      e.transform { case a: Attribute => UnresolvedAttribute.quoted(a.name) })
    val c = cond.map(toCol).getOrElse(org.apache.spark.sql.functions.lit(true))
    val assignments = sets.map { case (k, v) => k -> toCol(v) }.toMap
    // same IO-shape knob as DELETE: "cow" (default) rewrites touched files
    // now; "positional" commits (pairs + updated rows) in one MOR commit
    // and defers the rewrite to compactDeletes
    spark.conf.getOption("spark.graft.update.mode").map(_.toLowerCase) match {
      case Some("positional") => wh.positionUpdate(table, c, assignments)
      case None | Some("cow") => wh.updateWhere(table, c, assignments)
      case Some(other) => throw new IllegalArgumentException(
        s"spark.graft.update.mode must be cow or positional, got: $other")
    }
    Nil
  }
}
