package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedTableOrView, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.{DataType, StructType}

/** Parser-level claim of view DDL aimed at a graft catalog. Spark 4.1's
  * analyzer (`ResolveSessionCatalog`) rejects `CREATE VIEW` / `DROP VIEW` /
  * `ALTER VIEW` / `SHOW VIEWS` on ANY non-session catalog before a
  * ViewCatalog implementation gets a say — the rejection sits ahead of
  * every extension hook in the resolution batch — so the statements must be
  * rewritten at PARSE time into commands that drive the ViewCatalog face
  * directly (the same interception the Iceberg Spark extension ships).
  * Everything not aimed at a graft catalog passes through untouched,
  * including all non-DDL statements (one `transformDown`-free instanceof
  * fan-out on the ROOT node only — per-statement cost is a pattern match).
  */
class GraftViewParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  /** `Some(catalogName, objectName)` when `parts` names an object in a
    * registered graft catalog — explicit `cat.obj`, or a bare name under a
    * graft CURRENT catalog. Resolution is by the session's catalog manager,
    * so the check is exact, not name-pattern guessing.
    */
  private def graftTarget(parts: Seq[String]): Option[(String, String)] = {
    def isGraft(cat: String): Boolean =
      try spark.sessionState.catalogManager.catalog(cat).isInstanceOf[GraftCatalog]
      catch { case _: Exception => false }
    parts match {
      case Seq(cat, obj) if isGraft(cat) => Some((cat, obj))
      case Seq(obj) =>
        val cur = spark.sessionState.catalogManager.currentCatalog.name()
        if (isGraft(cur)) Some((cur, obj)) else None
      case _ => None
    }
  }

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan match {
    case cv @ CreateView(id: UnresolvedIdentifier, cols, comment, _, props,
        text, query, allowExisting, replace, _) =>
      graftTarget(id.nameParts) match {
        case Some((cat, v)) => CreateGraftViewCommand(cat, v, cols, comment,
          props, text, query, allowExisting, replace)
        case None => cv
      }
    case dv @ DropView(id: UnresolvedIdentifier, ifExists) =>
      graftTarget(id.nameParts) match {
        case Some((cat, v)) => DropGraftViewCommand(cat, v, ifExists)
        case None => dv
      }
    case sv @ ShowViews(ns: UnresolvedNamespace, pattern, output) =>
      ns.multipartIdentifier match {
        case Seq(cat) if graftTarget(Seq(cat, "x")).isDefined =>
          ShowGraftViewsCommand(cat, pattern, output)
        case _ => sv
      }
    case sp @ SetViewProperties(v: UnresolvedView, props) =>
      graftTarget(v.multipartIdentifier) match {
        case Some((cat, name)) => SetGraftViewPropertiesCommand(cat, name, props)
        case None => sp
      }
    case up @ UnsetViewProperties(v: UnresolvedView, keys, ifExists) =>
      graftTarget(v.multipartIdentifier) match {
        case Some((cat, name)) =>
          UnsetGraftViewPropertiesCommand(cat, name, keys, ifExists)
        case None => up
      }
    // ALTER VIEW ... RENAME parses as RenameTable(isView = true); the view
    // store itself refuses renames onto table names, so a graft TABLE rename
    // through ALTER TABLE (isView = false) stays on the TableCatalog path
    case rt @ RenameTable(tv: UnresolvedTableOrView, newName, true) =>
      graftTarget(tv.multipartIdentifier) match {
        case Some((cat, from)) =>
          val to = newName match {
            case Seq(n)                     => n
            case Seq(`cat`, n)              => n
            case other => throw new IllegalArgumentException(
              s"RENAME target must stay in catalog $cat: ${other.mkString(".")}")
          }
          RenameGraftViewCommand(cat, from, to)
        case None => rt
      }
    case other => other
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
