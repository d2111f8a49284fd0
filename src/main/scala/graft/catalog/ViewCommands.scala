package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.{Identifier, ViewCatalog, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** Runnable commands behind the graft view DDL ([[GraftViewParser]] swaps
  * them in at parse time — Spark 4.1's own `CREATE VIEW` analysis refuses
  * any non-session catalog outright, ViewCatalog SPI or not, so the DDL
  * must be claimed before the analyzer sees it; the Iceberg Spark
  * extension does the same).
  */
private[catalog] object ViewCommands {
  def viewCatalog(spark: SparkSession, catalogName: String): ViewCatalog =
    spark.sessionState.catalogManager.catalog(catalogName) match {
      case v: ViewCatalog => v
      case other => throw new IllegalStateException(
        s"catalog $catalogName (${other.getClass.getName}) does not support views")
    }
  def ident(name: String): Identifier = Identifier.of(Array.empty[String], name)
}

/** `CREATE [OR REPLACE] VIEW cat.v [(a [COMMENT ...], b)] AS <query>`: the
  * defining query is ANALYZED here (so a broken view fails its DDL, not its
  * first reader, and the stored schema is the analyzed one), but never
  * executed — the stored artifact is the SQL text plus resolution context.
  */
private[catalog] case class CreateGraftViewCommand(catalogName: String,
    viewName: String, userColumns: Seq[(String, Option[String])],
    comment: Option[String], properties: Map[String, String],
    originalText: Option[String], query: LogicalPlan,
    allowExisting: Boolean, replace: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val cat = ViewCommands.viewCatalog(spark, catalogName)
    val sql = originalText.getOrElse(throw new IllegalStateException(
      s"CREATE VIEW $viewName: no SQL text to persist"))
    val qe = spark.sessionState.executePlan(query)
    qe.assertAnalyzed()
    val queryCols = qe.analyzed.schema.fieldNames.toSeq
    require(userColumns.isEmpty || userColumns.size == queryCols.size,
      s"CREATE VIEW $viewName: ${userColumns.size} column aliases for " +
        s"${queryCols.size} query columns")
    val aliases = userColumns.map(_._1)
    val schema: StructType =
      if (aliases.isEmpty) qe.analyzed.schema
      else StructType(qe.analyzed.schema.fields.zip(aliases).map {
        case (f, a) => f.copy(name = a)
      })
    val props = properties ++ comment.map(ViewCatalog.PROP_COMMENT -> _)
    val info = new ViewInfo(ViewCommands.ident(viewName), sql, catalogName,
      Array.empty[String], schema, queryCols.toArray, aliases.toArray,
      userColumns.map(_._2.orNull).toArray, {
        import scala.jdk.CollectionConverters._
        props.asJava
      })
    if (replace) cat.replaceView(info, true)
    else try cat.createView(info)
    catch { case _: ViewAlreadyExistsException if allowExisting => () }
    Nil
  }
}

private[catalog] case class DropGraftViewCommand(catalogName: String,
    viewName: String, ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dropped = ViewCommands.viewCatalog(spark, catalogName)
      .dropView(ViewCommands.ident(viewName))
    if (!dropped && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(
        ViewCommands.ident(viewName))
    Nil
  }
}

private[catalog] case class ShowGraftViewsCommand(catalogName: String,
    pattern: Option[String], override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val names = ViewCommands.viewCatalog(spark, catalogName)
      .listViews().map(_.name()).toSeq
    val shown = pattern match {
      case Some(p) => names.filter(
        org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p).contains)
      case None => names
    }
    shown.sorted.map(n => Row(catalogName, n, false))
  }
}

private[catalog] case class SetGraftViewPropertiesCommand(catalogName: String,
    viewName: String, properties: Map[String, String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    ViewCommands.viewCatalog(spark, catalogName).alterView(
      ViewCommands.ident(viewName),
      properties.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) }: _*)
    Nil
  }
}

private[catalog] case class UnsetGraftViewPropertiesCommand(catalogName: String,
    viewName: String, keys: Seq[String], ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.connector.catalog.ViewChange
    val cat = ViewCommands.viewCatalog(spark, catalogName)
    if (!ifExists) {
      val have = cat.loadView(ViewCommands.ident(viewName)).properties()
      val missing = keys.filterNot(have.containsKey)
      require(missing.isEmpty,
        s"view $viewName has no propert${if (missing.size == 1) "y" else "ies"}: " +
          missing.mkString(", "))
    }
    cat.alterView(ViewCommands.ident(viewName),
      keys.map(ViewChange.removeProperty): _*)
    Nil
  }
}

private[catalog] case class RenameGraftViewCommand(catalogName: String,
    from: String, to: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    ViewCommands.viewCatalog(spark, catalogName)
      .renameView(ViewCommands.ident(from), ViewCommands.ident(to))
    Nil
  }
}
