package graft.catalog

import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, Cast, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL `MERGE INTO` on graft tables — the SQL spelling of the reference's
  * merge disposition (`salesforce_pipeline.py:83-134`, dlt `primary_key` +
  * `write_disposition="merge"` compiled to an Iceberg upsert):
  *
  * {{{
  *   MERGE INTO graft.orders t USING batch s
  *   ON t.o_orderkey = s.o_orderkey
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark-first shape: rather than a bespoke command + executor, the rule
  * REWRITES `MergeIntoTable` into the `AppendData` write Spark already
  * executes, carrying `disposition=merge` + the ON-clause PKs as write
  * options — i.e. the SQL statement lands in the exact same
  * `GraftWriteBuilder` → `Warehouse.merge` path as
  * `df.writeTo(...).option("disposition","merge")`, one code path for both
  * faces (stat-pruned file rewrite, size-gated broadcast anti-join, CAS
  * commit). Injected as a resolution rule, so it replaces the node inside
  * the main resolution batch — before Spark's row-level-operation rewrites
  * would reject the table for not implementing SupportsRowLevelOperations.
  *
  * Only the upsert idiom is accepted (unconditional `UPDATE SET *` +
  * `INSERT *`, ON = AND-ed same-named column equalities): that is exactly
  * the semantics `Warehouse.merge` implements. Everything else fails with a
  * message saying so, rather than silently approximating. Deliberate
  * divergences from ANSI MERGE, inherited from the reference's dlt
  * contract and pinned by `CatalogSpec`:
  *   - several source rows per PK do not error (ANSI: cardinality
  *     violation); all batch rows land, old PK versions are dropped;
  *   - NULL-keyed source rows are appended but never match (plain equality
  *     join semantics, SURVEY §7.6.4).
  */
object GraftMergeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved =>
      EliminateSubqueryAliases(m.targetTable) match {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
          rewrite(m, r)
        case _ => m
      }
  }

  private def fail(msg: String): Nothing = throw new UnsupportedOperationException(
    "graft MERGE INTO supports exactly the upsert idiom (ON AND-ed same-named " +
      "column equalities, WHEN MATCHED THEN UPDATE SET *, WHEN NOT MATCHED " +
      "THEN INSERT *) or the delete idiom (WHEN MATCHED THEN DELETE alone), " +
      s"with no extra clauses or conditions — $msg")

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** Star expansion may wrap the source attribute in a store-assignment
    * cast; the assignment is still whole-column.
    */
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => c.child
    case other   => other
  }

  /** `assigns` must be the star form: every target column assigned exactly
    * once from the same-named source column, nothing else.
    */
  private def requireStar(assigns: Seq[Assignment], targetCols: Seq[String],
                          sOut: AttributeSet, what: String): Unit = {
    val assigned = assigns.map { a =>
      (a.key, stripCast(a.value)) match {
        case (k: Attribute, v: Attribute)
            if sOut.contains(v) && conf.resolver(k.name, v.name) => k.name
        case _ => fail(s"$what assigns ${a.sql}, not the same-named source column")
      }
    }
    if (assigned.map(_.toLowerCase).sorted != targetCols.map(_.toLowerCase).sorted)
      fail(s"$what must cover the whole row; got [${assigned.mkString(", ")}]")
  }

  private def rewrite(m: MergeIntoTable, r: DataSourceV2Relation): LogicalPlan = {
    if (m.withSchemaEvolution) fail("WITH SCHEMA EVOLUTION is not supported")
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    val source = m.sourceTable
    val tOut = r.outputSet
    val sOut = source.outputSet
    val targetCols = r.output.map(_.name)

    val pks = splitConjuncts(m.mergeCondition).map {
      case EqualTo(a: Attribute, b: Attribute) =>
        val (ta, sa) =
          if (tOut.contains(a) && sOut.contains(b)) (a, b)
          else if (tOut.contains(b) && sOut.contains(a)) (b, a)
          else fail(s"ON conjunct ${EqualTo(a, b).sql} does not equate a target column with a source column")
        if (!conf.resolver(ta.name, sa.name))
          fail(s"ON equates differently-named columns ${ta.name} and ${sa.name}")
        ta.name
      case other => fail(s"unsupported ON conjunct ${other.sql}")
    }
    if (pks.isEmpty) fail("empty ON clause")

    // Delete idiom: WHEN MATCHED THEN DELETE as the ONLY clause → an
    // O(batch) merge-on-read equality delete keyed on the ON columns
    // (`disposition=delete-matched` → [[graft.sink.Warehouse.equalityDelete]];
    // no data file is rewritten — SQL delete-by-join at any table size).
    // The source is projected positionally onto the target schema with
    // typed nulls for non-key columns: only the key columns matter to the
    // delete, and the write shim re-selects them by name.
    (m.matchedActions, m.notMatchedActions) match {
      case (Seq(DeleteAction(None)), Seq()) =>
        val projected = Project(r.output.toSeq.map { t =>
          source.output.find(a => conf.resolver(a.name, t.name)) match {
            case Some(a) => a
            case None => Alias(Literal.create(null, t.dataType), t.name)()
          }
        }, source)
        return AppendData.byPosition(r, projected,
          Map("disposition" -> "delete-matched", "primaryKeys" -> pks.mkString(",")))
      case (as, _) if as.exists(_.isInstanceOf[DeleteAction]) =>
        fail("WHEN MATCHED THEN DELETE must be unconditional and the only clause")
      case _ => ()
    }

    m.matchedActions match {
      case Seq(UpdateStarAction(None)) => ()
      case Seq(UpdateAction(None, assigns, _)) =>
        requireStar(assigns, targetCols, sOut, "UPDATE SET")
      case _ => fail("matched actions must be exactly one unconditional UPDATE SET *")
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case Seq(InsertAction(None, assigns)) =>
        requireStar(assigns, targetCols, sOut, "INSERT")
      case _ => fail("not-matched actions must be exactly one unconditional INSERT *")
    }

    // Project the source onto the target's columns by name (order + width);
    // ResolveOutputRelation then applies store-assignment casts exactly as
    // for INSERT INTO. Missing target columns are an error — INSERT * needs
    // the whole row.
    val projected = Project(targetCols.map { n =>
      source.output.find(a => conf.resolver(a.name, n))
        .getOrElse(fail(s"source is missing target column '$n'"))
    }, source)
    AppendData.byPosition(r, projected,
      Map("disposition" -> "merge", "primaryKeys" -> pks.mkString(",")))
  }
}
