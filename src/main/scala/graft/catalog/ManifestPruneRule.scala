package graft.catalog

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sink.{DataFile, StatsPruning}

/** Predicate-driven FILE skipping for warehouse scans — the engine analog of
  * Iceberg's scan planning, where the manifest's per-file column bounds
  * decide which data files a query must read at all.
  *
  * Injected through `GraftExtensions` as an operator-optimization rule, so it
  * runs BEFORE `V2ScanRelationPushDown`: it only swaps the relation's
  * [[GraftTable]] for one whose manifest lists the surviving files, and
  * leaves the `Filter` in place. Parquet's own pushdown (row-group pruning,
  * column pruning, codegen) then applies to the reduced file list exactly as
  * before — this rule can only ever REMOVE IO, never change semantics.
  *
  * At 100 TB this is the difference between "read the table" and "read the
  * one region a watermark/PK predicate touches": a merge-style query with a
  * key-range filter over a range-clustered table opens O(matching files)
  * parquet footers instead of O(all files).
  *
  * Conservative by construction ([[StatsPruning]]): only AND-ed conjuncts of
  * shape `col OP literal` (plus IN/IsNotNull) on columns with recorded stats
  * prune; everything else keeps every file.
  */
object ManifestPruneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, r: DataSourceV2Relation) =>
      r.table match {
        case t: GraftTable if t.prunedManifest.isEmpty =>
          val files = t.manifest.files
          // bloom context once per table: the marker read is the O(1)
          // short-circuit that keeps un-indexed tables at zero extra cost
          val wh = new graft.sink.Warehouse(
            org.apache.spark.sql.SparkSession.active, t.root)
          val indexed = graft.sink.BloomIndex.indexedCols(wh.tableDirOf(t.table))
          val kept = files.filter(file =>
            mayMatch(file, cond) &&
              (indexed.isEmpty || bloomMayMatch(wh, indexed, t, file, cond)))
          if (kept.size < files.size) f.copy(child = r.copy(table = t.withFiles(kept)))
          else f
        case _ => f
      }
  }

  /** Point-lookup pruning via per-file Bloom sidecars
    * ([[graft.sink.BloomIndex]], built by `Warehouse.buildBloomIndex`):
    * `col = literal` / `col IN (...)` conjuncts drop files whose filter
    * proves the value absent — the case range stats can never prune (a
    * high-cardinality key the table is not clustered by spans every file's
    * bounds). No false negatives ⇒ pruning on a miss is exact; missing
    * sidecars, type mismatches, and non-equality shapes keep the file.
    * Catalog-rule-only (not part of [[mayMatch]]): the sidecar reads are
    * per-file driver IO that equality-heavy internal callers (DPP IN-sets,
    * merge victim selection) must not pay implicitly.
    */
  private def bloomMayMatch(wh: graft.sink.Warehouse, indexed: Set[String],
                            t: GraftTable, file: DataFile, cond: Expression): Boolean = {
    import graft.sink.BloomIndex
    def typeOk(a: AttributeReference): Boolean =
      t.manifest.schema.fields.exists(f0 => f0.name == a.name && f0.dataType == a.dataType)
    def hit(a: AttributeReference, l: Literal): Boolean =
      if (l.value == null || !indexed.contains(a.name) || !typeOk(a)) true
      else BloomIndex.hashLiteral(l) match {
        case Some(h) => BloomIndex.mightContain(wh.resolvePath(t.table, file.path), a.name, h)
        case None    => true
      }
    splitConjunctivePredicates(cond).forall {
      case EqualTo(a: AttributeReference, l: Literal) => hit(a, l)
      case EqualTo(l: Literal, a: AttributeReference) => hit(a, l)
      case In(a: AttributeReference, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        vs.exists(v => hit(a, v.asInstanceOf[Literal]))
      case InSet(a: AttributeReference, vs) if vs.nonEmpty =>
        vs.exists(v => hit(a, Literal(v, a.dataType)))
      case _ => true
    }
  }

  /** May `file` contain a row satisfying `cond`? Unknown shapes → true.
    * Public: [[graft.sink.Warehouse.deleteWhere]] reuses the same bound
    * logic to pick its rewrite victims (scan pruning and delete pruning
    * must agree, or a delete could skip a file a scan would read).
    */
  def mayMatch(file: DataFile, cond: Expression): Boolean =
    splitConjunctivePredicates(cond).forall(c => conjunctMayMatch(file, c))

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other     => Seq(other)
  }

  private def conjunctMayMatch(file: DataFile, c: Expression): Boolean = c match {
    case EqualTo(a: AttributeReference, l: Literal)            => check(file, a.name, "=", l)
    case EqualTo(l: Literal, a: AttributeReference)            => check(file, a.name, "=", l)
    case GreaterThan(a: AttributeReference, l: Literal)        => check(file, a.name, ">", l)
    case GreaterThan(l: Literal, a: AttributeReference)        => check(file, a.name, "<", l)
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => check(file, a.name, ">=", l)
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => check(file, a.name, "<=", l)
    case LessThan(a: AttributeReference, l: Literal)           => check(file, a.name, "<", l)
    case LessThan(l: Literal, a: AttributeReference)           => check(file, a.name, ">", l)
    case LessThanOrEqual(a: AttributeReference, l: Literal)    => check(file, a.name, "<=", l)
    case LessThanOrEqual(l: Literal, a: AttributeReference)    => check(file, a.name, ">=", l)
    case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => check(file, a.name, "=", v.asInstanceOf[Literal]))
    // OptimizeIn rewrites 11+-element IN lists to InSet in the same batch —
    // values are already catalyst-internal, Literal wraps them directly
    case InSet(a: AttributeReference, vs) if vs.nonEmpty =>
      vs.exists(v => check(file, a.name, "=", Literal(v, a.dataType)))
    // `col LIKE 'p%'`: strings with prefix p live in [p, succ(p)) under the
    // UTF-8 binary order the bounds were computed in
    case StartsWith(a: AttributeReference, Literal(p, StringType)) if p != null =>
      file.stats.get(a.name).forall(StatsPruning.mayMatchPrefix(_, p.toString))
    // null-safe equality: a null literal matches only null rows (null-count
    // powered); a non-null literal behaves like `=` (z-files excluded by
    // mayMatch's own z rule)
    case EqualNullSafe(a: AttributeReference, l: Literal) =>
      if (l.value == null) file.stats.get(a.name).forall(_.nulls != 0L)
      else check(file, a.name, "=", l)
    case EqualNullSafe(l: Literal, a: AttributeReference) =>
      if (l.value == null) file.stats.get(a.name).forall(_.nulls != 0L)
      else check(file, a.name, "=", l)
    case IsNotNull(a: AttributeReference) =>
      // an all-null ("z") file has no row passing IS NOT NULL; with a
      // recorded null count, nulls == rows proves the same without "z"
      file.stats.get(a.name).forall(st => st.kind != "z" && st.nulls != file.rows)
    case IsNull(a: AttributeReference) =>
      // a file with a PROVEN zero null count has no row passing IS NULL;
      // unknown (-1) keeps the file
      file.stats.get(a.name).forall(_.nulls != 0L)
    case _ => true
  }

  /** Shared with runtime (DPP) pruning — [[V2PredicatePruning]] routes the
    * join-driven IN-sets through the same bounds + transform projection, so
    * static and dynamic file skipping can never disagree.
    */
  private[catalog] def check(file: DataFile, col: String, op: String, l: Literal): Boolean = {
    if (l.value == null) return false // col OP null matches no row
    val raw = file.stats.get(col) match {
      case None => true // no bounds recorded for this column — keep the file
      case Some(st) =>
        StatsPruning.render(l.dataType, l.value) match {
          case Some((kind, v)) => StatsPruning.mayMatch(st, op, kind, v)
          case None            => true
        }
    }
    // hidden-partitioning bounds: project the predicate into every declared
    // transform of this column (Iceberg inclusive projection) — a file is
    // kept only if raw bounds AND every transform bound may match. This is
    // where bucket(n, col) equality pruning happens, which raw min/max can
    // never provide.
    raw && file.stats.forall { case (key, st) =>
      graft.sink.PartitionTransforms.project(key, col, op, l) match {
        case Some((kind, rop, v)) => StatsPruning.mayMatch(st, rop, kind, v)
        case None                 => true
      }
    }
  }
}
