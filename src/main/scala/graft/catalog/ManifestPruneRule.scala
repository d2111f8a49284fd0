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
          // SEGMENT level first (the manifest-list analog): segments whose
          // root-line summary proves no file can match are never PARSED —
          // the same conservative mayMatch, applied to the segment's merged
          // bounds as if it were one big file. Only surviving segments'
          // entries materialize for the per-file pass below, so a
          // one-partition query over a million-file table plans in
          // O(relevant segments), not O(table entries).
          val (man, skippedSegs) = t.manifestPruned(s =>
            mayMatch(graft.sink.DataFile("", s.rows, s.stats), cond))
          val files = man.files
          // bloom probes extracted ONCE per filter node (hashes included —
          // an InSet of a thousand uuids must not re-hash per file), and
          // only when an equality-shaped conjunct exists at all: the common
          // range-predicate query never touches the marker or a Warehouse
          val probes = bloomProbes(t, cond, man.schema)
          lazy val resolve = probeResolver(t)
          val kept = files.filter(file =>
            mayMatch(file, cond) && probes.forall { case (c, hs) =>
              hs.exists(h => graft.sink.BloomIndex.mightContain(resolve(file.path), c, h))
            })
          if (kept.size < files.size || skippedSegs > 0)
            f.copy(child = r.copy(table = t.withManifest(man.copy(files = kept))))
          else f
        case _ => f
      }
  }

  /** One sidecar-path resolver per table (branch-ref aware — the same
    * split [[graft.sink.Warehouse]] uses for every path).
    */
  private def probeResolver(t: GraftTable): String => String = {
    val wh = new graft.sink.Warehouse(org.apache.spark.sql.SparkSession.active, t.root)
    rel => wh.resolvePath(t.table, rel)
  }

  /** Point-lookup probes via per-file Bloom sidecars
    * ([[graft.sink.BloomIndex]], built by `Warehouse.buildBloomIndex`):
    * each `col = literal` / `col IN (...)` / InSet conjunct on an INDEXED
    * column becomes (column, candidate hashes); a file survives a probe iff
    * its filter might contain SOME candidate. No false negatives ⇒ pruning
    * on a miss is exact; missing sidecars, type mismatches, unhashable
    * values, oversized sets, and non-equality shapes contribute no probe
    * (keep). Catalog-rule-only (not part of [[mayMatch]]): sidecar reads
    * are per-file driver IO that equality-heavy internal callers (DPP
    * IN-sets, merge victim selection) must not pay implicitly.
    */
  private val MaxProbeValues = 512

  private def bloomProbes(t: GraftTable, cond: Expression,
                          schema: org.apache.spark.sql.types.StructType):
      Seq[(String, Seq[Long])] = {
    import graft.sink.BloomIndex
    val conjs = splitConjunctivePredicates(cond)
    val hasEq = conjs.exists {
      case _: EqualTo | _: In | _: InSet => true
      case _                             => false
    }
    if (!hasEq) return Nil
    val indexed = BloomIndex.indexedCols(
      new graft.sink.Warehouse(org.apache.spark.sql.SparkSession.active, t.root)
        .tableDirOf(t.table))
    if (indexed.isEmpty) return Nil
    def usable(a: AttributeReference): Boolean =
      indexed.contains(a.name) &&
        schema.fields.exists(f0 => f0.name == a.name && f0.dataType == a.dataType)
    // sidecars are keyed by field id (rename-stable) — BloomIndex.keyFor
    def keyOf(a: AttributeReference): String =
      BloomIndex.keyFor(schema, a.name)
    // all candidate hashes of a value list, or None if ANY is unhashable
    // (then the conjunct can't prune). Null values match no row under
    // plain equality — they contribute no hash, and an all-null list
    // yields an empty candidate set = prune everything, which is exact.
    def hashes(ls: Seq[Literal]): Option[Seq[Long]] = {
      val nonNull = ls.filter(_.value != null)
      val hs = nonNull.map(BloomIndex.hashLiteral)
      if (hs.contains(None)) None else Some(hs.flatten)
    }
    conjs.flatMap {
      case EqualTo(a: AttributeReference, l: Literal) if usable(a) =>
        hashes(Seq(l)).map(keyOf(a) -> _)
      case EqualTo(l: Literal, a: AttributeReference) if usable(a) =>
        hashes(Seq(l)).map(keyOf(a) -> _)
      case In(a: AttributeReference, vs)
          if usable(a) && vs.nonEmpty && vs.size <= MaxProbeValues &&
            vs.forall(_.isInstanceOf[Literal]) =>
        hashes(vs.map(_.asInstanceOf[Literal])).map(keyOf(a) -> _)
      case InSet(a: AttributeReference, vs)
          if usable(a) && vs.nonEmpty && vs.size <= MaxProbeValues =>
        hashes(vs.toSeq.map(v => Literal(v, a.dataType))).map(keyOf(a) -> _)
      case _ => None
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

  /** A variant extraction in the one shape vget stats can prune: a bare
    * variant column, a constant path, and a target type the stat domain
    * proves exactly ([[graft.sink.VariantStats]] soundness contract —
    * cross-type bounds would be unsound, so other shapes yield no key and
    * simply don't prune). Yields the manifest stat key.
    */
  private object VGetKey {
    def unapply(e: Expression): Option[String] = e match {
      case org.apache.spark.sql.catalyst.expressions.variant.VariantGet(
          a: AttributeReference, Literal(p, StringType), t, _, _) if p != null =>
        graft.sink.VariantStats.typeNameOf(t)
          .map(tn => graft.sink.VariantStats.VKey(a.name, p.toString, tn).key)
      case _ => None
    }
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
    // values are already catalyst-internal, Literal wraps them directly.
    // Capped: InSet is unbounded and this check runs per file; past the cap
    // the conjunct just doesn't prune (conservative).
    case InSet(a: AttributeReference, vs) if vs.nonEmpty && vs.size <= MaxProbeValues =>
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
      // recorded null count, nulls == rows proves the same without "z" —
      // but only for a KNOWN-positive row count: a summary probe may carry
      // rows = 0 (empty side) or −1 (unknown), where nulls == rows proves
      // nothing (and −1 == −1 for an unknown null count must never refute)
      file.stats.get(a.name).forall(st =>
        st.kind != "z" && !(file.rows > 0L && st.nulls == file.rows))
    case IsNull(a: AttributeReference) =>
      // a file with a PROVEN zero null count has no row passing IS NULL;
      // unknown (-1) keeps the file
      file.stats.get(a.name).forall(_.nulls != 0L)

    // ---- variant-path predicates: same bounds algebra, keyed by the vget
    // stat key instead of a column name ([[graft.sink.VariantStats]]).
    // `check`'s transform projection no-ops for these keys (no transform
    // ever names a vget key), so this is pure stat-bound pruning.
    case EqualTo(VGetKey(k), l: Literal)            => check(file, k, "=", l)
    case EqualTo(l: Literal, VGetKey(k))            => check(file, k, "=", l)
    case GreaterThan(VGetKey(k), l: Literal)        => check(file, k, ">", l)
    case GreaterThan(l: Literal, VGetKey(k))        => check(file, k, "<", l)
    case GreaterThanOrEqual(VGetKey(k), l: Literal) => check(file, k, ">=", l)
    case GreaterThanOrEqual(l: Literal, VGetKey(k)) => check(file, k, "<=", l)
    case LessThan(VGetKey(k), l: Literal)           => check(file, k, "<", l)
    case LessThan(l: Literal, VGetKey(k))           => check(file, k, ">", l)
    case LessThanOrEqual(VGetKey(k), l: Literal)    => check(file, k, "<=", l)
    case LessThanOrEqual(l: Literal, VGetKey(k))    => check(file, k, ">=", l)
    case In(VGetKey(k), vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => check(file, k, "=", v.asInstanceOf[Literal]))
    case InSet(vg @ VGetKey(k), vs) if vs.nonEmpty && vs.size <= MaxProbeValues =>
      vs.exists(v => check(file, k, "=", Literal(v, vg.dataType)))
    case StartsWith(VGetKey(k), Literal(p, StringType)) if p != null =>
      file.stats.get(k).forall(StatsPruning.mayMatchPrefix(_, p.toString))
    // null-count-powered: the vget stat's nulls field counts rows whose
    // extraction is null (missing path, null variant, or failed try-cast —
    // the same rows the query-side extraction nulls)
    case IsNotNull(VGetKey(k)) =>
      // same known-positive-rows guard as the column arm above
      file.stats.get(k).forall(st =>
        st.kind != "z" && !(file.rows > 0L && st.nulls == file.rows))
    case IsNull(VGetKey(k)) =>
      file.stats.get(k).forall(_.nulls != 0L)
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
