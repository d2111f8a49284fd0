package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sink.{Manifest, StatsPruning}

/** Metadata-only aggregates: a global `COUNT(*)` / `MIN(col)` / `MAX(col)`
  * over an unfiltered warehouse scan is answered from the MANIFEST — file
  * row counts and per-file column bounds — and the whole scan collapses to
  * a one-row [[LocalRelation]]. Zero file opens, zero Spark jobs: at
  * 100 TB, `SELECT count(*) FROM t` goes from "read every footer" (Spark's
  * own parquet aggregate pushdown) or "scan the table" to an O(files)
  * driver-side fold over metadata the commit already paid for — the
  * engine analog of Iceberg's snapshot-summary/manifest-served counts.
  *
  * Correctness gates (each bails to the ordinary plan, never approximates):
  *   - no `Filter` anywhere below the aggregate, relation reached through
  *     at most a column-pruning `Project`; grouping is served ONLY when
  *     every file is provably single-valued on every grouping column (the
  *     hive-split identity-partition invariant — groups are then unions of
  *     whole files and fold per group); anything else bails;
  *   - no pending MOR deletes (a delete file may have removed the extreme
  *     row / changes the count) — note MOR snapshots are normally rewritten
  *     to the anti-joined frame at resolution ([[MorReadRule]]) and so
  *     never reach this rule as bare relations;
  *   - `MIN`/`MAX` need EVERY data file to carry a recorded stat for the
  *     column in the type's expected domain ("z" all-null files contribute
  *     nothing); a single stat-less file bails. This automatically excludes
  *     columns whose value is virtual for old files (ADD COLUMN with
  *     initial default: pre-add files have no stat) and anything whose
  *     bound the writer dropped (NaN floats, >256-char strings);
  *   - bounds are ATTAINED values, never truncated — the write path drops
  *     unrenderable bounds instead of truncating ([[graft.sink.Warehouse]]
  *     `renderStat`, [[graft.sink.FooterStats]]), which is what makes
  *     serving MIN/MAX from them exact;
  *   - float/double zero bounds bail: ±0.0 render identically ("0.0"), so
  *     the sign of a zero extreme is unrecoverable from the stat;
  *   - `count(col)` serves from the per-file null counts the manifest now
  *     records (Σ rows − nulls) when EVERY file carries one for the column
  *     ("z" all-null files contribute 0; pre-null-count stats read as
  *     unknown and bail);
  *   - `COUNT(DISTINCT ...)`, FILTER clauses, and non-constant count
  *     children bail.
  *
  * Injected via [[graft.GraftExtensions]] in the operator-optimization
  * batch, after [[MorReadRule]]/time-travel resolution — the manifest on
  * the relation is exactly the snapshot the query addresses, so
  * `VERSION AS OF` counts serve from the pinned snapshot.
  */
object StatsAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, aggExprs, child, _) if aggExprs.nonEmpty =>
      unwrap(child) match {
        // pending-delete gate answers from the root header (O(2 lines)):
        // since round 17 such relations survive analysis (MorReadRule swaps
        // them in THIS batch, possibly after us in the iteration) and the
        // bail must not force a full manifest load to discover them
        case Some((t, nameOf, _)) if t.prunedManifest.isEmpty && !t.hasPendingDeletes =>
          val m = t.manifest
          val served = aggExprs.map(serve(m, nameOf, _))
          if (served.contains(None)) agg
          else LocalRelation(agg.output, Seq(InternalRow.fromSeq(served.map(_.get))))
        case _ => agg
      }
    // GROUP BY over columns — or PARTITION-TRANSFORM expressions — every
    // file is SINGLE-VALUED on (the hive-split invariant SPJ already
    // certifies per file): each group is a set of whole files, so grouped
    // COUNT/MIN/MAX/count(col) fold from the manifest exactly like the
    // global case — zero file opens for `SELECT region, count(*) ...
    // GROUP BY region` on a region-partitioned table, and for
    // `GROUP BY CAST(ts AS DATE)` / `year(ts)` on a days()/years()-
    // partitioned one (the commonest reporting shapes).
    case agg @ Aggregate(groupExprs, aggExprs, child, _) if groupExprs.nonEmpty =>
      unwrap(child) match {
        case Some((t, nameOf, specOf))
            if t.prunedManifest.isEmpty && !t.hasPendingDeletes =>
          serveGrouped(t.manifest, nameOf, specOf, groupExprs, aggExprs) match {
            case Some(rows) => LocalRelation(agg.output, rows)
            case None       => agg
          }
        case _ => agg
      }
  }

  /** How one grouping expression is served from per-file stats: the stat
    * key to consult, the domain it must be in, and the parser from the
    * rendered bound to the group's catalyst value.
    */
  private final case class GroupSpec(statKey: String, kind: String,
                                     parseKey: String => Option[Any])

  /** Recognize a grouping expression as manifest-servable: a bare column
    * (raw per-file stats), an alias of a recognized transform pulled below
    * the aggregate by `PullOutGroupingExpressions` (`specOf`), or a direct
    * partition-transform shape over a source column whose TRANSFORM stats
    * the write recorded — `CAST(ts AS DATE)` ≡ `days(ts)` and `year(ts)`
    * ≡ `years(ts) + 1970` under a UTC zone (the transforms are pure UTC
    * epoch arithmetic, so the equivalences hold only there; any other zone
    * bails).
    */
  private def groupSpec(e: Expression, nameOf: Map[ExprId, String],
                        specOf: Map[ExprId, GroupSpec]): Option[GroupSpec] =
    e match {
      case a: AttributeReference if specOf.contains(a.exprId) => specOf.get(a.exprId)
      case a: AttributeReference =>
        for { c <- nameOf.get(a.exprId); k <- expectedKind(a.dataType) }
          yield GroupSpec(c, k, s => parse(a.dataType, s))
      case other => transformSpec(other, nameOf)
    }

  /** The transform shapes themselves (see [[groupSpec]]). */
  private def transformSpec(e: Expression, nameOf: Map[ExprId, String]): Option[GroupSpec] =
    e match {
      case c @ Cast(a: AttributeReference, DateType, _, _)
          if a.dataType == TimestampType && utcZone(c.timeZoneId) =>
        nameOf.get(a.exprId).map(src =>
          GroupSpec(s"days($src)", "n", s => Some(s.toInt)))
      case Year(c @ Cast(a: AttributeReference, DateType, _, _))
          if a.dataType == TimestampType && utcZone(c.timeZoneId) =>
        nameOf.get(a.exprId).map(src =>
          GroupSpec(s"years($src)", "n", s => Some(s.toInt + 1970)))
      case Year(a: AttributeReference) if a.dataType == DateType =>
        nameOf.get(a.exprId).map(src =>
          GroupSpec(s"years($src)", "n", s => Some(s.toInt + 1970)))
      // date_trunc('YEAR'|'MONTH'|'DAY'|'HOUR', ts) — the other common
      // spelling of time-grouped reporting. Each level maps bijectively to
      // one transform's stat value; the group key is the truncated
      // timestamp (epoch micros of the period start, exact UTC arithmetic
      // both here and on the write side).
      case t @ TruncTimestamp(Literal(fmt: org.apache.spark.unsafe.types.UTF8String, StringType),
          a: AttributeReference, _)
          if a.dataType == TimestampType && utcZone(t.timeZoneId) =>
        val level = fmt.toString.toUpperCase(java.util.Locale.ROOT)
        def monthStartMicros(totalMonths: Int): Long = {
          val y = 1970 + Math.floorDiv(totalMonths, 12)
          val m = Math.floorMod(totalMonths, 12) + 1
          java.time.LocalDate.of(y, m, 1).toEpochDay * 86400000000L
        }
        nameOf.get(a.exprId).flatMap { src =>
          level match {
            case "YEAR" | "YYYY" | "YY" => Some(GroupSpec(s"years($src)", "n",
              s => Some(monthStartMicros(s.toInt * 12))))
            case "MON" | "MONTH" | "MM" => Some(GroupSpec(s"months($src)", "n",
              s => Some(monthStartMicros(s.toInt))))
            case "DAY" | "DD" => Some(GroupSpec(s"days($src)", "n",
              s => Some(s.toLong * 86400000000L)))
            case "HOUR" => Some(GroupSpec(s"hours($src)", "n",
              s => Some(s.toLong * 3600000000L)))
            case _ => None
          }
        }
      case _ => None
    }

  private def utcZone(tz: Option[String]): Boolean =
    tz.exists(z => scala.util.Try(
      java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC).getOrElse(false))

  /** Grouped serving: partition the manifest's files by their (single)
    * value tuple on the grouping columns, then fold each group with the
    * same per-slot logic as the global case. Bails (None) unless EVERY
    * file is provably single-valued on EVERY grouping column (stat present,
    * min == max in the expected domain, or "z" = the null group) and every
    * output slot is servable within every group.
    */
  private def serveGrouped(m: Manifest, nameOf: Map[ExprId, String],
                           specOf: Map[ExprId, GroupSpec],
                           groups: Seq[Expression],
                           aggExprs: Seq[NamedExpression]): Option[Seq[InternalRow]] = {
    if (m.files.isEmpty) return Some(Nil) // empty table: no groups
    val specs = groups.map(groupSpec(_, nameOf, specOf))
    if (specs.contains(None)) return None
    val gspecs = specs.flatten
    // group value of one file on one grouping slot: None = not single-valued
    // (bail). min == max alone is NOT single-valued — min/max ignore
    // nulls, so a file holding ('a', null) would fold its null row into
    // the 'a' group; a PROVEN zero null count is required ("z" is the
    // all-null dual; unknown −1 bails). Transform slots consult the
    // TRANSFORM's recorded stat, so a days()-split table serves GROUP BY
    // day even though the raw timestamp is many-valued per file.
    def fileKey(f: graft.sink.DataFile): Option[Seq[Option[String]]] = {
      val parts = gspecs.map { gs =>
        f.stats.get(gs.statKey) match {
          case Some(st) if st.kind == "z" => Some(None)
          case Some(st) if st.kind == gs.kind && st.min == st.max &&
            st.nulls == 0L => Some(Some(st.min))
          case _ => None
        }
      }
      if (parts.contains(None)) None else Some(parts.map(_.get))
    }
    val keyed = m.files.map(f => fileKey(f).map(_ -> f))
    if (keyed.contains(None)) return None
    val byKey = keyed.flatten.groupBy(_._1).toSeq.map { case (k, fs) => k -> fs.map(_._2) }
    // zero-float group keys bail in parse() (±0.0 renders identically);
    // each group folds through the same slot logic over its member files
    val rows = byKey.map { case (key, files) =>
      val sub = Manifest(m.schema, files)
      val keyVals: Seq[Any] = gspecs.zip(key).map { case (gs, vOpt) =>
        vOpt match {
          case None    => null
          case Some(s) => gs.parseKey(s).getOrElse(return None)
        }
      }
      // an output slot matching a grouping expression (bare or aliased, by
      // semantic equality — covers both attr groups and transform shapes)
      // serves the group key; everything else folds through `serve`
      def groupValue(e: Expression): Option[Option[Any]] =
        groups.zipWithIndex.collectFirst {
          case (g, i) if g.semanticEquals(e) => Some(keyVals(i))
        }
      val slots = aggExprs.map {
        case a: AttributeReference          => groupValue(a).getOrElse(None)
        case al @ Alias(child, _)           =>
          groupValue(child).getOrElse(serve(sub, nameOf, al))
        case e                              => serve(sub, nameOf, e)
      }
      if (slots.contains(None)) return None
      InternalRow.fromSeq(slots.map(_.get))
    }
    Some(rows)
  }

  /** The relation beneath column-pruning/renaming `Project`s, plus the
    * exprId → manifest-column-name map for plain columns AND the exprId →
    * [[GroupSpec]] map for projected TRANSFORM aliases (the shape
    * `PullOutGroupingExpressions` leaves below a GROUP BY over an
    * expression: `Project [..., cast(ts as date) AS _groupingexpression]`).
    */
  private def unwrap(plan: LogicalPlan)
      : Option[(GraftTable, Map[ExprId, String], Map[ExprId, GroupSpec])] =
    plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftTable =>
          Some((t, r.output.map(a => a.exprId -> a.name).toMap, Map.empty))
        case _ => None
      }
      case Project(list, inner) => unwrap(inner).flatMap { case (t, base, specs) =>
        val mapped: Seq[Option[Either[(ExprId, String), (ExprId, GroupSpec)]]] = list.map {
          case a: AttributeReference =>
            base.get(a.exprId).map(n => scala.util.Left(a.exprId -> n))
              .orElse(specs.get(a.exprId).map(s => scala.util.Right(a.exprId -> s)))
          case al @ Alias(a: AttributeReference, _) =>
            base.get(a.exprId).map(n => scala.util.Left(al.exprId -> n))
              .orElse(specs.get(a.exprId).map(s => scala.util.Right(al.exprId -> s)))
          case al @ Alias(child, _) =>
            transformSpec(child, base).map(s => scala.util.Right(al.exprId -> s))
          case _ => None
        }
        if (mapped.contains(None)) None
        else Some((t, mapped.flatten.collect { case scala.util.Left(e) => e }.toMap,
          specs ++ mapped.flatten.collect { case scala.util.Right(e) => e }))
      }
      case _ => None
    }

  /** One output slot's manifest-served value (catalyst-internal), or None
    * to bail. `Some(null)` is a legitimate answer (empty/all-null MIN).
    */
  private def serve(m: Manifest, nameOf: Map[ExprId, String],
                    e: NamedExpression): Option[Any] = e match {
    case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
      case Count(Seq(l: Literal)) if l.value != null =>
        Some(m.files.map(_.rows).sum)
      // count(col) = Σ (rows − nulls): servable when EVERY file carries a
      // recorded null count for the column ("z" = all-null contributes 0);
      // any unknown (-1 or stat-less file) bails
      case Count(Seq(a: AttributeReference)) =>
        nameOf.get(a.exprId).flatMap { c =>
          val perFile = m.files.map { f =>
            f.stats.get(c) match {
              case Some(st) if st.kind == "z"  => Some(0L)
              case Some(st) if st.nulls >= 0L  => Some(f.rows - st.nulls)
              case _                           => None
            }
          }
          if (perFile.contains(None)) None else Some(perFile.flatten.sum)
        }
      case Min(a: AttributeReference) => bound(m, nameOf.get(a.exprId), a.dataType, isMin = true)
      case Max(a: AttributeReference) => bound(m, nameOf.get(a.exprId), a.dataType, isMin = false)
      case _ => None
    }
    case Alias(l: Literal, _) => Some(l.value) // SELECT count(*), 'tag' FROM t
    case _ => None
  }

  /** Fold one column's per-file bounds into the table extreme. Bail unless
    * every file carries the stat in the expected domain; "z" files are
    * all-null and contribute nothing (SQL MIN/MAX null semantics).
    */
  private def bound(m: Manifest, col: Option[String], dt: DataType,
                    isMin: Boolean): Option[Any] = col.flatMap { c =>
    expectedKind(dt).flatMap { kind =>
      val sts = m.files.map(_.stats.get(c))
      if (sts.contains(None)) None
      else {
        val live = sts.flatten.filterNot(_.kind == "z")
        if (live.exists(_.kind != kind)) None
        else if (live.isEmpty) Some(null) // empty table or all-null column
        else {
          val best = live.map(st => if (isMin) st.min else st.max)
            .reduce((a, b) =>
              if ((StatsPruning.cmp(kind, a, b) <= 0) == isMin) a else b)
          parse(dt, best)
        }
      }
    }
  }

  /** Stat domain the write side records for `dt` ([[graft.sink.Warehouse]]
    * `statCols`); None = type never gets servable stats (incl. NTZ).
    */
  private def expectedKind(dt: DataType): Option[String] = dt match {
    case StringType => Some("s")
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
         _: DecimalType | TimestampType | DateType | BooleanType => Some("n")
    case _ => None
  }

  /** Inverse of the write side's stat rendering, into catalyst-internal
    * values (timestamps = epoch micros, dates = epoch days).
    */
  private def parse(dt: DataType, s: String): Option[Any] = dt match {
    case StringType  => Some(UTF8String.fromString(s))
    case ByteType    => Some(s.toByte)
    case ShortType   => Some(s.toShort)
    case IntegerType => Some(s.toInt)
    case LongType    => Some(s.toLong)
    case FloatType   =>
      val f = s.toFloat
      if (f == 0f) None else Some(f) // ±0.0 sign lost at render
    case DoubleType  =>
      val d = s.toDouble
      if (d == 0d) None else Some(d)
    case d: DecimalType =>
      val dec = Decimal(new java.math.BigDecimal(s))
      if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
    case TimestampType => Some(s.toLong)
    case DateType      => Some(s.toInt)
    case BooleanType   => Some(s == "1")
    case _             => None
  }
}
