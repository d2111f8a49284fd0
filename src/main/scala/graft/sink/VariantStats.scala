package graft.sink

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, try_variant_get}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructType, VariantType}

/** Per-file statistics on EXTRACTED VARIANT PATHS — file skipping for
  * predicates on JSON fields.
  *
  * A declared stat key `vget(props,$.k,long)` records each file's
  * min/max/null-count of `try_variant_get(props, '$.k', 'long')` in the
  * manifest, exactly like a physical column's bounds. `ManifestPruneRule`
  * then maps a query conjunct `variant_get(props, '$.k', 'long') > x` to
  * the same key and skips provably-disjoint files — and, because segment
  * summaries merge stat keys generically, provably-disjoint SEGMENTS are
  * never even parsed. On a table range-clustered by the extracted value,
  * a JSON-field range predicate reads O(matching files) — the shredded
  * storage ([[Warehouse]] variant writes) makes the extraction cheap; this
  * makes it prunable, which no amount of shredding alone provides.
  *
  * Soundness contract (why the key carries the TARGET TYPE):
  *
  *   - Stat collection uses `try_variant_get` with the key's own type, so
  *     stat-time and query-time extraction share one value domain: a row
  *     whose field can't cast contributes no bound AND (under
  *     `try_variant_get`) doesn't match — or (under strict `variant_get`)
  *     raises, and a raising row treated as non-matching for PLANNING is
  *     Spark's own pushed-filter posture (pruning may turn a failing scan
  *     into a succeeding one, never a wrong-rowed one).
  *   - A query extraction with a DIFFERENT target type (e.g. a `long`
  *     predicate over a `double`-keyed stat) never consults the key —
  *     numeric casts truncate differently per type, so cross-type bounds
  *     would be unsound. Unmatched shapes simply don't prune.
  *   - `long` bounds are exact int64; `double` bounds render the exact
  *     decimal text of the aggregated double (Double.toString round-trips,
  *     and the BigDecimal compare domain preserves it); `string` bounds
  *     live in the same UTF-8 binary order every other string stat uses.
  *     NaN/Infinity fail the numeric render and drop the file's stat —
  *     conservative, the file just stays in scope.
  *
  * Collection is two-tier:
  *
  *   - DECLARED keys ride [[Warehouse.writeData]]'s stats pass — footer
  *     bounds when the shredded leaf proves sound
  *     ([[FooterStats]].vgetOutcome's residual gates), one column-pruned
  *     scan fallback otherwise, so a declared key is recorded on EVERY
  *     file (all-null where the path is absent — that is what lets
  *     IS NOT NULL skip path-missing files).
  *   - AUTO-DISCOVERED keys need no declaration at all: the footer pass
  *     (already open per file) proposes a key for every shredded leaf
  *     whose primitive type maps into this stat domain and records it
  *     when the same residual gates prove it — an ad-hoc JSON-path
  *     predicate on a never-declared path prunes too. No scan fallback is
  *     funded for auto keys (Unknown simply isn't recorded; the file
  *     stays in scope), and `inheritedStatsCols` then promotes observed
  *     keys to declared status on later appends, so a path seen once
  *     keeps collecting — including sound scan-derived bounds over later
  *     dirty (mixed-type) batches.
  *
  * Keys survive RENAME like transform keys do
  * ([[Warehouse.renameColumn]] remaps the `src`).
  */
object VariantStats {

  /** A parsed vget stat key. `tpe` is the extraction target type name. */
  final case class VKey(src: String, path: String, tpe: String) {
    def key: String = s"vget($src,$path,$tpe)"
    /** Manifest stat domain: numeric types compare as BigDecimal ("n"),
      * strings in UTF-8 binary order ("s").
      */
    def kind: String = if (tpe == "string") "s" else "n"
  }

  // paths with commas/parens don't round-trip through the key syntax and
  // are refused at parse (no key -> no stats -> no pruning; never wrong)
  private val KeyRe = """vget\(([^,()]+),([^,()]+),(long|double|string)\)""".r

  def parseKey(k: String): Option[VKey] = k match {
    case KeyRe(s, p, t) => Some(VKey(s, p, t))
    case _              => None
  }

  /** The target-type name this pruning speaks, or None for types whose
    * variant cast has no exact stat domain here (timestamps, decimals,
    * booleans — addable, just not yet proven).
    */
  def typeNameOf(dt: DataType): Option[String] = dt match {
    case LongType   => Some("long")
    case DoubleType => Some("double")
    case StringType => Some("string")
    case _          => None
  }

  /** True when `schema` carries `src` as a VARIANT column — the only shape
    * a vget key may stat (a non-variant source would make `variant_get`
    * fail analysis anyway).
    */
  def applies(schema: StructType, vk: VKey): Boolean =
    schema.fields.exists(f => f.name == vk.src && f.dataType.isInstanceOf[VariantType])

  /** The extraction expression stats aggregate over (see the soundness
    * contract above for why try-semantics + the key's own type).
    */
  def extractExpr(vk: VKey): Column = try_variant_get(col(vk.src), vk.path, vk.tpe)

  // single-segment paths whose field name round-trips as a parquet group
  // name — the shapes the FOOTER can prove (deeper/bracketed paths still
  // stat fine through the scan fallback)
  private val FooterPathRe = """\$\.([A-Za-z0-9_\-]+)""".r

  /** The shredded-leaf field name for `$.name` paths, or None when the
    * path is too deep/exotic for footer proof ([[FooterStats]] then falls
    * back to the scan for this key).
    */
  def footerField(path: String): Option[String] = path match {
    case FooterPathRe(f) => Some(f)
    case _               => None
  }
}
