package graft.catalog

import org.apache.spark.sql.catalyst.expressions.{Expression, GetJsonObject}
import org.apache.spark.sql.catalyst.expressions.variant.{VariantGet, VariantPathParser}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{StringType, VariantType}

/** `get_json_object`-compatible SQL face for VARIANT columns.
  *
  * A table that migrates its JSON string column to parse-once VARIANT
  * storage ([[graft.sink.Warehouse]] shredded writes) must not break every
  * query written against the string era: `get_json_object(props, '$.k')`
  * type-checks only on string input, so unrewritten it fails analysis the
  * moment the column's type changes. This resolution rule re-points the
  * extraction at the variant machinery BEFORE the type check runs:
  *
  *   get_json_object(v: VARIANT, path) ==> variant_get(v, path) :: string
  *
  * which preserves the observable contract on the JSON shapes the old
  * column held — both return NULL on a missing path (`failOnError = false`
  * is exactly try_variant_get), scalars render unquoted (`"x"` -> `x`,
  * numbers as their literal text), and nested objects/arrays render as
  * their JSON text (variant-to-string casts emit JSON). The payoff is that
  * the rewritten form is the shape Spark's own PushVariantIntoScan /
  * V2ScanRelationPushDown.pushDownVariants push INTO the parquet scan: the
  * legacy query, unchanged, now decodes one shredded leaf column instead
  * of parsing a JSON string per row.
  *
  * Scope guards: only fires when the child is resolved AND variant-typed
  * (string-era tables never see it), only when the path argument is
  * foldable — `variant_get` requires a constant path, and a non-literal
  * path on a variant column has no faithful rewrite (left alone, it
  * surfaces Spark's own type-check error naming the real mismatch) — and
  * only when the folded path is one `variant_get`'s grammar ACCEPTS
  * (checked against Spark's own [[VariantPathParser]]): `get_json_object`
  * extensions like wildcards (`$.a[*].b`) have no variant equivalent, so
  * rewriting them would swap the informative type-mismatch error for an
  * INVALID_VARIANT_GET path error; they stay unrewritten.
  * Deliberately NOT rewritten: `json_tuple`/`from_json` on variant (no
  * variant equivalents — their type errors should surface), and
  * `get_json_object` on strings (the V1 contract, untouched).
  *
  * Reference anchor: the reference keeps `props`-style payloads as JSON
  * text end to end (salesforce_pipeline.py record dicts); this face is
  * what lets those pipelines adopt variant storage without a query
  * rewrite.
  */
object VariantJsonCompatRule extends Rule[LogicalPlan] {

  private def isVariant(e: Expression): Boolean =
    e.resolved && e.dataType.isInstanceOf[VariantType]

  /** The folded path string, when `variant_get`'s own parser accepts it —
    * a fold that throws, folds to null, or uses get_json_object-only
    * grammar (wildcards, `..`) yields None and the expression stays as is.
    */
  private def variantPath(e: Expression): Option[String] =
    try Option(e.eval(null)).map(_.toString).filter(p =>
      VariantPathParser.parse(p).isDefined)
    catch { case _: Throwable => None }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case g: GetJsonObject if isVariant(g.json) && g.path.resolved &&
            g.path.foldable && variantPath(g.path).isDefined =>
          VariantGet(g.json, g.path, StringType, failOnError = false, None)
      }
    }
}
