package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional file pruning — the
  * lakehouse `OPTIMIZE ZORDER BY` analog over the graft warehouse's
  * manifest stats: interleave the bits of two rank-normalized columns and
  * range-partition + sort on the interleaved key, so every written file
  * covers a small RECTANGLE in (a, b) space instead of a thin full-width
  * stripe. Per-file min/max bounds (append's `statsCols`) then prune files
  * for predicates on EITHER or BOTH columns — single-column range
  * clustering only ever prunes its own column.
  *
  * Scale posture: normalization uses two scalar min/max aggregates (driver
  * metadata, the Warehouse.writeData pattern), the z-value is a flat
  * codegen'd bitwise expression, and the layout is one
  * `repartitionByRange` — exactly the cost of the existing single-column
  * clustering. The trade is documented and spec-measured: a 1-D predicate
  * on the leading column prunes somewhat better under plain range
  * clustering; any 2-D box prunes far better under z-order.
  */
object ZOrder {

  private val Bits = 16 // per-dimension resolution: 2^16 cells per axis

  /** Interleave the low `Bits` bits of two non-negative int columns:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i (a is the
    * higher-order dimension). Flat fold of codegen'd bitwise ops.
    */
  def interleave(a: Column, b: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1)).cast("long"), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1)).cast("long"), 2 * i))
    }

  /** Rank-normalize a numeric column to [0, 2^Bits) using its observed
    * min/max (two scalars — bounded driver metadata). Degenerate (constant)
    * columns map to 0.
    */
  private def normalized(df: DataFrame, c: String): Column = {
    val r = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    if (hi <= lo) lit(0)
    else least(lit((1 << Bits) - 1),
      floor((col(c).cast("double") - lo) / (hi - lo) * ((1 << Bits) - 1)).cast("int"))
  }

  /** Lay `df` out z-ordered on (a, b) across `files` output partitions.
    * Feed the result to `Warehouse.append(..., statsCols = Seq(a, b))` —
    * each written file then carries tight rectangular (a, b) bounds.
    */
  def layout(df: DataFrame, a: String, b: String, files: Int): DataFrame =
    df.withColumn("__z", interleave(normalized(df, a), normalized(df, b)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
