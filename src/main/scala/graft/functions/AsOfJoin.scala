package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (temporal nearest) join — the reusable form of q45's
  * inline union+window construction.
  *
  * Spark has no native as-of join; the naive encoding — an inequality join
  * plus a per-left-row max — plans as a nested loop (quadratic per key) or
  * a range join that still fans out every candidate pair. This operator
  * never builds pairs: both sides UNION into one stream, ONE shuffle on the
  * key, and a per-key ordered window carries the most recent right-side row
  * forward (`last(..., ignoreNulls)` over unbounded-preceding). Cost is
  * sort + linear scan per key group — the only as-of shape that survives
  * 100 TB, and the same trick Flink/KDB systems use for temporal joins.
  *
  * Right-side payload columns travel as one struct; at equal timestamps the
  * right row sorts FIRST (asof is `<=`) and among equal-timestamp right
  * rows the max `tieBreak` wins, so results are deterministic without
  * pre-deduplication.
  */
object AsOfJoin {

  private val TS = "__asof_ts"
  private val SIDE = "__asof_side"
  private val P = "__asof_p"
  private val TB = "__asof_tb"

  private def us(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Backward as-of: each left row picks the LATEST right row with
    * `right(rightTs) <= left(leftTs)` in its `key` group (inclusive).
    *
    * @param payload     right columns to carry; emitted as `asof_<name>`
    * @param tieBreak    right column deciding equal-timestamp ties (max wins)
    * @param toleranceUs matches farther back than this become null (row kept)
    * @param negate      internal: flips time for [[forward]]
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String], tieBreak: String,
      toleranceUs: Option[Long] = None, negate: Boolean = false): DataFrame = {
    val sign = if (negate) lit(-1L) else lit(1L)
    val r = right.select(col(key), (us(col(rightTs)) * sign).as(TS),
      lit(0).as(SIDE), col(tieBreak).as(TB), struct(payload.map(col): _*).as(P))
    val l = left.withColumn(TS, us(col(leftTs)) * sign)
      .withColumn(SIDE, lit(1)).withColumn(TB, lit(null).cast(r.schema(TB).dataType))
      .withColumn(P, lit(null).cast(r.schema(P).dataType))
    val w = Window.partitionBy(key).orderBy(col(TS).asc, col(SIDE).asc, col(TB).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // r lacks the left-only columns; allowMissingColumns null-fills them
    val matched = l.unionByName(r, allowMissingColumns = true)
      .withColumn(P, last(when(col(SIDE) === 0, col(P)), ignoreNulls = true).over(w))
      .withColumn("__m_ts", last(when(col(SIDE) === 0, col(TS)), ignoreNulls = true).over(w))
      .filter(col(SIDE) === 1)
      .withColumn("asof_gap_us", col(TS) - col("__m_ts"))
    val gated = toleranceUs match {
      case Some(tol) => matched
        .withColumn(P, when(col("asof_gap_us") <= tol, col(P)))
        .withColumn("asof_gap_us", when(col("asof_gap_us") <= tol, col("asof_gap_us")))
      case None => matched
    }
    val out = payload.foldLeft(gated) { (d, c) => d.withColumn(s"asof_$c", col(P)(c)) }
    out.drop(TS, SIDE, TB, P, "__m_ts")
  }

  /** Forward as-of: each left row picks the EARLIEST right row with
    * `right(rightTs) >= left(leftTs)` — [[backward]] on negated time (the
    * latest negated timestamp IS the earliest real one).
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String], tieBreak: String,
      toleranceUs: Option[Long] = None): DataFrame =
    backward(left, right, key, leftTs, rightTs, payload, tieBreak,
      toleranceUs, negate = true)

  /** Nearest-either-direction as-of: the closer of [[backward]] and
    * [[forward]] per left row (ties go backward). Needs a unique `leftId`
    * to align the two passes — two window passes, one equi-join on the id,
    * still zero pair fan-out.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String, leftId: String,
      leftTs: String, rightTs: String, payload: Seq[String], tieBreak: String): DataFrame = {
    val cols = payload.map(c => s"asof_$c")
    val b = backward(left, right, key, leftTs, rightTs, payload, tieBreak)
    val f = forward(left, right, key, leftTs, rightTs, payload, tieBreak)
      .select(col(leftId) +: (cols.map(c => col(c).as(s"f_$c")) :+
        col("asof_gap_us").as("f_gap_us")): _*)
    // pin the direction choice BEFORE overwriting the gap column it reads
    val picked = b.join(f, leftId)
      .withColumn("__use_b", col("asof_gap_us").isNotNull &&
        (col("f_gap_us").isNull || col("asof_gap_us") <= col("f_gap_us")))
      .withColumn("asof_gap_us",
        when(col("__use_b"), col("asof_gap_us")).otherwise(col("f_gap_us")))
    cols.foldLeft(picked) { (d, c) =>
        d.withColumn(c, when(col("__use_b"), col(c)).otherwise(col(s"f_$c")))
      }
      .drop(cols.map(c => s"f_$c") ++ Seq("f_gap_us", "__use_b"): _*)
  }
}
