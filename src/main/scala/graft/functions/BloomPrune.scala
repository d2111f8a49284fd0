package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the explicit, composable form of what
  * Spark's own `InjectRuntimeFilter` does for qualifying shuffle joins.
  *
  * The 100 TB problem: a semi join that keeps one fact row in a thousand
  * still SHUFFLES every fact row to find that out. A Bloom filter of the
  * build side's keys, broadcast and applied as a scan-side filter, drops
  * ~all non-matching rows BEFORE the exchange: the shuffle then carries
  * only (matches + false positives). Bloom filters have no false
  * negatives, so following with the exact join preserves semantics
  * bit-for-bit — the filter only sheds rows the join would shed anyway.
  *
  * Spark 4 ships the expressions (`BloomFilterAggregate`,
  * `BloomFilterMightContain` — the ones runtime filtering plants) but does
  * not SQL-register them; [[register]] exposes them in the session the same
  * way the engine's own native expressions are exposed (see CosineFns).
  * Inputs are pre-hashed with `xxhash64`, the layout both expressions
  * require.
  */
object BloomPrune {
  val AggName = "graft_bloom_agg"
  val ContainsName = "graft_might_contain"

  /** Once per session (existence-checked — re-registration WARNs). */
  def register(spark: SparkSession): Unit = {
    val reg = castToImpl(spark).sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(AggName)))
      reg.createOrReplaceTempFunction(
        AggName, exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)), "built-in")
    if (!reg.functionExists(FunctionIdentifier(ContainsName)))
      reg.createOrReplaceTempFunction(
        ContainsName, exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }

  /** One-row frame holding the Bloom filter of `keys(df)`. */
  def buildFilter(df: DataFrame, key: Column, expectedItems: Long, numBits: Long): DataFrame = {
    register(df.sparkSession)
    df.select(call_function(AggName, xxhash64(key),
      lit(expectedItems), lit(numBits)).as("__bloom"))
  }

  /** Pre-filter `probe` to rows whose `probeKey` MIGHT be in `build`'s key
    * set. `might_contain` requires a CONSTANT bloom (the planner plants a
    * scalar subquery; that form isn't reachable from the public Column
    * API), so the one-row filter is collected and embedded as a literal —
    * a bounded numBits/8-byte driver fetch, the same metadata class as the
    * per-file stats collect, NOT a data collect. The test is then a pure
    * scan-side expression: no shuffle of `probe` happens here at all.
    * Superset guarantee (no false negatives) is what makes it a safe
    * pre-pass; callers re-check exactly afterwards.
    */
  def prefilter(probe: DataFrame, probeKey: Column, build: DataFrame, buildKey: Column,
      expectedItems: Long = 1000000L, numBits: Long = 8000000L): DataFrame = {
    val bytes = buildFilter(build, buildKey, expectedItems, numBits)
      .collect()(0).getAs[Array[Byte]]("__bloom")
    if (bytes == null) probe.filter(lit(false)) // empty build: nothing can match
    else probe.filter(call_function(ContainsName, lit(bytes), xxhash64(probeKey)))
  }

  /** Bloom-accelerated LEFT SEMI join: prefilter (sheds non-matches before
    * any exchange), then the exact semi join over the survivors. Returns
    * exactly `probe SEMI JOIN build` — spec-checked equal to the plain
    * semi join on every fixture.
    */
  def semiJoin(probe: DataFrame, probeKeyName: String, build: DataFrame, buildKeyName: String,
      expectedItems: Long = 1000000L, numBits: Long = 8000000L): DataFrame = {
    val pruned = prefilter(probe, col(probeKeyName), build, col(buildKeyName),
      expectedItems, numBits)
    // distinct alias avoids ambiguity when the two key names coincide
    val buildKeys = build.select(col(buildKeyName).as("__bk")).distinct()
    pruned.join(buildKeys, pruned(probeKeyName) === col("__bk"), "left_semi")
  }
}
