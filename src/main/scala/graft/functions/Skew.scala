package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (builder contract: "skewed keys ->
  * salting or AQE skew-join").
  *
  * AQE handles skewed JOINS automatically (split oversized partitions), but a
  * skewed AGGREGATION key still lands on one reducer. `saltedAgg` is the
  * standard two-phase rewrite: group on (key, salt) first — fanning one hot
  * key across `buckets` reducers — then combine the partials. Only
  * decomposable aggregates (sum/count/min/max) are supported; that's exactly
  * the set Spark itself can partial-aggregate.
  */
object Skew {

  /** Two-phase salted aggregation over the decomposable aggregates:
    * sum-of-partial-sums, min-of-partial-mins, max-of-partial-maxes, plus a
    * row count (`n` = sum of partial counts).
    *
    * @param df      input (must not already contain the reserved working
    *                columns `__salt`/`__cnt` or the output column `n`)
    * @param key     grouping column name
    * @param sums    columns to sum, by name (result column keeps the name)
    * @param buckets salt fan-out (reducers per hot key)
    * @param mins    columns to min, by name
    * @param maxs    columns to max, by name
    */
  def saltedAgg(df: DataFrame, key: String, sums: Seq[String], buckets: Int = 16,
                mins: Seq[String] = Nil, maxs: Seq[String] = Nil): DataFrame = {
    val reserved = Seq("__salt", "__cnt", "n").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"saltedAgg reserves column name(s) ${reserved.mkString(", ")} — rename them first")
    val dup = (sums ++ mins ++ maxs).diff((sums ++ mins ++ maxs).distinct)
    require(dup.isEmpty, s"column(s) ${dup.distinct.mkString(", ")} listed in more than one aggregate")
    val salted = df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partialAggs = sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++ maxs.map(c => max(col(c)).as(c)) :+
      count(lit(1)).as("__cnt")
    val partial = salted.groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.map(c => sum(col(c)).as(c)) ++
      mins.map(c => min(col(c)).as(c)) ++ maxs.map(c => max(col(c)).as(c)) :+
      sum("__cnt").as("n")
    partial.groupBy(col(key)).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed key when AQE's skew split isn't in play
    * (static planning, or a build side above the broadcast threshold but far
    * smaller than the skewed fact side): the fact side takes a per-row salt,
    * the dimension side is REPLICATED to every salt value, and the join runs
    * on (key, salt) — one hot key fans across `buckets` reducers instead of
    * one. Inner-join semantics on `key`, result identical to
    * `facts.join(dims, key)` (PropertySpec checks equality on generated
    * skew). Cost: dims scan x buckets — only sane when |dims| << |facts|,
    * which is the skew scenario by definition.
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
      buckets: Int = 16): DataFrame = {
    val reserved = Seq("__salt").filter(c => facts.columns.contains(c) || dims.columns.contains(c))
    require(reserved.isEmpty, "saltedJoin reserves column __salt — rename it first")
    val fs = facts.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val ds = dims.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    fs.join(ds, Seq(key, "__salt")).drop("__salt")
  }
}
