package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query surface.
  *
  * Cross-engine determinism rules (SURVEY.md §7.6.3 and FIXTURES.md):
  *  - Money/metric aggregates run in DECIMAL(18,2)-derived exact arithmetic
  *    and only the FINAL value is cast to double — a double SUM's value
  *    depends on accumulation order, which Spark and DuckDB do differently;
  *    an exact decimal sum converted once to double is bit-deterministic in
  *    both engines.
  *  - Every query ends in a total ORDER BY (unique tiebreak column included)
  *    so result rows hash identically regardless of partitioning. Catalyst's
  *    EliminateSorts drops these sorts under `count()`-style benchmarks, so
  *    they cost nothing in the bench path.
  *  - Timestamps stay native under a UTC session; sub-second-precision values
  *    from the ns-precision `events.ts` column are only emitted truncated.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a compute-heavy narrow table across all cores. Small parquet
    * files arrive as ONE scan partition (maxPartitionBytes never splits a
    * 65 MB file), which would serialize expensive per-row work (md5
    * shingling, vector math) onto a single core; one cheap round-robin
    * shuffle of the raw rows buys full parallelism for everything after.
    * At production scale the input is many files and this becomes a no-op
    * choice — the pattern (repartition before compute-bound stages, not
    * before IO-bound ones) is what matters.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Exact decimal view of a double money column. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact decimal sum, emitted as a deterministic double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** avg via exact sum / count — DuckDB's avg(decimal) returns double with
    * its own summation order; sum-then-divide is deterministic in both.
    */
  def davg(c: Column): Column = (sum(dec(c)).cast("double") / count(lit(1)))

  /** Revenue term l_extendedprice * (1 - l_discount) in exact arithmetic. */
  def revenue(price: Column, discount: Column): Column =
    dec(price) * (lit(java.math.BigDecimal.ONE).cast(DecimalType(18, 2)) - dec(discount))

  /** Wipe a per-JVM warehouse root's CONTENTS, keeping the directory itself
    * (catalog plugins are cached by name after first load, so the root conf
    * must keep pointing at the same path) — the one shared implementation
    * of the stable-path discipline every temp-catalog query uses.
    */
  private[queries] def wipe(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.filter(_ != p).foreach(java.nio.file.Files.deleteIfExists(_))
    }
}
