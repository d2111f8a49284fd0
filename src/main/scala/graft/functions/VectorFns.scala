package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order array functions (zip_with / transform / aggregate) — all
  * codegen'd, no UDF, no per-row JVM object churn.
  *
  * Determinism: every reduction is an explicit LEFT FOLD with a 0.0 seed, so
  * the float->double element casts and the double-add sequence are identical
  * in any engine that mirrors the same fold (the DuckDB oracles use
  * list_reduce, which folds the same way) — results are bit-deterministic.
  */
object VectorFns {

  /** Cast an array<float> column to array<double> (exact, elementwise). */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Left-fold sum of a double array. */
  def fsum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x * y))

  def norm2(a: Column): Column = fsum(transform(a, x => x * x))

  /** Cosine similarity dot/(|a||b|), computed as dot / sqrt(na * nb). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(norm2(a) * norm2(b))

  /** Deterministic pseudo-random hyperplane weight for (plane j, dim d):
    * an LCG over the flat index, exact integer arithmetic in any engine —
    * w in [-0.5, 0.5). Used for LSH random-hyperplane signatures; no
    * driver-side RNG so the oracle can reproduce it in pure SQL.
    */
  def lcgWeight(flatIdx: Column): Column =
    ((lit(1103515245L) * flatIdx + lit(12345L)) % lit(2147483648L)).cast("double") /
      lit(2.147483648e9) - lit(0.5)

  /** Sign bit ('1'/'0') of the projection of `vec` (array<double>, length
    * `dim`) onto pseudo-random hyperplane `plane`.
    */
  def hyperplaneBit(vec: Column, plane: Int, dim: Int): Column = {
    val proj = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
      (acc, d) => acc + element_at(vec, d + 1) * lcgWeight(lit(plane.toLong * dim) + d))
    when(proj >= 0, lit("1")).otherwise(lit("0"))
  }

  /** Full LSH signature: concatenated sign bits of `planes` hyperplanes. */
  def lshSignature(vec: Column, planes: Int, dim: Int): Column =
    concat((0 until planes).map(j => hyperplaneBit(vec, j, dim)): _*)
}
