package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import graft.functions.VectorFns.asDouble
import graft.queries.SimilarityQueries.{quantizeInt8, reconstructInt8}

/** Int8 quantization as a data transform (quantizeInt8/reconstructInt8) —
  * the shipped-artifact companion to q75's oracle-checked audit metrics.
  * The oracle stays on the scalar audit (arrays don't hash cross-engine);
  * this spec pins the array-valued contract.
  */
class QuantizeSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  test("quantizeInt8 emits array<tinyint>, reconstruction error <= scale/2 element-wise") {
    val q = reconstructInt8(quantizeInt8(emb))
    assert(q.schema("qv").dataType == ArrayType(ByteType, containsNull = false) ||
      q.schema("qv").dataType.asInstanceOf[ArrayType].elementType == ByteType,
      s"qv is not array<tinyint>: ${q.schema("qv").dataType}")
    // |q_i| <= 127 by construction (no tinyint wrap), and element-wise
    // |rv_i - v_i| <= scale/2 (round-to-nearest's half-step bound).
    val audit = q.select(
      aggregate(col("qv"), lit(0), (acc, x) => greatest(acc, abs(x.cast("int")))).as("qmax"),
      aggregate(zip_with(col("rv"), col("v"), (r, x) => abs(r - x)),
        lit(0.0), (acc, e) => greatest(acc, e)).as("max_err"),
      col("scale"))
    val bad = audit.filter(col("qmax") > 127 ||
      col("max_err") > col("scale") / 2 + lit(1e-12)).count()
    assert(bad == 0, s"$bad vectors violate the quantization error contract")
    assert(q.count() == emb.count())
  }

  test("reconstructed vectors keep cosine fidelity with the originals") {
    graft.functions.expressions.CosineFns.register(spark)
    val q = reconstructInt8(quantizeInt8(emb))
      // the all-zero vector reconstructs to all-zero; cosine is 0/0 there,
      // so restrict the fidelity bound to vectors with signal
      .filter(aggregate(col("v"), lit(0.0), (a, x) => a + x * x) > 0.0)
      .select(graft.functions.expressions.CosineFns
        .cosineNative(col("v"), col("rv")).as("cos"))
    val minCos = q.agg(min("cos")).head().getDouble(0)
    // SQ8 at dim 64: per-component error <= absmax/254 keeps the angle tiny.
    assert(minCos >= 0.995, s"worst-case cosine fidelity too low: $minCos")
  }

  test("transform's audit metrics agree with q75's oracle-checked output") {
    // Same math, two surfaces: the per-vector max |rv - v| and saturation
    // count derived from the ARRAY transform must equal q75's scalar audit
    // (rounded to q75's 6 digits), guarding the two code paths against drift.
    val fromTransform = reconstructInt8(quantizeInt8(emb)).select(
      col("vec_id"),
      round(aggregate(zip_with(col("rv"), col("v"), (r, x) => abs(r - x)),
        lit(0.0), (acc, e) => greatest(acc, e)), 6).as("max_abs_err"),
      aggregate(col("qv"), lit(0L),
        (acc, x) => acc + when(abs(x.cast("int")) >= 127, 1L).otherwise(0L))
        .as("n_saturated"))
    val fromQ75 = SparkEntry.queries("q75_quantize_int8")(spark, sf)
      .select(col("vec_id"), col("max_abs_err"), col("n_saturated"))
    assert(fromTransform.except(fromQ75).isEmpty && fromQ75.except(fromTransform).isEmpty,
      "array-transform audit diverges from q75's scalar audit")
  }
}
