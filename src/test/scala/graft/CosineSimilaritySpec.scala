package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFns
import graft.functions.expressions.CosineFns

/** The native codegen'd cosine expression must agree bit-for-bit with the
  * composable fold form (same left-to-right double-add sequence) — that
  * identity is what keeps the DuckDB oracles valid after swapping q60/q61
  * to the fast path.
  */
class CosineSimilaritySpec extends SparkSpec {

  test("native expression == higher-order-function fold, bit for bit") {
    CosineFns.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
    val a = emb.limit(50).select(col("vec_id").as("ida"), col("v").as("va"))
    val b = emb.limit(50).select(col("vec_id").as("idb"), col("v").as("vb"))
    val pairs = a.crossJoin(b)
      .withColumn("fold", VectorFns.cosine(col("va"), col("vb")))
      .withColumn("native", CosineFns.cosineNative(col("va"), col("vb")))
    val diff = pairs.filter(col("fold") =!= col("native")).count()
    assert(diff == 0, s"$diff pairs differ between fold and native cosine")
  }

  test("null element -> NULL, matching the fold form's null poisoning") {
    CosineFns.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_native(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d)) AS a,
        |  cosine_native(array(1.0d, 2.0d), array(1.0d, CAST(NULL AS DOUBLE))) AS b,
        |  cosine_native(array(1.0d, 2.0d), array(1.0d)) AS ragged""".stripMargin).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("works from SQL text too") {
    CosineFns.register(spark)
    val one = spark.sql(
      "SELECT cosine_native(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head().getDouble(0)
    assert(math.abs(one - 1.0) < 1e-15)
    val orth = spark.sql(
      "SELECT cosine_native(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS c").head().getDouble(0)
    assert(orth == 0.0)
  }
}
