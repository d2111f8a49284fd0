package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VectorFns}
import graft.functions.expressions.TextVectorFns

/** The fused LshSignature / TokenSetCount expressions must agree bit-for-bit
  * with the composable higher-order-function forms they replace — that
  * identity is what keeps the q50/q51/q52/q61 DuckDB oracles valid after
  * swapping the queries to the fast path.
  */
class TextVectorExprSpec extends SparkSpec {

  test("lsh_signature native == fold form on real embeddings") {
    TextVectorFns.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
    val both = emb
      .withColumn("fold", VectorFns.lshSignature(col("v"), 8, 64))
      .withColumn("native", TextVectorFns.lshSignatureNative(col("v"), 8, 64))
    val diff = both.filter(col("fold") =!= col("native")).count()
    assert(diff == 0, s"$diff rows differ between fold and native signature")
    // sanity: signatures have real spread (not constant)
    assert(both.select("native").distinct().count() > 1)
  }

  test("lsh_signature: null element -> all-zeros; short array -> NULL") {
    TextVectorFns.register(spark)
    val rows = spark.sql(
      """SELECT
        |  lsh_signature(array(1.0d, 2.0d, 3.0d, CAST(NULL AS DOUBLE)), 4, 4) AS withNull,
        |  lsh_signature(array(1.0d, 2.0d), 4, 4) AS short""".stripMargin).head()
    assert(rows.getString(0) == "0000")
    assert(rows.isNullAt(1))
  }

  test("token_set_count native == filter/isin fold form on documents") {
    TextVectorFns.register(spark)
    val toks = TextFns.tokens(col("text"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("fold", TextFns.stopwordCount(toks))
      .withColumn("native", TextVectorFns.tokenSetCountNative(toks, TextFns.stopwords))
    val diff = docs.filter(col("fold") =!= col("native")).count()
    assert(diff == 0, s"$diff rows differ between fold and native stopword count")
    // markers too (all four languages)
    val markerDiff = TextFns.langMarkers.map { case (_, ms) =>
      spark.read.parquet(s"$sf/documents.parquet")
        .withColumn("fold", TextFns.markerScore(toks, ms))
        .withColumn("native", TextVectorFns.tokenSetCountNative(toks, ms))
        .filter(col("fold") =!= col("native")).count()
    }.sum
    assert(markerDiff == 0)
  }

  test("token_set_count: null elements skipped, NULL array -> NULL") {
    TextVectorFns.register(spark)
    val r = spark.sql(
      """SELECT
        |  token_set_count(array('the', CAST(NULL AS STRING), 'x', 'of'), 'the', 'of') AS c,
        |  token_set_count(CAST(NULL AS ARRAY<STRING>), 'the') AS n""".stripMargin).head()
    assert(r.getInt(0) == 2)
    assert(r.isNullAt(1))
  }

  test("sign_bits native == fold form on real embeddings (both q80 halves)") {
    import graft.functions.expressions.SignBitsFns
    SignBitsFns.register(spark)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
    def fold(msb: Int) = aggregate(sequence(lit(0), lit(31)), lit(0L),
      (acc, i) => acc * 2 + when(get(col("v"), lit(msb) - i) >= 0.0, 1L).otherwise(0L))
    val both = emb
      .withColumn("fh", fold(63)).withColumn("fl", fold(31))
      .withColumn("nh", SignBitsFns.signBitsNative(col("v"), lit(63)))
      .withColumn("nl", SignBitsFns.signBitsNative(col("v"), lit(31)))
    val diff = both.filter(col("fh") =!= col("nh") || col("fl") =!= col("nl")).count()
    assert(diff == 0, s"$diff rows differ between fold and native sign bits")
    assert(both.select("nh").distinct().count() > 1)
  }

  test("sign_bits: null/out-of-range elements are 0 bits; bounds hold") {
    import graft.functions.expressions.SignBitsFns
    SignBitsFns.register(spark)
    val r = spark.sql(
      """SELECT
        |  sign_bits_native(array(1.0d, -1.0d, CAST(NULL AS DOUBLE)), 31) AS withnull,
        |  sign_bits_native(array(1.0d), 31) AS short,
        |  sign_bits_native(CAST(NULL AS ARRAY<DOUBLE>), 31) AS narr""".stripMargin).head()
    // MSB-first fold with msb=31: element 0 is processed last (weight 2^0);
    // element 1 is negative and element 2 NULL (both 0 bits), dims 3..31
    // out of range (0 bits) -> the whole signature is exactly 1
    assert(r.getLong(0) == 1L, s"null element must be a 0 bit, got ${r.getLong(0)}")
    assert(r.getLong(1) == 1L)
    assert(r.isNullAt(2))
  }

  test("char_entropy: known distributions, empty, unicode fallback, NULL") {
    TextVectorFns.register(spark)
    val r = spark.sql(
      """SELECT
        |  char_entropy('aabb') AS h2,
        |  char_entropy('abcd') AS h4,
        |  char_entropy('aaaa') AS h0,
        |  char_entropy('') AS he,
        |  char_entropy('ééaa') AS hu,
        |  char_entropy(CAST(NULL AS STRING)) AS hn""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)   // two symbols, 50/50
    assert(math.abs(r.getDouble(1) - 2.0) < 1e-12)   // four uniform symbols
    assert(r.getDouble(2) == 0.0)                    // constant string
    assert(r.getDouble(3) == 0.0)                    // empty -> 0 by definition
    // multi-byte é forces the code-point fallback path; distribution is
    // still two symbols at 50/50 -> exactly 1 bit
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
    assert(r.isNullAt(5))
  }

  test("char_entropy: codegen == eval on real docs; natural-text band") {
    TextVectorFns.register(spark)
    // The executor side runs the codegen'd path; recomputing on the driver
    // calls eval() directly — bit-equality checks both paths agree on every
    // real document.
    import graft.functions.expressions.CharEntropy
    import org.apache.spark.unsafe.types.UTF8String
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"), TextVectorFns.charEntropyNative(col("text")).as("h"))
      .collect()
    docs.foreach { row =>
      val expected = CharEntropy.compute(UTF8String.fromString(row.getString(0)))
      assert(row.getDouble(1) == expected,
        s"codegen/eval divergence on ${row.getString(0).take(40)}")
    }
    // entropy of natural-language text sits in a sane band
    assert(docs.forall(r => r.getDouble(1) > 2.0 && r.getDouble(1) < 6.0))
  }
}
