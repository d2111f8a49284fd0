package graft

import org.apache.spark.sql.functions._
import graft.functions.{IvfPq, ProductQuantization}

/** IVF-PQ composition: probing ALL cells must reproduce plain PQ/ADC
  * ranking exactly (the restriction is the only difference), nprobe=2
  * search keeps useful recall vs exact cosine, and results are
  * partition-independent.
  */
class IvfPqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"), col("label").cast("int").as("cell"),
      col("embedding").cast("array<double>").as("v"))
  private lazy val index = IvfPq.build(emb, dim = 64)
  private lazy val probes = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("probe_id"), col("v").as("pv"))

  test("probing all cells == plain ADC over the whole code table") {
    val nCells = index.centroids.count().toInt
    val all = IvfPq.search(probes, index, nprobe = nCells, topK = 10)
      .select("probe_id", "rank", "vec_id").collect().toSet
    val plain = ProductQuantization.adcTopK(probes,
        index.codes.select("vec_id", "codes"), index.model, topK = 10)
      .select("probe_id", "rank", "vec_id").collect().toSet
    assert(all == plain, "all-cell IVF-PQ search diverged from plain ADC")
  }

  test("nprobe=2 search: recall@10 vs exact cosine stays useful; scan is cell-bounded") {
    val res = IvfPq.search(probes, index, nprobe = 2, topK = 10).cache()
    assert(res.groupBy("probe_id").count().collect().forall(_.getLong(1) == 10))
    // every hit comes from one of the probe's 2 assigned cells
    assert(res.select("probe_id", "cell").distinct().groupBy("probe_id").count()
      .collect().forall(_.getLong(1) <= 2))
    val exact = SparkEntry.queries("q60_cosine_topk")(spark, sf)
      .select("probe_id", "vec_id")
    val hits = exact.join(res.select("probe_id", "vec_id"), Seq("probe_id", "vec_id"))
      .count()
    assert(hits >= 5, s"IVF-PQ recall collapsed: $hits/50 exact-cosine neighbors recovered")
  }

  test("search is partition-independent") {
    val a = IvfPq.search(probes, index, nprobe = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val shuffled = index.copy(codes = index.codes.repartition(13))
    val b = IvfPq.search(probes.repartition(7), shuffled, nprobe = 2, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "IVF-PQ search depends on partitioning")
  }
}
