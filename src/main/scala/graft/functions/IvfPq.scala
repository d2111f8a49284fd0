package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes
import graft.functions.ProductQuantization.PQModel

/** IVF-PQ: the composed FAISS-style vector index — an IVF coarse quantizer
  * partitions the corpus into cells, each vector is stored as its PQ codes
  * (plus its cell id), and a query (a) picks its `nprobe` best cells by
  * centroid similarity, then (b) runs PQ asymmetric-distance scoring ONLY
  * over the codes in those cells. At 100 TB the scan side is the code
  * table (M bytes + a cell id per vector, 32x smaller than float32) and
  * each probe touches ~nprobe/cells of it; the float corpus is read only
  * at index-build time.
  *
  * Composition of the two oracle-anchored halves: cell assignment is q65's
  * centroid machinery (exact-decimal centroids, cosine, (score DESC, cell
  * ASC) ties), scoring is ProductQuantization.adcTopK's algebra restricted
  * per cell. Everything deterministic: retries and re-partitionings return
  * identical results (spec-checked).
  */
object IvfPq {

  private val Dec = DataTypes.createDecimalType(28, 12)

  /** The built index: bounded `centroids` (cell, cv) and the per-vector
    * code table (vec_id, cell, codes).
    */
  final case class Index(centroids: DataFrame, codes: DataFrame, model: PQModel)

  /** Build from a labeled embedding frame (vec_id, cell, v) — the cell
    * column is the IVF coarse assignment (a label, or lloydTrain's output);
    * PQ codebooks are trained on the same frame.
    */
  def build(emb: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
      maxIter: Int = 4): Index = {
    val (model, _) = ProductQuantization.train(
      emb.select(col("vec_id"), col("v")), dim, m, k, maxIter)
    val cents = emb.select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg((sum(col("x").cast(Dec)).cast("double") / count(lit(1))).as("c"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("cv"))
    val codes = ProductQuantization.encode(emb.select(col("vec_id"), col("v")), model)
      .join(emb.select(col("vec_id"), col("cell")), "vec_id")
    Index(cents, codes, model)
  }

  /** Search: probes (probe_id, pv) -> top-k (probe_id, rank, vec_id,
    * cell, adc_d2). Cell choice by centroid cosine (nprobe best), ADC
    * scoring within those cells only. `excludeSelf` drops the corpus
    * vector whose id equals the probe's (recall audits probe with corpus
    * members; the trivial self-hit would waste a result slot).
    */
  def search(probes: DataFrame, index: Index, nprobe: Int = 2,
      topK: Int = 10, excludeSelf: Boolean = false): DataFrame = {
    graft.functions.expressions.SqDistFns.register(probes.sparkSession)
    val wCell = Window.partitionBy("probe_id").orderBy(col("cscore").desc, col("cell").asc)
    val assigned = probes.crossJoin(broadcast(index.centroids))
      .withColumn("cscore", VectorFns.cosine(col("pv"), col("cv")))
      .withColumn("r", row_number().over(wCell)).filter(col("r") <= nprobe)
      .select(col("probe_id"), col("pv"), col("cell"))
    // per-(probe, subspace, centroid) exact distance table — probes * M * K
    // rows, broadcast; the code scan side never touches floats
    val probeSubs = assigned.select(col("probe_id"), col("cell"),
        explode(sequence(lit(0), lit(index.model.m - 1))).as("sub_id"), col("pv"))
      .select(col("probe_id"), col("cell"), col("sub_id"),
        slice(col("pv"), col("sub_id") * index.model.subDim + 1,
          lit(index.model.subDim)).as("psv"))
    val distTable = probeSubs
      .join(index.model.codebook.withColumnRenamed("cell", "code_cell")
        .withColumnRenamed("cv", "ccv"), Seq("sub_id"))
      .select(col("probe_id"), col("cell"), col("sub_id"),
        col("code_cell"),
        // native fused loop, bit-identical to the aggregate(zip_with(...))
        // fold (the probe table is tiny, but the expression keeps the whole
        // projection inside codegen); registered by the search entry below
        graft.functions.expressions.SqDistFns.sqDistNative(
          col("psv"), col("ccv")).as("d2"))
    val wRank = Window.partitionBy("probe_id").orderBy(col("adc_d2").asc, col("vec_id").asc)
    val scored = index.codes
      .select(col("vec_id"), col("cell"), posexplode(col("codes")).as(Seq("sub_id", "code_cell")))
      .join(broadcast(distTable), Seq("cell", "sub_id", "code_cell"))
      .groupBy("probe_id", "vec_id", "cell")
      .agg(sum(col("d2").cast(Dec)).cast("double").as("adc_d2"))
    (if (excludeSelf) scored.filter(col("vec_id") =!= col("probe_id")) else scored)
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("cell"), col("adc_d2"))
  }
}
