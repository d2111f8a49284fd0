package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Product quantization (PQ) — the codebook compression behind large-scale
  * ANN indexes (FAISS IVF-PQ style): split each D-dim vector into M
  * contiguous subvectors, k-means each subspace independently into K
  * centroids, and store each vector as M small codes (M bytes at K <= 256 —
  * 32x smaller than float32 at D=64/M=8). Search uses asymmetric distance
  * (ADC): the probe precomputes an M x K table of exact subspace distances
  * to every centroid, and each corpus vector's approximate distance is M
  * table lookups summed — no float vector is ever read at query time.
  *
  * Companion to the scalar paths: q75/quantizeInt8 (SQ8, 4x) and q80 (binary,
  * 64x, Hamming); PQ sits between — 32x with far better distance fidelity
  * than sign bits.
  *
  * Scale posture (100 TB): training iterates M independent k-means in ONE
  * distributed frame keyed by (sub_id, cell) — per-iteration cost is a
  * linear scan plus a (M*K x subDim)-sized centroid aggregate, and the
  * centroid table is always broadcast. Encoding is the same scan shape;
  * ADC search broadcasts the probes' M x K distance tables and streams the
  * codes. Per-round `localCheckpoint` truncates the loop's lineage (the
  * lloydTrain idiom); driver state is bounded telemetry, never row data.
  *
  * Determinism: centroid components accumulate in DECIMAL(28,12) (bit-
  * reproducible under any partitioning — the q62/q73 rule); assignment ties
  * break on cell id; initial cells come from a hash of (vec_id, sub_id), so
  * retraining on the same input yields identical codebooks on any cluster.
  */
object ProductQuantization {

  /** Trained model: `codebook` is (sub_id, cell, cv: array<double>) with
    * M*K rows — always broadcast-sized.
    */
  final case class PQModel(codebook: DataFrame, m: Int, k: Int, subDim: Int)

  /** Per-iteration telemetry (same witness as lloydTrain). */
  final case class PQIter(iter: Int, churn: Long, avgSqDist: Double)

  private val Dec = DataTypes.createDecimalType(28, 12)

  /** Squared L2 distance between two equal-length double arrays — the
    * native fused loop ([[graft.functions.expressions.SquaredDistance]]),
    * bit-identical to the `aggregate(zip_with(...))` left fold it replaced
    * (same IEEE op sequence; HOFs run interpreted with a lambda frame per
    * element, and this sits inside the corpus x K training/encode stages).
    * Callers register via [[ensureRegistered]] at their public entry points.
    */
  private def sqDist(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    graft.functions.expressions.SqDistFns.sqDistNative(a, b)

  private def ensureRegistered(df: DataFrame): Unit =
    graft.functions.expressions.SqDistFns.register(df.sparkSession)

  /** Explode (vec_id, v) into M subvector rows (vec_id, sub_id, sv). */
  private def subvectors(emb: DataFrame, m: Int, subDim: Int): DataFrame =
    emb.select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("sub_id"), col("v"))
      .select(col("vec_id"), col("sub_id"),
        slice(col("v"), col("sub_id") * subDim + 1, lit(subDim)).as("sv"))

  /** (sub_id, cell)-keyed exact-decimal centroids of an assignment frame
    * (vec_id, sub_id, sv, cell) — the M-subspace generalization of the IVF
    * centroidsFor. Output is M*K x subDim: broadcast-sized by construction.
    */
  private def centroids(assigned: DataFrame): DataFrame =
    assigned.select(col("sub_id"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
      .groupBy("sub_id", "cell", "pos")
      .agg((sum(col("x").cast(Dec)).cast("double") / count(lit(1))).as("c"))
      .groupBy("sub_id", "cell")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        e => e.getField("c")).as("cv"))

  /** One reassignment pass: each subvector to its nearest (squared-L2)
    * centroid within its own subspace; ties break on cell id.
    */
  private def reassign(subs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id", "sub_id")
      .orderBy(col("d2").asc, col("c_cell").asc)
    subs.join(broadcast(cents.select(col("sub_id"), col("cell").as("c_cell"), col("cv"))),
        Seq("sub_id"))
      .withColumn("d2", sqDist(col("sv"), col("cv")))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("sub_id"), col("sv"),
        col("c_cell").as("cell"), col("d2"))
  }

  /** Train M independent K-means codebooks over `emb` (vec_id, v) with
    * `dim` = M * subDim. Stops on zero churn or `maxIter`.
    */
  def train(emb: DataFrame, dim: Int, m: Int = 8, k: Int = 16,
      maxIter: Int = 5): (PQModel, Seq[PQIter]) = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    ensureRegistered(emb)
    val subDim = dim / m
    // deterministic spread-out init: Murmur3 hash of (vec_id, sub_id) mod k
    var cur = subvectors(emb, m, subDim)
      .withColumn("cell", pmod(hash(col("vec_id"), col("sub_id")), lit(k)))
      .localCheckpoint()
    val history = scala.collection.mutable.ArrayBuffer.empty[PQIter]
    var iter = 0
    var converged = false
    var cents = centroids(cur).localCheckpoint()
    while (!converged && iter < maxIter) {
      iter += 1
      val next = reassign(cur.select(col("vec_id"), col("sub_id"), col("sv")), cents)
        .localCheckpoint()
      val stats = next
        .join(cur.select(col("vec_id"), col("sub_id"), col("cell").as("prev_cell")),
          Seq("vec_id", "sub_id"))
        .agg(sum(when(col("cell") =!= col("prev_cell"), 1L).otherwise(0L)).as("churn"),
          (sum(col("d2").cast(Dec)).cast("double") / count(lit(1))).as("avg"))
        .head()
      history += PQIter(iter, stats.getLong(0), stats.getDouble(1))
      converged = stats.getLong(0) == 0L
      cur = next
      cents = centroids(cur.select(col("vec_id"), col("sub_id"), col("sv"), col("cell")))
        .localCheckpoint()
    }
    (PQModel(cents, m, k, subDim), history.toSeq)
  }

  /** Zero-iteration codebook: exact-decimal centroids of the DETERMINISTIC
    * `(vec_id + sub_id) % k` initial assignment — the [[trainStepAudit]]
    * init frozen into a servable model. Unlike [[train]] (whose Lloyd loop
    * is only step-auditable), this codebook is a closed-form aggregate an
    * external engine can reproduce in pure SQL, which is what makes an
    * IVF-PQ serving path ORACLE-GATEABLE end to end (q133). Quality is
    * init-grade by construction; production indexes freeze [[train]]'s
    * output instead and lean on the spec-level equivalence proofs.
    */
  def initCodebook(emb: DataFrame, dim: Int, m: Int, k: Int): PQModel = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val subs = subvectors(emb, m, subDim)
      .withColumn("cell", pmod(col("vec_id") + col("sub_id"), lit(k)))
    PQModel(centroids(subs), m, k, subDim)
  }

  /** One PQ training step as an auditable rollup (the q73/q74 pattern
    * applied to PQ, SQL-mirrorable end to end): a deterministic
    * `(vec_id + sub_id) % k` initial assignment (init quality is irrelevant
    * to an audit of the step algebra), one exact-decimal centroid pass, one
    * squared-L2 reassignment, then per-(subspace, cell) membership, churn
    * and distortion. Same shapes and tie-breaks as the production `train`
    * loop — this is the oracle-checked witness for its per-iteration step.
    */
  def trainStepAudit(emb: DataFrame, dim: Int, m: Int, k: Int): DataFrame = {
    ensureRegistered(emb)
    val subDim = dim / m
    // localCheckpoint: three consumers (centroid pass, reassign, prev_cell
    // join) would otherwise each re-run the subvector explode pipeline
    val subs = subvectors(emb, m, subDim)
      .withColumn("cell", pmod(col("vec_id") + col("sub_id"), lit(k)))
      .localCheckpoint()
    val cents = centroids(subs)
    reassign(subs.select(col("vec_id"), col("sub_id"), col("sv")), cents)
      .join(subs.select(col("vec_id"), col("sub_id"), col("cell").as("prev_cell")),
        Seq("vec_id", "sub_id"))
      .groupBy("sub_id", "cell")
      .agg(count(lit(1)).as("n_subvectors"),
        sum(when(col("prev_cell") =!= col("cell"), 1L).otherwise(0L)).as("n_moved_in"),
        round(sum(col("d2").cast(Dec)).cast("double") / count(lit(1)), 4).as("avg_sq_dist"))
      .orderBy("sub_id", "cell")
  }

  /** Encode vectors to codes: (vec_id, codes array<int>), codes[i] = the
    * cell of subspace i. Linear scan against the broadcast codebook.
    */
  def encode(emb: DataFrame, model: PQModel): DataFrame = {
    ensureRegistered(emb)
    reassign(subvectors(emb, model.m, model.subDim), model.codebook)
      .groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("sub_id"), col("cell")))),
        e => e.getField("cell")).as("codes"))
  }

  /** Reconstruct approximate vectors from codes: concatenate each code's
    * centroid in subspace order.
    */
  def decode(codes: DataFrame, model: PQModel): DataFrame =
    codes.select(col("vec_id"), posexplode(col("codes")).as(Seq("sub_id", "cell")))
      .join(broadcast(model.codebook), Seq("sub_id", "cell"))
      .groupBy("vec_id")
      .agg(flatten(transform(array_sort(collect_list(struct(col("sub_id"), col("cv")))),
        e => e.getField("cv"))).as("rv"))

  /** ADC top-k search: probes (probe_id, pv) against encoded corpus
    * (vec_id, codes). The probe x codebook distance table (probes * M * K
    * rows of exact subspace distances) is broadcast; each corpus vector
    * costs M joins-by-lookup + a sum — the float corpus is never touched.
    */
  def adcTopK(probes: DataFrame, codes: DataFrame, model: PQModel, topK: Int = 10): DataFrame = {
    ensureRegistered(probes)
    val probeSubs = probes
      .select(col("probe_id"), explode(sequence(lit(0), lit(model.m - 1))).as("sub_id"),
        col("pv"))
      .select(col("probe_id"), col("sub_id"),
        slice(col("pv"), col("sub_id") * model.subDim + 1, lit(model.subDim)).as("psv"))
    val distTable = probeSubs.join(model.codebook, Seq("sub_id"))
      .select(col("probe_id"), col("sub_id"), col("cell"),
        sqDist(col("psv"), col("cv")).as("d2"))
    val w = Window.partitionBy("probe_id").orderBy(col("adc_d2").asc, col("vec_id").asc)
    codes.select(col("vec_id"), posexplode(col("codes")).as(Seq("sub_id", "cell")))
      .join(broadcast(distTable), Seq("sub_id", "cell"))
      .groupBy("probe_id", "vec_id")
      // exact decimal sum of the M lookups: bit-reproducible ranking
      .agg(sum(col("d2").cast(Dec)).cast("double").as("adc_d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("vec_id"), col("adc_d2"))
  }
}
