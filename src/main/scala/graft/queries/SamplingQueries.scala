package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Tables._

/** Sampling operators for training-data mixture construction (builder
  * contract extension): per-stratum mixture weighting and deterministic
  * dataset splits. Selection is a pure function of a salted md5 of the row
  * key compared against an 8-hex-digit threshold — P(md5_8 < t) == t/16^8
  * under md5 uniformity — so sampling is:
  *   - reproducible (no RNG state, no partition-order dependence: the same
  *     row is selected on any cluster size, any retry),
  *   - exactly DuckDB-mirrorable (string compare on the same hex),
  *   - shuffle-free at 100 TB: one embarrassingly-parallel scan.
  *
  * This hash-threshold idiom is the distributed replacement for
  * `df.sample()` (whose Bernoulli draw depends on partition layout and
  * seed plumbing) whenever reproducibility across runs matters — which for
  * training-data lineage is always.
  */
object SamplingQueries {

  /** Per-language mixture rates as hex thresholds (rate = thr/16^8). */
  private val MixThresholds: Seq[(String, String)] = Seq(
    "en" -> "c0000000", // 0.75
    "de" -> "80000000", // 0.50
    "fr" -> "40000000", // 0.25
    "es" -> "20000000") // 0.125
  private val DefaultThreshold = "10000000" // 0.0625 for other langs

  // train < cc000000 (~0.797) <= val < e6000000 (~0.898) <= test
  private val TrainEnd = "cc000000"
  private val ValEnd = "e6000000"

  private val TokenBudget = 2048 // packing bin size (tokens)
  private val SourceTokenBudget = 600L // q121: per-source mixture budget
  private val PackerBuckets = 8  // independent greedy packers
  private val PpsTargetK = 10L   // q124: samples per stratum

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mixture-weighted stratified sample: each language kept at its own
    // rate, selection key emitted for lineage/audit.
    "q66_mixture_sample" -> { (s, dir) =>
      val thr = MixThresholds.foldRight(lit(DefaultThreshold)) {
        case ((lang, t), els) => when(col("lang") === lang, lit(t)).otherwise(els)
      }
      spread(read(s, dir, "documents"))
        .withColumn("sample_key", substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 8))
        .withColumn("thr", thr)
        .filter(col("sample_key") < col("thr"))
        .select(col("doc_id"), col("lang"), col("sample_key"))
        .orderBy("doc_id")
    },

    // Sequence-packing plan: assign documents to fixed-token-budget bins for
    // training-batch construction. Greedy packing is inherently sequential,
    // so the scan is FIRST hash-bucketed into independent packer groups and
    // the running token sum runs per bucket — the window parallelizes across
    // buckets instead of serializing on one global cumsum (the 100 TB
    // version of "sort then pack").
    "q68_packing_plan" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val t = spread(read(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          size(graft.functions.TextFns.tokens(col("text"))).as("n_tokens"))
        // % not pmod: the oracle's DuckDB % keeps the dividend's sign, and
        // the two must bucket identically should a negative id ever appear
        .withColumn("bucket", col("doc_id") % PackerBuckets)
      val w = Window.partitionBy("bucket").orderBy("doc_id")
      t.withColumn("cum", sum("n_tokens").over(w))
        .withColumn("bin", expr(s"(cum - n_tokens) div $TokenBudget"))
        .groupBy("bucket", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
        .orderBy("bucket", "bin")
    },

    // Deterministic 80/10/10 train/val/test split + per-split language mix —
    // the lineage-auditable form of dataset partitioning.
    "q67_dataset_split" -> { (s, dir) =>
      val key = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8)
      spread(read(s, dir, "documents"))
        .withColumn("split",
          when(key < TrainEnd, "train").when(key < ValEnd, "val").otherwise("test"))
        .groupBy("split", "lang").agg(count(lit(1)).as("n"))
        .orderBy("split", "lang")
    },

    // Class-balanced downsampling: every label kept at exactly the SMALLEST
    // stratum's size (the classifier-training counter to q66's weighted
    // mixture). Selection is a salted-md5 ranking per label — deterministic
    // under retries/repartitioning — and WindowGroupLimit caps what each
    // partition ships before the stratum shuffle. The min-size threshold is
    // a one-row broadcast scalar.
    "q99_balanced_sample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val target = read(s, dir, "embeddings")
        .groupBy("label").agg(count(lit(1)).as("cnt"))
        .agg(min("cnt").as("target"))
      val w = Window.partitionBy("label").orderBy("sample_key", "vec_id")
      read(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          md5(concat(lit("bal:"), col("vec_id").cast("string"))).as("sample_key"))
        .withColumn("rk", row_number().over(w))
        .crossJoin(broadcast(target))
        .filter(col("rk") <= col("target"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"), min("vec_id").as("first_vec"))
        .orderBy("label")
    },

    // Token-BUDGET mixture fill — the pretraining-mix operator q66's RATE
    // sampling approximates: each source contributes documents, in
    // deterministic salted-key order, until its token budget fills (greedy
    // prefix: the first doc that would overflow stops the source; no
    // back-fill — semantics the oracle mirrors exactly). One keyed window
    // (per-source running token sum) over a linear scan; budgets are
    // per-source constants so the cut is a pure filter, no second pass.
    "q121_token_budget_mix" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("sample_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spread(read(s, dir, "documents"))
        .select(col("doc_id"), col("source"),
          size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens"),
          substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 8)
            .as("sample_key"))
        .withColumn("cum_tokens", sum("n_tokens").over(w))
        .filter(col("cum_tokens") <= SourceTokenBudget)
        .orderBy("source", "sample_key", "doc_id")
    },

    // Split-drift audit: per-language two-sample Kolmogorov–Smirnov statistic
    // between the train and test token-length distributions (q67's md5
    // split). The one data-QA number a split ships with: ks ≈ 0 certifies
    // the held-out set is distributionally exchangeable with training.
    // Exact at any scale: both empirical CDFs jump only at observed values,
    // so sup|F_tr−F_te| is the max over (lang, n_tokens) groups of the
    // INTEGER cross-product difference |cum_tr·tot_te − cum_te·tot_tr| —
    // the max is computed in exact int64 arithmetic (partition-order-free,
    // no float accumulation) and divided by tot_tr·tot_te once at the end.
    // Shape: linear scan → tiny (lang × distinct-length) agg → keyed window
    // → per-lang agg. Languages with an empty side are dropped (KS
    // undefined), declared semantics both engines share.
    "q123_ks_drift" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val key = substring(md5(concat(lit("split:"), col("doc_id").cast("string"))), 1, 8)
      val counts = spread(read(s, dir, "documents"))
        .withColumn("split",
          when(key < TrainEnd, "train").when(key < ValEnd, "val").otherwise("test"))
        .filter(col("split") =!= "val")
        .select(col("lang"), col("split"),
          size(graft.functions.TextFns.tokens(col("text"))).cast("long").as("n_tokens"))
        .groupBy("lang", "n_tokens")
        .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("c_tr"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("c_te"))
      val cdf = Window.partitionBy("lang").orderBy("n_tokens")
      val tot = Window.partitionBy("lang")
      counts
        .withColumn("cum_tr", sum("c_tr").over(cdf))
        .withColumn("cum_te", sum("c_te").over(cdf))
        .withColumn("tot_tr", sum("c_tr").over(tot))
        .withColumn("tot_te", sum("c_te").over(tot))
        .groupBy("lang")
        .agg(max("tot_tr").as("n_train"), max("tot_te").as("n_test"),
          max(abs(col("cum_tr") * col("tot_te") - col("cum_te") * col("tot_tr")))
            .as("ks_num"))
        .filter(col("n_train") > 0 && col("n_test") > 0)
        .select(col("lang"), col("n_train"), col("n_test"),
          round(col("ks_num").cast("double")
            / (col("n_train") * col("n_test")).cast("double"), 6).as("ks"))
        .orderBy("lang")
    },

    // Weighted (probability-proportional-to-size) systematic sample: ~k docs
    // per language, selection probability proportional to document LENGTH —
    // the "sample by token mass, not doc count" form corpus audits need
    // (uniform doc sampling under-represents long documents' share of the
    // training tokens). Deterministic PPS: docs order by salted md5 key,
    // weights cumsum, and a doc is selected iff its weight span [cum−w, cum)
    // crosses a multiple of step = ⌊W/k⌋ — pure int64 arithmetic, no RNG, no
    // transcendental key (an Efraimidis–Spirakis u^(1/w) key would hinge on
    // pow() ULPs differing across engines). Same shape as q121: one keyed
    // window over a linear scan; big docs (w ≥ step) are selected with
    // certainty, the systematic-sampling contract.
    "q124_pps_sample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ord = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
      val w = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spread(read(s, dir, "documents"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          substring(md5(concat(lit("pps:"), col("doc_id").cast("string"))), 1, 8)
            .as("sample_key"))
        .withColumn("cum", sum("n_chars").over(w))
        .withColumn("total", sum("n_chars").over(Window.partitionBy("lang")))
        .withColumn("step", greatest(expr(s"total div $PpsTargetK"), lit(1L)))
        .filter(expr("cum div step") > expr("(cum - n_chars) div step"))
        .select(col("lang"), col("doc_id"), col("n_chars"), col("cum"))
        .orderBy("lang", "cum", "doc_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "q124_pps_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, n_chars,
         |    substring(md5('pps:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, lang, n_chars,
         |    CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY sample_key, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |    greatest(CAST(sum(n_chars) OVER (PARTITION BY lang) AS BIGINT) // $PpsTargetK,
         |      1) AS step
         |  FROM d)
         |SELECT lang, doc_id, n_chars, cum FROM c
         |WHERE cum // step > (cum - n_chars) // step
         |ORDER BY lang, cum, doc_id""".stripMargin,

    "q123_ks_drift" ->
      s"""WITH d AS (
         |  SELECT lang,
         |    CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens,
         |    CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '$TrainEnd' THEN 'train'
         |         WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '$ValEnd' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |c AS (
         |  SELECT lang, n_tokens,
         |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS c_tr,
         |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS c_te
         |  FROM d WHERE split <> 'val' GROUP BY lang, n_tokens),
         |k AS (
         |  SELECT lang,
         |    CAST(sum(c_tr) OVER (PARTITION BY lang ORDER BY n_tokens) AS BIGINT) AS cum_tr,
         |    CAST(sum(c_te) OVER (PARTITION BY lang ORDER BY n_tokens) AS BIGINT) AS cum_te,
         |    CAST(sum(c_tr) OVER (PARTITION BY lang) AS BIGINT) AS tot_tr,
         |    CAST(sum(c_te) OVER (PARTITION BY lang) AS BIGINT) AS tot_te
         |  FROM c)
         |SELECT lang, max(tot_tr) AS n_train, max(tot_te) AS n_test,
         |  round(CAST(max(abs(cum_tr * tot_te - cum_te * tot_tr)) AS DOUBLE)
         |    / (max(tot_tr) * max(tot_te)), 6) AS ks
         |FROM k GROUP BY lang
         |HAVING max(tot_tr) > 0 AND max(tot_te) > 0
         |ORDER BY lang""".stripMargin,

    "q121_token_budget_mix" ->
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_tokens,
         |    substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key
         |  FROM documents),
         |c AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY source
         |    ORDER BY sample_key, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM d)
         |SELECT doc_id, source, n_tokens, sample_key, cum_tokens FROM c
         |WHERE cum_tokens <= $SourceTokenBudget
         |ORDER BY source, sample_key, doc_id""".stripMargin,

    "q66_mixture_sample" -> {
      val thrCase = MixThresholds.map { case (l, t) => s"WHEN lang = '$l' THEN '$t'" }
        .mkString("CASE ", " ", s" ELSE '$DefaultThreshold' END")
      s"""SELECT doc_id, lang, sample_key FROM (
         |  SELECT doc_id, lang,
         |    substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key,
         |    $thrCase AS thr
         |  FROM documents)
         |WHERE sample_key < thr ORDER BY doc_id""".stripMargin
    },

    "q68_packing_plan" ->
      s"""SELECT bucket, bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
         |FROM (
         |  SELECT bucket, CAST((cum - n_tokens) // $TokenBudget AS BIGINT) AS bin, n_tokens FROM (
         |    SELECT doc_id, doc_id % $PackerBuckets AS bucket,
         |      len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS n_tokens,
         |      sum(len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')))
         |        OVER (PARTITION BY doc_id % $PackerBuckets ORDER BY doc_id) AS cum
         |    FROM documents))
         |GROUP BY bucket, bin ORDER BY bucket, bin""".stripMargin,

    "q67_dataset_split" ->
      s"""SELECT split, lang, count(*) AS n FROM (
         |  SELECT lang,
         |    CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '$TrainEnd' THEN 'train'
         |         WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < '$ValEnd' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents)
         |GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    "q99_balanced_sample" ->
      """WITH m AS (SELECT min(cnt) AS target FROM (
        |    SELECT count(*) AS cnt FROM embeddings GROUP BY label)),
        |r AS (SELECT vec_id, label, row_number() OVER (PARTITION BY label
        |    ORDER BY md5('bal:' || CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |  FROM embeddings)
        |SELECT label, CAST(count(*) AS BIGINT) AS n, min(vec_id) AS first_vec
        |FROM r CROSS JOIN m WHERE rk <= m.target
        |GROUP BY label ORDER BY label""".stripMargin
  )
}
