package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.TextFns._
import graft.functions.expressions.TextVectorFns
import Tables._

/** Text-analysis surface over `documents` (builder contract §extensions):
  * token counting (whitespace + BPE-ish regex), quality scoring, language-ID
  * (marker-token heuristic), and document fingerprinting. All pure column
  * expressions — at 100 TB this is one embarrassingly-parallel scan, no
  * shuffle until the final (tiny) aggregate where present.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token + char counting, two tokenizers (whitespace and a BPE-ish regex).
    "q50_token_stats" -> { (s, dir) =>
      TextVectorFns.register(s)
      val t = spread(read(s, dir, "documents"))
      t.select(col("doc_id"),
          length(col("text")).as("n_chars_m"),
          size(tokens(col("text"))).as("n_tokens"),
          regexpTokens(normalize(col("text"))).as("n_subtokens"),
          TextVectorFns.tokenSetCountNative(tokens(col("text")), stopwords).as("n_stopwords"))
        .withColumn("stop_ratio", col("n_stopwords").cast("double") / col("n_tokens"))
        .orderBy("doc_id")
    },

    // Quality scoring: length, punctuation ratio, mean word length, verdict.
    "q51_quality" -> { (s, dir) =>
      TextVectorFns.register(s)
      val t = spread(read(s, dir, "documents"))
      val toks = tokens(col("text"))
      val nonWs = length(regexp_replace(col("text"), "\\s", ""))
      t.select(col("doc_id"), col("lang"),
          size(toks).as("n_tokens"),
          (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", ""))).as("n_punct"),
          (nonWs.cast("double") / size(toks)).as("avg_word_len"),
          TextVectorFns.tokenSetCountNative(toks, stopwords).as("n_stop"))
        .withColumn("punct_ratio", col("n_punct").cast("double") / col("n_tokens"))
        .withColumn("quality_ok",
          col("n_tokens").between(5, 10000) &&
          col("punct_ratio") < 0.3 &&
          col("avg_word_len").between(2.0, 12.0))
        .orderBy("doc_id")
    },

    // Language-ID via marker tokens; output is the (declared lang x predicted
    // lang) confusion matrix — small result, deterministic argmax.
    "q52_langid" -> { (s, dir) =>
      TextVectorFns.register(s)
      val t = spread(read(s, dir, "documents"))
      val toks = tokens(col("text"))
      val scoreCols = Seq(col("doc_id"), col("lang")) ++
        langMarkers.map { case (l, ms) =>
          TextVectorFns.tokenSetCountNative(toks, ms).as(s"s_$l") }
      val scored = t.select(scoreCols: _*)
      val pred = predictLang(langMarkers.map { case (l, _) => l -> col(s"s_$l") })
      scored.withColumn("pred_lang", pred)
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
        .orderBy("lang", "pred_lang")
    },

    // Document fingerprinting: full-text md5, normalized md5, 80-char-prefix
    // md5 (the near-dup blocking key used by the dedup family).
    "q53_fingerprints" -> { (s, dir) =>
      spread(read(s, dir, "documents"))
        .select(col("doc_id"),
          md5(col("text")).as("fp_raw"),
          md5(normalize(col("text"))).as("fp_norm"),
          md5(substring(normalize(col("text")), 1, 80)).as("fp_prefix80"))
        .orderBy("doc_id")
    },

    // Per-group statistical outliers, integer-exact: flag docs whose length
    // is >2 population stddevs from their source's mean WITHOUT computing
    // mean/stddev in floating point — z² > K² rearranges to
    // (n·x − s₁)² > K²·(n·s₂ − s₁²), all integer arithmetic (DECIMAL(38,0)
    // here, HUGEINT in the oracle), so the comparison is bit-identical
    // across engines at any scale. One tiny per-source stats aggregate,
    // broadcast back onto a linear scan.
    "q94_outlier_docs" -> { (s, dir) =>
      val big = DecimalType(38, 0)
      val d = read(s, dir, "documents")
      val stats = d.groupBy("source").agg(
        count(lit(1)).cast(big).as("sn"),
        sum(col("n_chars").cast(big)).as("s1"),
        sum((col("n_chars") * col("n_chars")).cast(big)).as("s2"))
      val dev = col("sn") * col("n_chars").cast(big) - col("s1")
      d.join(broadcast(stats), "source")
        .filter(dev * dev > lit(4) * (col("sn") * col("s2") - col("s1") * col("s1")))
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    },

    // Curriculum bucketing: ntile(10) over length within each language,
    // then per-bucket count and length range — the standard "sort corpus
    // into difficulty deciles" pass. ntile's definition (equal-count tiles,
    // earlier tiles get the remainder) is identical in both engines given
    // the same total order, which the doc_id tiebreak pins.
    "q95_ntile_buckets" -> { (s, dir) =>
      val w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
      read(s, dir, "documents")
        .withColumn("bucket", ntile(10).over(w).cast("long"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n"), min("n_chars").as("lo"), max("n_chars").as("hi"))
        .orderBy("lang", "bucket")
    },

    // Character-entropy quality scan: per-doc Shannon entropy (log2) of the
    // character distribution plus the length-normalized form (entropy /
    // max-possible log2(n)) — the repetition/garbage signal corpus filters
    // threshold on. The native `char_entropy` expression is one histogram
    // pass per row inside codegen; the compositional alternative (explode
    // one row per CHARACTER, groupBy back) is a ~500× row blowup and a
    // giant shuffle at 100 TB — which is exactly what the DuckDB oracle
    // does, making the gate a cross-SHAPE check, not just cross-engine.
    "q122_char_entropy" -> { (s, dir) =>
      TextVectorFns.register(s)
      spread(read(s, dir, "documents"))
        .select(col("doc_id"), col("lang"),
          length(col("text")).as("n_cp"),
          TextVectorFns.charEntropyNative(col("text")).as("ent_raw"))
        .select(col("doc_id"), col("lang"), col("n_cp"),
          round(col("ent_raw"), 6).as("ent"),
          round(col("ent_raw") / log2(col("n_cp")), 6).as("ent_norm"))
        .orderBy("doc_id")
    }
  )

  /** regexp-based subword token count (shared with the oracle formula). */
  private def regexpTokens(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  // DuckDB mirrors. Tokenization: regexp_replace needs the 'g' flag in
  // DuckDB (Spark replaces all matches by default).
  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val toksSql = s"string_split($normSql, ' ')"
  private val stopList = "('the','a','of','and','to','in','is','on','for','with')"

  val oracles: Map[String, String] = Map(
    "q122_char_entropy" ->
      """WITH e AS (
        |  SELECT doc_id, entropy(c) AS ent_raw
        |  FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, d.lang, length(d.text) AS n_cp,
        |  round(e.ent_raw, 6) AS ent,
        |  round(e.ent_raw / log2(length(d.text)), 6) AS ent_norm
        |FROM documents d JOIN e USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q50_token_stats" ->
      s"""SELECT doc_id, length(text) AS n_chars_m,
         |  len($toksSql) AS n_tokens,
         |  len(regexp_extract_all($normSql, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_subtokens,
         |  len(list_filter($toksSql, t -> t IN $stopList)) AS n_stopwords,
         |  CAST(len(list_filter($toksSql, t -> t IN $stopList)) AS DOUBLE)
         |    / len($toksSql) AS stop_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q51_quality" ->
      s"""SELECT doc_id, lang, n_tokens, n_punct, avg_word_len, n_stop,
         |  CAST(n_punct AS DOUBLE) / n_tokens AS punct_ratio,
         |  (n_tokens BETWEEN 5 AND 10000)
         |    AND (CAST(n_punct AS DOUBLE) / n_tokens < 0.3)
         |    AND (avg_word_len BETWEEN 2.0 AND 12.0) AS quality_ok
         |FROM (
         |  SELECT doc_id, lang,
         |    len($toksSql) AS n_tokens,
         |    length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
         |      / len($toksSql) AS avg_word_len,
         |    len(list_filter($toksSql, t -> t IN $stopList)) AS n_stop
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q52_langid" -> {
      val scores = Map(
        "en" -> "('the','and','of','a','to','is')",
        "de" -> "('der','die','das','und','ist')",
        "fr" -> "('le','la','les','et','est')",
        "es" -> "('el','los','las','y','es')")
      val sCols = scores.map { case (l, set) =>
        s"len(list_filter($toksSql, t -> t IN $set)) AS s_$l" }.mkString(",\n    ")
      s"""SELECT lang, pred_lang, count(*) AS n FROM (
         |  SELECT lang,
         |    CASE WHEN s_en + s_de + s_fr + s_es = 0 THEN 'und'
         |         WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |         WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |         WHEN s_fr >= s_es THEN 'fr'
         |         ELSE 'es' END AS pred_lang
         |  FROM (SELECT lang,
         |    $sCols
         |  FROM documents))
         |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
    },

    "q53_fingerprints" ->
      s"""SELECT doc_id, md5(text) AS fp_raw, md5($normSql) AS fp_norm,
         |  md5(substring($normSql, 1, 80)) AS fp_prefix80
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q94_outlier_docs" ->
      """WITH s AS (
        |  SELECT source, CAST(count(*) AS HUGEINT) AS sn,
        |    CAST(sum(n_chars) AS HUGEINT) AS s1,
        |    CAST(sum(n_chars * n_chars) AS HUGEINT) AS s2
        |  FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d JOIN s USING (source)
        |WHERE (s.sn * d.n_chars - s.s1) * (s.sn * d.n_chars - s.s1)
        |      > 4 * (s.sn * s.s2 - s.s1 * s.s1)
        |ORDER BY doc_id""".stripMargin,

    "q95_ntile_buckets" ->
      """WITH b AS (
        |  SELECT lang, n_chars,
        |    ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS bucket
        |  FROM documents)
        |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n,
        |  min(n_chars) AS lo, max(n_chars) AS hi
        |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin
  )
}
