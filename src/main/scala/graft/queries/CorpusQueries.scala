package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFns.{shingles, tokens}
import Tables._

/** Corpus-statistics surface over `documents` — the cross-document analyses
  * a training-data curation pipeline runs between per-doc scoring (TextQueries)
  * and dedup (DedupQueries): boilerplate/rarity via gram document frequency,
  * per-doc lexical diversity, and the corpus length histogram that drives
  * packing / curriculum planning.
  *
  * Scale posture (100 TB): the gram DF table is the only shuffle-heavy piece
  * and it is a plain keyed aggregate (map-side partial, linear). The join
  * back to documents only ever ships the DF *head* (grams seen in >RARE_DF
  * docs — the heavy hitters, bounded by corpus diversity, not corpus size):
  * the long rare tail is inferred by difference (`n_rare = n_grams - matched`)
  * instead of being materialized, so the per-doc stats join is a broadcast.
  * Everything else is zero-shuffle per-row array math.
  */
object CorpusQueries {

  private val GRAM_W = 3 // word n-gram width (same universe as q56/q57)
  private val BOILER_DF = 5 // gram in >= 5 docs => boilerplate
  private val RARE_DF = 2 // gram in <= 2 docs => rare; head = df > RARE_DF
  private val BIN_W = 16 // token-count histogram bin width

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-doc gram document-frequency stats: per-doc boilerplate coverage
    // (grams shared with >= BOILER_DF docs — the CCNet-style repeated-content
    // signal) and rare-gram coverage (grams in <= RARE_DF docs — the noise /
    // uniqueness signal). The gram frame is persisted (two consumers: the DF
    // aggregate and the join back — the q72 posture, MEMORY_AND_DISK so
    // corpus-scale eviction spills instead of re-running the shingle HOFs).
    // Only the DF HEAD (df > RARE_DF) is broadcast back; a gram that misses
    // the head is by construction rare, so the unbounded tail never moves.
    "q76_gram_df_stats" -> { (s, dir) =>
      val grams = spread(read(s, dir, "documents"))
        .select(col("doc_id"),
          explode(array_distinct(shingles(tokens(col("text")), GRAM_W))).as("g"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
      val head = df.filter(col("df") > RARE_DF)
      grams.join(broadcast(head), Seq("g"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") >= BOILER_DF, 1L).otherwise(0L)).as("n_boiler"),
          sum(when(col("df").isNull, 1L).otherwise(0L)).as("n_rare"))
        .withColumn("boiler_ratio",
          round(col("n_boiler").cast("double") / col("n_grams"), 6))
        .withColumn("rare_ratio",
          round(col("n_rare").cast("double") / col("n_grams"), 6))
        .orderBy("doc_id")
    },

    // Per-doc lexical diversity: type-token ratio and top-token share (the
    // within-doc repetition signals complementing q70's window repetition).
    // Pure per-row array math — the top-token count folds over the distinct
    // tokens of the row (O(|vocab_doc| x |doc|) per row, bounded by doc
    // length, zero shuffle at any corpus size).
    "q77_token_diversity" -> { (s, dir) =>
      spread(read(s, dir, "documents"))
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          size(col("tk")).as("n_tokens"),
          size(array_distinct(col("tk"))).as("n_distinct"),
          array_max(transform(array_distinct(col("tk")),
            t => size(filter(col("tk"), x => x === t)))).as("top_n"))
        .withColumn("ttr", round(col("n_distinct").cast("double") / col("n_tokens"), 6))
        .withColumn("top_share", round(col("top_n").cast("double") / col("n_tokens"), 6))
        .orderBy("doc_id")
    },

    // Token-length histogram with cumulative corpus share — the planning
    // query behind q68's packing (bin docs by token count, see how much of
    // the corpus sits under each cutoff). One tiny keyed aggregate (<=
    // max_len/BIN_W rows) then an unpartitioned window over that tiny frame
    // (single partition is correct here: the frame is bins, not rows).
    "q79_length_histogram" -> { (s, dir) =>
      val binned = spread(read(s, dir, "documents"))
        .select(size(tokens(col("text"))).as("n"))
        .select((floor(col("n") / BIN_W) * BIN_W).cast("long").as("bin"), col("n"))
      val wCum = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      binned.groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("sum_tokens"))
        .withColumn("cum_doc_share",
          round(sum("n_docs").over(wCum).cast("double") / sum("n_docs").over(wAll), 6))
        .withColumn("cum_token_share",
          round(sum("sum_tokens").over(wCum).cast("double") / sum("sum_tokens").over(wAll), 6))
        .orderBy("bin")
    }
  )

  // --- DuckDB mirrors -----------------------------------------------------

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val toksSql = s"string_split($normSql, ' ')"
  /** Same gram universe as DedupQueries' oracles: md5 of the space-joined
    * window; concat_ws skips the NULL tail slots exactly like the Spark
    * shingles helper's try_element_at.
    */
  private val gramsCte =
    s"""tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(len(toks) - ${GRAM_W - 1}, 1)),
       |    i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2]))))) AS g
       |  FROM tk)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q76_gram_df_stats" ->
      s"""WITH $gramsCte,
         |df AS (SELECT g, count(*) AS df FROM grams GROUP BY g),
         |head AS (SELECT g, df FROM df WHERE df > $RARE_DF)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN h.df >= $BOILER_DF THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |  CAST(sum(CASE WHEN h.df IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
         |  round(CAST(sum(CASE WHEN h.df >= $BOILER_DF THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS boiler_ratio,
         |  round(CAST(sum(CASE WHEN h.df IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS rare_ratio
         |FROM grams LEFT JOIN head h USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q77_token_diversity" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents)
         |SELECT doc_id, len(toks) AS n_tokens,
         |  len(list_distinct(toks)) AS n_distinct,
         |  list_max(list_transform(list_distinct(toks),
         |    t -> len(list_filter(toks, x -> x = t)))) AS top_n,
         |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr,
         |  round(CAST(list_max(list_transform(list_distinct(toks),
         |    t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE) / len(toks), 6)
         |    AS top_share
         |FROM tk ORDER BY doc_id""".stripMargin,

    "q79_length_histogram" ->
      s"""WITH d AS (SELECT len($toksSql) AS n FROM documents),
         |b AS (
         |  SELECT CAST(floor(n / $BIN_W.0) * $BIN_W AS BIGINT) AS bin,
         |    count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS sum_tokens
         |  FROM d GROUP BY 1)
         |SELECT bin, n_docs, sum_tokens,
         |  round(CAST(sum(n_docs) OVER w AS DOUBLE) / (sum(n_docs) OVER ()), 6)
         |    AS cum_doc_share,
         |  round(CAST(sum(sum_tokens) OVER w AS DOUBLE) / (sum(sum_tokens) OVER ()), 6)
         |    AS cum_token_share
         |FROM b
         |WINDOW w AS (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |ORDER BY bin""".stripMargin
  )
}
