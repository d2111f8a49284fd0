package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFns._
import Tables._

/** Deduplication family over `documents` (builder contract): exact
  * (hash-groupBy), fingerprint-block near-dup, n-gram Jaccard with prefix
  * blocking, MinHash+LSH (shingle -> salted-md5 minhash -> banded bucket
  * join), SimHash (in SimilarityQueries). Scale posture: every variant blocks
  * candidates FIRST (hash buckets / LSH bands), so the pair space stays
  * linear-ish in corpus size — never the quadratic all-pairs cross join.
  */
object DedupQueries {

  private val W = 3         // shingle width (word trigrams)
  private val K = 12        // minhash signature length
  private val BANDS = 3     // LSH bands (r = K / BANDS = 4 rows per band)
  private val R = K / BANDS
  private val JACCARD_T = 0.5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on the normalized-text fingerprint; keeper =
    // min doc_id per group (pure map-side expr + one keyed window).
    "q54_exact_dedup" -> { (s, dir) =>
      val g = Window.partitionBy("fp_norm")
      read(s, dir, "documents")
        .select(col("doc_id"), md5(normalize(col("text"))).as("fp_norm"))
        .withColumn("keeper", min("doc_id").over(g))
        .withColumn("is_dup", col("doc_id") =!= col("keeper"))
        .orderBy("doc_id")
    },

    // Fingerprint-block near-dup groups: docs sharing an 80-char normalized
    // prefix; emits only groups with >1 member.
    "q55_prefix_dup_groups" -> { (s, dir) =>
      read(s, dir, "documents")
        .select(col("doc_id"), md5(substring(normalize(col("text")), 1, 80)).as("grp"))
        .groupBy("grp")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"),
          array_join(sort_array(collect_list("doc_id")), ",").as("members"))
        .filter(col("copies") > 1)
        .orderBy("keeper")
    },

    // n-gram Jaccard near-dup pairs, blocked on a 40-char prefix fingerprint
    // so the join fans out only within tiny candidate buckets.
    "q56_ngram_jaccard" -> { (s, dir) =>
      val base = read(s, dir, "documents")
        .withColumn("tk", tokens(col("text")))
        .select(col("doc_id"),
          md5(substring(normalize(col("text")), 1, 40)).as("blk"),
          array_distinct(shingles(col("tk"), W)).as("sh"))
      val a = base.select(col("doc_id").as("d1"), col("blk"), col("sh").as("sh1"))
      val b = base.select(col("doc_id").as("d2"), col("blk"), col("sh").as("sh2"))
      a.join(b, Seq("blk")).filter(col("d1") < col("d2"))
        .withColumn("jaccard",
          size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            size(array_union(col("sh1"), col("sh2"))))
        .filter(col("jaccard") >= JACCARD_T)
        .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    },

    // MinHash + LSH: per-doc signature of K salted-md5 minima, banded into
    // BANDS keys; docs sharing a band key become candidates, verified by true
    // shingle Jaccard. Candidate generation is a keyed self-join on band
    // keys — at 100 TB the band key is the shuffle key and bucket sizes stay
    // bounded, no quadratic blowup.
    "q57_minhash_lsh" -> { (s, dir) =>
      val base = read(s, dir, "documents")
        .withColumn("tk", tokens(col("text")))
        .select(col("doc_id"), array_distinct(shingles(col("tk"), W)).as("sh"))
        .withColumn("sig", minhashSignature(col("sh"), K))
        .withColumn("bands", lshBands(col("sig"), BANDS, R))
      val exploded = base.select(col("doc_id"), col("sh"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      val a = exploded.select(col("doc_id").as("d1"), col("sh").as("sh1"),
        col("band_idx"), col("band_key"))
      val b = exploded.select(col("doc_id").as("d2"), col("sh").as("sh2"),
        col("band_idx"), col("band_key"))
      a.join(b, Seq("band_idx", "band_key")).filter(col("d1") < col("d2"))
        .select("d1", "d2", "sh1", "sh2").distinct()
        .withColumn("jaccard",
          size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            size(array_union(col("sh1"), col("sh2"))))
        .filter(col("jaccard") >= JACCARD_T)
        .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    }
  )

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  /** Tokens + distinct shingle set, precomputed once per doc in a CTE chain. */
  private val docShinglesCte =
    s"""tk AS (SELECT doc_id, text, string_split($normSql, ' ') AS toks FROM documents),
       |base AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(toks) - ${W - 1}, 1)),
       |    i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh
       |  FROM tk)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q54_exact_dedup" ->
      s"""SELECT doc_id, fp_norm, min(doc_id) OVER (PARTITION BY fp_norm) AS keeper,
         |  doc_id <> min(doc_id) OVER (PARTITION BY fp_norm) AS is_dup
         |FROM (SELECT doc_id, md5($normSql) AS fp_norm FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q55_prefix_dup_groups" ->
      s"""SELECT grp, min(doc_id) AS keeper, count(*) AS copies,
         |  array_to_string(list_sort(list(doc_id)), ',') AS members
         |FROM (SELECT doc_id, md5(substring($normSql, 1, 80)) AS grp FROM documents)
         |GROUP BY grp HAVING count(*) > 1 ORDER BY keeper""".stripMargin,

    "q56_ngram_jaccard" ->
      s"""WITH $docShinglesCte,
         |blocked AS (
         |  SELECT doc_id, md5(substring($normSql, 1, 40)) AS blk, sh
         |  FROM base JOIN documents USING (doc_id))
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |    len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         |FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
         |    len(list_distinct(list_concat(a.sh, b.sh))) >= $JACCARD_T
         |ORDER BY d1, d2""".stripMargin,

    "q57_minhash_lsh" ->
      s"""WITH $docShinglesCte,
         |sig AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, ${K - 1}),
         |      j -> list_min(list_transform(sh, h -> md5(concat(j, ':', h))))) AS sig
         |  FROM base),
         |banded AS (
         |  SELECT doc_id, sh, t.b AS band_idx,
         |    md5(concat_ws('|', sig[t.b*$R+1], sig[t.b*$R+2], sig[t.b*$R+3], sig[t.b*$R+4])) AS band_key
         |  FROM sig, generate_series(0, ${BANDS - 1}) AS t(b)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sh AS sh1, b.sh AS sh2
         |  FROM banded a JOIN banded b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id)
         |SELECT d1, d2,
         |  round(CAST(len(list_intersect(sh1, sh2)) AS DOUBLE) /
         |    len(list_distinct(list_concat(sh1, sh2))), 4) AS jaccard
         |FROM cand
         |WHERE CAST(len(list_intersect(sh1, sh2)) AS DOUBLE) /
         |    len(list_distinct(list_concat(sh1, sh2))) >= $JACCARD_T
         |ORDER BY d1, d2""".stripMargin
  )
}
