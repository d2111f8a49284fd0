package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import Tables._

/** Multimodal surface (builder contract): binary payload columns + typed
  * metadata, decode stubbed (see graft.multimodal.Multimodal). q63 is the
  * pure-expression feature projection (oracle-checked); q64 exercises the
  * real partition-wise decode path (rows-only check: the stub decoder's
  * byte-level math isn't SQL-expressible).
  */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q63_media_features" -> { (s, dir) =>
      Multimodal.featuresSql(
          Multimodal.fromDocuments(spread(read(s, dir, "documents"))))
        .orderBy("media_id")
    },

    "q64_media_decode" -> { (s, dir) =>
      import s.implicits._
      Multimodal.extractFeatures(
          Multimodal.fromDocuments(spread(read(s, dir, "documents"))))
        .toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"), col("magic"),
          col("width"), col("height"), round(col("mean_intensity"), 4).as("mean_intensity"))
        .orderBy("media_id")
    }
  )

  val oracles: Map[String, String] = Map(
    "q63_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  lower(substring(hex(encode(text)), 1, 4)) AS magic,
        |  16 + octet_length(encode(text)) % 64 AS width,
        |  16 + CAST(FLOOR(octet_length(encode(text)) / 7) AS INT) % 64 AS height
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
