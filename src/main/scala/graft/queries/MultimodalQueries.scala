package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import Tables._

/** Multimodal surface (builder contract): binary payload columns + typed
  * metadata, decode stubbed (see graft.multimodal.Multimodal). q63 is the
  * pure-expression feature projection; q64 exercises the real partition-wise
  * decode path. BOTH are oracle-checked: the payloads are ASCII text bytes,
  * so the stub decoder's byte-level math (incl. mean intensity — integer
  * byte sums are exact in double, hence order-independent) is mirrored
  * per-character in DuckDB.
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
    },

    // Frame-sampling plan for the video payloads: deterministic byte
    // offsets (every STRIDE bytes, capped at MAX_FRAMES per clip) computed
    // IN the engine as a sequence+explode projection — the decode worker
    // receives (media_id, offset) work items and never plans. This is how a
    // 100 TB video corpus schedules frame extraction: the plan is a linear
    // scan, the fan-out is bounded per row, and no payload bytes move until
    // the decoder reads its assigned offsets.
    "q100_frame_plan" -> { (s, dir) =>
      val stride = 37
      val maxFrames = 8
      Multimodal.fromDocuments(spread(read(s, dir, "documents")))
        .filter(col("kind") === "video")
        .select(col("media_id"),
          explode(expr(s"sequence(0L, least((length(payload) - 1) div $stride, ${maxFrames - 1}))"))
            .as("frame_idx"))
        .select(col("media_id"), col("frame_idx"),
          (col("frame_idx") * stride).cast("long").as("byte_offset"))
        .orderBy("media_id", "frame_idx")
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
        |FROM documents ORDER BY media_id""".stripMargin,

    // The decode path's oracle recomputes the stub's byte math from the text
    // (ASCII -> ord(char) == byte value). The byte sum is an exact integer
    // in both engines, so mean_intensity matches bit-for-bit before round.
    "q64_media_decode" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  octet_length(encode(text)) AS n_bytes,
        |  lower(substring(hex(encode(text)), 1, 4)) AS magic,
        |  16 + octet_length(encode(text)) % 64 AS width,
        |  16 + CAST(FLOOR(octet_length(encode(text)) / 7) AS INT) % 64 AS height,
        |  round(CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE CAST(list_aggregate(list_transform(generate_series(1, length(text)),
        |      i -> ord(substring(text, i, 1))), 'sum') AS DOUBLE) / length(text)
        |    END, 4) AS mean_intensity
        |FROM documents ORDER BY media_id""".stripMargin,

    "q100_frame_plan" ->
      """SELECT doc_id AS media_id, f.frame_idx,
        |  CAST(f.frame_idx * 37 AS BIGINT) AS byte_offset
        |FROM (SELECT doc_id, octet_length(encode(text)) AS n
        |      FROM documents WHERE doc_id % 3 = 2) v,
        |  LATERAL (SELECT unnest(generate_series(0, least((n - 1) // 37, 7)))
        |    AS frame_idx) f
        |ORDER BY media_id, frame_idx""".stripMargin
  )
}
