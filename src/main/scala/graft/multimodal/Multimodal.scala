package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (builder contract): image/audio/video payloads
  * travel as opaque `binary` columns beside typed metadata; decode /
  * feature-extraction runs per-partition so one decoder instance amortizes
  * across a whole batch of rows (the Scala dual of a pandas_udf/mapInPandas
  * batch UDF).
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): `FakeDecoder` derives deterministic pseudo-features from the
  * bytes. Everything around it — the schema contract, the partition-wise
  * batching, the Dataset encoders, partitioning behavior — is real and
  * tested, so a real decoder (JavaCV, TwelveMonkeys, ffmpeg-cli) drops into
  * `decodePartition` without touching the pipeline.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata, the multimodal analog of
    * the reference's flat typed columns (binary type per iceberg/schema.py:51-52).
    */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
      source: String)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      magic: String, width: Int, height: Int, mean_intensity: Double)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("payload", BinaryType),
    StructField("source", StringType)))

  /** Build a media table from the documents fixture: utf-8 bytes stand in
    * for encoded media payloads (deterministic, no external data needed).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video")).as("kind"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** STUB decoder: deterministic pseudo-features from raw bytes. A real
    * implementation would decode the codec here; the signature — bytes in,
    * fixed-schema features out — is the real contract.
    */
  object FakeDecoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      val w = 16 + (n % 64)                 // pretend width
      val h = 16 + ((n / 7) % 64)           // pretend height
      val mean = if (n == 0) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / n
      (w, h, mean)
    }
  }

  /** Partition-wise decode: one "decoder" per partition, iterator-in /
    * iterator-out, never materializing a partition in memory — the exact
    * shape a heavyweight codec needs (same batching contract as
    * mapInPandas). Returns a typed Dataset.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (expensive, amortized)
        it.map { case (id, kind, payload) =>
          val (w, h, mean) = FakeDecoder.decode(kind, payload)
          val magic = payload.take(2).map(b => f"${b & 0xff}%02x").mkString
          MediaFeatures(id, kind, payload.length, magic, w, h, mean)
        }
      }
  }

  /** Pure-SQL feature projection over the same payloads (no mapPartitions):
    * used by the oracle-checked query — byte length, hex magic, and the
    * deterministic pseudo-features recomputed as column expressions.
    */
  def featuresSql(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      octet_length(col("payload")).as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 2))).as("magic"),
      (lit(16) + octet_length(col("payload")) % 64).as("width"),
      // floor, not cast-of-division: DuckDB CAST(double AS INT) rounds while
      // Spark truncates — floor() agrees in both engines for positives.
      (lit(16) + floor(octet_length(col("payload")) / 7).cast("int") % 64).as("height"))
}
