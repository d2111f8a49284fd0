package graft

import graft.multimodal.Multimodal

/** Multimodal plumbing: binary payload schema, partition-wise stub decode,
  * and agreement between the mapPartitions path and the pure-SQL projection
  * on the shared feature columns.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.fromDocuments(spark.read.parquet(s"$sf/documents.parquet"))

  test("media table has the binary payload contract") {
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(media.select("kind").distinct().count() == 3)
  }

  test("partition-wise decode emits one feature row per media row") {
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == media.count())
    val f = feats.filter(_.media_id == 0).head()
    assert(f.n_bytes > 0 && f.width >= 16 && f.height >= 16 && f.mean_intensity > 0)
  }

  test("mapPartitions decode agrees with the SQL projection on shared columns") {
    val a = Multimodal.extractFeatures(media).toDF()
      .select("media_id", "kind", "n_bytes", "magic", "width", "height")
    val b = Multimodal.featuresSql(media)
      .select("media_id", "kind", "n_bytes", "magic", "width", "height")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("decode is deterministic") {
    val (w1, h1, m1) = Multimodal.FakeDecoder.decode("image", "hello".getBytes)
    val (w2, h2, m2) = Multimodal.FakeDecoder.decode("image", "hello".getBytes)
    assert((w1, h1, m1) == (w2, h2, m2))
  }
}
