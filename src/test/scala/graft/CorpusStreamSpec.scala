package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.pipeline.CorpusPipeline
import graft.sink.Warehouse
import graft.streaming.CorpusStream

/** Streaming corpus curation (CorpusStream.ingestCurated): quality and
  * decontamination gates apply in-flight, cross-batch dedup state lives in
  * the warehouse table, and a rebuilt checkpoint replays to zero new rows.
  */
class CorpusStreamSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def frame(rows: (Long, String, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)

  private val goodText = "alpha beta gamma delta epsilon zeta eta theta"
  private val evalText = "one two three four five six seven eight nine ten"

  test("streaming ingest: quality gate, decontamination, durable cross-batch dedup") {
    val watch = tmpDir("corpus-watch")
    val wh = new Warehouse(spark, tmpDir("corpus-wh"))
    val evalGrams = CorpusPipeline.evalGrams(frame((100L, evalText, "en")))

    def drain(checkpoint: String): Unit = {
      val q = CorpusStream.ingestCurated(spark, watch, schema, wh, "corpus",
        evalGrams, checkpointDir = Some(checkpoint))
        .trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(60000), "stream did not drain in 60s")
      finally q.stop()
    }

    // batch 1: one good doc, one too-short (quality), one in-batch dup of
    // the good doc, one containing a verbatim eval 8-gram (contaminated)
    frame(
      (1L, goodText, "en"),
      (2L, "short", "en"),
      (3L, goodText, "en"),
      (4L, "padding starts one two three four five six seven eight done", "en"))
      .write.mode("append").parquet(watch)
    drain(tmpDir("cp1"))
    val after1 = wh.load("corpus").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after1 == Set(1L), s"batch 1 admitted wrong docs: $after1")

    // batch 2: a cross-batch duplicate of doc 1 plus one genuinely new doc
    frame(
      (10L, goodText, "en"),
      (11L, "iota kappa lambda mu nu xi omicron pi", "en"))
      .write.mode("append").parquet(watch)
    drain(tmpDir("cp2")) // FRESH checkpoint: batch-1 file replays too
    val after2 = wh.load("corpus").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after2 == Set(1L, 11L), s"batch 2 state wrong: $after2")

    // pure replay on another fresh checkpoint: nothing changes
    drain(tmpDir("cp3"))
    assert(wh.load("corpus").count() == 2, "replay double-ingested rows")
  }
}
