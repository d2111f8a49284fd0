package graft

import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.sink.Warehouse
import graft.streaming.GraftSinkProvider

/** The writeStream-native sink face (GraftTableSink): dispositions, the
  * exactly-once batch-id ledger, rebuilt-checkpoint refusal, schema drift.
  */
class GraftTableSinkSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def frame(rows: (Long, String)*): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private def mkSink(root: String, table: String, extra: (String, String)*)
      : graft.streaming.GraftTableSink = {
    val opts = Map("root" -> root, "table" -> table) ++ extra
    new GraftSinkProvider()
      .createSink(spark.sqlContext, opts, Nil, OutputMode.Append())
      .asInstanceOf[graft.streaming.GraftTableSink]
  }

  test("writeStream end-to-end: append disposition, incremental drains, no re-delivery") {
    val watch = tmpDir("sink-watch")
    val root = tmpDir("sink-wh")
    val cp = tmpDir("sink-cp")
    val wh = new Warehouse(spark, root)

    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(watch)
        .writeStream.outputMode("append")
        .format("graft.streaming.GraftSinkProvider")
        .option("root", root).option("table", "t")
        .option("stats-cols", "id")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(60000), "stream did not drain in 60s")
      finally q.stop()
    }

    frame(1L -> "a", 2L -> "b").write.mode("append").parquet(watch)
    drain()
    assert(wh.load("t").collect().map(r => r.getLong(0) -> r.getString(1)).toSet ==
      Set(1L -> "a", 2L -> "b"))

    frame(3L -> "c").write.mode("append").parquet(watch)
    drain() // same checkpoint: only the new file is a new batch
    val vAfter2 = wh.currentVersion("t")
    assert(wh.load("t").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))

    drain() // nothing new: no commit at all
    assert(wh.currentVersion("t") == vAfter2, "empty drain must not commit")
  }

  test("batch-id ledger: replay of the committed batch is a no-op commit-wise") {
    val root = tmpDir("sink-replay")
    val wh = new Warehouse(spark, root)
    val sink = mkSink(root, "t")
    sink.addBatch(0, frame(1L -> "a"))
    val v = wh.currentVersion("t")
    sink.addBatch(0, frame(1L -> "a")) // crash-window replay
    assert(wh.currentVersion("t") == v, "replayed batch must not re-commit")
    assert(wh.load("t").count() == 1)
    sink.addBatch(1, frame(2L -> "b"))
    assert(wh.load("t").count() == 2)
  }

  test("rebuilt checkpoint (batch id below high-water mark) refuses loudly") {
    val root = tmpDir("sink-rebuild")
    val sink = mkSink(root, "t")
    sink.addBatch(0, frame(1L -> "a"))
    sink.addBatch(3, frame(2L -> "b"))
    val e = intercept[IllegalStateException](sink.addBatch(1, frame(9L -> "x")))
    assert(e.getMessage.contains("REBUILT checkpoint"))
    // a fresh consumer identity re-attaches cleanly
    val sink2 = mkSink(root, "t", "stream-id" -> "take2")
    sink2.addBatch(0, frame(9L -> "x"))
    assert(new Warehouse(spark, root).load("t").count() == 3)
  }

  test("upsert disposition converges by key and replays without churn") {
    val root = tmpDir("sink-upsert")
    val wh = new Warehouse(spark, root)
    val sink = mkSink(root, "t", "disposition" -> "upsert", "keys" -> "id")
    sink.addBatch(0, frame(1L -> "a", 2L -> "b"))
    sink.addBatch(1, frame(2L -> "B", 3L -> "c"))
    def state() = wh.load("t").collect().map(r => r.getLong(0) -> r.getString(1)).toSet
    assert(state() == Set(1L -> "a", 2L -> "B", 3L -> "c"))
    val v = wh.currentVersion("t")
    sink.addBatch(1, frame(2L -> "B", 3L -> "c")) // ledger skip: zero extra files
    assert(wh.currentVersion("t") == v && state() == Set(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("merge-schema evolves the table on drift; default conforms (target schema wins)") {
    val root = tmpDir("sink-evolve")
    val wh = new Warehouse(spark, root)
    val wide = StructType(schema.fields :+ StructField("extra", IntegerType))
    def wideFrame(rows: (Long, String, Integer)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, wide)

    // default: the new column is dropped (documented target-schema-wins)
    val strict = mkSink(root, "t")
    strict.addBatch(0, frame(1L -> "a"))
    strict.addBatch(1, wideFrame((2L, "b", 7)))
    assert(wh.load("t").columns.toSeq == Seq("id", "v"))

    // merge-schema: table evolves, pre-drift rows read null
    val evolving = mkSink(root, "t", "merge-schema" -> "true")
    evolving.addBatch(2, wideFrame((3L, "c", 9)))
    val rows = wh.load("t").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getInt(2)))).toMap
    assert(wh.load("t").columns.toSeq == Seq("id", "v", "extra"))
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(9)))
  }

  test("option validation fails at query start, not first batch") {
    val ctx = spark.sqlContext
    val p = new GraftSinkProvider()
    def make(opts: Map[String, String], mode: OutputMode = OutputMode.Append()) =
      p.createSink(ctx, opts, Nil, mode)
    intercept[IllegalArgumentException](make(Map("table" -> "t")))
    intercept[IllegalArgumentException](make(Map("root" -> "/x")))
    intercept[IllegalArgumentException](
      make(Map("root" -> "/x", "table" -> "t", "disposition" -> "upsert")))
    intercept[IllegalArgumentException](
      make(Map("root" -> "/x", "table" -> "t", "disposition" -> "dedup")))
    intercept[IllegalArgumentException]( // replace needs complete mode
      make(Map("root" -> "/x", "table" -> "t", "disposition" -> "replace")))
    // mode-derived defaults
    assert(make(Map("root" -> "/x", "table" -> "t", "keys" -> "id"),
      OutputMode.Update()).toString.contains("upsert"))
    assert(make(Map("root" -> "/x", "table" -> "t"),
      OutputMode.Complete()).toString.contains("replace"))
  }

  test("enforced CHECK constraints guard the streaming sink too") {
    val root = tmpDir("sink-check")
    spark.conf.set("spark.sql.catalog.gsck", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsck.root", root)
    spark.sql(
      "CREATE TABLE gsck.guarded (id BIGINT, v STRING, CONSTRAINT id_pos CHECK (id > 0))")
    val wh = new Warehouse(spark, root)
    val sink = mkSink(root, "guarded")
    sink.addBatch(0L, frame(1L -> "ok")) // satisfying batch lands
    assert(wh.load("guarded").count() == 1L)
    // the violating batch fails LOUDLY and commits nothing
    val ex = intercept[IllegalStateException](
      sink.addBatch(1L, frame(-5L -> "bad", 2L -> "fine")))
    assert(ex.getMessage.contains("id_pos"), ex.getMessage)
    assert(wh.load("guarded").collect().map(_.getLong(0)).toSet == Set(1L))
    // a retried/clean batch under the same id still lands (nothing ledgered)
    sink.addBatch(1L, frame(3L -> "ok2"))
    assert(wh.load("guarded").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // null passes a CHECK (SQL semantics: only FALSE violates)
    sink.addBatch(2L, spark.createDataFrame(Seq(Row(null, "n")).asJava, schema))
    assert(wh.load("guarded").count() == 3L)
  }
}
