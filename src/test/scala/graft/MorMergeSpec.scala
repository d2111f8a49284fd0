package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** Merge-on-read upsert (`Warehouse.morMerge`): one O(batch) commit of data
  * files + an equality-delete file of the batch keys, zero target rewrites —
  * semantically identical to the copy-on-write `merge`, with the rewrite IO
  * deferred to compactDeletes. Pins the equivalence, the O(batch) manifest
  * shape, replay convergence, the SQL faces (merge-on-read disposition,
  * positional DELETE mode), and change-feed exactness.
  */
class MorMergeSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType), StructField("Amount", LongType)))

  private def df(rows: (String, Long)*): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private def bag(d: DataFrame): Map[Seq[Any], Int] =
    d.collect().toSeq.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap

  test("morMerge == merge: same final content, including dup-key batches and null keys") {
    val cow = new Warehouse(spark, tmpDir("mm-cow"))
    val mor = new Warehouse(spark, tmpDir("mm-mor"))
    val base = df("a" -> 1L, "b" -> 2L, "c" -> 3L)
    val batch = spark.createDataFrame(Seq(
      Row("b", 20L), Row("d", 40L), Row("d", 41L), Row(null, 99L)).asJava, schema)
    cow.replace("t", base, Seq("Id")); mor.replace("t", base, Seq("Id"))
    cow.merge("t", batch, Seq("Id"))
    mor.morMerge("t", batch, Seq("Id"))
    assert(bag(mor.load("t")) == bag(cow.load("t")))
    assert(mor.load("t").count() == 6) // a,c + b,d,d,null-row (dup keys land, merge contract)
  }

  test("O(batch): every prior data file carries into the new manifest untouched") {
    val wh = new Warehouse(spark, tmpDir("mm-obatch"))
    wh.replace("t", df("a" -> 1L, "b" -> 2L), Seq("Id"))
    val before = wh.currentManifest("t").files.map(_.path).toSet
    wh.morMerge("t", df("b" -> 20L), Seq("Id"))
    val after = wh.currentManifest("t")
    assert(before.subsetOf(after.files.map(_.path).toSet), "morMerge must not rewrite")
    assert(after.deletes.nonEmpty && after.deletes.forall(_.kind == "eq"))
  }

  test("replay converges by value; chained batches keep only the latest") {
    val wh = new Warehouse(spark, tmpDir("mm-replay"))
    wh.replace("t", df("a" -> 1L, "b" -> 2L), Seq("Id"))
    wh.morMerge("t", df("b" -> 20L), Seq("Id"))
    wh.morMerge("t", df("b" -> 20L), Seq("Id")) // replay: same content
    assert(bag(wh.load("t")) == bag(df("a" -> 1L, "b" -> 20L)))
    wh.morMerge("t", df("b" -> 200L, "c" -> 3L), Seq("Id"))
    assert(bag(wh.load("t")) == bag(df("a" -> 1L, "b" -> 200L, "c" -> 3L)))
    wh.compactDeletes("t")
    assert(bag(wh.load("t")) == bag(df("a" -> 1L, "b" -> 200L, "c" -> 3L)))
    assert(wh.currentManifest("t").deletes.isEmpty)
  }

  test("missing PK columns or missing table fall back to append (merge's guard)") {
    val wh = new Warehouse(spark, tmpDir("mm-guard"))
    wh.morMerge("t", df("a" -> 1L), Seq("Id")) // table absent -> append/create
    wh.morMerge("t", df("a" -> 2L), Seq("Nope")) // pk absent -> append
    assert(wh.load("t").count() == 2)
  }

  test("readChanges equals diffRows across morMerge commits, both directions") {
    val wh = new Warehouse(spark, tmpDir("mm-cdc"))
    val vs = scala.collection.mutable.ArrayBuffer[Long]()
    vs += wh.append("t", df("a" -> 1L, "b" -> 2L), statsCols = Seq("Id"))
    vs += wh.morMerge("t", df("b" -> 20L, "c" -> 3L), Seq("Id"))
    vs += wh.morMerge("t", df("a" -> 10L), Seq("Id"))
    vs += wh.compactDeletes("t")
    for (i <- vs.indices; j <- vs.indices) {
      val ch = wh.readChanges("t", vs(i), vs(j))
      val (add, rem) = wh.diffRows("t", vs(i), vs(j))
      assert(bag(ch.filter(col("_change_type") === "+I").drop("_change_type")) == bag(add),
        s"+I mismatch ${vs(i)} -> ${vs(j)}")
      assert(bag(ch.filter(col("_change_type") === "-D").drop("_change_type")) == bag(rem),
        s"-D mismatch ${vs(i)} -> ${vs(j)}")
    }
  }

  test("SQL face: writeTo disposition merge-on-read upserts without rewriting") {
    val root = tmpDir("mm-sql")
    spark.conf.set("spark.sql.catalog.gmm", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmm.root", root)
    val wh = new Warehouse(spark, root)
    wh.replace("t", df("a" -> 1L, "b" -> 2L), Seq("Id"))
    val before = wh.currentManifest("t").files.map(_.path).toSet
    df("b" -> 20L, "c" -> 3L).writeTo("gmm.t")
      .option("disposition", "merge-on-read").option("primaryKeys", "Id").append()
    assert(bag(wh.load("t")) == bag(df("a" -> 1L, "b" -> 20L, "c" -> 3L)))
    assert(before.subsetOf(wh.currentManifest("t").files.map(_.path).toSet))
  }

  test("streaming CDC upserts == batch morMerge; replay and rebuilt checkpoint add nothing") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.CorpusStream
    def drain(w: org.apache.spark.sql.streaming.DataStreamWriter[Row]): Unit = {
      val q = w.trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(60000), "stream did not drain in 60s")
      finally q.stop()
    }
    val watch = tmpDir("mm-stream-watch")
    val ckpt = tmpDir("mm-stream-ckpt")
    val wh = new Warehouse(spark, tmpDir("mm-stream"))
    wh.replace("t", df("a" -> 1L, "b" -> 2L), Seq("Id"))
    df("b" -> 20L, "c" -> 3L).coalesce(1).write.mode("append").parquet(watch)
    drain(CorpusStream.ingestUpserts(spark, watch, schema, wh, "t", Seq("Id"), Some(ckpt)))
    val expect = bag(df("a" -> 1L, "b" -> 20L, "c" -> 3L))
    assert(bag(wh.load("t")) == expect)
    val version = wh.currentVersion("t")
    // same checkpoint: nothing new to process, version untouched
    drain(CorpusStream.ingestUpserts(spark, watch, schema, wh, "t", Seq("Id"), Some(ckpt)))
    assert(wh.currentVersion("t") == version)
    // REBUILT checkpoint: the source replays every file, the batch-id
    // ledger skips the already-committed ids — zero commits, same content
    drain(CorpusStream.ingestUpserts(spark, watch, schema, wh, "t", Seq("Id"),
      Some(tmpDir("mm-stream-ckpt2"))))
    assert(wh.currentVersion("t") == version)
    assert(bag(wh.load("t")) == expect)
    // a genuinely new drop lands incrementally
    df("c" -> 30L).coalesce(1).write.mode("append").parquet(watch)
    drain(CorpusStream.ingestUpserts(spark, watch, schema, wh, "t", Seq("Id"), Some(ckpt)))
    assert(bag(wh.load("t")) == bag(df("a" -> 1L, "b" -> 20L, "c" -> 30L)))
  }

  test("plain SQL UPDATE (default cow mode) resolves and rewrites — incl. WHERE on columns") {
    // regression pin: the UPDATE command used to store unresolved-by-name
    // expressions, failing CheckAnalysis on the first real `UPDATE ... WHERE
    // col = ...` (the MERGE face never exercised this path)
    val root = tmpDir("mm-updcow")
    spark.conf.set("spark.sql.catalog.guc", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.guc.root", root)
    val wh = new Warehouse(spark, root)
    wh.replace("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L), Seq("Id"))
    spark.sql("UPDATE guc.t SET Amount = Amount * 10 WHERE Id <> 'c'")
    assert(bag(wh.load("t")) == bag(df("a" -> 10L, "b" -> 20L, "c" -> 3L)))
    assert(wh.currentManifest("t").deletes.isEmpty) // cow: rewrite, no MOR state
  }

  test("SQL UPDATE honors spark.graft.update.mode = positional") {
    val root = tmpDir("mm-updmode")
    spark.conf.set("spark.sql.catalog.gup", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gup.root", root)
    val wh = new Warehouse(spark, root)
    wh.replace("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L), Seq("Id"))
    val before = wh.currentManifest("t").files.map(_.path).toSet
    try {
      spark.conf.set("spark.graft.update.mode", "positional")
      spark.sql("UPDATE gup.t SET Amount = Amount + 100 WHERE Id = 'b'")
    } finally spark.conf.unset("spark.graft.update.mode")
    val man = wh.currentManifest("t")
    assert(man.deletes.exists(_.kind == "dv"), "expected a pending positional delete (deletion vector)")
    assert(before.subsetOf(man.files.map(_.path).toSet), "positional UPDATE must not rewrite")
    assert(bag(wh.load("t")) == bag(df("a" -> 1L, "b" -> 102L, "c" -> 3L)))
  }

  test("SQL DELETE honors spark.graft.delete.mode = positional") {
    val root = tmpDir("mm-delmode")
    spark.conf.set("spark.sql.catalog.gdm", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdm.root", root)
    val wh = new Warehouse(spark, root)
    wh.replace("t", df("a" -> 1L, "b" -> 2L, "c" -> 3L), Seq("Id"))
    val before = wh.currentManifest("t").files.map(_.path).toSet
    try {
      spark.conf.set("spark.graft.delete.mode", "positional")
      spark.sql("DELETE FROM gdm.t WHERE Amount = 2")
    } finally spark.conf.unset("spark.graft.delete.mode")
    val man = wh.currentManifest("t")
    assert(man.deletes.exists(_.kind == "dv"), "expected a pending positional delete (deletion vector)")
    assert(before.subsetOf(man.files.map(_.path).toSet), "positional DELETE must not rewrite")
    assert(bag(wh.load("t")) == bag(df("a" -> 1L, "c" -> 3L)))
  }
}
