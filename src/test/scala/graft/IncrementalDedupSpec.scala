package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Incremental deduplicated ingestion (Warehouse.appendDeduped): in-batch
  * keeper selection, cross-commit fingerprint dedup, replay safety, and
  * report arithmetic — the corpus-building bridge between the append sink
  * and the q54 exact-dedup algebra.
  */
class IncrementalDedupSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fp", StringType),
    StructField("text", StringType)))

  private def docs(rows: (Long, String, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)

  test("first batch: in-batch dups collapse to the min-pk keeper") {
    val wh = new Warehouse(spark, tmpDir("wh-dedup1"))
    val r = wh.appendDeduped("corpus",
      docs((3, "A", "a-late"), (1, "A", "a-first"), (2, "B", "b")), "fp", "doc_id")
    assert(r.appended == 2 && r.dupInBatch == 1 && r.dupInTable == 0)
    val rows = wh.load("corpus").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "A"), (2L, "B")), s"got $rows")
  }

  test("second batch: table-resident fingerprints are skipped, new ones land") {
    val wh = new Warehouse(spark, tmpDir("wh-dedup2"))
    wh.appendDeduped("corpus", docs((1, "A", "a"), (2, "B", "b")), "fp", "doc_id")
    val r = wh.appendDeduped("corpus",
      docs((10, "A", "a-again"), (11, "C", "c"), (12, "C", "c-dup")), "fp", "doc_id")
    assert(r.appended == 1 && r.dupInBatch == 1 && r.dupInTable == 1, s"got $r")
    assert(wh.load("corpus").count() == 3)
    // the kept C row is the min-pk one
    assert(wh.load("corpus").filter("fp = 'C'").collect().head.getLong(0) == 11L)
  }

  test("replay safety: re-ingesting the same batch appends nothing") {
    val wh = new Warehouse(spark, tmpDir("wh-dedup3"))
    val batch = docs((1, "A", "a"), (2, "B", "b"))
    wh.appendDeduped("corpus", batch, "fp", "doc_id")
    val replay = wh.appendDeduped("corpus", batch, "fp", "doc_id")
    assert(replay.appended == 0 && replay.dupInTable == 2, s"got $replay")
    assert(wh.load("corpus").count() == 2)
    assert(replay.version == wh.currentVersion("corpus"),
      s"report version ${replay.version} != current ${wh.currentVersion("corpus")}")
  }

  test("fpCol == pk: duplicate-pk rows collapse to one deterministic keeper") {
    // the old min-pk equality keeper was vacuous here (every copy of a
    // duplicated pk shares the min pk), so duplicate-pk batches landed whole
    val wh = new Warehouse(spark, tmpDir("wh-dedup-pk"))
    val r = wh.appendDeduped("corpus",
      docs((1, "x", "zz"), (1, "x", "aa"), (2, "y", "bb")), "doc_id", "doc_id")
    assert(r.appended == 2 && r.dupInBatch == 1, s"got $r")
    val kept = wh.load("corpus").collect()
      .map(r => (r.getLong(0), r.getString(2))).toSet
    // JSON-minimal row wins the same-pk tie: "aa" sorts before "zz"
    assert(kept == Set((1L, "aa"), (2L, "bb")), s"got $kept")
    // replay of the same duplicate-bearing batch converges (appends nothing)
    val replay = wh.appendDeduped("corpus",
      docs((1, "x", "zz"), (1, "x", "aa"), (2, "y", "bb")), "doc_id", "doc_id")
    assert(replay.appended == 0, s"got $replay")
  }

  test("report arithmetic always balances: appended + dups = batch size") {
    val wh = new Warehouse(spark, tmpDir("wh-dedup4"))
    val batch = docs((1, "A", "x"), (2, "A", "x"), (3, "B", "y"), (4, "C", "z"))
    val r1 = wh.appendDeduped("corpus", batch, "fp", "doc_id")
    assert(r1.appended + r1.dupInBatch + r1.dupInTable == 4)
    val r2 = wh.appendDeduped("corpus", docs((5, "C", "z"), (6, "D", "w")), "fp", "doc_id")
    assert(r2.appended + r2.dupInBatch + r2.dupInTable == 2)
    assert(r2.appended == 1 && r2.dupInTable == 1)
  }
}
