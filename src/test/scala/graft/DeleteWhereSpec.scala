package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Row-level DELETE WHERE contract: stat-bounded file pruning (provably
  * disjoint files never rewrite), SQL null semantics (NULL predicate keeps
  * the row), no-op commits when nothing matches, and snapshot isolation
  * (pre-delete versions stay readable).
  */
class DeleteWhereSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType), StructField("Amount", LongType)))

  private def df(rows: (String, java.lang.Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  test("range delete rewrites only overlapping files; others prune by stats") {
    val wh = new Warehouse(spark, tmpDir("dw-range"))
    wh.append("t", df(("a", 1L), ("b", 2L), ("c", 3L)), statsCols = Seq("Amount"))
    wh.append("t", df(("x", 100L), ("y", 200L)), statsCols = Seq("Amount"))
    val lowFiles = wh.dataFiles("t").count(_.stats.get("Amount")
      .exists(st => BigDecimal(st.max) < 100))
    assert(lowFiles > 0, "low-range batch must have stats-bounded files")

    val r = wh.deleteWhere("t", col("Amount") >= 100L)
    assert(r.deleted == 2L, r.toString)
    assert(r.prunedFiles >= lowFiles, s"low-range files must prune: $r")
    assert(wh.load("t").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
    // the pruned files carried over by PATH (no rewrite): still referenced
    val after = wh.dataFiles("t").map(_.path).toSet
    val lowPaths = wh.manifestAt("t", r.version - 1).files
      .filter(_.stats.get("Amount").exists(st => BigDecimal(st.max) < 100)).map(_.path).toSet
    assert(lowPaths.subsetOf(after), "untouched files must carry over verbatim")
  }

  test("NULL predicate keeps the row (DELETE only where TRUE)") {
    val wh = new Warehouse(spark, tmpDir("dw-null"))
    wh.append("t", df(("a", 1L), (null, 2L), ("b", null)))
    val r = wh.deleteWhere("t", col("Id") === "a")
    assert(r.deleted == 1L, r.toString)
    // null Id row: predicate NULL -> kept; null Amount row with Id 'b' kept
    assert(wh.load("t").count() == 2)
    val r2 = wh.deleteWhere("t", col("Amount") > 1L)
    assert(r2.deleted == 1L, "null Amount must be kept under Amount > 1")
    assert(wh.load("t").count() == 1)
  }

  test("predicate proven disjoint commits nothing (version unchanged)") {
    val wh = new Warehouse(spark, tmpDir("dw-noop"))
    wh.append("t", df(("a", 1L), ("b", 2L)), statsCols = Seq("Amount"))
    val v = wh.currentVersion("t")
    val r = wh.deleteWhere("t", col("Amount") > 500L)
    assert(r.deleted == 0L && r.version == v, r.toString)
    assert(r.prunedFiles == wh.dataFiles("t").size, "every file stat-pruned")
    // bounds overlap but no row matches -> also a no-op commit
    val r2 = wh.deleteWhere("t", col("Amount") === 1L && col("Id") === "zzz")
    assert(r2.deleted == 0L && r2.version == v, r2.toString)
  }

  test("pre-delete snapshots stay readable (copy-on-write isolation)") {
    val wh = new Warehouse(spark, tmpDir("dw-travel"))
    wh.append("t", df(("a", 1L), ("b", 2L), ("c", 3L)))
    val before = wh.currentVersion("t")
    val r = wh.deleteWhere("t", col("Amount") <= 2L)
    assert(r.deleted == 2L)
    assert(wh.load("t").collect().map(_.getString(0)).toSeq == Seq("c"))
    assert(wh.loadVersion("t", before).count() == 3, "time travel to pre-delete")
  }
}
