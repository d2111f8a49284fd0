package graft.catalog

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec
import graft.sink.Warehouse

/** Misconfiguration / contract-drift guards on the catalog face:
  *   - a plain scan of a table with pending MOR deletes must FAIL, not
  *     resurrect deleted rows (the MorReadRule swap rides
  *     spark.sql.extensions — a catalog-only session would bypass it);
  *   - an unconvertible DSv2 delete predicate must THROW, never be dropped
  *     (dropping weakens the condition and deletes MORE rows than asked);
  *   - copy-on-write rewrites (deleteWhere / updateWhere) must re-cluster
  *     survivors on the partition spec so transform bounds stay tight.
  */
class CatalogGuardSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("v", StringType)))

  private def rows(day: String, ids: Range) =
    spark.createDataFrame(ids.map(i => Row(i.toLong, java.sql.Timestamp.from(
      java.time.Instant.parse(s"${day}T0${i % 10}:00:00Z")), s"v$i")).asJava, schema)

  test("newScanBuilder refuses a snapshot with pending equality deletes") {
    val root = tmpDir("guard-mor")
    val wh = new Warehouse(spark, root)
    wh.replace("t", rows("2020-01-01", 0 until 10), statsCols = Seq("id"))
    wh.equalityDelete("t", spark.createDataFrame(
      Seq(Row(3L)).asJava, StructType(Seq(StructField("id", LongType)))))

    val gt = new GraftTable("g.t", "t", root, None)
    val err = intercept[IllegalArgumentException] {
      gt.newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
    }
    assert(err.getMessage.contains("pending equality-delete"))
    // once compacted the plain scan is safe again and the builder serves it
    wh.compactDeletes("t")
    new GraftTable("g.t2", "t", root, None)
      .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
  }

  test("deleteWhere throws on an unconvertible predicate instead of over-deleting") {
    val root = tmpDir("guard-del")
    val wh = new Warehouse(spark, root)
    wh.replace("t", rows("2020-01-01", 0 until 10), statsCols = Seq("id"))

    val gt = new GraftTable("g.t", "t", root, None)
    // col = col: predColumn cannot convert it; canDeleteWhere would refuse,
    // but if Spark's vetting contract ever drifts the execution path must
    // fail too — silently dropping it would make the delete unconditional
    val colEqCol = new Predicate("=",
      Array(Expressions.column("id"), Expressions.column("v")))
    assert(!gt.canDeleteWhere(Array(colEqCol)))
    intercept[UnsupportedOperationException] { gt.deleteWhere(Array(colEqCol)) }
    assert(wh.load("t").count() == 10, "a refused delete must delete nothing")
  }

  test("copy-on-write rewrites re-cluster on the partition spec: bounds stay tight") {
    val root = tmpDir("guard-cluster")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema, Seq("days(ts)"))
    // one batch spanning two days: cluster() splits it into per-day files
    wh.append("t", rows("2020-01-01", 0 until 10).union(rows("2020-01-02", 10 until 20)))
    def tight() = wh.dataFiles("t").foreach { f =>
      val s = f.stats("days(ts)")
      assert(s.min == s.max, s"file ${f.path} spans days [${s.min}, ${s.max}]")
    }
    tight()

    // both files are victims (even ids live in each); without re-clustering
    // the rewrite would coalesce them into one file spanning both days and
    // transform pruning would degrade for every later scan
    wh.updateWhere("t", col("id") % 2 === 0, Map("v" -> lit("even")))
    tight()
    wh.deleteWhere("t", col("id") % 2 === 1)
    tight()
    assert(wh.load("t").count() == 10)
    assert(wh.load("t").select("v").distinct().collect().map(_.getString(0)).toSeq == Seq("even"))
  }
}
