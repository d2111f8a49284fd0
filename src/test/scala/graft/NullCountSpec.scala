package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** Per-file null counts in the manifest ([[graft.sink.ColStat]]`.nulls`,
  * Iceberg's `null_value_counts` analog): written from parquet footers /
  * the scan fallback, they power
  *
  *   - `IS NULL` file pruning (a file with a PROVEN zero null count has no
  *     matching row) and sharper `IS NOT NULL` pruning (nulls == rows, even
  *     without the "z" marker),
  *   - manifest-served `count(col)` ([[graft.catalog.StatsAggRule]]),
  *
  * and stats written before the field existed must read back as UNKNOWN
  * (−1): no pruning, no serving, no behavior change — pinned here by
  * rewriting a committed manifest into the old 4-field stat form.
  */
class NullCountSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("g", StringType)))

  private def df(rows: Seq[(java.lang.Long, String)]): DataFrame =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private def register(cat: String, root: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
  }

  // scannedFiles: shared in SparkSpec

  test("IS NULL prunes zero-null files; IS NOT NULL prunes all-null-by-count files") {
    val root = tmpDir("nc-prune")
    register("ncp", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // three files with distinct null profiles in g
    wh.append("t", df(Seq((1L: java.lang.Long) -> "a", (2L: java.lang.Long) -> "b")),
      statsCols = Seq("k", "g"))                                  // nulls = 0
    wh.append("t", df(Seq((3L: java.lang.Long) -> "c", (4L: java.lang.Long) -> null)),
      statsCols = Seq("k", "g"))                                  // nulls = 1
    wh.append("t", df(Seq((5L: java.lang.Long) -> null, (6L: java.lang.Long) -> null)),
      statsCols = Seq("k", "g"))                                  // nulls = rows ("z")
    // the write path range-clusters batches, so file counts vary — derive
    // the expected surviving sets from the manifest's own null counts
    val man = wh.currentManifest("t")
    val profiles = man.files.map(f => f.stats("g").nulls -> f.rows)
    assert(profiles.forall(_._1 >= 0L), s"every file must know its null count: $profiles")
    val withNulls = profiles.count(_._1 > 0L)          // may satisfy IS NULL
    val withValues = profiles.count(p => p._1 < p._2)  // may satisfy IS NOT NULL
    assert(withNulls < man.files.size && withValues < man.files.size,
      s"test premise: both predicates must have something to prune ($profiles)")

    val isNull = spark.sql("SELECT k FROM ncp.t WHERE g IS NULL ORDER BY k")
    assert(scannedFiles(isNull, man.files.size) == withNulls,
      "IS NULL must prune every zero-null file")
    assert(isNull.collect().map(_.getLong(0)).toSeq == Seq(4L, 5L, 6L))

    val notNull = spark.sql("SELECT k FROM ncp.t WHERE g IS NOT NULL ORDER BY k")
    assert(scannedFiles(notNull, man.files.size) == withValues,
      "IS NOT NULL must prune every all-null file")
    assert(notNull.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("null counts survive the manifest codec across commit kinds") {
    val root = tmpDir("nc-codec")
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(Seq((1L: java.lang.Long) -> "a", (2L: java.lang.Long) -> null)),
      statsCols = Seq("k", "g"))
    wh.merge("t", df(Seq((2L: java.lang.Long) -> "b", (7L: java.lang.Long) -> null)), Seq("k"))
    wh.compact("t")
    val stats = wh.currentManifest("t").files.flatMap(f => f.stats.get("g"))
    assert(stats.nonEmpty && stats.forall(_.nulls >= 0L),
      s"every rewrite path must re-derive null counts, got $stats")
    // g: "a" survives merge untouched?, final contents 1,2,7 with one null
    val g = wh.load("t").agg(count(lit(1)), count(col("g"))).head()
    assert((g.getLong(0), g.getLong(1)) == ((3L, 2L)))
  }

  test("pre-null-count manifests read as unknown: no pruning, no count(col) serving") {
    val root = tmpDir("nc-compat")
    register("ncc", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", df(Seq((1L: java.lang.Long) -> "a", (2L: java.lang.Long) -> "b")),
      statsCols = Seq("k", "g"))
    // rewrite every manifest/segment file into the OLD stat form (strip the
    // 5th `:nulls` field) — simulating a table written before the field
    val statTok = "([A-Za-z0-9+/=]*:[snz]:[A-Za-z0-9+/=]*:[A-Za-z0-9+/=]*):\\d+".r
    val dir = Paths.get(root, "t")
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".manifest") ||
        p.getFileName.toString.endsWith(".seg"))
      .foreach { p =>
        val old = Files.readString(p)
        Files.writeString(p, statTok.replaceAllIn(old, m => m.group(1)))
      }
    val man = wh.currentManifest("t")
    assert(man.files.flatMap(_.stats.get("g")).forall(_.nulls == -1L),
      "stripped stats must read back as unknown")
    // IS NULL keeps every file (no [k files] label) and stays correct
    val q = spark.sql("SELECT k FROM ncc.t WHERE g IS NULL")
    assert(scannedFiles(q, man.files.size) == man.files.size)
    assert(q.count() == 0L)
    // count(g) must NOT serve from stats — and still answers correctly
    val c = spark.sql("SELECT count(g) AS n FROM ncc.t")
    val hasScan = c.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation])
    assert(hasScan, "unknown null counts must bail to the scan")
    assert(c.head().getLong(0) == 2L)
  }
}
