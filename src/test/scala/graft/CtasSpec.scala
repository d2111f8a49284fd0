package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Atomic CTAS/RTAS through StagingTableCatalog: one-commit visibility,
  * abort-to-nothing on query failure, REPLACE redefinition with time
  * travel, and the create-race CAS.
  */
class CtasSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val root = {
    val dir = tmpDir("graft-ctas")
    spark.conf.set("spark.sql.catalog.gctas", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gctas.root", dir)
    dir
  }
  private lazy val wh = { root; new Warehouse(spark, root) }

  test("CREATE TABLE AS SELECT lands as exactly one commit (v0 carries the data)") {
    wh.replace("src_t", spark.createDataFrame(
      Seq(("a", 1L), ("b", 2L), ("c", 3L)).map(r => Row(r._1, r._2)).asJava,
      StructType(Seq(StructField("k", StringType), StructField("n", LongType)))))
    spark.sql("CREATE TABLE gctas.ct1 AS SELECT k, n * 10 AS n10 FROM gctas.src_t WHERE n > 1")
    assert(wh.exists("ct1"))
    assert(wh.history("ct1") == Seq(0L), "CTAS must publish as the single v0 commit")
    assert(spark.sql("SELECT k, n10 FROM gctas.ct1 ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("b", 20L), ("c", 30L)))
  }

  test("CTAS with PARTITIONED BY installs the transform spec and hive-splits files") {
    spark.sql("CREATE TABLE gctas.ct2 PARTITIONED BY (bucket(4, k)) AS " +
      "SELECT k, n FROM gctas.src_t")
    assert(wh.partitionSpec("ct2") == Seq("bucket(4,k)"))
    // every file single-valued on the transform (stat min == max)
    val files = wh.currentManifest("ct2").files
    assert(files.nonEmpty && files.forall { f =>
      f.stats.get("bucket(4,k)").exists(s => s.min == s.max)
    }, files.map(_.stats).toString)
  }

  test("a failing CTAS query aborts to NOTHING: no table, no husk directory") {
    val before = wh.listTables().toSet
    intercept[Exception] { // ANSI division by zero fails at execution time
      spark.sql("CREATE TABLE gctas.ct_bad AS SELECT n / 0 AS x FROM gctas.src_t")
    }
    assert(!wh.exists("ct_bad"))
    assert(wh.listTables().toSet == before)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "ct_bad")),
      "aborted CTAS must not leave a table directory behind")
  }

  test("CTAS refuses an existing table; CREATE OR REPLACE / REPLACE redefine atomically") {
    intercept[Exception](
      spark.sql("CREATE TABLE gctas.ct1 AS SELECT 1 AS one"))
    // RTAS: new schema, new content, one commit on top; v0 still time-travels
    spark.sql("REPLACE TABLE gctas.ct1 AS SELECT k AS kk FROM gctas.src_t WHERE n = 1")
    assert(spark.sql("SELECT kk FROM gctas.ct1").collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(wh.history("ct1") == Seq(0L, 1L))
    assert(spark.sql("SELECT k, n10 FROM gctas.ct1 VERSION AS OF 0 ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("b", 20L), ("c", 30L)))
    // REPLACE of a missing table refuses; CREATE OR REPLACE creates it
    intercept[Exception](
      spark.sql("REPLACE TABLE gctas.ct_missing AS SELECT 1 AS one"))
    spark.sql("CREATE OR REPLACE TABLE gctas.ct3 AS SELECT 7 AS seven")
    assert(spark.sql("SELECT seven FROM gctas.ct3").collect().map(_.getInt(0)).toSeq == Seq(7))
  }

  test("RTAS redefines the partition spec too (and '' un-partitions)") {
    spark.sql("CREATE TABLE gctas.ct4 PARTITIONED BY (bucket(4, k)) AS " +
      "SELECT k, n FROM gctas.src_t")
    assert(wh.partitionSpec("ct4") == Seq("bucket(4,k)"))
    spark.sql("REPLACE TABLE gctas.ct4 AS SELECT k FROM gctas.src_t")
    assert(wh.partitionSpec("ct4").isEmpty, "RTAS without PARTITIONED BY un-partitions")
  }

  test("create-race CAS: of two staged creators, exactly one commits") {
    val schema = StructType(Seq(StructField("x", LongType)))
    def frame(v: Long) = spark.createDataFrame(Seq(Row(v)).asJava, schema)
    val s1 = wh.stageCreateTable("race_t", schema, Nil, replaceExisting = false)
    val s2 = wh.stageCreateTable("race_t", schema, Nil, replaceExisting = false)
    s1.write(frame(1L)); s2.write(frame(2L))
    s1.commit()
    intercept[java.util.ConcurrentModificationException](s2.commit())
    s2.abort() // loser's files leave; winner's content intact
    assert(wh.load("race_t").collect().map(_.getLong(0)).toSeq == Seq(1L))
    // RTAS loses the same way if the table moved since staging
    val s3 = wh.stageCreateTable("race_t", schema, Nil, replaceExisting = true)
    s3.write(frame(9L))
    wh.append("race_t", frame(5L))
    intercept[java.util.ConcurrentModificationException](s3.commit())
    s3.abort()
    assert(wh.load("race_t").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 5L))
  }
}
