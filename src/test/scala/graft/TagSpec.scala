package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Snapshot tag contract (Iceberg ref semantics): a tag pins a committed
  * snapshot under a stable name — readable after any number of later
  * commits, addressable from SQL as `VERSION AS OF 'tag'`, PROTECTED from
  * `expireSnapshots` until dropped, and movable by re-tagging.
  */
class TagSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType), StructField("Amount", LongType)))

  private def df(rows: (String, Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  test("tag pins a snapshot across later commits; SQL VERSION AS OF 'tag'") {
    val root = tmpDir("tag-basic")
    spark.conf.set("spark.sql.catalog.tagcat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tagcat.root", root)
    val wh = new Warehouse(spark, root)
    wh.replace("t", df(("a", 1)))
    val v = wh.tagSnapshot("t", "train-v1")
    wh.append("t", df(("b", 2)))
    wh.append("t", df(("c", 3)))
    assert(wh.loadTag("t", "train-v1").collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(wh.resolveTag("t", "train-v1") == v)
    val viaSql = spark.sql("SELECT Id FROM tagcat.t VERSION AS OF 'train-v1'")
    assert(viaSql.collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(spark.sql("SELECT count(*) FROM tagcat.t").head().getLong(0) == 3L)
  }

  test("expireSnapshots protects tagged snapshots; dropTag releases them") {
    val wh = new Warehouse(spark, tmpDir("tag-expire"))
    wh.replace("t", df(("a", 1)))
    wh.tagSnapshot("t", "keepme")
    val tagged = wh.resolveTag("t", "keepme")
    (2 to 6).foreach(i => wh.replace("t", df((s"v$i", i.toLong))))
    wh.expireSnapshots("t", keepLast = 1, orphanGraceMs = 0L)
    // the tagged snapshot survived a keepLast=1 expiry AND still reads its data
    assert(wh.history("t").contains(tagged))
    assert(wh.loadTag("t", "keepme").collect().map(_.getString(0)).toSeq == Seq("a"))
    // intermediate untagged snapshots are gone
    assert(wh.history("t").size == 2, wh.history("t").toString)

    wh.dropTag("t", "keepme")
    wh.expireSnapshots("t", keepLast = 1, orphanGraceMs = 0L)
    assert(!wh.history("t").contains(tagged), "released tag must expire")
    // current snapshot unaffected
    assert(wh.load("t").count() == 1)
  }

  test("re-tagging moves the ref atomically; unknown tags throw") {
    val wh = new Warehouse(spark, tmpDir("tag-move"))
    wh.replace("t", df(("a", 1)))
    wh.tagSnapshot("t", "latest-good")
    wh.append("t", df(("b", 2)))
    wh.tagSnapshot("t", "latest-good") // move to current
    assert(wh.loadTag("t", "latest-good").count() == 2)
    assert(wh.tags("t") == Map("latest-good" -> wh.currentVersion("t")))
    intercept[IllegalArgumentException](wh.resolveTag("t", "nope"))
    intercept[IllegalArgumentException](wh.tagSnapshot("t", "bad/name"))
  }

  test("all-digit tag names are rejected (unreachable via VERSION AS OF)") {
    val wh = new Warehouse(spark, tmpDir("tag-digits"))
    wh.replace("t", df(("a", 1)))
    // loadTable tries version.toLong first, so a tag named '2024' could only
    // ever resolve as a (likely nonexistent) numeric snapshot — ban it
    intercept[IllegalArgumentException](wh.tagSnapshot("t", "2024"))
    wh.tagSnapshot("t", "v2024") // digits are fine when not the whole name
    assert(wh.resolveTag("t", "v2024") == wh.currentVersion("t"))
  }

  test("a legacy all-digit tag is still droppable (rejection applies to creation only)") {
    val root = tmpDir("tag-legacy")
    val wh = new Warehouse(spark, root)
    wh.replace("t", df(("a", 1)))
    // pre-guard era artifact: the ref file exists on disk
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "t", "tag-123.ref"), "0")
    assert(wh.tags("t").get("123").contains(0L), "legacy tag is visible")
    // it pins its snapshot — until dropped, which MUST work, or the
    // snapshot is protected from expiry forever
    assert(wh.dropTag("t", "123"))
    assert(!wh.tags("t").contains("123"))
    // creation stays rejected
    intercept[IllegalArgumentException](wh.tagSnapshot("t", "123"))
  }
}
