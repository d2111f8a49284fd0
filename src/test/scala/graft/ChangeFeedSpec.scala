package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Incremental change feed: file-grain added-data reads are exact for
  * appends, a documented superset across merges (rewritten files carry
  * survivors), and the row-level diff is exact everywhere.
  */
class ChangeFeedSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType),
    StructField("Amount", LongType)))

  private def df(rows: (String, Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private def ids(d: org.apache.spark.sql.DataFrame): Seq[String] =
    d.collect().map(_.getString(0)).sorted.toSeq

  test("appends: readAdded returns exactly the batches between the versions") {
    val wh = new Warehouse(spark, tmpDir("cf-append"))
    val v1 = wh.append("t", df(("a", 1), ("b", 2)))
    val v2 = wh.append("t", df(("c", 3)))
    val v3 = wh.append("t", df(("d", 4), ("e", 5)))
    assert(ids(wh.readAdded("t", v1, v2)) == Seq("c"))
    assert(ids(wh.readAdded("t", v1, v3)) == Seq("c", "d", "e"))
    assert(ids(wh.readAdded("t", v3, v3)) == Seq.empty)
    // the feed reads only the new files, not the table
    assert(wh.addedFiles("t", v1, v3).map(_.rows).sum == 3)
  }

  test("merge: file feed is a superset containing the incoming rows; diffRows is exact") {
    val wh = new Warehouse(spark, tmpDir("cf-merge"))
    val v1 = wh.replace("t", df(("a", 1), ("b", 2), ("c", 3)))
    val v2 = wh.merge("t", df(("b", 20), ("d", 40)), Seq("Id"))
    val feed = wh.readAdded("t", v1, v2)
    assert(Set("b", "d").subsetOf(ids(feed).toSet),
      "incoming rows must appear in the file-grain feed")
    val (added, removed) = wh.diffRows("t", v1, v2)
    assert(added.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("b", 20L), ("d", 40L)))
    assert(removed.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("b", 2L)))
  }

  test("empty diff yields an empty frame with the snapshot schema") {
    val wh = new Warehouse(spark, tmpDir("cf-empty"))
    val v1 = wh.append("t", df(("a", 1)))
    val out = wh.readAdded("t", v1, v1)
    assert(out.schema.fieldNames.toSeq == Seq("Id", "Amount"))
    assert(out.count() == 0)
  }
}
