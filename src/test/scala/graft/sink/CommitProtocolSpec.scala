package graft.sink

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.{SparkSpec, TestSpark}

/** The snapshot-commit protocol's optimistic-concurrency guard: a commit
  * whose base version was overtaken by another writer must fail loudly
  * (ConcurrentModificationException) instead of silently dropping the other
  * writer's snapshot — the single-writer analog of Iceberg's catalog CAS.
  * (In-package spec: the guard lives in the private commit step, below the
  * public dispositions, which each re-read the version at call time.)
  */
class CommitProtocolSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(StructField("x", LongType)))
  private def df(n: Long) = TestSpark.spark.createDataFrame(
    (0L until n).map(Row(_)).asJava, schema)

  test("stale commit is rejected, table state intact") {
    val wh = new Warehouse(spark, tmpDir("wh-occ"))
    wh.replace("t", df(3)) // v0
    val man = wh.currentManifest("t")
    wh.append("t", df(2))  // v1: a concurrent writer wins the race
    // our commit, computed against v0, must NOT clobber v1
    val e = intercept[java.util.ConcurrentModificationException] {
      wh.commitManifest("t", 1L, man)
    }
    assert(e.getMessage.contains("concurrent writer"))
    assert(wh.currentVersion("t") == 1L)
    assert(wh.load("t").count() == 5)
    // retry against the fresh version succeeds (the documented recovery)
    assert(wh.append("t", df(1)) == 2L)
  }
}
