package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.{ColStat, StatsPruning, Warehouse}

/** LIKE-prefix (`StartsWith`) and null-safe-equality (`<=>`) file pruning:
  * prefix predicates map to the byte range [p, succ(p)) under the UTF-8
  * binary order the string bounds were computed in, and `col <=> NULL`
  * prunes via the per-file null counts. Unit-level edge cases plus the
  * end-to-end rule behavior with scan-identical answers.
  */
class PrefixPruneSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  test("mayMatchPrefix: range math, unicode, 0xFF tails, z, domain mismatch") {
    def st(mn: String, mx: String) = ColStat("s", mn, mx)
    // plain ranges
    assert(StatsPruning.mayMatchPrefix(st("apple", "banana"), "app"))
    assert(StatsPruning.mayMatchPrefix(st("apple", "banana"), "b"))
    assert(!StatsPruning.mayMatchPrefix(st("apple", "banana"), "c"))   // after max
    assert(!StatsPruning.mayMatchPrefix(st("cherry", "date"), "b"))    // succ(b)=c ≤ min
    assert(StatsPruning.mayMatchPrefix(st("cherry", "date"), "ch"))
    // boundary: min exactly at succ(p) is OUTSIDE [p, succ(p))
    assert(!StatsPruning.mayMatchPrefix(st("ac", "az"), "ab"))
    assert(StatsPruning.mayMatchPrefix(st("ab", "az"), "ab"))
    // empty prefix matches everything non-z
    assert(StatsPruning.mayMatchPrefix(st("x", "y"), ""))
    assert(!StatsPruning.mayMatchPrefix(ColStat("z", "", ""), "a"))
    // unicode: supplementary-plane bounds compare in UTF-8 byte order
    assert(StatsPruning.mayMatchPrefix(st("🦓a", "🦓z"), "🦓"))
    assert(!StatsPruning.mayMatchPrefix(st("abc", "abd"), "🦓"))
    // U+FFFF tail (UTF-8 EF BF BF): successor increments the last non-0xFF
    // byte — prefix pruning must stay conservative-correct around it
    assert(StatsPruning.mayMatchPrefix(st("a￿", "a￿z"), "a￿"))
    assert(!StatsPruning.mayMatchPrefix(st("b", "c"), "a￿"))
    // domain mismatch keeps the file
    assert(StatsPruning.mayMatchPrefix(ColStat("n", "1", "2"), "a"))
  }

  test("LIKE 'p%' prunes files by string bounds; answers equal the raw scan") {
    val root = tmpDir("prefix-prune")
    spark.conf.set("spark.sql.catalog.pfx", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pfx.root", root)
    val schema = StructType(Seq(StructField("s", StringType), StructField("n", LongType)))
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // three files with disjoint string ranges
    wh.append("t", spark.createDataFrame(Seq(
      Row("alpha", 1L), Row("apricot", 2L)).asJava, schema).coalesce(1), statsCols = Seq("s"))
    wh.append("t", spark.createDataFrame(Seq(
      Row("banana", 3L), Row("blueberry", 4L)).asJava, schema).coalesce(1), statsCols = Seq("s"))
    wh.append("t", spark.createDataFrame(Seq(
      Row("cherry", 5L), Row("citrus", 6L)).asJava, schema).coalesce(1), statsCols = Seq("s"))
    val total = wh.currentManifest("t").files.size
    val q = spark.sql("SELECT n FROM pfx.t WHERE s LIKE 'b%' ORDER BY n")
    assert(scannedFiles(q, total) < total, "prefix predicate must prune files")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
    // multi-char prefix straddling a file boundary stays correct
    val q2 = spark.sql("SELECT n FROM pfx.t WHERE s LIKE 'ap%' ORDER BY n")
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("null-safe equality: <=> NULL prunes zero-null files, <=> v behaves like =") {
    val root = tmpDir("nse-prune")
    spark.conf.set("spark.sql.catalog.nse", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.nse.root", root)
    val schema = StructType(Seq(StructField("s", StringType), StructField("n", LongType)))
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    wh.append("t", spark.createDataFrame(Seq(
      Row("a", 1L), Row("b", 2L)).asJava, schema).coalesce(1), statsCols = Seq("s"))   // nulls=0
    wh.append("t", spark.createDataFrame(Seq(
      Row(null, 3L), Row("c", 4L)).asJava, schema).coalesce(1), statsCols = Seq("s"))  // nulls=1
    val total = wh.currentManifest("t").files.size
    val qNull = spark.sql("SELECT n FROM nse.t WHERE s <=> NULL ORDER BY n")
    assert(scannedFiles(qNull, total) < total, "<=> NULL must prune the zero-null file")
    assert(qNull.collect().map(_.getLong(0)).toSeq == Seq(3L))
    val qVal = spark.sql("SELECT n FROM nse.t WHERE s <=> 'a' ORDER BY n")
    assert(scannedFiles(qVal, total) < total, "<=> 'a' must range-prune like =")
    assert(qVal.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }
}
