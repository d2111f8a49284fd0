package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** SCD Type 2 merge contract: business-time versioning (valid_from /
  * valid_to / is_current) with change detection by attribute fingerprint —
  * new keys insert, changed keys close-and-insert, identical keys are
  * no-ops, and a fully-unchanged batch commits nothing. Business-time
  * travel (`scd2AsOf`) must reconstruct any past attribute state exactly,
  * independently of snapshot (processing-time) travel.
  */
class Scd2Spec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("Id", StringType),
    StructField("Tier", StringType),
    StructField("Credit", LongType)))

  private def df(rows: (String, String, Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, schema)

  private def ts(s: String) = Timestamp.valueOf(s)
  private val t0 = ts("2024-01-01 00:00:00")
  private val t1 = ts("2024-02-01 00:00:00")
  private val t2 = ts("2024-03-01 00:00:00")

  test("first batch: every row current from asOf") {
    val wh = new Warehouse(spark, tmpDir("scd2-first"))
    val r = wh.scd2Merge("dim", df(("a", "gold", 10L), ("b", "bronze", 5L)), Seq("Id"), t0)
    assert(r.inserted == 2 && r.closed == 0 && r.unchanged == 0)
    val rows = wh.scd2Current("dim").orderBy("Id").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows.forall(_.getAs[Boolean]("__is_current")))
    assert(rows.forall(_.getAs[Timestamp]("__valid_from") == t0))
    assert(rows.forall(_.getAs[Timestamp]("__valid_to") == null))
  }

  test("changed key closes and re-inserts; unchanged key is a no-op; new key inserts") {
    val wh = new Warehouse(spark, tmpDir("scd2-basic"))
    wh.scd2Merge("dim", df(("a", "gold", 10L), ("b", "bronze", 5L)), Seq("Id"), t0)
    val r = wh.scd2Merge("dim",
      df(("a", "platinum", 10L), ("b", "bronze", 5L), ("c", "silver", 7L)), Seq("Id"), t1)
    assert(r.inserted == 2, s"changed a + new c: $r") // a (changed) + c (new)
    assert(r.closed == 1, s"a's old version: $r")
    assert(r.unchanged == 1, s"b untouched: $r")

    val cur = wh.scd2Current("dim").orderBy("Id").collect()
    assert(cur.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "platinum"), ("b", "bronze"), ("c", "silver")))
    // b's single version still starts at t0 (no churn from re-extraction)
    assert(cur.find(_.getString(0) == "b").get.getAs[Timestamp]("__valid_from") == t0)

    val all = wh.load("dim").collect()
    assert(all.length == 4, "a×2 + b + c")
    val aClosed = all.filter(r => r.getString(0) == "a" && !r.getAs[Boolean]("__is_current"))
    assert(aClosed.length == 1)
    assert(aClosed.head.getAs[Timestamp]("__valid_to") == t1)
    assert(aClosed.head.getString(1) == "gold")
  }

  test("business-time travel reconstructs past states; end-exclusive close") {
    val wh = new Warehouse(spark, tmpDir("scd2-asof"))
    wh.scd2Merge("dim", df(("a", "gold", 10L)), Seq("Id"), t0)
    wh.scd2Merge("dim", df(("a", "platinum", 12L)), Seq("Id"), t1)
    wh.scd2Merge("dim", df(("a", "diamond", 20L)), Seq("Id"), t2)

    def tierAt(t: Timestamp) =
      wh.scd2AsOf("dim", t).collect().map(_.getString(1)).toSeq
    assert(tierAt(t0) == Seq("gold"))
    assert(tierAt(ts("2024-01-15 00:00:00")) == Seq("gold"))
    assert(tierAt(t1) == Seq("platinum"), "close stamp is end-exclusive")
    assert(tierAt(t2) == Seq("diamond"))
    assert(wh.scd2AsOf("dim", ts("2023-12-31 00:00:00")).count() == 0)
    // exactly one current row; history intervals chain t0 -> t1 -> t2 -> open
    val a = wh.load("dim").orderBy("__valid_from").collect()
    assert(a.map(r => Option(r.getAs[Timestamp]("__valid_to"))).toSeq ==
      Seq(Some(t1), Some(t2), None))
  }

  test("fully-unchanged batch commits nothing (no version churn)") {
    val wh = new Warehouse(spark, tmpDir("scd2-noop"))
    wh.scd2Merge("dim", df(("a", "gold", 10L), ("b", "bronze", 5L)), Seq("Id"), t0)
    val v = wh.currentVersion("dim")
    val r = wh.scd2Merge("dim", df(("a", "gold", 10L), ("b", "bronze", 5L)), Seq("Id"), t1)
    assert(r.inserted == 0 && r.closed == 0 && r.unchanged == 2)
    assert(wh.currentVersion("dim") == v, "replayed/unchanged batch must not commit")
    assert(wh.load("dim").count() == 2)
  }

  test("keys absent from a batch are untouched (no implicit deletes)") {
    val wh = new Warehouse(spark, tmpDir("scd2-absent"))
    wh.scd2Merge("dim", df(("a", "gold", 10L), ("b", "bronze", 5L)), Seq("Id"), t0)
    wh.scd2Merge("dim", df(("a", "platinum", 10L)), Seq("Id"), t1)
    val b = wh.scd2Current("dim").filter("Id = 'b'").collect()
    assert(b.length == 1 && b.head.getString(1) == "bronze")
    assert(b.head.getAs[Timestamp]("__valid_from") == t0)
  }

  test("history rows in untouched files survive later merges verbatim") {
    val wh = new Warehouse(spark, tmpDir("scd2-hist"))
    wh.scd2Merge("dim", df(("a", "gold", 10L)), Seq("Id"), t0)
    wh.scd2Merge("dim", df(("a", "platinum", 11L)), Seq("Id"), t1)
    // touch a DIFFERENT key: a's two versions must carry over unchanged
    wh.scd2Merge("dim", df(("z", "silver", 1L)), Seq("Id"), t2)
    val a = wh.load("dim").filter("Id = 'a'").orderBy("__valid_from").collect()
    assert(a.length == 2)
    assert(a.map(_.getString(1)).toSeq == Seq("gold", "platinum"))
    assert(Option(a.head.getAs[Timestamp]("__valid_to")) == Some(t1))
    assert(a.last.getAs[Boolean]("__is_current"))
  }

  test("null-keyed rows always insert, never match (merge contract)") {
    val wh = new Warehouse(spark, tmpDir("scd2-null"))
    wh.scd2Merge("dim", df((null, "gold", 1L)), Seq("Id"), t0)
    val r = wh.scd2Merge("dim", df((null, "gold", 1L)), Seq("Id"), t1)
    assert(r.inserted == 1, "null key can never fingerprint-match")
    assert(wh.load("dim").count() == 2)
    assert(wh.scd2Current("dim").count() == 2, "both null-keyed rows stay current")
  }

  test("snapshot time travel and business time are independent axes") {
    val wh = new Warehouse(spark, tmpDir("scd2-bitemporal"))
    wh.scd2Merge("dim", df(("a", "gold", 10L)), Seq("Id"), t0)
    val vAfterFirst = wh.currentVersion("dim")
    wh.scd2Merge("dim", df(("a", "platinum", 12L)), Seq("Id"), t1)
    // processing time: the OLD SNAPSHOT never saw the platinum version
    val oldSnap = wh.loadVersion("dim", vAfterFirst).collect()
    assert(oldSnap.length == 1 && oldSnap.head.getString(1) == "gold")
    assert(oldSnap.head.getAs[Boolean]("__is_current"))
    // business time: the CURRENT snapshot still reconstructs the t0 state
    assert(wh.scd2AsOf("dim", t0).collect().head.getString(1) == "gold")
  }
}
