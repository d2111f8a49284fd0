package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.{ColStat, DataFile, Manifest, RowLineage, Warehouse}

/** Row lineage (the Iceberg v3 `first_row_id` analog): every row gets a
  * stable `_row_id` at its first commit — derived from manifest metadata
  * for fresh files, materialized physically by content-preserving
  * rewrites — unique forever (the high-water rides every manifest root)
  * and stable across appends, MOR churn, compaction, DELETE WHERE,
  * branches and restores.
  */
class RowLineageSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))
  private def df(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  /** k → _row_id of the current (or given) snapshot. */
  private def ids(wh: Warehouse, t: String, v: Long = -1L): Map[Long, Long] =
    wh.loadWithLineage(t, v).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("_row_id"))).toMap

  /** k → _last_updated_version of the current snapshot. */
  private def vers(wh: Warehouse, t: String): Map[Long, Long] =
    wh.loadWithLineage(t).collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("_last_updated_version"))).toMap

  test("assignment: unique at commit, stable across appends and MOR churn; upserts are new row versions") {
    val wh = new Warehouse(spark, tmpDir("rl-basic"))
    wh.create("t", schema)
    wh.append("t", df(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    val i1 = ids(wh, "t")
    assert(i1.values.toSet.size == 2, s"ids must be unique: $i1")
    wh.append("t", df(3L -> "c", 4L -> "d"), statsCols = Seq("k"))
    val i2 = ids(wh, "t")
    assert(i2.filterKeys(i1.contains).toMap == i1, "appends must not move prior ids")
    assert(i2.values.toSet.size == 4)
    // MOR equality delete: survivors keep their ids
    wh.equalityDelete("t", df(1L -> "x").select("k"))
    assert(ids(wh, "t") == i2 - 1L, "a MOR delete must not move survivors' ids")
    // DV positional delete: same
    wh.compactDeletes("t")
    wh.positionDelete("t", col("k") === 2L)
    assert(ids(wh, "t") == i2 - 1L - 2L)
    // morMerge: the incoming row is a NEW row version — fresh id; the
    // untouched key keeps its id
    wh.morMerge("t", df(3L -> "C"), Seq("k"))
    val i3 = ids(wh, "t")
    assert(i3(4L) == i2(4L), "untouched key must keep its id")
    assert(i3(3L) != i2(3L), "an upserted key is a new row version: fresh id")
    assert(i3.values.toSet.size == 2)
    // time travel: the old snapshot still serves the old ids
    assert(ids(wh, "t", 2L) == i2)
  }

  test("content-preserving rewrites CARRY ids: compactFiles, compactDeletes, deleteWhere") {
    val wh = new Warehouse(spark, tmpDir("rl-rewrite"))
    wh.create("t", schema)
    (0 until 3).foreach(i => wh.append("t",
      df((10L * i until 10L * i + 10).map(k => k -> s"v$k"): _*), statsCols = Seq("k")))
    val before = ids(wh, "t")
    assert(before.size == 30)
    // fresh files: _last_updated_version = the append's commit version
    val versBefore = vers(wh, "t")
    assert(versBefore == (0L until 30L).map(k => k -> (k / 10 + 1)).toMap, versBefore.toString)
    wh.compactFiles("t") // merges the three small files
    assert(wh.currentManifest("t").files.size < 3 ||
      wh.currentManifest("t").files.forall(_.stats.contains(RowLineage.Key)))
    assert(ids(wh, "t") == before, "compaction must carry every id")
    assert(vers(wh, "t") == versBefore,
      "compaction must carry every row's ORIGINAL last-updated version")
    // the rewritten entries are MARKED materialized
    assert(wh.currentManifest("t").files.exists(_.stats.contains(RowLineage.Key)))
    // pending MOR delete + compactDeletes: survivors carried
    wh.equalityDelete("t", df(5L -> "x", 15L -> "x").select("k"))
    wh.compactDeletes("t")
    assert(ids(wh, "t") == before - 5L - 15L, "compactDeletes must carry survivors' ids")
    // DELETE WHERE: survivors carried (a second-generation rewrite — the
    // carried column itself must carry)
    wh.deleteWhere("t", col("k") % 2 === 0)
    assert(ids(wh, "t") == (before - 5L - 15L).filter(_._1 % 2 != 0),
      "deleteWhere must carry survivors' ids")
  }

  test("ids are never reused, even after the highest-id files are removed outright") {
    val wh = new Warehouse(spark, tmpDir("rl-hwm"))
    wh.create("t", schema)
    wh.append("t", df(1L -> "a", 2L -> "b"), statsCols = Seq("k"))
    val maxBefore = ids(wh, "t").values.max
    // remove EVERY row: the table's files vanish with no replacement — the
    // only witness against recycling is the root's high-water
    wh.deleteWhere("t", lit(true))
    assert(wh.load("t").count() == 0)
    wh.append("t", df(9L -> "z"), statsCols = Seq("k"))
    val fresh = ids(wh, "t")(9L)
    assert(fresh > maxBefore, s"id $fresh recycled a removed row's id (max was $maxBefore)")
  }

  test("partitioned tables: carry survives the hive-split rewrite (ids and versions intact)") {
    val wh = new Warehouse(spark, tmpDir("rl-part"))
    wh.create("t", schema, Seq("bucket(4,k)"))
    (0 until 2).foreach(i => wh.append("t",
      df((8L * i until 8L * i + 8).map(k => k -> s"v$k"): _*), statsCols = Seq("k")))
    val i0 = ids(wh, "t")
    val v0 = vers(wh, "t")
    // the rewrite re-clusters by the spec and hive-splits per bucket — the
    // physical lineage columns must ride through the partitioned write
    wh.compactFiles("t")
    assert(ids(wh, "t") == i0, "partitioned compaction must carry ids")
    assert(vers(wh, "t") == v0, "partitioned compaction must carry versions")
    wh.deleteWhere("t", col("k") % 4 === 0)
    assert(ids(wh, "t") == i0.filter(_._1 % 4 != 0))
  }

  test("COW merge carries unmatched rows' ids; COW update keeps the updated row's identity") {
    val wh = new Warehouse(spark, tmpDir("rl-cow"))
    wh.create("t", schema)
    wh.append("t", df((1L to 6L).map(k => k -> s"v$k"): _*), statsCols = Seq("k"))
    val before = ids(wh, "t")
    // merge: key 2 is REPLACED by the batch row (new version, fresh id from
    // the batch's file); unmatched rows in the rewritten victims carry
    wh.merge("t", df(2L -> "B2", 7L -> "g"), Seq("k"))
    val after = ids(wh, "t")
    ((1L to 6L).toSet - 2L).foreach(k =>
      assert(after(k) == before(k), s"carry-over key $k moved: ${before(k)} -> ${after(k)}"))
    assert(after(2L) != before(2L), "a merged-in row is a new row version")
    assert(after.values.toSet.size == 7)
    // update: the row's IDENTITY survives a value change (the Iceberg v3
    // UPDATE rule) — same id, new value, and ONLY its last-updated version
    // advances to the update's commit
    val versBefore = vers(wh, "t")
    wh.updateWhere("t", col("k") === 3L, Map("v" -> lit("V3")))
    val updated = ids(wh, "t")
    assert(updated == after, s"updateWhere must not move ANY id: $after vs $updated")
    assert(wh.load("t").filter(col("k") === 3L).head().getString(1) == "V3")
    val versAfter = vers(wh, "t")
    assert(versAfter(3L) == wh.currentVersion("t"),
      s"the updated row's version must advance: ${versAfter(3L)}")
    assert(versAfter - 3L == versBefore - 3L,
      "untouched rows must keep their last-updated versions")
  }

  test("SQL face: t$lineage serves _row_id through plain SQL, stable across compaction") {
    val root = tmpDir("rl-sql")
    spark.conf.set("spark.sql.catalog.grl", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grl.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    (0 until 3).foreach(i => wh.append("t",
      df((10L * i until 10L * i + 5).map(k => k -> s"v$k"): _*), statsCols = Seq("k")))
    def sqlIds(): Map[Long, Long] =
      spark.sql("SELECT k, _row_id FROM grl.`t$lineage`").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = sqlIds()
    assert(before == ids(wh, "t"), "SQL face must serve the API's ids")
    assert(spark.sql("SELECT count(*) FROM grl.`t$lineage` WHERE k >= 10").head().getLong(0) == 10L)
    wh.compactFiles("t")
    assert(sqlIds() == before, "SQL face ids stable across compaction")
    // joins compose: lineage self-join pairs every row with itself
    assert(spark.sql(
      "SELECT count(*) FROM grl.`t$lineage` a JOIN grl.`t$lineage` b " +
        "ON a._row_id = b._row_id WHERE a.k = b.k").head().getLong(0) == 15L)
  }

  test("branches and restores preserve ids; pre-lineage files refuse with the adoption step") {
    val wh = new Warehouse(spark, tmpDir("rl-refs"))
    wh.create("t", schema)
    wh.append("t", df(1L -> "a"), statsCols = Seq("k"))
    val i1 = ids(wh, "t")
    wh.createBranch("t", "dev")
    wh.append("t@dev", df(2L -> "b"), statsCols = Seq("k"))
    val ib = ids(wh, "t@dev")
    assert(ib(1L) == i1(1L), "fork must keep main's ids")
    wh.publishBranch("t", "dev")
    assert(ids(wh, "t") == ib, "publish must carry the branch's ids")
    val preRestore = wh.currentVersion("t")
    wh.append("t", df(3L -> "c"), statsCols = Seq("k"))
    wh.restore("t", preRestore)
    assert(ids(wh, "t") == ib, "restore must serve the restored snapshot's ids")

    // assignment unit contract: adoption assigns in manifest order past the
    // high-water; already-assigned entries are untouched
    val m = Manifest(schema, Seq(
      DataFile("a.parquet", 10, Map.empty[String, ColStat]),
      DataFile("b.parquet", 5, Map.empty[String, ColStat], firstRowId = 100L),
      DataFile("c.parquet", 3, Map.empty[String, ColStat])))
    val assigned = Manifest.assignRowIds(m, prevHwm = 200L)
    assert(assigned.files.map(_.firstRowId) == Seq(200L, 100L, 210L))
    assert(assigned.rowHwm == 213L)
    // hwm witness beats manifest contents (files removed without replacement)
    assert(Manifest.assignRowIds(Manifest(schema, Nil), 42L).rowHwm == 42L)
  }
}
