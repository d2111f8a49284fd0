package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Explicit schema evolution (ADD COLUMN): a manifest-only schema commit —
  * no data rewrite, null-backfill on read, old snapshots keep their own
  * schema — plus the `MERGE ... WITH SCHEMA EVOLUTION` upsert that adds the
  * source's extra columns instead of dropping them (the documented
  * divergence from target-schema-wins conform, which stays the default).
  */
class SchemaEvolutionSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val root = {
    val dir = tmpDir("graft-evo")
    spark.conf.set("spark.sql.catalog.gevo", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gevo.root", dir)
    dir
  }
  private lazy val wh = { root; new Warehouse(spark, root) }

  private val schema = StructType(Seq(
    StructField("Id", StringType),
    StructField("Amount", LongType)))

  private def df(rows: (String, Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  test("ALTER TABLE ADD COLUMN: no rewrite, null backfill, old snapshots keep old schema") {
    wh.replace("t1", df(("a", 1), ("b", 2)), Seq("Id"))
    val v1 = wh.currentVersion("t1")
    val filesBefore = wh.dataFiles("t1").map(_.path)

    spark.sql("ALTER TABLE gevo.t1 ADD COLUMN note STRING")
    assert(wh.dataFiles("t1").map(_.path) == filesBefore, "schema commit must not rewrite data")
    // old rows null-backfill on read
    val out = spark.sql("SELECT Id, Amount, note FROM gevo.t1 ORDER BY Id").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.isNullAt(2))).toSeq ==
      Seq(("a", 1L, true), ("b", 2L, true)))
    // new writes carry the column; old files still backfill
    spark.sql("INSERT INTO gevo.t1 VALUES ('c', 3, 'fresh')")
    val all = spark.sql("SELECT Id, note FROM gevo.t1 ORDER BY Id").collect()
    assert(all.map(r => (r.getString(0), Option(r.getString(1)))).toSeq ==
      Seq(("a", None), ("b", None), ("c", Some("fresh"))))
    // the pre-evolution snapshot still travels with the OLD schema
    val old = spark.sql(s"SELECT * FROM gevo.t1 VERSION AS OF $v1")
    assert(old.columns.toSeq == Seq("Id", "Amount"))
    assert(old.count() == 2)
  }

  test("ALTER TABLE rejects NOT NULL, duplicates, positions, and retype; rename/drop evolve") {
    wh.replace("t2", df(("a", 1)), Seq("Id"))
    def bad(sql: String): String = intercept[Exception](spark.sql(sql)).getMessage
    assert(bad("ALTER TABLE gevo.t2 ADD COLUMN c LONG NOT NULL").contains("NOT NULL"))
    assert(bad("ALTER TABLE gevo.t2 ADD COLUMN Amount LONG").contains("already exist"))
    assert(bad("ALTER TABLE gevo.t2 ADD COLUMN c LONG FIRST").contains("FIRST/AFTER"))
    assert(bad("ALTER TABLE gevo.t2 ALTER COLUMN Amount TYPE STRING")
      .contains("unsupported ALTER TABLE change"))
    // rename and drop are metadata-only field-id evolution now
    // (ColumnEvolutionSpec pins the semantics; here just the DDL face)
    spark.sql("ALTER TABLE gevo.t2 RENAME COLUMN Amount TO amt")
    assert(spark.sql("SELECT amt FROM gevo.t2").collect().map(_.getLong(0)).toSeq == Seq(1L))
    spark.sql("ALTER TABLE gevo.t2 DROP COLUMN amt")
    assert(spark.sql("SELECT * FROM gevo.t2").columns.toSeq == Seq("Id"))
  }

  test("MERGE WITH SCHEMA EVOLUTION adds the extra source column; plain MERGE drops it") {
    val wide = StructType(schema.fields :+ StructField("extra", LongType))
    def wideDf(rows: (String, Long, Long)*) =
      spark.createDataFrame(rows.map(r => Row(r._1, r._2, r._3)).asJava, wide)

    // plain MERGE: target-schema-wins — extra is dropped (dlt conform contract)
    wh.replace("t3", df(("a", 1), ("b", 2)), Seq("Id"))
    wideDf(("b", 20, 99), ("c", 30, 77)).createOrReplaceTempView("evo_b")
    spark.sql("MERGE INTO gevo.t3 t USING evo_b s ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(wh.load("t3").columns.toSeq == Seq("Id", "Amount"))

    // WITH SCHEMA EVOLUTION: extra becomes a real nullable column
    wh.replace("t4", df(("a", 1), ("b", 2)), Seq("Id"))
    spark.sql("MERGE WITH SCHEMA EVOLUTION INTO gevo.t4 t USING evo_b s " +
      "ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    val out = spark.sql("SELECT Id, Amount, extra FROM gevo.t4 ORDER BY Id").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq ==
      Seq(("a", 1L, -1L), ("b", 20L, 99L), ("c", 30L, 77L)))

    // replay: addMissingColumns skips the existing column, merge idempotent
    spark.sql("MERGE WITH SCHEMA EVOLUTION INTO gevo.t4 t USING evo_b s " +
      "ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(wh.load("t4").count() == 3)
    assert(wh.load("t4").columns.toSeq == Seq("Id", "Amount", "extra"))
  }

  test("evolution guards: type conflict fails; non-upsert shapes stay rejected") {
    wh.replace("t5", df(("a", 1)), Seq("Id"))
    // same-named source column with a different type must fail, not coerce
    spark.createDataFrame(Seq(Row("a", "not-a-long")).asJava,
      StructType(Seq(StructField("Id", StringType), StructField("Amount", StringType))))
      .createOrReplaceTempView("evo_conflict")
    val e1 = intercept[Exception] {
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO gevo.t5 t USING evo_conflict s " +
        "ON t.Id = s.Id WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e1.getMessage.contains("cannot change column types"), e1.getMessage)
    df(("a", 2)).createOrReplaceTempView("evo_plain")
    val e2 = intercept[Exception] {
      spark.sql("MERGE WITH SCHEMA EVOLUTION INTO gevo.t5 t USING evo_plain s " +
        "ON t.Id = s.Id WHEN MATCHED AND s.Amount > 1 THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *")
    }
    assert(e2.getMessage.contains("plain upsert"), e2.getMessage)
  }
}
