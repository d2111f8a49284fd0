package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** Persisted SQL views (ViewCatalog): create/select/replace/alter/rename/
  * drop through SQL, snapshot-freshness (a view re-resolves per statement),
  * name-collision refusals against tables.
  */
class ViewSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val root = {
    val dir = tmpDir("graft-views")
    spark.conf.set("spark.sql.catalog.gview", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gview.root", dir)
    dir
  }
  private lazy val wh = { root; new Warehouse(spark, root) }

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType)))
  private def df(rows: (String, Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  test("CREATE VIEW persists; SELECT re-resolves against the CURRENT snapshot") {
    wh.replace("base_t", df(("a", 1), ("b", 2), ("c", 3)))
    spark.sql("CREATE VIEW gview.big AS SELECT k, n FROM gview.base_t WHERE n >= 2")
    def rows() = spark.sql("SELECT k, n FROM gview.big ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows() == Seq(("b", 2L), ("c", 3L)))
    // the view is METADATA: new commits show through without any DDL
    wh.append("base_t", df(("d", 9)))
    assert(rows() == Seq(("b", 2L), ("c", 3L), ("d", 9L)))
    // survives a fresh catalog instance (durable, not session state)
    spark.conf.set("spark.sql.catalog.gview2", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gview2.root", root)
    assert(spark.sql("SELECT count(*) AS c FROM gview2.big").head().getLong(0) == 3L)
  }

  test("SHOW VIEWS lists; CREATE OR REPLACE redefines; ALTER/RENAME/DROP work") {
    spark.sql("CREATE VIEW gview.v2 AS SELECT 1 AS one")
    val listed = spark.sql("SHOW VIEWS IN gview").collect().map(_.getString(1)).toSet
    assert(listed.contains("v2"), listed.toString)
    intercept[Exception](spark.sql("CREATE VIEW gview.v2 AS SELECT 2 AS two"))
    spark.sql("CREATE OR REPLACE VIEW gview.v2 AS SELECT 2 AS two")
    assert(spark.sql("SELECT two FROM gview.v2").head().getInt(0) == 2)
    spark.sql("ALTER VIEW gview.v2 SET TBLPROPERTIES ('note' = 'x')")
    spark.sql("ALTER VIEW gview.v2 RENAME TO v2r")
    assert(spark.sql("SELECT two FROM gview.v2r").head().getInt(0) == 2)
    spark.sql("DROP VIEW gview.v2r")
    intercept[Exception](spark.sql("SELECT * FROM gview.v2r"))
  }

  test("views never shadow tables: creation at a table name refuses (both directions)") {
    wh.replace("solid_t", df(("a", 1)))
    intercept[Exception](
      spark.sql("CREATE VIEW gview.solid_t AS SELECT 1 AS one"))
    spark.sql("CREATE VIEW gview.v3 AS SELECT 1 AS one")
    // a rename onto a table name refuses too
    intercept[Exception](spark.sql("ALTER VIEW gview.v3 RENAME TO solid_t"))
    spark.sql("DROP VIEW gview.v3")
  }

  test("views compose: over a view, with time travel inside, join with tables") {
    wh.replace("tt_t", df(("a", 1)))
    wh.append("tt_t", df(("b", 2)))
    spark.sql("CREATE VIEW gview.tt_v0 AS SELECT k FROM gview.tt_t VERSION AS OF 0")
    assert(spark.sql("SELECT k FROM gview.tt_v0").collect().map(_.getString(0)).toSeq == Seq("a"))
    spark.sql("CREATE VIEW gview.tt_join AS " +
      "SELECT t.k, t.n FROM gview.tt_t t JOIN gview.tt_v0 v ON t.k = v.k")
    assert(spark.sql("SELECT k, n FROM gview.tt_join").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 1L)))
  }

  test("view bodies with CTEs: readable after splice, CTE names never bind to like-named tables") {
    wh.replace("cte_t", df(("a", 1), ("b", 2)))
    // decoy TABLE named like the view's CTE — the CTE must win inside the view
    wh.replace("tmp", df(("z", 99)))
    spark.sql("CREATE VIEW gview.cte_v AS " +
      "WITH tmp AS (SELECT k, n + 10 AS n FROM gview.cte_t) SELECT k, n FROM tmp")
    assert(spark.sql("SELECT k, n FROM gview.cte_v ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 11L), ("b", 12L)))
    // chained CTEs (later referencing earlier) + a CTE referenced from a
    // subquery expression — both must survive the Resolution-batch splice
    spark.sql("CREATE VIEW gview.cte_chain AS " +
      "WITH base AS (SELECT k, n FROM gview.cte_t), " +
      "big AS (SELECT k FROM base WHERE n >= 2) " +
      "SELECT k FROM gview.cte_t WHERE k IN (SELECT k FROM big)")
    assert(spark.sql("SELECT k FROM gview.cte_chain").collect()
      .map(_.getString(0)).toSeq == Seq("b"))
  }

  test("WITH nested inside a CTE definition inlines (innerChildren are not traversal-reachable)") {
    wh.replace("nest_t", df(("a", 1), ("b", 2), ("c", 3)))
    // the nested WITH lives in the OUTER CTE's definition — an innerChild of
    // UnresolvedWith, invisible to transformUpWithSubqueries — so only the
    // explicit per-definition recursion inlines it; pre-fix this view fails
    // analysis with an unresolved-operator error
    spark.sql("CREATE VIEW gview.nest_v AS " +
      "WITH a AS (WITH b AS (SELECT k, n FROM gview.nest_t WHERE n >= 2) " +
      "SELECT k, n + 100 AS n FROM b) " +
      "SELECT k, n FROM a")
    assert(spark.sql("SELECT k, n FROM gview.nest_v ORDER BY k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 102L), ("c", 103L)))
    // nested-WITH shadowing: the INNER definition of the same name wins
    // inside its scope, the outer one elsewhere — the analyzer's own scoping
    spark.sql("CREATE VIEW gview.nest_shadow AS " +
      "WITH x AS (SELECT k, n FROM gview.nest_t), " +
      "y AS (WITH x AS (SELECT k, n * 10 AS n FROM gview.nest_t) " +
      "SELECT k, n FROM x) " +
      "SELECT x.k, x.n AS outer_n, y.n AS inner_n FROM x JOIN y ON x.k = y.k")
    val got = spark.sql("SELECT k, outer_n, inner_n FROM gview.nest_shadow ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 1L, 10L), ("b", 2L, 20L), ("c", 3L, 30L)), got.toString)
  }

  test("bare names inside view SUBQUERY expressions resolve in the CREATION catalog") {
    wh.replace("subq_t", df(("a", 1), ("b", 2)))
    wh.replace("subq_allow", df(("b", 0)))
    val otherRoot = tmpDir("graft-views-other")
    spark.conf.set("spark.sql.catalog.gother", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gother.root", otherRoot)
    val who = new Warehouse(spark, otherRoot)
    who.replace("subq_allow", df(("a", 0))) // decoy: same name, other catalog
    val prev = spark.sessionState.catalogManager.currentCatalog.name()
    try {
      spark.sql("SET CATALOG gview")
      spark.sql("CREATE VIEW gview.subq_v AS SELECT k FROM gview.subq_t t " +
        "WHERE EXISTS (SELECT 1 FROM subq_allow a WHERE a.k = t.k)")
      // read under a DIFFERENT current catalog holding the decoy: the view's
      // subquery must still read the creation catalog's table
      spark.sql("SET CATALOG gother")
      val got = spark.sql("SELECT k FROM gview.subq_v").collect()
        .map(_.getString(0)).toSeq
      assert(got == Seq("b"),
        s"subquery relation bound to the READER's catalog (wrong-table read): $got")
    } finally spark.sql(s"SET CATALOG $prev")
  }
}
