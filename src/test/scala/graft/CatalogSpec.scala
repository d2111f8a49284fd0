package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sink.Warehouse

/** SQL addressability of the warehouse through `GraftCatalog` — the engine
  * analog of querying the reference's Iceberg REST catalog by name
  * (`check_tables.py:16-32`, Airflow verify task
  * `salesforce_iceberg_dag.py:106-140`): name resolution, verification-style
  * counts purely via `spark.sql`, snapshot time travel in SQL, inserts with
  * dispositions, DDL.
  */
class CatalogSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private lazy val root = {
    val dir = tmpDir("graft-catalog")
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", dir)
    dir
  }
  private lazy val wh = { root; new Warehouse(spark, root) }

  private val schema = StructType(Seq(
    StructField("Id", StringType),
    StructField("Amount", LongType)))

  private def df(rows: (String, Long)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  test("SELECT by name reads the current snapshot; filters/pruning push down") {
    wh.replace("orders_sql", df(("a", 1), ("b", 2), ("c", 3)))
    val out = spark.sql("SELECT Id, Amount FROM graft.orders_sql WHERE Amount > 1 ORDER BY Id")
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 2L), ("c", 3L)))
    // the scan is Spark's parquet DSv2: pushed filter visible in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(Amount,1)"), plan)
  }

  test("manifest-stat file skipping: a key-range predicate opens only overlapping files") {
    // four appends with disjoint Amount ranges, one data file each,
    // stats collected on Amount
    (0 until 4).foreach { b =>
      val rows = (0 until 10).map(i => Row(s"k$b-$i", b * 100L + i))
      wh.append("pruned_sql",
        spark.createDataFrame(rows.asJava, schema).repartition(1), Seq("Amount"))
    }
    assert(wh.dataFiles("pruned_sql").size == 4)

    // GraftTable.name() reports the pruned file count, which the BatchScan
    // node renders — assert on the plan text (the physical tree nests AQE
    // query stages as leaf wrappers, so a collect() tree-walk can't see it).
    def scanLabel(df: org.apache.spark.sql.DataFrame): String = {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters"), s"parquet pushdown lost:\n$plan")
      "\\[(\\d+) files\\]".r.findFirstMatchIn(plan).map(_.group(1)).getOrElse("unpruned")
    }

    val q = spark.sql("SELECT Id, Amount FROM graft.pruned_sql WHERE Amount >= 300 ORDER BY Id")
    assert(scanLabel(q) == "1", "expected 1 file after pruning")
    assert(q.count() == 10)

    // point lookup: one file; unprunable predicate: all files, same rows
    val point = spark.sql("SELECT * FROM graft.pruned_sql WHERE Amount = 105")
    assert(scanLabel(point) == "1" && point.count() == 1)
    val unprunable = spark.sql("SELECT * FROM graft.pruned_sql WHERE Id LIKE '%-3'")
    assert(scanLabel(unprunable) == "unpruned" && unprunable.count() == 4)
  }

  test("verification-style catalog sweep purely via spark.sql") {
    wh.replace("t_a", df(("a", 1)))
    wh.replace("t_b", df(("b", 2), ("c", 3)))
    // SHOW TABLES + per-table counts, the q08/check_tables.py analog
    val tables = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(Set("t_a", "t_b").subsetOf(tables))
    val counts = Seq("t_a", "t_b")
      .map(t => t -> spark.sql(s"SELECT count(*) FROM graft.$t").head().getLong(0)).toMap
    assert(counts == Map("t_a" -> 1L, "t_b" -> 2L))
  }

  test("VERSION AS OF / TIMESTAMP AS OF time travel in SQL") {
    wh.replace("tt", df(("a", 1)))                  // v0
    wh.append("tt", df(("b", 2)))                   // v1
    wh.merge("tt", df(("a", 10)), Seq("Id"))        // v2
    assert(spark.sql("SELECT count(*) FROM graft.tt VERSION AS OF 0").head().getLong(0) == 1)
    assert(spark.sql("SELECT count(*) FROM graft.tt VERSION AS OF 1").head().getLong(0) == 2)
    val v2 = spark.sql("SELECT Id, Amount FROM graft.tt ORDER BY Id").collect()
    assert(v2.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 10L), ("b", 2L)))
    // TIMESTAMP AS OF now() resolves to the newest snapshot
    val cnt = spark.sql(
      "SELECT count(*) FROM graft.tt TIMESTAMP AS OF current_timestamp()").head().getLong(0)
    assert(cnt == 2)
    intercept[Exception](spark.sql("SELECT * FROM graft.tt VERSION AS OF 99").collect())
  }

  test("INSERT INTO appends; INSERT OVERWRITE replaces") {
    spark.sql("CREATE TABLE graft.ins (Id STRING, Amount BIGINT)")
    spark.sql("INSERT INTO graft.ins VALUES ('a', 1)")
    spark.sql("INSERT INTO graft.ins VALUES ('b', 2)")
    assert(spark.sql("SELECT count(*) FROM graft.ins").head().getLong(0) == 2)
    spark.sql("INSERT OVERWRITE graft.ins VALUES ('z', 9)")
    assert(spark.sql("SELECT Id FROM graft.ins").collect().map(_.getString(0)).toSeq == Seq("z"))
  }

  test("writeTo carries the merge disposition via options") {
    wh.replace("m", df(("a", 1), ("b", 2)))
    df(("b", 20), ("c", 30)).writeTo("graft.m")
      .option("disposition", "merge").option("primaryKeys", "Id")
      .append()
    val out = spark.sql("SELECT Id, Amount FROM graft.m ORDER BY Id").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 20L), ("c", 30L)))
  }

  test("writeTo merge honors the broadcast gate option (results unchanged)") {
    wh.replace("mg", df(("a", 1), ("b", 2)))
    df(("b", 20), ("c", 30)).writeTo("graft.mg")
      .option("disposition", "merge").option("primaryKeys", "Id")
      .option("mergeBroadcastMaxKeys", "0") // force the SMJ fallback
      .append()
    val out = spark.sql("SELECT Id, Amount FROM graft.mg ORDER BY Id").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 1L), ("b", 20L), ("c", 30L)))
  }

  // --- SQL MERGE INTO (GraftMergeRule → disposition=merge write path) -----

  private def rowsOf(t: String): Seq[(String, Long)] =
    spark.sql(s"SELECT Id, Amount FROM graft.$t").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
      .sortBy(p => (Option(p._1).getOrElse(""), p._2))

  test("SQL MERGE INTO ≡ Warehouse.merge: upsert semantics, one write path") {
    wh.replace("mi_sql", df(("a", 1), ("b", 2), ("c", 3)), Seq("Id"))
    wh.replace("mi_api", df(("a", 1), ("b", 2), ("c", 3)), Seq("Id"))
    val batch = df(("b", 20), ("d", 4))
    batch.createOrReplaceTempView("mi_batch")
    spark.sql("MERGE INTO graft.mi_sql t USING mi_batch s ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    wh.merge("mi_api", batch, Seq("Id"))
    assert(rowsOf("mi_sql") == rowsOf("mi_api"))
    assert(rowsOf("mi_sql") == Seq(("a", 1L), ("b", 20L), ("c", 3L), ("d", 4L)))
  }

  test("SQL MERGE duplicate-PK-in-batch contract matches Warehouse.merge (all batch rows land)") {
    wh.replace("md_sql", df(("a", 1), ("b", 2)), Seq("Id"))
    wh.replace("md_api", df(("a", 1), ("b", 2)), Seq("Id"))
    val batch = df(("a", 7), ("a", 8), ("e", 5)) // ANSI MERGE would raise a cardinality violation
    batch.createOrReplaceTempView("md_batch")
    spark.sql("MERGE INTO graft.md_sql t USING md_batch s ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    wh.merge("md_api", batch, Seq("Id"))
    assert(rowsOf("md_sql") == rowsOf("md_api"))
    assert(rowsOf("md_sql") == Seq(("a", 7L), ("a", 8L), ("b", 2L), ("e", 5L)))
  }

  test("SQL MERGE null-PK contract matches Warehouse.merge (null keys append, never match)") {
    val init = spark.createDataFrame(Seq(Row("a", 1L), Row(null, 0L)).asJava, schema)
    wh.replace("mn_sql", init, Seq("Id"))
    wh.replace("mn_api", init, Seq("Id"))
    val batch = spark.createDataFrame(Seq(Row("a", 10L), Row(null, 99L)).asJava, schema)
    batch.createOrReplaceTempView("mn_batch")
    spark.sql("MERGE INTO graft.mn_sql t USING mn_batch s ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    wh.merge("mn_api", batch, Seq("Id"))
    assert(rowsOf("mn_sql") == rowsOf("mn_api"))
    // both null-keyed rows survive: the target's (never matched/deleted)
    // and the batch's (appended)
    assert(rowsOf("mn_sql") == Seq((null, 0L), (null, 99L), ("a", 10L)))
  }

  test("SQL MERGE: compound ON key and reversed equality order resolve to the PK set") {
    wh.replace("mc_sql", df(("a", 1), ("a", 2), ("b", 1)), Seq("Id"))
    wh.replace("mc_api", df(("a", 1), ("a", 2), ("b", 1)), Seq("Id"))
    val batch = df(("a", 2), ("z", 9))
    batch.createOrReplaceTempView("mc_batch")
    // (Id, Amount) compound key; one conjunct written source-first
    spark.sql("MERGE INTO graft.mc_sql t USING mc_batch s " +
      "ON t.Id = s.Id AND s.Amount = t.Amount " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    wh.merge("mc_api", batch, Seq("Id", "Amount"))
    assert(rowsOf("mc_sql") == rowsOf("mc_api"))
    assert(rowsOf("mc_sql") == Seq(("a", 1L), ("a", 2L), ("b", 1L), ("z", 9L)))
  }

  // --- widened MERGE grammar: conditional / partial clauses --------------

  test("SQL MERGE conditional update ≡ the DataFrame-algebra rewrite") {
    wh.replace("mw1", df(("a", 1), ("b", 2), ("c", 3)), Seq("Id"))
    df(("a", 10), ("b", 1), ("d", 4)).createOrReplaceTempView("mw1_b")
    // matched rows update only when the source value is LARGER; not-matched
    // rows insert; (b,1) matches but fails the condition -> b keeps 2,
    // and d does not exist in the target -> inserted
    spark.sql("MERGE INTO graft.mw1 t USING mw1_b s ON t.Id = s.Id " +
      "WHEN MATCHED AND s.Amount > t.Amount THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(rowsOf("mw1") == Seq(("a", 10L), ("b", 2L), ("c", 3L), ("d", 4L)))
  }

  test("SQL MERGE partial SET with expressions sees the OLD row; update-only form") {
    wh.replace("mw2", df(("a", 1), ("b", 2), ("c", 3)), Seq("Id"))
    df(("a", 100), ("b", 200)).createOrReplaceTempView("mw2_b")
    // no INSERT clause: source rows without a match ((z) absent here) never
    // land; SET mixes target and source columns of the OLD matched row
    spark.sql("MERGE INTO graft.mw2 t USING mw2_b s ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET Amount = s.Amount + t.Amount * 10")
    assert(rowsOf("mw2") == Seq(("a", 110L), ("b", 220L), ("c", 3L)))
  }

  test("SQL MERGE insert-only and conditional insert") {
    wh.replace("mw3", df(("a", 1)), Seq("Id"))
    df(("a", 9), ("b", 2), ("c", 0)).createOrReplaceTempView("mw3_b")
    // insert-only MERGE: matched rows untouched (a keeps 1), condition
    // filters the not-matched side (c fails Amount > 0)
    spark.sql("MERGE INTO graft.mw3 t USING mw3_b s ON t.Id = s.Id " +
      "WHEN NOT MATCHED AND s.Amount > 0 THEN INSERT *")
    assert(rowsOf("mw3") == Seq(("a", 1L), ("b", 2L)))
    // explicit column list: unassigned columns null-fill (rowsOf maps null -> -1)
    spark.sql("MERGE INTO graft.mw3 t USING mw3_b s ON t.Id = s.Id " +
      "WHEN NOT MATCHED THEN INSERT (Id) VALUES (s.Id)")
    assert(rowsOf("mw3") == Seq(("a", 1L), ("b", 2L), ("c", -1L)))
  }

  test("SQL MERGE conditional delete ≡ equality delete of the surviving keys") {
    wh.replace("mw4", df(("a", 1), ("b", 2), ("c", 3)), Seq("Id"))
    df(("a", 0), ("b", 0), ("x", 0)).createOrReplaceTempView("mw4_b")
    val before = wh.dataFiles("mw4").map(_.path)
    // only matched pairs satisfying the TARGET-side condition delete;
    // (x) matches nothing, (a) fails t.Amount > 1
    spark.sql("MERGE INTO graft.mw4 t USING mw4_b s ON t.Id = s.Id " +
      "WHEN MATCHED AND t.Amount > 1 THEN DELETE")
    assert(rowsOf("mw4") == Seq(("a", 1L), ("c", 3L)))
    // still merge-on-read: no data file rewritten by the delete commit
    assert(wh.dataFiles("mw4").map(_.path) == before)
  }

  test("SQL MERGE NOT MATCHED BY SOURCE: delete, conditional keep, target-only update") {
    // full three-clause sync: the table becomes exactly the source
    wh.replace("mb1", df(("a", 1), ("b", 2)), Seq("Id"))
    df(("b", 20), ("c", 30)).createOrReplaceTempView("mb1_b")
    spark.sql("MERGE INTO graft.mb1 t USING mb1_b s ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
    assert(rowsOf("mb1") == Seq(("b", 20L), ("c", 30L)))

    // conditional BY SOURCE delete: unmatched rows failing the condition stay
    wh.replace("mb2", df(("a", 1), ("b", 2), ("c", 3)), Seq("Id"))
    df(("c", 99)).createOrReplaceTempView("mb2_b")
    spark.sql("MERGE INTO graft.mb2 t USING mb2_b s ON t.Id = s.Id " +
      "WHEN NOT MATCHED BY SOURCE AND t.Amount > 1 THEN DELETE")
    // c matched (no matched clause -> kept as-is), b deleted, a fails cond
    assert(rowsOf("mb2") == Seq(("a", 1L), ("c", 3L)))

    // BY SOURCE UPDATE with target-only expressions; matched DELETE combines
    wh.replace("mb3", df(("a", 1), ("b", 2)), Seq("Id"))
    df(("a", 0)).createOrReplaceTempView("mb3_b")
    spark.sql("MERGE INTO graft.mb3 t USING mb3_b s ON t.Id = s.Id " +
      "WHEN MATCHED THEN DELETE " +
      "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET Amount = t.Amount * 100")
    assert(rowsOf("mb3") == Seq(("b", 200L)))
  }

  test("SQL MERGE multiple matched clauses: first-match-wins; DELETE combines with INSERT") {
    // the classic upsert-with-tombstone: negative amounts delete, others
    // update, new keys insert — one atomic statement
    wh.replace("mm1", df(("a", 1), ("b", 2), ("c", 3)), Seq("Id"))
    df(("a", 10), ("b", -1), ("d", 4)).createOrReplaceTempView("mm1_b")
    spark.sql("MERGE INTO graft.mm1 t USING mm1_b s ON t.Id = s.Id " +
      "WHEN MATCHED AND s.Amount < 0 THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(rowsOf("mm1") == Seq(("a", 10L), ("c", 3L), ("d", 4L)))

    // first-match-wins with overlapping conditions: the EARLIER clause takes
    // the row even though the later one also matches
    wh.replace("mm2", df(("a", 5)), Seq("Id"))
    df(("a", 7)).createOrReplaceTempView("mm2_b")
    spark.sql("MERGE INTO graft.mm2 t USING mm2_b s ON t.Id = s.Id " +
      "WHEN MATCHED AND s.Amount > 0 THEN UPDATE SET Amount = s.Amount * 100 " +
      "WHEN MATCHED THEN UPDATE SET Amount = s.Amount")
    assert(rowsOf("mm2") == Seq(("a", 700L)))

    // conditional DELETE + INSERT (no update clause): matched-but-failing
    // rows stay, matched-passing rows go, unmatched source rows insert
    wh.replace("mm3", df(("a", 1), ("b", 9)), Seq("Id"))
    df(("a", 0), ("b", 0), ("z", 5)).createOrReplaceTempView("mm3_b")
    spark.sql("MERGE INTO graft.mm3 t USING mm3_b s ON t.Id = s.Id " +
      "WHEN MATCHED AND t.Amount > 5 THEN DELETE " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(rowsOf("mm3") == Seq(("a", 1L), ("z", 5L)))
  }

  test("SQL MERGE BY SOURCE rejects source references in SET values") {
    wh.replace("mb4", df(("a", 1)), Seq("Id"))
    df(("z", 9)).createOrReplaceTempView("mb4_b")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO graft.mb4 t USING mb4_b s ON t.Id = s.Id " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET Amount = s.Amount")
    }
    // Spark's own analyzer may reject the reference before our rule does —
    // either way it must fail, never bind a phantom source row
    assert(e.getMessage.contains("only target columns") ||
      e.getMessage.toLowerCase.contains("resolve") ||
      e.getMessage.toLowerCase.contains("unresolved"), e.getMessage)
  }

  test("SQL MERGE rejects unsupported shapes with a contract message") {
    wh.replace("mr", df(("a", 1)), Seq("Id"))
    df(("a", 2)).createOrReplaceTempView("mr_batch")
    def bad(sql: String): String =
      intercept[Exception](spark.sql(sql)).getMessage
    // reassigning an ON key (non-identity)
    assert(bad("MERGE INTO graft.mr t USING mr_batch s ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET Id = concat(s.Id, 'x') " +
      "WHEN NOT MATCHED THEN INSERT *").contains("ON key"))
    // several matched clauses where a non-last one is unconditional: Spark's
    // parser enforces this (NON_LAST_MATCHED_CLAUSE_OMIT_CONDITION); the
    // rule carries the same check as defense-in-depth for plan-built merges
    assert(bad("MERGE INTO graft.mr t USING mr_batch s ON t.Id = s.Id " +
      "WHEN MATCHED THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
      .matches("(?s).*(except the last|NON_LAST_MATCHED_CLAUSE).*"))
    // non-equi ON
    assert(bad("MERGE INTO graft.mr t USING mr_batch s ON t.Id > s.Id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *").contains("ON conjunct"))
    // two NOT MATCHED BY SOURCE clauses
    assert(bad("MERGE INTO graft.mr t USING mr_batch s ON t.Id = s.Id " +
      "WHEN NOT MATCHED BY SOURCE AND Amount > 5 THEN DELETE " +
      "WHEN NOT MATCHED BY SOURCE THEN DELETE")
      .contains("at most one WHEN NOT MATCHED BY SOURCE"))
    // same column assigned twice
    assert(bad("MERGE INTO graft.mr t USING mr_batch s ON t.Id = s.Id " +
      "WHEN MATCHED THEN UPDATE SET Amount = s.Amount, Amount = t.Amount")
      .contains("more than once"))
  }

  test("metadata tables: $files and $snapshots reflect manifests, stats, tags") {
    wh.replace("meta_sql", df(("a", 1), ("b", 2)), Seq("Amount"))
    wh.append("meta_sql", df(("c", 30)), Seq("Amount"))
    val tagged = wh.tagSnapshot("meta_sql", "train-v1")

    val files = spark.sql("SELECT * FROM graft.`meta_sql$files` ORDER BY file_path")
    val fRows = files.collect()
    assert(fRows.map(_.getLong(1)).sum ==
      spark.sql("SELECT count(*) FROM graft.meta_sql").head().getLong(0))
    // per-file Amount bounds surfaced from the manifest
    val bounds = fRows.map(_.getMap[String, Row](2).get("Amount").map(s => (s.getString(1), s.getString(2))))
    assert(bounds.forall(_.isDefined), s"every file must carry Amount stats: ${fRows.mkString}")
    // a metadata scan reads no data files (LocalScan): no parquet in the plan
    val plan = files.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan)
    assert(!plan.contains("Parquet"), plan)

    val snaps = spark.sql(
      "SELECT version, n_files, total_rows, tags FROM graft.`meta_sql$snapshots` ORDER BY version")
      .collect()
    assert(snaps.map(_.getLong(0)).toSeq == wh.history("meta_sql").sorted)
    assert(snaps.last.getLong(2) == 3L, "current snapshot totals all rows")
    assert(snaps.exists(r => r.getLong(0) == tagged && r.getSeq[String](3) == Seq("train-v1")))
    // total_rows is non-decreasing across these append-style commits
    assert(snaps.map(_.getLong(2)).toSeq == snaps.map(_.getLong(2)).toSeq.sorted)

    // time travel on $files: the tagged (= current) vs the first snapshot
    val v0 = wh.history("meta_sql").min
    val oldFiles = spark.sql(s"SELECT * FROM graft.`meta_sql$$files` VERSION AS OF $v0").collect()
    assert(oldFiles.map(_.getLong(1)).sum == 2L, "v0 file list must predate the append")
    val tagFiles = spark.sql("SELECT * FROM graft.`meta_sql$files` VERSION AS OF 'train-v1'").collect()
    assert(tagFiles.map(_.getLong(1)).sum == 3L)
    // snapshots table is the version axis: time travel on it is rejected
    intercept[Exception](
      spark.sql(s"SELECT * FROM graft.`meta_sql$$snapshots` VERSION AS OF $v0").collect())
  }

  test("DDL: create, rename, drop") {
    spark.sql("CREATE TABLE graft.ddl1 (Id STRING, Amount BIGINT)")
    assert(spark.sql("SELECT count(*) FROM graft.ddl1").head().getLong(0) == 0)
    spark.sql("ALTER TABLE graft.ddl1 RENAME TO ddl2")
    assert(wh.exists("ddl2") && !wh.exists("ddl1"))
    spark.sql("DROP TABLE graft.ddl2")
    assert(!wh.exists("ddl2"))
    intercept[Exception](spark.sql("SELECT * FROM graft.no_such_table").collect())
  }
}
