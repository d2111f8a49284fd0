package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** Partition-spec evolution (`Warehouse.updateSpec`): the declared
  * transforms change WITHOUT rewriting old files — files keep the layout
  * and per-file transform bounds they were written under, new writes
  * cluster by the new spec, pruning resolves per file, and SPJ reports
  * clustering only while every live file is single-valued under one
  * common (current) spec — re-established by a rewrite, never assumed.
  */
class PartitionSpecEvolutionSpec extends SparkSpec {

  private def shuffles(df: DataFrame): Int = {
    df.collect()
    def count(p: SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private def withSpj[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("SQL DDL face: ALTER TABLE SET TBLPROPERTIES('partition.spec') evolves the spec") {
    val root = tmpDir("pse-sql")
    spark.conf.set("spark.sql.catalog.psesql", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.psesql.root", root)
    val wh = new Warehouse(spark, root)
    val df = spark.range(0, 50).select(col("id").as("k"), (col("id") * 2).as("v"))
    wh.create("t", df.schema, Seq("bucket(2,k)"))
    wh.append("t", df)
    spark.sql("ALTER TABLE psesql.t SET TBLPROPERTIES ('partition.spec' = 'bucket(8,k)')")
    assert(wh.partitionSpec("t") == Seq("bucket(8,k)"))
    spark.sql("ALTER TABLE psesql.t SET TBLPROPERTIES ('partition.spec' = '')")
    assert(wh.partitionSpec("t") == Nil)
    // still readable either way
    assert(spark.sql("SELECT count(*) FROM psesql.t").head().getLong(0) == 50L)
  }

  test("re-bucketing: old files untouched with old bounds, new files single-valued under the new spec") {
    val root = tmpDir("pse-rebucket")
    val wh = new Warehouse(spark, root)
    val df = spark.range(0, 200).select(col("id").as("k"), (col("id") * 2).as("v"))
    wh.create("t", df.schema, Seq("bucket(2,k)"))
    wh.append("t", df.filter(col("k") < 100), statsCols = Seq("k"))
    val oldFiles = wh.dataFiles("t").map(_.path).toSet
    assert(wh.dataFiles("t").forall(f =>
      f.stats.get("bucket(2,k)").exists(c => c.min == c.max)))

    wh.updateSpec("t", Seq("bucket(4,k)"))
    assert(wh.partitionSpec("t") == Seq("bucket(4,k)"))
    wh.append("t", df.filter(col("k") >= 100), statsCols = Seq("k"))
    val files = wh.dataFiles("t")
    // ZERO rewrite: every pre-evolution file still listed by path, bounds intact
    assert(oldFiles.subsetOf(files.map(_.path).toSet))
    val (olds, news) = files.partition(f => oldFiles.contains(f.path))
    assert(olds.forall(f => f.stats.contains("bucket(2,k)") && !f.stats.contains("bucket(4,k)")))
    assert(news.forall(f => f.stats.get("bucket(4,k)").exists(c => c.min == c.max)))
    // retired transforms stop being collected; live raw-column stats continue
    assert(news.forall(f => !f.stats.contains("bucket(2,k)") && f.stats.contains("k")))
    // the read is simply correct across the mixed layout
    assert(wh.load("t").count() == 200)
  }

  test("per-file pruning survives the evolution boundary on both layouts") {
    val root = tmpDir("pse-prune")
    val wh = new Warehouse(spark, root)
    val s2 = StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType)))
    def rows(day: Int, n: Int) = {
      import scala.jdk.CollectionConverters._
      spark.createDataFrame((0 until n).map(i => org.apache.spark.sql.Row(
        (day * 1000 + i).toLong,
        java.sql.Timestamp.valueOf(f"2024-02-$day%02d 00:00:00"))).asJava, s2)
    }
    wh.create("t", s2, Seq("days(ts)"))
    wh.append("t", rows(1, 5).union(rows(2, 5)), statsCols = Seq("id"))
    wh.updateSpec("t", Seq("bucket(4,id)"))
    wh.append("t", rows(3, 5).union(rows(4, 5)), statsCols = Seq("id"))
    // predicate on ts: old files prune by days(ts) bounds; new files carry
    // none (conservatively kept) — deleteWhere's report counts pruned files.
    // Mid-day literal: a boundary literal can't prune the adjacent day (the
    // inclusive projection must relax < to <=).
    val r = wh.deleteWhere("t",
      col("ts") < lit(java.sql.Timestamp.valueOf("2024-02-01 12:00:00")))
    assert(r.deleted == 5L, s"day-1 rows only: $r")
    assert(r.prunedFiles > 0, s"old-spec day bounds must still prune: $r")
    assert(wh.load("t").count() == 15)
  }

  test("SPJ falls back (correctly) on a mixed-spec table and returns after a rewrite under the new spec") {
    val root = tmpDir("pse-spj")
    spark.conf.set("spark.sql.catalog.pse", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pse.root", root)
    val wh = new Warehouse(spark, root)
    val orders = spark.range(0, 500).select(col("id").as("o_id"), (col("id") * 3).as("total"))
    val items = spark.range(0, 1500).select((col("id") % 500).as("o_id"), (col("id") % 11).as("qty"))
    wh.create("orders", orders.schema, Seq("bucket(4,o_id)"))
    wh.create("items", items.schema, Seq("bucket(4,o_id)"))
    wh.append("orders", orders.filter(col("o_id") < 250))
    wh.append("items", items)
    // evolve orders to 8 buckets mid-life; second half lands under the new spec
    wh.updateSpec("orders", Seq("bucket(8,o_id)"))
    wh.append("orders", orders.filter(col("o_id") >= 250))
    withSpj {
      val q = "SELECT o.o_id, o.total, i.qty FROM pse.orders o JOIN pse.items i USING (o_id)"
      val oracle = orders.join(items, "o_id").count()
      val mixed = spark.sql(q)
      // mixed layout: no common spec across files -> shuffled join, same rows
      assert(shuffles(mixed) > 0, "a mixed-spec side must NOT claim co-partitioning")
      assert(mixed.count() == oracle)
      // rewrite the mixed side under the CURRENT spec; items must then also
      // speak bucket(8) for the specs to be common
      wh.updateSpec("items", Seq("bucket(8,o_id)"))
      wh.compactFiles("orders", smallRows = Long.MaxValue)
      wh.compactFiles("items", smallRows = Long.MaxValue)
      val uniform = spark.sql(q)
      assert(shuffles(uniform) == 0,
        "uniform current-spec files must restore the zero-exchange join")
      assert(uniform.count() == oracle)
    }
  }
}
