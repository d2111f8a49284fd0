package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** Metadata-only aggregates (`StatsAggRule`): global COUNT(*)/MIN/MAX over
  * an unfiltered catalog scan served from manifest row counts / column
  * bounds — the plan collapses to a one-row LocalRelation with ZERO file
  * reads — and every bail-out path stays correct through the ordinary scan.
  */
class StatsAggSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val cat = "sagg"
  private lazy val root: String = {
    val r = tmpDir("graft-sagg")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", r)
    r
  }
  private def wh = new Warehouse(spark, root)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("d", DecimalType(10, 2)), StructField("ts", TimestampType),
    StructField("dt", DateType), StructField("b", BooleanType),
    StructField("x", DoubleType), StructField("nul", StringType)))

  private def rows(n: Int, offset: Long = 0L) = spark.createDataFrame(
    (0 until n).map { i =>
      Row(offset + i, s"s${"%03d".format(i)}", new java.math.BigDecimal(s"$i.25"),
        java.sql.Timestamp.valueOf(s"2024-01-0${i % 9 + 1} 10:00:00"),
        java.sql.Date.valueOf(s"2024-02-0${i % 9 + 1}"), i % 2 == 0,
        i * 1.5 + 1.0, null)
    }.asJava, schema)

  private def servedFromStats(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    var local = false; var scan = false
    p.foreach {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => local = true
      case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
             | _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => scan = true
      case _ => ()
    }
    local && !scan
  }

  test("COUNT(*)/MIN/MAX of every stat domain serve from the manifest — LocalRelation plan, scan-identical values") {
    wh.create("t1", schema)
    wh.append("t1", rows(7), statsCols = Seq("id", "s", "d", "ts", "dt", "b", "x", "nul"))
    wh.append("t1", rows(5, offset = 100L), statsCols = Seq("id", "s", "d", "ts", "dt", "b", "x", "nul"))
    val q = spark.sql(
      s"""SELECT count(*) AS n, min(id) AS mn_id, max(id) AS mx_id,
         |  min(s) AS mn_s, max(s) AS mx_s, min(d) AS mn_d, max(d) AS mx_d,
         |  min(ts) AS mn_ts, max(ts) AS mx_ts, min(dt) AS mn_dt, max(dt) AS mx_dt,
         |  min(b) AS mn_b, max(b) AS mx_b, min(x) AS mn_x, max(x) AS mx_x,
         |  min(nul) AS mn_nul FROM $cat.t1""".stripMargin)
    assert(servedFromStats(q), s"expected stat-served plan:\n${q.queryExecution.optimizedPlan}")
    // values must equal the genuine scan's (fresh frame, no catalog rule)
    val direct = wh.load("t1").agg(
      count(lit(1)).as("n"), min("id").as("mn_id"), max("id").as("mx_id"),
      min("s").as("mn_s"), max("s").as("mx_s"), min("d").as("mn_d"), max("d").as("mx_d"),
      min("ts").as("mn_ts"), max("ts").as("mx_ts"), min("dt").as("mn_dt"), max("dt").as("mx_dt"),
      min("b").as("mn_b"), max("b").as("mx_b"), min("x").as("mn_x"), max("x").as("mx_x"),
      min("nul").as("mn_nul"))
    assert(q.collect().toSeq.map(_.toSeq) == direct.collect().toSeq.map(_.toSeq))
  }

  test("empty table: count 0 and null extremes, still metadata-served") {
    wh.create("t_empty", schema)
    val q = spark.sql(s"SELECT count(*) AS n, min(id) AS mn, max(s) AS mx FROM $cat.t_empty")
    assert(servedFromStats(q))
    assert(q.collect().toSeq.map(_.toSeq) == Seq(Seq(0L, null, null)))
  }

  test("bail-outs: unstatted column, filter, group-by, distinct, FILTER clause — ordinary plan, correct answers") {
    wh.create("t2", StructType(Seq(StructField("k", LongType), StructField("v", LongType))))
    wh.append("t2", spark.createDataFrame(
      Seq(Row(1L, 10L), Row(2L, 20L), Row(3L, 30L)).asJava,
      StructType(Seq(StructField("k", LongType), StructField("v", LongType)))),
      statsCols = Seq("k")) // v deliberately unstatted
    val unstat = spark.sql(s"SELECT min(v) AS mn FROM $cat.t2")
    assert(!servedFromStats(unstat), "a stat-less column must not serve from the manifest")
    assert(unstat.head().getLong(0) == 10L)
    val filtered = spark.sql(s"SELECT count(*) AS n FROM $cat.t2 WHERE k > 1")
    assert(!servedFromStats(filtered) && filtered.head().getLong(0) == 2L)
    // GROUP BY an UNSTATTED column can never prove single-valued files
    val grouped = spark.sql(s"SELECT v, count(*) AS n FROM $cat.t2 GROUP BY v")
    assert(!servedFromStats(grouped) && grouped.count() == 3L)
    val dist = spark.sql(s"SELECT count(DISTINCT k) AS n FROM $cat.t2")
    assert(!servedFromStats(dist) && dist.head().getLong(0) == 3L)
    val fc = spark.sql(s"SELECT count(*) FILTER (WHERE k > 2) AS n FROM $cat.t2")
    assert(!servedFromStats(fc) && fc.head().getLong(0) == 1L)
    // count(k) serves from the manifest's per-file null counts;
    // count(v) has no stat at all and must bail
    val ck = spark.sql(s"SELECT count(k) AS n FROM $cat.t2")
    assert(servedFromStats(ck) && ck.head().getLong(0) == 3L)
    val cv = spark.sql(s"SELECT count(v) AS n FROM $cat.t2")
    assert(!servedFromStats(cv) && cv.head().getLong(0) == 3L)
  }

  test("grouped aggregates over identity-partitioned files serve from the manifest") {
    val s = StructType(Seq(
      StructField("g", StringType), StructField("v", LongType)))
    wh.create("t_grp", s, Seq("g"))
    wh.append("t_grp", spark.createDataFrame(Seq(
      Row("a", 1L), Row("a", 5L), Row("b", 2L), Row(null, 9L)).asJava, s),
      statsCols = Seq("g", "v"))
    wh.append("t_grp", spark.createDataFrame(Seq(
      Row("a", 3L), Row("b", 7L)).asJava, s),
      statsCols = Seq("g", "v"))
    val q = spark.sql(
      s"""SELECT g, count(*) AS n, count(v) AS nv, min(v) AS mn, max(v) AS mx
         |FROM $cat.t_grp GROUP BY g ORDER BY g""".stripMargin)
    assert(servedFromStats(q), s"expected stat-served plan:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSeq.map(_.toSeq) == Seq(
      Seq(null, 1L, 1L, 9L, 9L),
      Seq("a", 3L, 3L, 1L, 5L),
      Seq("b", 2L, 2L, 2L, 7L)))
    // a NON-single-valued layout bails: same data, no partition spec
    wh.create("t_grp2", s)
    wh.append("t_grp2", spark.createDataFrame(Seq(
      Row("a", 1L), Row("b", 2L)).asJava, s).coalesce(1), statsCols = Seq("g", "v"))
    val q2 = spark.sql(s"SELECT g, count(*) AS n FROM $cat.t_grp2 GROUP BY g")
    assert(!servedFromStats(q2) && q2.count() == 2L)
    // min == max but nulls > 0 is NOT single-valued: the file holds BOTH an
    // 'a' row and a null row — folding them into one group would lose the
    // NULL group. Must bail and stay correct through the scan.
    wh.create("t_grp3", s)
    wh.append("t_grp3", spark.createDataFrame(Seq(
      Row("a", 1L), Row(null, 2L)).asJava, s).coalesce(1), statsCols = Seq("g", "v"))
    val q3 = spark.sql(s"SELECT g, count(*) AS n FROM $cat.t_grp3 GROUP BY g ORDER BY g")
    assert(!servedFromStats(q3), "a min==max file with nulls must not serve groups")
    assert(q3.collect().toSeq.map(_.toSeq) == Seq(Seq(null, 1L), Seq("a", 1L)))
  }

  test("TRANSFORM-grouped aggregates: GROUP BY CAST(ts AS DATE)/year(ts) on a days()/years()-split table") {
    val s = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", LongType)))
    def tsRows(rows: (String, Long)*) = spark.createDataFrame(
      rows.map(r => Row(java.sql.Timestamp.valueOf(r._1), r._2)).asJava, s)
    // days(ts)-split: every file single-valued on the TRANSFORM (the raw
    // timestamp is many-valued) — GROUP BY the equivalent cast serves
    wh.create("t_days", s, Seq("days(ts)"))
    wh.append("t_days", tsRows(
      "2024-03-01 08:00:00" -> 1L, "2024-03-01 17:30:00" -> 2L,
      "2024-03-02 09:00:00" -> 5L), statsCols = Seq("v"))
    wh.append("t_days", tsRows("2024-03-02 23:59:59" -> 7L), statsCols = Seq("v"))
    val qd = spark.sql(
      s"""SELECT CAST(ts AS DATE) AS day, count(*) AS n, min(v) AS mn, max(v) AS mx
         |FROM $cat.t_days GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin)
    assert(servedFromStats(qd), s"days-grouped must serve:\n${qd.queryExecution.optimizedPlan}")
    assert(qd.collect().toSeq.map(_.toSeq) == Seq(
      Seq(java.sql.Date.valueOf("2024-03-01"), 2L, 1L, 2L),
      Seq(java.sql.Date.valueOf("2024-03-02"), 2L, 5L, 7L)))
    // to_date(ts) resolves to the same cast — serves too
    val qd2 = spark.sql(
      s"SELECT to_date(ts) AS day, count(*) AS n FROM $cat.t_days GROUP BY to_date(ts)")
    assert(servedFromStats(qd2), s"${qd2.queryExecution.optimizedPlan}")

    // years(ts)-split: GROUP BY year(ts) serves with the +1970 re-offset
    wh.create("t_years", s, Seq("years(ts)"))
    wh.append("t_years", tsRows(
      "2023-05-01 00:00:00" -> 1L, "2023-11-05 12:00:00" -> 3L,
      "2024-01-01 00:00:00" -> 8L), statsCols = Seq("v"))
    val qy = spark.sql(
      s"""SELECT year(ts) AS yr, count(*) AS n, max(v) AS mx
         |FROM $cat.t_years GROUP BY year(ts) ORDER BY yr""".stripMargin)
    assert(servedFromStats(qy), s"years-grouped must serve:\n${qy.queryExecution.optimizedPlan}")
    assert(qy.collect().toSeq.map(_.toSeq) == Seq(Seq(2023, 2L, 3L), Seq(2024, 1L, 8L)))

    // date_trunc spellings: every level serves from its transform's stats
    val qtd = spark.sql(
      s"""SELECT date_trunc('DAY', ts) AS d, count(*) AS n
         |FROM $cat.t_days GROUP BY 1 ORDER BY 1""".stripMargin)
    assert(servedFromStats(qtd), s"date_trunc DAY must serve:\n${qtd.queryExecution.optimizedPlan}")
    assert(qtd.collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq ==
      Seq(("2024-03-01 00:00:00.0", 2L), ("2024-03-02 00:00:00.0", 2L)))
    val qty = spark.sql(
      s"SELECT date_trunc('YEAR', ts) AS y, count(*) AS n FROM $cat.t_years GROUP BY 1 ORDER BY 1")
    assert(servedFromStats(qty), s"${qty.queryExecution.optimizedPlan}")
    assert(qty.collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq ==
      Seq(("2023-01-01 00:00:00.0", 2L), ("2024-01-01 00:00:00.0", 1L)))
    // months()/hours() splits serve their date_trunc levels too
    wh.create("t_mon", s, Seq("months(ts)"))
    wh.append("t_mon", tsRows(
      "2024-01-05 01:00:00" -> 1L, "2024-01-20 02:00:00" -> 2L,
      "2024-02-01 03:00:00" -> 7L), statsCols = Seq("v"))
    val qtm = spark.sql(
      s"SELECT date_trunc('MONTH', ts) AS m, count(*) AS n, max(v) AS mx " +
        s"FROM $cat.t_mon GROUP BY 1 ORDER BY 1")
    assert(servedFromStats(qtm), s"${qtm.queryExecution.optimizedPlan}")
    assert(qtm.collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("2024-01-01 00:00:00.0", 2L, 2L), ("2024-02-01 00:00:00.0", 1L, 7L)))
    wh.create("t_hr", s, Seq("hours(ts)"))
    wh.append("t_hr", tsRows(
      "2024-03-01 08:10:00" -> 1L, "2024-03-01 08:50:00" -> 2L,
      "2024-03-01 09:05:00" -> 5L), statsCols = Seq("v"))
    val qth = spark.sql(
      s"SELECT date_trunc('HOUR', ts) AS h, count(*) AS n FROM $cat.t_hr GROUP BY 1 ORDER BY 1")
    assert(servedFromStats(qth), s"${qth.queryExecution.optimizedPlan}")
    assert(qth.collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSeq ==
      Seq(("2024-03-01 08:00:00.0", 2L), ("2024-03-01 09:00:00.0", 1L)))
    // an unsupported level bails (correct via scan)
    val qtw = spark.sql(
      s"SELECT date_trunc('WEEK', ts) AS w, count(*) AS n FROM $cat.t_days GROUP BY 1")
    assert(!servedFromStats(qtw) && qtw.count() >= 1)

    // NON-ALIGNED layout bails: same data, no days() spec — one file spans
    // two days, so the transform stat is not single-valued; correct via scan
    wh.create("t_flat", s)
    wh.append("t_flat", tsRows(
      "2024-03-01 08:00:00" -> 1L, "2024-03-02 09:00:00" -> 5L).coalesce(1),
      statsCols = Seq("v"))
    val qf = spark.sql(
      s"SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM $cat.t_flat GROUP BY 1 ORDER BY 1")
    assert(!servedFromStats(qf), "non-aligned layout must bail to the scan")
    assert(qf.collect().map(_.getLong(1)).toSeq == Seq(1L, 1L))
    // a years-split table does NOT serve day grouping (wrong transform)
    val qwrong = spark.sql(
      s"SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM $cat.t_years GROUP BY 1 ORDER BY 1")
    assert(!servedFromStats(qwrong), "day grouping on a years-split table must bail")
    assert(qwrong.count() == 3L)
  }

  test("count(col) serves exact non-null counts: mixed nulls, all-null column, scan-identical") {
    wh.create("t_cnt", StructType(Seq(
      StructField("k", LongType), StructField("g", StringType),
      StructField("z", StringType))))
    val s = StructType(Seq(
      StructField("k", LongType), StructField("g", StringType),
      StructField("z", StringType)))
    // two files (two appends): per-file null counts must SUM correctly
    wh.append("t_cnt", spark.createDataFrame(Seq(
      Row(1L, "a", null), Row(2L, null, null), Row(3L, "c", null)).asJava, s),
      statsCols = Seq("k", "g", "z"))
    wh.append("t_cnt", spark.createDataFrame(Seq(
      Row(4L, null, null), Row(5L, null, null)).asJava, s),
      statsCols = Seq("k", "g", "z"))
    val q = spark.sql(
      s"SELECT count(*) AS n, count(k) AS nk, count(g) AS ng, count(z) AS nz FROM $cat.t_cnt")
    assert(servedFromStats(q), s"expected stat-served plan:\n${q.queryExecution.optimizedPlan}")
    assert(q.collect().toSeq.map(_.toSeq) == Seq(Seq(5L, 5L, 2L, 0L)))
  }

  test("pending MOR deletes: counts reflect the deletes (never the raw manifest)") {
    wh.create("t3", StructType(Seq(StructField("k", LongType))))
    val s1 = StructType(Seq(StructField("k", LongType)))
    wh.append("t3", spark.createDataFrame(Seq(Row(1L), Row(2L), Row(3L)).asJava, s1),
      statsCols = Seq("k"))
    wh.equalityDelete("t3", spark.createDataFrame(Seq(Row(2L)).asJava, s1))
    val q = spark.sql(s"SELECT count(*) AS n, max(k) AS mx FROM $cat.t3")
    assert(q.collect().toSeq.map(_.toSeq) == Seq(Seq(2L, 3L)))
  }

  test("ADD COLUMN with initial default: the virtual column bails to the scan and serves the default") {
    wh.create("t4", StructType(Seq(StructField("k", LongType))))
    val s1 = StructType(Seq(StructField("k", LongType)))
    wh.append("t4", spark.createDataFrame(Seq(Row(1L), Row(2L)).asJava, s1), statsCols = Seq("k"))
    wh.addColumns("t4", Seq(StructField("tag", LongType)), Map("tag" -> "42"))
    val q = spark.sql(s"SELECT min(tag) AS mn, max(tag) AS mx, count(*) AS n FROM $cat.t4")
    assert(!servedFromStats(q), "pre-add files carry no stat for the default column")
    assert(q.collect().toSeq.map(_.toSeq) == Seq(Seq(42L, 42L, 2L)))
  }

  test("time travel: the pinned snapshot's manifest answers, not the head's") {
    wh.create("t5", StructType(Seq(StructField("k", LongType))))
    val s1 = StructType(Seq(StructField("k", LongType)))
    wh.append("t5", spark.createDataFrame(Seq(Row(1L), Row(2L)).asJava, s1), statsCols = Seq("k"))
    val v = wh.currentVersion("t5")
    wh.append("t5", spark.createDataFrame(Seq(Row(9L)).asJava, s1), statsCols = Seq("k"))
    val q = spark.sql(s"SELECT count(*) AS n, max(k) AS mx FROM $cat.t5 VERSION AS OF $v")
    assert(servedFromStats(q))
    assert(q.collect().toSeq.map(_.toSeq) == Seq(Seq(2L, 2L)))
    val head = spark.sql(s"SELECT count(*) AS n, max(k) AS mx FROM $cat.t5")
    assert(servedFromStats(head))
    assert(head.collect().toSeq.map(_.toSeq) == Seq(Seq(3L, 9L)))
  }

  test("float/double zero extremes bail (±0.0 sign is unrecoverable from the rendered bound)") {
    wh.create("t6", StructType(Seq(StructField("x", DoubleType))))
    wh.append("t6", spark.createDataFrame(Seq(Row(-0.0d), Row(2.5d)).asJava,
      StructType(Seq(StructField("x", DoubleType)))), statsCols = Seq("x"))
    val q = spark.sql(s"SELECT min(x) AS mn FROM $cat.t6")
    assert(!servedFromStats(q), "a zero bound must fall back to the scan")
    // the scan preserves the sign the stat cannot
    assert(java.lang.Double.compare(q.head().getDouble(0), -0.0d) == 0)
    val mx = spark.sql(s"SELECT max(x) AS mx FROM $cat.t6")
    assert(servedFromStats(mx) && mx.head().getDouble(0) == 2.5d)
  }
}
