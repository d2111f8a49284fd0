package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sink.{Manifest, VariantStats, Warehouse}

/** File + segment pruning on EXTRACTED VARIANT PATHS
  * ([[graft.sink.VariantStats]] keys consulted by [[ManifestPruneRule]]):
  * a predicate on a JSON field reads O(matching files) of a table
  * range-clustered by that field's value — the piece shredded storage
  * alone can't provide. Soundness posture throughout: every pruned answer
  * is checked value-exact against the predicate computed over the full
  * data, and shapes the stat domain can't prove (cross-type extraction)
  * must read everything rather than guess.
  */
class VariantPruneSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("props", VariantType)))

  private val KeyK = "vget(props,$.k,long)"
  private val KeyTag = "vget(props,$.tag,string)"
  private val KeyOpt = "vget(props,$.opt,long)"

  /** 100 ids from `lo`: k = id, tag = s<id %04d>, opt present only when
    * `withOpt` (so whole FILES provably lack the path).
    */
  private def batch(lo: Long, withOpt: Boolean): org.apache.spark.sql.DataFrame = {
    val raw = spark.createDataFrame(
      (lo until lo + 100).map { i =>
        val opt = if (withOpt) s""", "opt": ${i % 7}""" else ""
        Row(i, s"""{"k": $i, "tag": "s${"%04d".format(i)}"$opt}""")
      }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("props", StringType))))
    raw.select(col("id"), parse_json(col("props")).as("props"))
  }

  private def build(catName: String): (Warehouse, Int) = {
    val root = tmpDir("varprune")
    spark.conf.set(s"spark.sql.catalog.$catName", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$catName.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // 24 disjoint k-ranges, one commit (= one segment) each; opt only in
    // the first 4 batches
    (0 until 24).foreach(i =>
      wh.append("t", batch(i * 100L, withOpt = i < 4),
        statsCols = Seq(KeyK, KeyTag, KeyOpt)))
    (wh, wh.currentManifest("t").files.size)
  }

  test("long-path range predicate prunes files AND segments; answers exact") {
    val (wh, total) = build("vpr")
    assert(total >= 24)
    // the manifest physically carries the vget bounds
    val st = wh.currentManifest("t").files.head.stats
    assert(st.contains(KeyK) && st.contains(KeyTag), st.keySet.toString)

    val c0 = Manifest.prunedSegConsults.get()
    val s0 = Manifest.prunedSegSkips.get()
    val q = spark.sql(
      "SELECT id FROM vpr.t WHERE variant_get(props, '$.k', 'long') BETWEEN 1230 AND 1240")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (1230L to 1240L))
    assert(scannedFiles(q, total) <= math.max(2, total / 12),
      q.queryExecution.executedPlan.toString)
    // one-range probe parses O(1) segments of the 24
    assert(Manifest.prunedSegConsults.get() - c0 <= 3)
    assert(Manifest.prunedSegSkips.get() - s0 >= 21)

    // IN-list goes through the same key
    val qin = spark.sql(
      "SELECT id FROM vpr.t WHERE variant_get(props, '$.k', 'long') IN (5, 905, 2205)")
    assert(qin.collect().map(_.getLong(0)).sorted.toSeq == Seq(5L, 905L, 2205L))
    assert(scannedFiles(qin, total) <= math.max(3, total / 8))
  }

  test("cross-type extraction never consults the key: reads everything, stays exact") {
    val (_, total) = build("vprx")
    // a DOUBLE-typed extraction over a long-keyed stat must not prune
    // (truncation semantics differ per type — VariantStats contract)
    val q = spark.sql(
      "SELECT count(*) AS n FROM vprx.t WHERE variant_get(props, '$.k', 'double') = 42.0")
    assert(q.collect().head.getLong(0) == 1L)
    assert(scannedFiles(q, total) == total,
      "cross-type shapes must be conservative:\n" +
        q.queryExecution.executedPlan.toString)
  }

  test("string path: equality and LIKE-prefix prune; IS NOT NULL drops path-missing files") {
    val (_, total) = build("vprs")
    val qe = spark.sql(
      "SELECT id FROM vprs.t WHERE variant_get(props, '$.tag', 'string') = 's1234'")
    assert(qe.collect().map(_.getLong(0)).toSeq == Seq(1234L))
    assert(scannedFiles(qe, total) <= math.max(2, total / 12))

    val qp = spark.sql(
      "SELECT count(*) AS n FROM vprs.t WHERE variant_get(props, '$.tag', 'string') LIKE 's071%'")
    assert(qp.collect().head.getLong(0) == 10L) // s0710..s0719
    assert(scannedFiles(qp, total) <= math.max(2, total / 12))

    // `opt` exists only in ids 0..399: whole files beyond prove all-null
    // extraction and IS NOT NULL skips them
    val qn = spark.sql(
      "SELECT count(*) AS n FROM vprs.t WHERE variant_get(props, '$.opt', 'long') IS NOT NULL")
    assert(qn.collect().head.getLong(0) == 400L)
    assert(scannedFiles(qn, total) <= math.max(4, total / 5),
      qn.queryExecution.executedPlan.toString)
    // and the equality form composes bounds + nulls
    val q7 = spark.sql(
      "SELECT count(*) AS n FROM vprs.t WHERE variant_get(props, '$.opt', 'long') = 3")
    assert(q7.collect().head.getLong(0) == (0L until 400L).count(_ % 7 == 3))
    assert(scannedFiles(q7, total) <= math.max(4, total / 5))
  }

  test("RENAME remaps vget keys; pruning keeps working under the new name") {
    val (wh, total) = build("vprr")
    wh.renameColumn("t", "props", "payload")
    val st = wh.currentManifest("t").files.head.stats
    assert(st.contains("vget(payload,$.k,long)") && !st.contains(KeyK), st.keySet.toString)
    spark.sql("REFRESH TABLE vprr.t")
    val q = spark.sql(
      "SELECT id FROM vprr.t WHERE variant_get(payload, '$.k', 'long') = 777")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(777L))
    assert(scannedFiles(q, total) <= math.max(2, total / 12))
  }

  test("DELETE WHERE on a variant path rewrites only the may-match files") {
    val (wh, total) = build("vprd")
    val rep = wh.deleteWhere("t", variant_get(col("props"), "$.k", "long") === 1234L)
    // scan pruning and delete-victim pruning share one mayMatch: all but
    // the owning file(s) carry into the new snapshot UNREWRITTEN
    assert(rep.deleted == 1L, rep.toString)
    assert(rep.prunedFiles >= total - 2, rep.toString)
    val left = spark.sql(
      "SELECT count(*) AS n FROM vprd.t WHERE variant_get(props, '$.k', 'long') " +
        "BETWEEN 1230 AND 1240")
    assert(left.collect().head.getLong(0) == 10L)
  }

  test("UNDECLARED paths prune too: auto-collected shredded-leaf stats") {
    val root = tmpDir("varauto")
    spark.conf.set("spark.sql.catalog.vpa", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vpa.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // NO vget stat keys declared — the footer pass discovers every clean
    // shredded leaf and records its bounds on its own
    (0 until 24).foreach(i =>
      wh.append("t", batch(i * 100L, withOpt = i < 4), statsCols = Seq("id")))
    val total = wh.currentManifest("t").files.size
    val st = wh.currentManifest("t").files.head.stats
    assert(st.contains(KeyK) && st.contains(KeyTag), st.keySet.toString)

    val c0 = Manifest.prunedSegConsults.get()
    val s0 = Manifest.prunedSegSkips.get()
    val q = spark.sql(
      "SELECT id FROM vpa.t WHERE variant_get(props, '$.k', 'long') BETWEEN 1230 AND 1240")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (1230L to 1240L))
    assert(scannedFiles(q, total) <= math.max(2, total / 12),
      q.queryExecution.executedPlan.toString)
    // segment summaries merge the auto keys like any other stat: the
    // one-range probe still parses O(1) of the 24 segments
    assert(Manifest.prunedSegConsults.get() - c0 <= 3)
    assert(Manifest.prunedSegSkips.get() - s0 >= 21)

    // string leaf auto-collects too
    val qe = spark.sql(
      "SELECT id FROM vpa.t WHERE variant_get(props, '$.tag', 'string') = 's1234'")
    assert(qe.collect().map(_.getLong(0)).toSeq == Seq(1234L))
    assert(scannedFiles(qe, total) <= math.max(2, total / 12))

    // a path observed ONCE keeps collecting: inheritedStatsCols promotes
    // the discovered keys to declared status on every later append, so the
    // leafless batches (4..23) record footer-proven all-null `opt` stats
    // and IS NOT NULL prunes them — the path universe grows as it is seen
    val qn = spark.sql(
      "SELECT count(*) AS n FROM vpa.t WHERE variant_get(props, '$.opt', 'long') IS NOT NULL")
    assert(qn.collect().head.getLong(0) == 400L)
    assert(scannedFiles(qn, total) <= math.max(4, total / 5),
      qn.queryExecution.executedPlan.toString)
    val withOpt = wh.currentManifest("t").files.count(_.stats.contains(KeyOpt))
    assert(withOpt == total, s"$withOpt of $total")
  }

  test("dirty batch: mixed-type field refuses the auto stat; file stays in scope, exact") {
    val root = tmpDir("vardirty")
    spark.conf.set("spark.sql.catalog.vpd", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.vpd.root", root)
    val wh = new Warehouse(spark, root)
    wh.create("t", schema)
    // dirty batch FIRST (no keys to inherit): k alternates long/string, so
    // Spark shreds k with NO typed leaf (all values in the field residual)
    // — discovery proposes nothing for k, and with nothing declared or
    // inherited the dirty files carry NO k stat at all
    val raw = spark.createDataFrame(
      (100L until 200L).map { i =>
        val v = if (i % 2 == 0) i.toString else s""""x$i""""
        Row(i, s"""{"k": $v, "tag": "s${"%04d".format(i)}"}""")
      }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("props", StringType))))
    wh.append("t", raw.select(col("id"), parse_json(col("props")).as("props")),
      statsCols = Seq("id"))
    val dirty0 = wh.currentManifest("t").files
    assert(dirty0.nonEmpty && dirty0.forall(f =>
      !f.stats.keys.exists(_.startsWith("vget(props,$.k"))),
      dirty0.map(_.stats.keySet).toString)

    // clean batch second: its files auto-collect; the dirty files' stats
    // are immutable and stay keyless for k — forever in scope, never wrong
    wh.append("t", batch(0L, withOpt = false), statsCols = Seq("id"))
    val files = wh.currentManifest("t").files
    assert(files.exists(_.stats.contains(KeyK)), files.map(_.stats.keySet).toString)
    assert(files.exists(f => !f.stats.contains(KeyK)))

    // try-semantics keeps the answer exact: the long extraction over the
    // dirty batch yields its castable (even-id) rows, and the dirty files
    // are never skipped (no stat to skip by)
    val q = spark.sql(
      "SELECT count(*) AS n FROM vpd.t WHERE try_variant_get(props, '$.k', 'long') >= 100")
    assert(q.collect().head.getLong(0) == 50L, "even ids of the dirty batch")

    // a LATER dirty append (now inheriting the clean batch's discovered
    // keys as declared stat cols) records SOUND scan-fallback bounds for
    // the residual-held rows instead of refusing — same try-cast domain
    wh.append("t",
      raw.select((col("id") + 200L).as("id"), parse_json(col("props")).as("props")),
      statsCols = Seq("id"))
    val third = wh.currentManifest("t").files.filter(_.seq == 3)
    assert(third.nonEmpty && third.forall(_.stats.contains(KeyK)),
      third.map(_.stats.keySet).toString)
    assert(third.forall(_.stats(KeyK).nulls > 0), "string rows are try-cast nulls")
    // both dirty batches' castable halves (their k VALUES are 100..198)
    val q2 = spark.sql(
      "SELECT count(*) AS n FROM vpd.t WHERE try_variant_get(props, '$.k', 'long') >= 100")
    assert(q2.collect().head.getLong(0) == 100L)
  }

  test("key parse/remap round-trip") {
    assert(VariantStats.parseKey(KeyK).contains(VariantStats.VKey("props", "$.k", "long")))
    assert(VariantStats.parseKey("vget(a,$.x.y,string)").map(_.kind).contains("s"))
    assert(VariantStats.parseKey("vget(a,$.x,decimal)").isEmpty) // unproven type
    assert(VariantStats.parseKey("vget(a,$.x[0],long)").nonEmpty)
    assert(VariantStats.parseKey("vget(a,$.x(y),long)").isEmpty) // no round-trip
    assert(VariantStats.parseKey("days(ts)").isEmpty)
  }
}
