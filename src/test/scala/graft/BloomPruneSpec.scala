package graft

import org.apache.spark.sql.functions._
import graft.functions.BloomPrune

/** Bloom semi-join pruning: the pre-filter is a strict superset of the true
  * match set (no false negatives), the composed semi join equals the plain
  * semi join exactly, and the pre-filter actually sheds rows (the point).
  */
class BloomPruneSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def events = graft.schema.SchemaOps.normalizeNanos(
    spark.read.parquet(s"$sf/events.parquet"), Seq("ts"))

  test("prefilter is a superset of true matches; composed semi join is exact") {
    // build side: a small user subset (every 37th user)
    val build = events.select(col("user_id")).distinct()
      .filter(col("user_id") % 37 === 0)
    val plain = events.join(build, Seq("user_id"), "left_semi")
      .orderBy("event_id").select("event_id")
    val pruned = BloomPrune.prefilter(events, col("user_id"), build, col("user_id"))
    // no false negatives: every true match survives the bloom
    assert(plain.count() ==
      plain.intersect(pruned.orderBy("event_id").select("event_id")).count())
    val composed = BloomPrune.semiJoin(events, "user_id", build, "user_id")
      .orderBy("event_id").select("event_id")
    assert(composed.collect().toSeq == plain.collect().toSeq)
  }

  test("prefilter sheds non-matching rows before any exchange") {
    val build = events.select(col("user_id")).distinct()
      .filter(col("user_id") % 37 === 0)
    val total = events.count()
    val kept = BloomPrune.prefilter(events, col("user_id"), build, col("user_id")).count()
    val trueMatches = events.join(build, Seq("user_id"), "left_semi").count()
    assert(kept < total, "bloom must drop some rows on a selective build side")
    assert(kept >= trueMatches, "bloom can only overshoot, never undershoot")
  }

  test("empty build side yields an empty semi join (null bloom drops all)") {
    val empty = events.select(col("user_id")).filter(lit(false))
    assert(BloomPrune.semiJoin(events, "user_id", empty, "user_id").count() == 0)
  }

  test("cross-table: documents pruned by an id sample round-trips exactly") {
    val sample = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    val plain = docs.join(sample, Seq("doc_id"), "left_semi").orderBy("doc_id")
    val composed = BloomPrune.semiJoin(docs, "doc_id", sample, "doc_id").orderBy("doc_id")
    assert(composed.select("doc_id").collect().toSeq ==
      plain.select("doc_id").collect().toSeq)
  }
}
