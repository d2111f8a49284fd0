package graft

/** Smoke the whole declared query surface on sf0.001: every query builds a
  * plan, executes, and (where the fixture data can produce them) returns
  * rows; every oracle key has a matching query. Value-level correctness is
  * the DuckDB gate (tools/check.py) — this spec guards plan regressions.
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // Queries whose correct sf0.001 result may legitimately be empty (tiny
  // corpus -> no near-dup pairs in some buckets).
  private val mayBeEmpty = Set("q55_prefix_dup_groups", "q56_ngram_jaccard",
    "q57_minhash_lsh", "q169_neardup_index_follow", "q58_simhash", "q61_ann_lsh",
    "q28_customers_no_orders",
    "q46_range_purchase_errors",
    // 50-doc fixture: no length lands >2 population stddevs from its
    // source's mean (the oracle agrees — both sides empty)
    "q94_outlier_docs")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned 0 rows")
    }
  }
}
