package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator family from SURVEY.md §2 (plus the training-data pipeline
  * extensions) surfaces here as a named query with a DuckDB-ANSI oracle where
  * SQL-expressible; rows-only checks otherwise (q44 sketches).
  */
object SparkEntry {

  /** Flagship slice (SURVEY §7.3): watermark-filtered lineitem (I1/P3)
    * merge-upserted against an older snapshot (J1 algebra) and aggregated to
    * revenue per order priority (A-series) — every engine layer at depth 1.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.read(spark, dir, "lineitem")
    val o = Tables.read(spark, dir, "orders")
    val cut = lit("1997-06-01").cast("timestamp")
    // merge: "target" = shipped before cut, "incoming" = watermark > cut
    val target = li.filter(col("l_shipdate") <= cut)
    val incoming = li.filter(col("l_shipdate") > cut)
    val keys = incoming.select("l_orderkey", "l_linenumber").distinct()
    // bounded demo slice ⇒ broadcast is right; Warehouse.merge size-gates
    // the same join shape for arbitrary batch sizes
    val merged = target.join(broadcast(keys), Seq("l_orderkey", "l_linenumber"), "left_anti")
      .unionByName(incoming)
    merged.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(Tables.revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.queries ++ AnalyticQueries.queries ++ EventQueries.queries ++
      TextQueries.queries ++ CorpusQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ MultimodalQueries.queries ++ SamplingQueries.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the same
    * parquet tables. Keys absent here (q44 sketches) get rows-only checks.
    */
  val oracleSql: Map[String, String] =
    EtlQueries.oracles ++ AnalyticQueries.oracles ++ EventQueries.oracles ++
      TextQueries.oracles ++ CorpusQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ MultimodalQueries.oracles ++ SamplingQueries.oracles
}
