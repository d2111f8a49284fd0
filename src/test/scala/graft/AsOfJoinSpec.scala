package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.AsOfJoin

/** AsOfJoin vs two independent formulations: q45's inline union+window
  * (backward) and a brute-force pair join (all three directions, small
  * fixture only — the quadratic shape the operator exists to avoid).
  */
class AsOfJoinSpec extends SparkSpec {

  private def events = graft.schema.SchemaOps.normalizeNanos(
    spark.read.parquet(s"$sf/events.parquet"), Seq("ts"))

  private def clicks = events.filter(col("event_type") === "click")
    .select(col("user_id"), col("ts"), col("event_id"))
  private def purchases = events.filter(col("event_type") === "purchase")
    .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))

  /** Brute force: join every (purchase, click) pair per user, keep the one
    * the direction selects. Quadratic — correct by construction.
    */
  private def brute(dir: String): DataFrame = {
    val pairs = purchases.as("p").join(clicks.as("c"), Seq("user_id"))
      .select(col("purchase_id"), col("user_id"),
        unix_micros(col("p.ts").cast("timestamp")).as("pu"),
        unix_micros(col("c.ts").cast("timestamp")).as("cu"),
        col("c.event_id").as("click_id"))
    val dirFiltered = dir match {
      case "backward" => pairs.filter(col("cu") <= col("pu"))
        .withColumn("gap", col("pu") - col("cu"))
      case "forward" => pairs.filter(col("cu") >= col("pu"))
        .withColumn("gap", col("cu") - col("pu"))
      case "nearest" => pairs
        .withColumn("gap", abs(col("cu") - col("pu")))
        // ties between directions go backward (cu <= pu wins at equal gap)
        .withColumn("dirPref", when(col("cu") <= col("pu"), 0).otherwise(1))
    }
    val ord: Seq[org.apache.spark.sql.Column] =
      if (dir == "nearest") Seq(col("gap").asc, col("dirPref").asc, col("click_id").desc)
      else Seq(col("gap").asc, col("click_id").desc)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("purchase_id")
      .orderBy(ord: _*)
    dirFiltered.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("purchase_id", "click_id", "gap")
  }

  private def canon(df: DataFrame): Seq[(Long, Option[Long], Option[Long])] =
    df.collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }.sortBy(_._1).toSeq

  test("backward as-of == q45's inline construction AND the brute-force join") {
    val op = AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts",
        Seq("event_id"), "event_id")
      .select(col("purchase_id"), col("asof_event_id"), col("asof_gap_us"))
    val q45 = SparkEntry.queries("q45_asof_click_purchase")(spark, sf)
      .select(col("purchase_id"), col("click_id"), col("gap_us"))
    assert(canon(op) == canon(q45))
    // brute force only has rows for matched purchases: compare the matched slice
    val matched = canon(op).collect { case (p, Some(c), Some(g)) => (p, Some(c), Some(g)) }
    assert(matched == canon(brute("backward")))
  }

  test("forward as-of == brute force") {
    val op = AsOfJoin.forward(purchases, clicks, "user_id", "ts", "ts",
        Seq("event_id"), "event_id")
      .select(col("purchase_id"), col("asof_event_id"), col("asof_gap_us"))
    val matched = canon(op).collect { case (p, Some(c), Some(g)) => (p, Some(c), Some(g)) }
    assert(matched == canon(brute("forward")))
  }

  test("nearest as-of == brute force (ties go backward)") {
    val op = AsOfJoin.nearest(purchases, clicks, "user_id", "purchase_id",
        "ts", "ts", Seq("event_id"), "event_id")
      .select(col("purchase_id"), col("asof_event_id"), col("asof_gap_us"))
    val matched = canon(op).collect { case (p, Some(c), Some(g)) => (p, Some(c), Some(g)) }
    assert(matched == canon(brute("nearest")))
  }

  test("tolerance nulls far matches but keeps the row") {
    val tol = 60L * 1000000 // 60s
    val op = AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts",
      Seq("event_id"), "event_id", toleranceUs = Some(tol))
    assert(op.count() == purchases.count(), "every left row survives")
    assert(op.filter(col("asof_gap_us") > tol).count() == 0)
    val unGated = AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts",
      Seq("event_id"), "event_id")
    val expectNull = unGated.filter(col("asof_gap_us") > tol).count()
    val gotNull = op.filter(col("asof_event_id").isNull).count() -
      unGated.filter(col("asof_event_id").isNull).count()
    assert(gotNull == expectNull, "exactly the far matches were nulled")
  }
}
