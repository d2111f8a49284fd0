package graft

import graft.pipeline.Pipeline
import graft.model.{ResourceDef, Resources, WriteMode}
import graft.state.WatermarkStore
import graft.sink.Warehouse

/** End-to-end pipeline semantics over the sf0.001 fixture data:
  * validate -> run -> verify -> summary (SURVEY §2.10, §3), incremental
  * second run is a no-op (strict `>` watermark), force_replace resets state.
  */
class PipelineSpec extends SparkSpec {

  private def cfg(wh: String, st: String, rs: Seq[ResourceDef] = Resources.testdata) =
    Pipeline.Config(sf, wh, st, resources = rs)

  test("validate fails fast on bad config") {
    assert(Pipeline.validate(cfg("", "s")).isLeft)
    assert(Pipeline.validate(Pipeline.Config(sf, "w", "s", resources = Nil)).isLeft)
    assert(Pipeline.validate(Pipeline.Config("/nope", "w", "s")).isLeft)
    assert(Pipeline.validate(cfg("w", "s")).isRight)
  }

  test("first run loads all resources; verification counts match source") {
    val (wh, st) = (tmpDir("pl-wh"), tmpDir("pl-st"))
    val summary = Pipeline.run(spark, cfg(wh, st))
    assert(summary.successCount == Resources.testdata.size)
    assert(summary.totalRecords > 0)
    val counts = Pipeline.verify(spark, wh)
    val srcOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(counts("orders").rows == srcOrders)
    assert(summary.render.contains("TOTAL"))
    // check_tables.py parity: the verify stage carries ≤3 sample rows per
    // table over the first ≤5 columns
    counts.foreach { case (t, chk) =>
      assert(chk.sample.nonEmpty && chk.sample.size <= 3, s"$t: no sample rows")
      assert(chk.sample.forall(_.count(_ == '|') <= 4), s"$t: more than 5 columns sampled")
    }
  }

  test("second incremental run extracts nothing new (strict > watermark)") {
    val (wh, st) = (tmpDir("pl2-wh"), tmpDir("pl2-st"))
    Pipeline.run(spark, cfg(wh, st))
    val before = Pipeline.verify(spark, wh).view.mapValues(_.rows).toMap
    val second = Pipeline.run(spark, cfg(wh, st))
    // merge resources see 0 incremental rows; replace resources reload fully
    val mergeReports = second.reports.filter(_.mode == WriteMode.Merge)
    assert(mergeReports.nonEmpty && mergeReports.forall(_.rows == 0))
    assert(Pipeline.verify(spark, wh).view.mapValues(_.rows).toMap == before)
  }

  test("transient extract failure is retried; rows applied exactly once") {
    val (wh, st) = (tmpDir("pl5-wh"), tmpDir("pl5-st"))
    val res = Resources.byName("orders")
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky: (org.apache.spark.sql.SparkSession, ResourceDef, Option[String], Option[Int]) =>
        org.apache.spark.sql.DataFrame = { (s, r, wm, lim) =>
      if (attempts.incrementAndGet() == 1)
        throw new RuntimeException("simulated transient API failure")
      s.read.parquet(s"$sf/orders.parquet")
    }
    val summary = Pipeline.run(spark,
      cfg(wh, st, Seq(res)).copy(extract = Some(flaky), retryBackoffMs = 0L))
    assert(attempts.get() == 2, "attempt 1 fails, attempt 2 succeeds")
    val src = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(summary.reports.head.rows == src)
    assert(Pipeline.verify(spark, wh)("orders").rows == src, "no double-applied rows")
  }

  test("failure on every attempt propagates after retries are exhausted") {
    val (wh, st) = (tmpDir("pl6-wh"), tmpDir("pl6-st"))
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val broken: (org.apache.spark.sql.SparkSession, ResourceDef, Option[String], Option[Int]) =>
        org.apache.spark.sql.DataFrame = { (_, _, _, _) =>
      attempts.incrementAndGet(); throw new RuntimeException("still down")
    }
    intercept[RuntimeException] {
      Pipeline.run(spark, cfg(wh, st, Seq(Resources.byName("orders")))
        .copy(extract = Some(broken), retries = 2, retryBackoffMs = 0L))
    }
    assert(attempts.get() == 3, "initial attempt + 2 retries")
  }

  test("force_replace resets state and dispositions") {
    val (wh, st) = (tmpDir("pl3-wh"), tmpDir("pl3-st"))
    Pipeline.run(spark, cfg(wh, st))
    val summary = Pipeline.run(spark, cfg(wh, st).copy(forceReplace = true))
    assert(summary.reports.forall(_.mode == WriteMode.Replace))
    // full re-extraction after state reset
    assert(summary.reports.find(_.table == "orders").get.rows ==
      spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("testLimit caps extraction like IS_PRODUCTION=false") {
    val (wh, st) = (tmpDir("pl4-wh"), tmpDir("pl4-st"))
    val summary = Pipeline.run(spark,
      cfg(wh, st, Seq(Resources.byName("customer"))).copy(testLimit = Some(100)))
    assert(summary.reports.head.rows == 100)
  }

  test("describe dumps every config knob and auth strategy (dump_env_vars parity)") {
    val out = Pipeline.describe(cfg("whdir", "stdir").copy(testLimit = Some(7)))
    // every Config field present with its effective value
    Seq("sfDir", "warehouseDir", "stateDir", "resources", "forceReplace",
      "testLimit", "retries", "retryBackoffMs").foreach(k => assert(out.contains(k), k))
    assert(out.contains("whdir") && out.contains("= 7"))
    assert(out.contains("SALESFORCE_RESOURCES") && out.contains("force_replace"))
    // all six connector credential strategies, fields only — never values
    Seq("security_token", "organization_id", "instance", "consumer_key_secret",
      "jwt", "client_credentials").foreach(s => assert(out.contains(s"auth=$s"), s))
  }

  test("watermark store: monotone advance, atomic write, reset") {
    val st = new WatermarkStore(tmpDir("wm"))
    st.advance("r", "2024-01-01T00:00:00")
    st.advance("r", "2023-01-01T00:00:00") // smaller: no-op
    assert(st.get("r").contains("2024-01-01T00:00:00.000000"))
    st.advance("r", "2025-01-01T00:00:00")
    assert(st.get("r").contains("2025-01-01T00:00:00.000000"))
    st.reset()
    assert(st.get("r").isEmpty)
  }

  test("watermark store: Z-suffixed seed does not block same-second µs advance") {
    val st = new WatermarkStore(tmpDir("wm-z"))
    // externally seeded in the documented Z format (Resources.DefaultInitialWatermark)
    st.put("r", "2024-06-01T12:00:00Z")
    // a µs-format candidate in the SAME second: '.' < 'Z' lexicographically,
    // but temporally this is later and must advance
    st.advance("r", "2024-06-01T12:00:00.000500")
    assert(st.get("r").contains("2024-06-01T12:00:00.000500"))
    st.advance("r", "2024-06-01T12:00:00.000400") // earlier µs: no-op
    assert(st.get("r").contains("2024-06-01T12:00:00.000500"))
    // non-timestamp watermarks stay opaque strings
    st.put("k", "000123")
    st.advance("k", "000124")
    assert(st.get("k").contains("000124"))
  }
}
