package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusPipeline
import graft.pipeline.CorpusPipeline.Config
import graft.queries.Tables

/** End-to-end curation pipeline: stage composition, audit-count coherence,
  * dedup/decontamination postconditions, determinism and idempotence — the
  * properties that make incremental 100 TB re-runs safe.
  */
class CorpusPipelineSpec extends SparkSpec {

  private def docs = Tables.read(spark, sf, "documents")
  // q72's eval selection: a deterministic ~1/16 md5 split of the corpus.
  private def evalDocs =
    docs.filter(substring(md5(col("doc_id").cast("string")), 1, 1) === "0")

  private val cfg = Config(sampleRates = Map("en" -> 0.5))

  test("stage reports chain and never grow; result is non-empty") {
    val out = CorpusPipeline.curate(docs, evalDocs, cfg)
    assert(out.report.map(_.stage) ==
      Seq("quality_filter", "exact_dedup", "neardup_collapse",
        "decontaminate", "mixture_sample"))
    out.report.foreach(r =>
      assert(r.docsOut <= r.docsIn, s"${r.stage} grew: $r"))
    out.report.sliding(2).foreach { case Seq(a, b) =>
      assert(b.docsIn == a.docsOut, s"gap between ${a.stage} and ${b.stage}")
    case _ => }
    assert(out.report.last.docsOut == out.docs.count())
    assert(out.docs.count() > 0)
    // at least one stage actually removed something on this fixture
    assert(out.report.map(r => r.docsIn - r.docsOut).sum > 0)
  }

  test("postconditions: no duplicate fingerprints, no eval docs survive") {
    val out = CorpusPipeline.curate(docs, evalDocs, cfg)
    val n = out.docs.count()
    assert(out.docs.select(md5(graft.functions.TextFns.normalize(col("text"))))
      .distinct().count() == n, "exact-dup fingerprints survived curation")
    // an eval doc overlaps itself on every gram, so none can survive
    assert(out.docs.join(evalDocs.select("doc_id"), Seq("doc_id"), "left_semi")
      .count() == 0, "eval documents leaked through decontamination")
  }

  test("idempotent: curating a curated corpus is a no-op") {
    val once = CorpusPipeline.curate(docs, evalDocs, cfg)
    val twice = CorpusPipeline.curate(once.docs, evalDocs, cfg)
    twice.report.foreach(r =>
      assert(r.docsIn == r.docsOut, s"second run still removed docs at $r"))
  }

  test("non-broadcast (bloom-prefiltered shuffle) decontamination == broadcast path") {
    val bc = CorpusPipeline.decontaminate(docs, evalDocs, cfg)
    val bl = CorpusPipeline.decontaminate(docs, evalDocs,
      cfg.copy(broadcastEvalGrams = false))
    assert(bl.select("doc_id").orderBy("doc_id").collect().toSeq ==
      bc.select("doc_id").orderBy("doc_id").collect().toSeq,
      "bloom pre-pass must not change the surviving set")
  }

  test("mixture sampling is monotone in the rate (subset property)") {
    val low = CorpusPipeline.mixtureSample(docs, Config(defaultSampleRate = 0.3))
    val high = CorpusPipeline.mixtureSample(docs, Config(defaultSampleRate = 0.6))
    assert(low.join(high, Seq("doc_id"), "left_anti").count() == 0,
      "rate-0.3 sample is not a subset of the rate-0.6 sample")
    assert(low.count() < high.count())
  }

  test("deterministic: identical report on a re-run") {
    val a = CorpusPipeline.curate(docs, evalDocs, cfg).report
    val b = CorpusPipeline.curate(docs.repartition(7), evalDocs, cfg).report
    assert(a == b, "stage counts depend on partitioning")
  }

  test("WAP-gated curation: clean audit publishes; failed audit leaves the table untouched") {
    val wh = new graft.sink.Warehouse(spark, tmpDir("corpus-wap"))
    val rep = CorpusPipeline.curateIntoWarehouse(wh, "corpus", docs, evalDocs, cfg)
    assert(rep.audits.forall(_._2), s"audits must pass on real docs: ${rep.audits}")
    assert(rep.published.isDefined)
    val v1 = rep.published.get
    val direct = CorpusPipeline.curate(docs, evalDocs, cfg).docs
    assert(wh.load("corpus").count() == direct.count(),
      "published table must hold exactly the curated corpus")
    assert(wh.listStages("corpus").isEmpty)

    // a keep-ratio bar no real curation can meet: audit fails, stage drops,
    // the published snapshot stays exactly where it was
    val bad = CorpusPipeline.curateIntoWarehouse(wh, "corpus", docs, evalDocs, cfg,
      minKeepRatio = 1.01)
    assert(bad.published.isEmpty)
    assert(bad.audits.collect { case ("keep_ratio", ok) => ok } == Seq(false))
    assert(wh.currentVersion("corpus") == v1, "failed audit must not commit")
    assert(wh.listStages("corpus").isEmpty, "failed audit must drop its stage")
    assert(wh.load("corpus").count() == direct.count())
  }
}
