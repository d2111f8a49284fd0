package graft

import org.apache.spark.sql.functions._
import graft.model.{SalesforceRegistry, WriteMode}
import graft.pipeline.Pipeline
import graft.sink.Warehouse
import graft.sources.SObjectSource

/** The reference's concrete 15-resource Salesforce registry
  * (`salesforce/__init__.py:31-148`) running through the engine's own
  * pipeline loop over the API-shaped DSv2 connector: dispositions per the
  * README table, PK-less merge fallback, per-resource replication keys,
  * incremental second runs.
  */
class SalesforceRegistrySpec extends SparkSpec {

  test("registry matches the reference disposition table") {
    val r = SalesforceRegistry.resources
    assert(r.size == 15)
    assert(r.count(_.mode == WriteMode.Replace) == 8)
    assert(r.count(_.mode == WriteMode.Merge) == 7)
    // replace resources: full refresh, no PK, no watermark (README table rows 1-8)
    val replaceNames = r.filter(_.mode == WriteMode.Replace).map(_.name).toSet
    assert(replaceNames == Set("sf_user", "user_role", "contact", "lead", "campaign",
      "product_2", "pricebook_2", "pricebook_entry"))
    assert(r.filter(_.mode == WriteMode.Replace).forall(x =>
      x.primaryKeys.isEmpty && x.replicationKey.isEmpty))
    // account is the one LastModifiedDate incremental (salesforce/__init__.py:76-83)
    assert(SalesforceRegistry.byName("account").get.replicationKey.contains("LastModifiedDate"))
    // other id-keyed merges replicate on SystemModstamp with the 2000-01-01 seed
    Seq("opportunity", "opportunity_line_item", "opportunity_contact_role", "campaign_member")
      .foreach { n =>
        val res = SalesforceRegistry.byName(n).get
        assert(res.primaryKeys == Seq("Id"))
        assert(res.replicationKey.contains("SystemModstamp"))
        assert(res.initialWatermark.contains("2000-01-01T00:00:00Z"))
      }
    // task/event: merge WITHOUT pk (falls back to append), no initial watermark
    Seq("task", "event").foreach { n =>
      val res = SalesforceRegistry.byName(n).get
      assert(res.mode == WriteMode.Merge && res.primaryKeys.isEmpty)
      assert(res.initialWatermark.isEmpty)
    }
    // sObject API names differ from table names where the reference says so
    assert(SalesforceRegistry.byName("sf_user").get.apiName == "User")
    assert(SalesforceRegistry.byName("pricebook_entry").get.apiName == "Pricebook2Entry"
      || SalesforceRegistry.byName("pricebook_entry").get.apiName == "PricebookEntry")
  }

  test("full registry run over the DSv2 connector; incremental second run") {
    val whDir = tmpDir("sfreg-wh")
    val stDir = tmpDir("sfreg-st")
    val cfg = Pipeline.Config(
      sfDir = "", warehouseDir = whDir, stateDir = stDir,
      resources = SalesforceRegistry.resources,
      extract = Some(SObjectSource.dsv2Extractor(rows = 300, pageSize = 100)))

    val run1 = Pipeline.run(spark, cfg)
    assert(run1.reports.size == 15)
    assert(run1.totalRecords == 15L * 300)
    val wh = new Warehouse(spark, whDir)
    assert(wh.listTables().size == 15)
    assert(wh.load("account").count() == 300)
    assert(wh.load("task").count() == 300)

    // second run, source unchanged: merge resources extract 0 (strict >);
    // replace resources re-extract everything but the table content is stable
    val run2 = Pipeline.run(spark, cfg)
    val byName = run2.reports.map(r => r.table -> r).toMap
    Seq("opportunity", "account", "campaign_member", "task", "event").foreach { n =>
      assert(byName(n).rows == 0, s"$n re-extracted ${byName(n).rows} rows")
    }
    assert(byName("sf_user").rows == 300)
    SalesforceRegistry.resources.foreach { r =>
      assert(wh.load(r.name).count() == 300, r.name)
    }

    // source grows: merge resources pick up ONLY the delta; task/event append it
    val grown = cfg.copy(extract = Some(SObjectSource.dsv2Extractor(rows = 350, pageSize = 100)))
    val run3 = Pipeline.run(spark, grown)
    val by3 = run3.reports.map(r => r.table -> r).toMap
    assert(by3("opportunity").rows == 50 && by3("task").rows == 50)
    assert(wh.load("opportunity").count() == 350)
    assert(wh.load("task").count() == 350)
    // updated rows merge by PK, not duplicate: re-run 350 over account
    Pipeline.run(spark, grown.copy(resources = SalesforceRegistry.resources.filter(_.name == "account"),
      forceReplace = false))
    assert(wh.load("account").count() == 350)
    assert(wh.load("account").select("Id").distinct().count() == 350)
  }

  test("disposition semantics on update: merge dedups by Id, replace refreshes") {
    val whDir = tmpDir("sfreg-upd")
    val stDir = tmpDir("sfreg-upd-st")
    val subset = SalesforceRegistry.resources.filter(r => Set("account", "contact").contains(r.name))
    val cfg = Pipeline.Config("", whDir, stDir, resources = subset,
      extract = Some(SObjectSource.dsv2Extractor(rows = 120, pageSize = 50)))
    Pipeline.run(spark, cfg)
    val wh = new Warehouse(spark, whDir)
    assert(wh.load("account").count() == 120 && wh.load("contact").count() == 120)
    // contact (replace) snapshots advance on every run; account (merge) stays v-stable on no-op
    val cv = wh.currentVersion("contact")
    Pipeline.run(spark, cfg)
    assert(wh.currentVersion("contact") == cv + 1)
    assert(wh.load("contact").count() == 120)
  }
}
