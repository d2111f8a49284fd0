package graft

import org.apache.spark.sql.functions._
import graft.sources.dsv2.FakeSalesforceApi

/** DSv2 sObject connector: schema discovery, filter/column/limit pushdown
  * (visible in the executed plan as synthesized SOQL), paged partitions,
  * and value-level correctness against the deterministic fake API.
  */
class DsV2Spec extends SparkSpec {

  private val fmt = "graft.sources.dsv2.SObjectDataSource"

  private def accounts(rows: Long = 5000, pageSize: Int = 1000) =
    spark.read.format(fmt)
      .option("sobject", "Account")
      .option("rows", rows.toString)
      .option("pageSize", pageSize.toString)
      .load()

  test("schema discovery via describe(): compound fields pruned from metadata") {
    val df = accounts()
    assert(df.schema.fieldNames.toSeq ==
      Seq("Id", "Name", "AnnualRevenue", "IsActive", "LastModifiedDate", "SystemModstamp"))
    assert(df.count() == 5000)
    // the excluded-column set derives from describe() metadata (records.py:71-84),
    // not from caller-supplied drop lists
    assert(FakeSalesforceApi.compoundFields("Account") == Seq("BillingAddress", "ShippingAddress"))
    assert(!df.columns.contains("BillingAddress"))
  }

  test("watermark filter is pushed down and appears as SOQL in the plan") {
    val cut = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T01:00:00Z"))
    val df = accounts().filter(col("SystemModstamp") > lit(cut)).select("Id", "SystemModstamp")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SOQL: SELECT"), s"no SOQL scan in plan:\n$plan")
    assert(plan.contains("SystemModstamp >"), s"watermark not pushed:\n$plan")
    // rows 61..4999 pass (one per minute after the first hour)
    assert(df.count() == 5000 - 61)
  }

  test("column pruning reaches the scan") {
    val df = accounts().select("Id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SELECT Id FROM Account"), s"projection not pruned:\n$plan")
  }

  test("limit pushdown caps pages server-side") {
    val df = accounts(rows = 100000, pageSize = 100).limit(42)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LIMIT 42"), s"limit not pushed:\n$plan")
    assert(df.count() == 42)
  }

  test("paged partitions: one per pageSize slice") {
    val df = accounts(rows = 2500, pageSize = 1000)
    assert(df.rdd.getNumPartitions == 3)
  }

  test("bulk->rest fallback: activity entities plan as one REST cursor chain") {
    // records.py:96-121 — Bulk is tried first; Task/Event are not
    // Bulk-queryable, so auto falls back to the serial REST cursor.
    val tasks = spark.read.format(fmt)
      .option("sobject", "Task").option("rows", "2500").option("pageSize", "1000")
      .load()
    val plan = tasks.queryExecution.executedPlan.toString
    assert(plan.contains("REST SOQL"), s"REST path not chosen:\n$plan")
    assert(tasks.rdd.getNumPartitions == 1) // one nextRecordsUrl chain
    assert(tasks.count() == 2500)
    // a Bulk-capable sObject keeps parallel page partitions under auto
    val acc = accounts(rows = 2500, pageSize = 1000)
    assert(acc.queryExecution.executedPlan.toString.contains("BULK SOQL"))
    assert(acc.rdd.getNumPartitions == 3)
    // pushdown still applies on the REST path (WHERE travels on the cursor)
    val filtered = tasks.filter(col("Status") === "Open")
    assert(filtered.queryExecution.executedPlan.toString.contains("Status ="))
    assert(filtered.count() == 834) // rows 0,3,6,... of 2500
  }

  test("api=bulk on an activity entity fails fast; api=rest forces the cursor") {
    val e = intercept[Exception] {
      spark.read.format(fmt).option("sobject", "Event").option("api", "bulk")
        .option("rows", "10").load().count()
    }
    assert(e.getMessage.contains("Bulk API cannot query Event"), e.getMessage)
    val forced = accounts(rows = 2500, pageSize = 1000)
    val rest = spark.read.format(fmt)
      .option("sobject", "Account").option("api", "rest")
      .option("rows", "2500").option("pageSize", "1000").load()
    assert(rest.rdd.getNumPartitions == 1 && forced.rdd.getNumPartitions == 3)
    assert(rest.count() == forced.count())
  }

  test("values match the deterministic API") {
    val row = accounts().filter(col("Id") === "Account-00000007")
      .select("Name", "AnnualRevenue", "IsActive").head()
    assert(row.getString(0) == "Account 7")
    assert(row.getLong(1) == FakeSalesforceApi.field("Account", 7, "AnnualRevenue"))
    assert(row.getBoolean(2) == FakeSalesforceApi.field("Account", 7, "IsActive"))
  }

  test("unsupported predicate stays a Spark-side residual but result is right") {
    val df = accounts().filter(col("Name").endsWith("99"))
    assert(df.count() == 50)  // Account 99, 199, ..., 4999
  }

  // --- credential strategy surface (client.py:132-214) ---------------------

  import graft.sources.dsv2.SalesforceAuth
  import org.apache.spark.sql.util.CaseInsensitiveStringMap
  private def opts(kv: (String, String)*) =
    new CaseInsensitiveStringMap(scala.jdk.CollectionConverters.MapHasAsJava(kv.toMap).asJava)

  test("auth: each of the six strategies resolves from typed options") {
    assert(SalesforceAuth.fromOptions(opts(
      "username" -> "u", "password" -> "p", "securityToken" -> "t"))
      .contains(SalesforceAuth.SecurityToken("u", "p", "t")))
    assert(SalesforceAuth.fromOptions(opts(
      "username" -> "u", "password" -> "p", "organizationId" -> "o"))
      .contains(SalesforceAuth.OrganizationId("u", "p", "o")))
    assert(SalesforceAuth.fromOptions(opts("sessionId" -> "s", "instanceUrl" -> "https://x"))
      .contains(SalesforceAuth.Instance("s", None, Some("https://x"))))
    assert(SalesforceAuth.fromOptions(opts(
      "username" -> "u", "password" -> "p", "consumerKey" -> "k", "consumerSecret" -> "c"))
      .contains(SalesforceAuth.ConsumerKeySecret("u", "p", "k", "c")))
    assert(SalesforceAuth.fromOptions(opts(
      "username" -> "u", "consumerKey" -> "k", "privateKey" -> "pem"))
      .contains(SalesforceAuth.Jwt("u", "k", Some("pem"), None)))
    assert(SalesforceAuth.fromOptions(opts(
      "consumerKey" -> "k", "consumerSecret" -> "c", "domain" -> "login"))
      .contains(SalesforceAuth.ClientCredentials("k", "c", "login")))
    // no credential options at all: the offline source needs none
    assert(SalesforceAuth.fromOptions(opts()).isEmpty)
  }

  test("auth: incomplete or unknown credential sets fail fast with named errors") {
    // explicit strategy, missing field
    val e1 = intercept[IllegalArgumentException](SalesforceAuth.fromOptions(
      opts("auth" -> "security_token", "username" -> "u", "password" -> "p")))
    assert(e1.getMessage.contains("securityToken"))
    // either-or rules (client.py on_resolved)
    val e2 = intercept[IllegalArgumentException](SalesforceAuth.fromOptions(
      opts("auth" -> "jwt", "username" -> "u", "consumerKey" -> "k")))
    assert(e2.getMessage.contains("privateKey"))
    val e3 = intercept[IllegalArgumentException](SalesforceAuth.fromOptions(
      opts("auth" -> "instance", "sessionId" -> "s")))
    assert(e3.getMessage.contains("instance"))
    // unknown strategy name
    val e4 = intercept[IllegalArgumentException](SalesforceAuth.fromOptions(
      opts("auth" -> "magic")))
    assert(e4.getMessage.contains("unknown auth strategy"))
    // username/password with no discriminating field: ambiguous, rejected
    val e5 = intercept[IllegalArgumentException](SalesforceAuth.fromOptions(
      opts("username" -> "u", "password" -> "p")))
    assert(e5.getMessage.contains("incomplete credentials"))
    // a bad credential set is rejected at load() planning, not mid-extraction
    intercept[IllegalArgumentException] {
      spark.read.format(fmt).option("sobject", "Account")
        .option("auth", "jwt").option("username", "u").option("consumerKey", "k")
        .load()
    }
  }
}
