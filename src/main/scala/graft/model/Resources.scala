package graft.model

/** Per-table write disposition (SURVEY.md §2.9 I6).
  *
  * Mirrors the reference's three dispositions (`salesforce_pipeline.py:75-134`):
  *   - Replace: delete-all (`AlwaysTrue()` predicate) then append.
  *   - Merge: delete-by-PK (semi-join on incoming PKs) then append.
  *   - Append: plain append.
  */
sealed trait WriteMode
object WriteMode {
  case object Replace extends WriteMode
  case object Merge   extends WriteMode
  case object Append  extends WriteMode

  def parse(s: String): WriteMode = s.toLowerCase match {
    case "replace" | "force_replace" => Replace
    case "merge"                     => Merge
    case "append"                    => Append
    case other => throw new IllegalArgumentException(s"unknown write mode: $other")
  }
}

/** Declarative description of one extracted table: the Scala analog of a dlt
  * `@dlt.resource` declaration (`salesforce/__init__.py:31-148`), carrying the
  * disposition, primary keys, and incremental replication key + initial
  * watermark (`initial_value="2000-01-01T00:00:00Z"`,
  * `salesforce/__init__.py:42-43`).
  *
  * @param name            table name (sObject analog; here a parquet file stem)
  * @param mode            write disposition
  * @param primaryKeys     PK columns (empty → merge falls back to append, the
  *                        reference's PK-presence guard `salesforce_pipeline.py:131-134`)
  * @param replicationKey  incremental watermark column, if any
  * @param initialWatermark starting watermark value (ISO timestamp literal)
  * @param nanosCols       columns stored as TIMESTAMP(NANOS) parquet, which
  *                        Spark surfaces as raw long nanos (legacy
  *                        nanosAsLong) — normalized to TimestampType at
  *                        extraction
  * @param sObject         Salesforce API object name when it differs from the
  *                        destination table name (e.g. resource `sf_user` reads
  *                        sObject `User`, `salesforce/__init__.py:32-34`)
  */
final case class ResourceDef(
    name: String,
    mode: WriteMode,
    primaryKeys: Seq[String] = Nil,
    replicationKey: Option[String] = None,
    initialWatermark: Option[String] = None,
    nanosCols: Seq[String] = Nil,
    sObject: Option[String] = None) {
  /** The upstream API name (defaults to the table name). */
  def apiName: String = sObject.getOrElse(name)
}

object Resources {
  /** The reference's epoch (`salesforce/__init__.py:42-43`). */
  val DefaultInitialWatermark = "2000-01-01T00:00:00Z"

  /** Epoch predating all driver test data (orders span 1995-2001): the
    * initial watermark must predate the corpus or the first run silently
    * skips history — same role 2000-01-01 plays for Salesforce data.
    */
  val TestdataEpoch = "1990-01-01T00:00:00Z"

  /** The driver test-data star schema cast into the reference's resource
    * roles (FIXTURES.md §B): `orders`/`lineitem` are merge-disposition
    * incremental facts; dimensions are replace; `events` is append-only with
    * a watermark (like the reference's task/event resources,
    * `salesforce/__init__.py:116-130`).
    */
  val testdata: Seq[ResourceDef] = Seq(
    ResourceDef("region",   WriteMode.Replace),
    ResourceDef("nation",   WriteMode.Replace),
    ResourceDef("customer", WriteMode.Replace, Seq("c_custkey")),
    ResourceDef("supplier", WriteMode.Replace, Seq("s_suppkey")),
    ResourceDef("part",     WriteMode.Replace, Seq("p_partkey")),
    ResourceDef("orders",   WriteMode.Merge, Seq("o_orderkey"), Some("o_orderdate"), Some(TestdataEpoch)),
    ResourceDef("lineitem", WriteMode.Merge, Seq("l_orderkey", "l_linenumber"), Some("l_shipdate"), Some(TestdataEpoch)),
    ResourceDef("events",   WriteMode.Append, Seq("event_id"), Some("ts"), None, Seq("ts"))
  )

  def byName(name: String): ResourceDef =
    testdata.find(_.name == name).getOrElse(ResourceDef(name, WriteMode.Append))
}

/** The reference's concrete 15-resource Salesforce registry
  * (`salesforce/__init__.py:31-148`, disposition table
  * `salesforce/README.md:5-28`), encoded as [[ResourceDef]]s:
  *
  *  - 8 replace resources (full refresh, no PK): User, UserRole, Contact,
  *    Lead, Campaign, Product2, Pricebook2, PricebookEntry
  *  - 5 merge resources with PK `Id` and a strict-`>` incremental watermark
  *    seeded at 2000-01-01: Opportunity (+LineItem, +ContactRole),
  *    CampaignMember on `SystemModstamp`; Account on `LastModifiedDate`
  *    (`salesforce/__init__.py:76-83` — the one non-Modstamp key)
  *  - 2 merge resources declared WITHOUT a primary key: Task and Event
  *    (`salesforce/__init__.py:116-130`), which therefore fall back to
  *    append (the reference's PK-presence guard,
  *    `salesforce_pipeline.py:131-134`), with no initial watermark
  *    (`initial_value=None` — first run extracts full history)
  */
object SalesforceRegistry {
  /** `initial_value="2000-01-01T00:00:00Z"` (`salesforce/__init__.py:42-43`). */
  val InitialWatermark: String = Resources.DefaultInitialWatermark

  private def replace(table: String, sobj: String) =
    ResourceDef(table, WriteMode.Replace, sObject = Some(sobj))

  private def merge(table: String, sobj: String, rk: String = "SystemModstamp") =
    ResourceDef(table, WriteMode.Merge, Seq("Id"), Some(rk), Some(InitialWatermark),
      sObject = Some(sobj))

  val resources: Seq[ResourceDef] = Seq(
    replace("sf_user", "User"),
    replace("user_role", "UserRole"),
    merge("opportunity", "Opportunity"),
    merge("opportunity_line_item", "OpportunityLineItem"),
    merge("opportunity_contact_role", "OpportunityContactRole"),
    merge("account", "Account", rk = "LastModifiedDate"),
    replace("contact", "Contact"),
    replace("lead", "Lead"),
    replace("campaign", "Campaign"),
    merge("campaign_member", "CampaignMember"),
    replace("product_2", "Product2"),
    replace("pricebook_2", "Pricebook2"),
    replace("pricebook_entry", "PricebookEntry"),
    ResourceDef("task", WriteMode.Merge, Nil, Some("SystemModstamp"), None,
      sObject = Some("Task")),
    ResourceDef("event", WriteMode.Merge, Nil, Some("SystemModstamp"), None,
      sObject = Some("Event")))

  def byName(name: String): Option[ResourceDef] = resources.find(_.name == name)
}
