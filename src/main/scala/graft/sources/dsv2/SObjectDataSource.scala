package graft.sources.dsv2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Production-path DSv2 connector for the sObject source (SURVEY §2.1 S1/S2,
  * §4 pushdown rows): the in-repo query surface reads parquet stand-ins, but
  * a real deployment scans the Salesforce API — this is that connector shape,
  * backed by a deterministic in-memory "API" so it is fully testable offline.
  *
  * What it demonstrates, mapped to the reference:
  *  - describe() schema discovery  -> `TableProvider.inferSchema` (records.py:69-84)
  *  - SOQL WHERE synthesis         -> `SupportsPushDownFilters` (records.py:87-94);
  *    the synthesized SOQL is surfaced in `Scan.description()` so it shows in
  *    `.explain` exactly like parquet `PushedFilters`
  *  - field-list projection        -> `SupportsPushDownRequiredColumns`
  *  - test LIMIT                   -> `SupportsPushDownLimit`
  *  - Bulk API paged extraction    -> one `InputPartition` per page
  *    (`lazy_operation=True` pages, records.py:96-103); pages stream through
  *    `PartitionReader` iterators, never materialized whole
  *
  * Usage: `spark.read.format("graft.sources.dsv2.SObjectDataSource")
  *   .option("sobject", "Account").option("pageSize", "1000").load()`
  */
class SObjectDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sobject"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FakeSalesforceApi.describe(options.get("sobject"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    // Fail-fast credential resolution at planning time (client.py:132-214);
    // the offline fake API authenticates nothing, but a bad credential SET
    // must still be rejected here, not mid-extraction.
    val auth = SalesforceAuth.fromOptions(opts)
    val api = Option(opts.get("api")).map(_.toLowerCase).getOrElse("auto")
    require(Set("auto", "bulk", "rest").contains(api),
      s"api must be auto|bulk|rest, got: $api")
    new SObjectTable(opts.get("sobject"),
      Option(opts.get("pageSize")).map(_.toInt).getOrElse(1000),
      Option(opts.get("rows")).map(_.toLong).getOrElse(FakeSalesforceApi.DefaultRows),
      auth, api)
  }
}

/** Deterministic stand-in for the Salesforce API: describe() + filtered,
  * projected, paged record serving. Field values derive from the row index
  * alone, so tests can compute expected results independently.
  *
  * `describeRaw` models the reference's per-sObject `describe()` metadata for
  * the 15 sObjects its registry extracts (`salesforce/__init__.py:31-148`),
  * including the *compound* fields (addresses) the reference derives its
  * excluded-column set from (`salesforce/helpers/records.py:71-84`) —
  * [[describe]] prunes them exactly the way the reference's field-list
  * synthesis does.
  */
object FakeSalesforceApi {
  val DefaultRows = 10000L
  private val Epoch = java.time.Instant.parse("2024-01-01T00:00:00Z")

  /** (field, type, isCompound) per sObject. Unlisted sObjects keep the
    * legacy generic shape so ad-hoc test objects still work.
    */
  private val S = StringType; private val L = LongType
  private val B = BooleanType; private val T = TimestampType
  private val extras: Map[String, Seq[(String, DataType, Boolean)]] = Map(
    "User"                   -> Seq(("Username", S, false), ("Email", S, false), ("IsActive", B, false)),
    "UserRole"               -> Seq(("RollupDescription", S, false)),
    "Account"                -> Seq(("AnnualRevenue", L, false), ("IsActive", B, false),
                                    ("LastModifiedDate", T, false),
                                    ("BillingAddress", S, true), ("ShippingAddress", S, true)),
    "Contact"                -> Seq(("Email", S, false), ("AccountId", S, false), ("MailingAddress", S, true)),
    "Lead"                   -> Seq(("Email", S, false), ("Status", S, false), ("Address", S, true)),
    "Campaign"               -> Seq(("IsActive", B, false)),
    "CampaignMember"         -> Seq(("CampaignId", S, false), ("LeadId", S, false), ("Status", S, false)),
    "Product2"               -> Seq(("ProductCode", S, false), ("IsActive", B, false)),
    "Pricebook2"             -> Seq(("IsActive", B, false), ("IsStandard", B, false)),
    "PricebookEntry"         -> Seq(("Pricebook2Id", S, false), ("Product2Id", S, false),
                                    ("UnitPrice", L, false), ("IsActive", B, false)),
    "Opportunity"            -> Seq(("AccountId", S, false), ("Amount", L, false), ("StageName", S, false)),
    "OpportunityLineItem"    -> Seq(("OpportunityId", S, false), ("Quantity", L, false), ("UnitPrice", L, false)),
    "OpportunityContactRole" -> Seq(("OpportunityId", S, false), ("ContactId", S, false), ("Role", S, false)),
    "Task"                   -> Seq(("WhoId", S, false), ("Subject", S, false), ("Status", S, false)),
    "Event"                  -> Seq(("WhoId", S, false), ("Subject", S, false), ("DurationInMinutes", L, false)))

  /** Raw describe() metadata incl. compound fields (records.py:71-84). */
  def describeRaw(sobject: String): Seq[(String, DataType, Boolean)] =
    extras.get(sobject) match {
      case Some(ex) =>
        Seq(("Id", S, false), ("Name", S, false)) ++ ex ++ Seq(("SystemModstamp", T, false))
      case None => Seq(("Id", S, false), ("Name", S, false), ("AnnualRevenue", L, false),
        ("IsActive", B, false), ("SystemModstamp", T, false))
    }

  /** Compound fields the extraction schema must exclude (P1 analog). */
  def compoundFields(sobject: String): Seq[String] =
    describeRaw(sobject).filter(_._3).map(_._1)

  /** Whether the Bulk API can serve this sObject. Mirrors real Salesforce:
    * activity entities (Task/Event) are not Bulk-queryable, which is exactly
    * the failure the reference's Bulk→REST fallback catches
    * (`records.py:96-121` try bulk / except / REST cursor).
    */
  def bulkSupported(sobject: String): Boolean =
    sobject != "Task" && sobject != "Event"

  /** Extraction schema: describe() minus compound fields — derived from the
    * metadata, not caller-supplied, like `records.py:71-84`.
    */
  def describe(sobject: String): StructType = StructType(
    describeRaw(sobject).filterNot(_._3).map { case (n, t, _) =>
      StructField(n, t, nullable = n != "Id")
    })

  /** Row i of any sObject; SystemModstamp advances one minute per row. */
  def modstampMicros(i: Long): Long =
    Epoch.plusSeconds(60L * i).getEpochSecond * 1000000L

  def field(sobject: String, i: Long, name: String): Any = name match {
    case "Id"                => s"$sobject-${"%08d".format(i)}"
    case "Name"              => s"$sobject $i"
    case "AnnualRevenue"     => (i * 1013904223L) % 500000000L
    case "IsActive"          => i % 5 != 0
    case "SystemModstamp" | "LastModifiedDate" => modstampMicros(i)
    case "IsStandard"         => i % 2 == 0
    case "Username"           => s"user$i"
    case "Email"              => s"user$i@example.com"
    case "Status"             => Seq("Open", "Working", "Closed")((i % 3).toInt)
    case "StageName"          => Seq("Prospecting", "Negotiation", "Closed Won")((i % 3).toInt)
    case "Subject"            => s"$sobject subject $i"
    case "Role"               => Seq("Decision Maker", "Influencer")((i % 2).toInt)
    case "RollupDescription"  => s"role $i"
    case "ProductCode"        => s"P-${"%06d".format(i)}"
    case "UnitPrice"          => (i * 7919L) % 10000L
    case "Quantity"           => i % 50
    case "DurationInMinutes"  => 15L + (i % 8) * 15L
    case "Amount"             => (i * 2654435761L) % 1000000L
    // FK columns reference row i % 100 of the target object
    case fk if fk.endsWith("Id") => s"${fk.stripSuffix("Id")}-${"%08d".format(i % 100)}"
    case other            => throw new IllegalArgumentException(other)
  }
}

final class SObjectTable(sobject: String, pageSize: Int, rows: Long,
    val auth: Option[SalesforceAuth] = None, apiMode: String = "auto")
    extends Table with SupportsRead {
  override def name(): String = sobject
  override def schema(): StructType = FakeSalesforceApi.describe(sobject)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SObjectScanBuilder(sobject, schema(), pageSize, rows, apiMode)
}

final class SObjectScanBuilder(sobject: String, fullSchema: StructType,
    pageSize: Int, rows: Long, apiMode: String = "auto")
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var limit: Option[Int] = None

  /** Accept the predicate shapes SOQL can express (the reference pushes its
    * watermark predicate, records.py:88-90); anything else stays a Spark-side
    * residual.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, residual) = filters.partition {
      case _: EqualTo | _: GreaterThan | _: GreaterThanOrEqual |
           _: LessThan | _: LessThanOrEqual | _: IsNotNull => true
      case _ => false
    }
    pushed = supported
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  /** Bulk→REST strategy resolution (`records.py:96-121`): the reference
    * tries the Bulk API and catches its rejection to fall back to the REST
    * cursor. In Spark the strategy must resolve at PLAN time (a mid-job
    * per-task fallback would re-extract pages already served), so `auto`
    * consults the same capability metadata the Bulk rejection encodes;
    * `bulk` on an unsupported sObject fails fast, like the uncaught form.
    */
  private def effectiveApi: String = apiMode match {
    case "auto" => if (FakeSalesforceApi.bulkSupported(sobject)) "bulk" else "rest"
    case "bulk" =>
      require(FakeSalesforceApi.bulkSupported(sobject),
        s"Bulk API cannot query $sobject (activity entity); use api=rest or api=auto")
      "bulk"
    case "rest" => "rest"
  }

  override def build(): Scan =
    new SObjectScan(sobject, required, pushed, limit, pageSize, rows, effectiveApi)
}

final class SObjectScan(sobject: String, schema: StructType,
    filters: Array[Filter], limit: Option[Int], pageSize: Int, rows: Long,
    api: String = "bulk")
    extends Scan with Batch {

  override def readSchema(): StructType = schema

  /** The SOQL this scan stands for — the reference's query synthesis
    * (records.py:87-94) — surfaced in `.explain`, prefixed with the
    * extraction path (BULK pages vs REST cursor) actually chosen.
    */
  override def description(): String = {
    val cols = if (schema.isEmpty) "count()" else schema.fieldNames.mkString(", ")
    val where = if (filters.isEmpty) "" else
      " WHERE " + filters.map(SoqlFilters.render).mkString(" AND ")
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    s"${api.toUpperCase} SOQL: SELECT $cols FROM $sobject$where$lim"
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // LIMIT applies AFTER WHERE (SOQL semantics): the row range may only be
    // pre-capped when no predicate is pushed; with filters, every page is
    // scanned and readers stop after emitting `limit` matches.
    val total =
      if (filters.isEmpty) limit.map(n => math.min(n.toLong, rows)).getOrElse(rows)
      else rows
    if (api == "rest")
      // REST cursor semantics: one nextRecordsUrl chain — inherently serial,
      // so the whole extraction is ONE partition whose reader walks the
      // cursor (records.py:104-121). Parallelism at 100 TB comes from the
      // Bulk path; REST is the correctness fallback, not the scale path.
      Array(SObjectPage(sobject, 0L, total))
    else
      (0L until total by pageSize).map { start =>
        SObjectPage(sobject, start, math.min(start + pageSize, total)): InputPartition
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SObjectReaderFactory(schema, filters, limit)
}

final case class SObjectPage(sobject: String, start: Long, end: Long) extends InputPartition

final class SObjectReaderFactory(schema: StructType, filters: Array[Filter],
    limit: Option[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[SObjectPage]
    new PartitionReader[InternalRow] {
      private var i = page.start - 1
      private var emitted = 0
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (limit.exists(emitted >= _)) return false  // per-partition cap
        i += 1
        while (i < page.end && !SoqlFilters.matches(filters, page.sobject, i)) i += 1
        if (i >= page.end) return false
        emitted += 1
        current = InternalRow.fromSeq(schema.fieldNames.toSeq.map { f =>
          FakeSalesforceApi.field(page.sobject, i, f) match {
            case s: String => UTF8String.fromString(s)
            case other     => other
          }
        })
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Server-side predicate evaluation + SOQL rendering for the pushed-down
  * filter shapes.
  */
object SoqlFilters {
  private def value(sobject: String, i: Long, attr: String): Any =
    FakeSalesforceApi.field(sobject, i, attr)

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String)   => x.compareTo(y)
    case (x: Long, y: Long)       => java.lang.Long.compare(x, y)
    case (x: Long, y: Number)     => java.lang.Long.compare(x, y.longValue())
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    // full µs precision: getTime*1000 would zero the sub-millisecond digits
    // and silently re-admit boundary rows past a µs-precision watermark
    case (x: Long, y: java.sql.Timestamp) =>
      java.lang.Long.compare(x,
        java.lang.Math.floorDiv(y.getTime, 1000L) * 1000000L + y.getNanos / 1000L)
    case (x: Long, y: java.time.Instant) =>
      java.lang.Long.compare(x, y.getEpochSecond * 1000000L + y.getNano / 1000L)
    case _ => throw new IllegalArgumentException(s"incomparable: $a vs $b")
  }

  def matches(filters: Array[Filter], sobject: String, i: Long): Boolean =
    filters.forall {
      case EqualTo(a, v)            => cmp(value(sobject, i, a), v) == 0
      case GreaterThan(a, v)        => cmp(value(sobject, i, a), v) > 0
      case GreaterThanOrEqual(a, v) => cmp(value(sobject, i, a), v) >= 0
      case LessThan(a, v)           => cmp(value(sobject, i, a), v) < 0
      case LessThanOrEqual(a, v)    => cmp(value(sobject, i, a), v) <= 0
      case IsNotNull(_)             => true
      case _                        => true
    }

  def render(f: Filter): String = f match {
    case EqualTo(a, v)            => s"$a = ${lit(v)}"
    case GreaterThan(a, v)        => s"$a > ${lit(v)}"
    case GreaterThanOrEqual(a, v) => s"$a >= ${lit(v)}"
    case LessThan(a, v)           => s"$a < ${lit(v)}"
    case LessThanOrEqual(a, v)    => s"$a <= ${lit(v)}"
    case IsNotNull(a)             => s"$a != null"
    case other                    => other.toString
  }

  private def lit(v: Any): String = v match {
    case s: String => s"'$s'"
    case t: java.sql.Timestamp => t.toInstant.toString
    case t: java.time.Instant  => t.toString
    case other => String.valueOf(other)
  }
}
