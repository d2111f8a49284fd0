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
  */
final case class ResourceDef(
    name: String,
    mode: WriteMode,
    primaryKeys: Seq[String] = Nil,
    replicationKey: Option[String] = None,
    initialWatermark: Option[String] = None,
    nanosCols: Seq[String] = Nil)

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
