package graft.sink

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style partition transforms (hidden partitioning; reference
  * context `README.md:37-46`): a table declares `days(ts)` / `bucket(16,id)`
  * / `truncate(4,s)` / `years|months|hours(ts)` once, writes cluster by the
  * TRANSFORM value, and scans prune files from predicates on the SOURCE
  * column — the query never mentions the layout.
  *
  * Engine shape: a transform value is just another per-file stat. Writes
  * record min/max of the transform under its canonical key (e.g.
  * `"days(ts)"`) through the same one-pass grouped stat scan as raw
  * columns, and [[graft.catalog.ManifestPruneRule]] projects query
  * predicates into the transform domain (Iceberg's *inclusive projection*):
  * monotonic transforms (time units, truncate) carry range predicates with
  * `<`/`>` relaxed to `<=`/`>=`; `bucket` carries only equality/IN. That
  * reuses the whole existing bounds machinery ([[ColStat]] /
  * [[StatsPruning]]) — no new manifest format — and `bucket` adds pruning
  * power raw min/max can NEVER have: a hash bucket's raw value range spans
  * the whole domain, but its bucket number is a point.
  *
  * The prune side intentionally derives everything from the predicate
  * literal (its Catalyst internal value and type) so no schema lookup is
  * needed at plan time; the literal's type equals the column's after
  * analysis. Sessions run in UTC (engine-wide convention), so time
  * transforms use pure epoch arithmetic on both sides, bit-identical.
  */
object PartitionTransforms {

  /** One parsed spec entry. `fn` = identity | years | months | days | hours
    * | bucket | truncate; `param` = bucket count / truncate width.
    */
  final case class Field(fn: String, param: Option[Int], src: String) {
    /** Canonical key (also the manifest stat key); identity is the bare
      * column name, so it flows through the plain-column stat path.
      */
    def key: String = fn match {
      case "identity"             => src
      case f if param.isDefined   => s"$f(${param.get},$src)"
      case f                      => s"$f($src)"
    }
  }

  private val Pat = """^\s*([A-Za-z_]+)\s*\(\s*(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$""".r
  private val Bare = """^\s*([A-Za-z_][A-Za-z0-9_]*)\s*$""".r
  private val Fns = Set("identity", "years", "months", "days", "hours", "bucket", "truncate")

  /** Parse a spec entry (`"days(ts)"`, `"bucket(16,id)"`, bare `"ts"`). */
  def parse(s: String): Option[Field] = s match {
    case Bare(c) => Some(Field("identity", None, c))
    case Pat(fn, param, c) if Fns(fn.toLowerCase) =>
      val f = fn.toLowerCase
      val p = Option(param).map(_.toInt)
      val ok = f match {
        case "bucket" | "truncate" => p.exists(_ > 0)
        case "identity"            => p.isEmpty
        case _                     => p.isEmpty
      }
      if (ok) Some(Field(f, p, c)) else None
    case _ => None
  }

  /** Parse a manifest stat KEY as a non-identity transform (plain column
    * names do not match the `fn(...)` shape).
    */
  def parseKey(key: String): Option[Field] = key match {
    case Pat(_, _, _) => parse(key).filter(_.fn != "identity")
    case _            => None
  }

  /** Write side: the transform value as a Column over the source column,
    * plus its stat kind — or None if the (transform, source type) combo is
    * unsupported (validated at spec creation; conservative elsewhere).
    */
  def exprAndKind(f: Field, dt: DataType): Option[(Column, String)] = {
    val c = col(f.src)
    def time = dt == TimestampType || dt == DateType
    f.fn match {
      case "identity" => Some((c, "")) // clustering only; stats ride the plain path
      // Time transforms are pure epoch arithmetic on BOTH sides: session-tz
      // functions (year/month/to_date on timestamps) would disagree with the
      // prune side's UTC projection under a non-UTC session, and a write/prune
      // disagreement silently drops files. Timestamps route through epoch-day
      // (floorDiv via pmod) and then date_from_unix_date, whose year()/month()
      // are tz-independent (DateType is a local date).
      case "years" if dt == TimestampType =>
        val d = date_from_unix_date(epochDay(c).cast("int"))
        Some(((year(d) - 1970).cast("long"), "n"))
      case "years" if dt == DateType => Some(((year(c) - 1970).cast("long"), "n"))
      case "months" if dt == TimestampType =>
        val d = date_from_unix_date(epochDay(c).cast("int"))
        Some((((year(d) - 1970) * 12 + month(d) - 1).cast("long"), "n"))
      case "months" if dt == DateType =>
        Some((((year(c) - 1970) * 12 + month(c) - 1).cast("long"), "n"))
      case "days" if dt == TimestampType => Some((epochDay(c), "n"))
      case "days" if dt == DateType      => Some((unix_date(c).cast("long"), "n"))
      case "hours" if dt == TimestampType =>
        val us = unix_micros(c)
        Some((((us - pmod(us, lit(3600000000L))) / lit(3600000000L)).cast("long"), "n"))
      case "bucket" if bucketable(dt) =>
        Some((pmod(hash(c), lit(f.param.get)), "n"))
      case "truncate" if integral(dt) =>
        Some(((c - pmod(c, lit(f.param.get))).cast("long"), "n"))
      case "truncate" if dt == StringType =>
        Some((substring(c, 1, f.param.get), "s"))
      case _ => None
    }
  }

  /** Epoch day of a timestamp column via pure epoch arithmetic —
    * floorDiv(unix_micros, 86_400_000_000) spelled with pmod so negative
    * (pre-1970) micros floor instead of truncating toward zero. Matches the
    * prune side's `Math.floorDiv` exactly, independent of session timezone.
    */
  private def epochDay(c: Column): Column = {
    val us = unix_micros(c)
    ((us - pmod(us, lit(86400000000L))) / lit(86400000000L)).cast("long")
  }

  private def integral(dt: DataType) =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType
  private def bucketable(dt: DataType) =
    integral(dt) || dt == StringType || dt == DateType || dt == TimestampType

  /** `<` on the source only bounds `<=` on a many-to-one transform value
    * (rows below the literal can share its transform value).
    */
  private def relax(op: String): String = op match {
    case "<" => "<="
    case ">" => ">="
    case o   => o
  }

  /** Prune side (inclusive projection): given manifest stat key `key` and a
    * pushed predicate `srcCol OP literal`, return (kind, relaxedOp,
    * renderedValue) to test against the file's transform bounds — or None
    * when this key does not bound that predicate (different source column,
    * non-equality on bucket, unsupported literal type): the caller keeps
    * the file.
    */
  def project(key: String, srcCol: String, op: String, l: Literal)
      : Option[(String, String, String)] = {
    if (l.value == null) return None
    parseKey(key).filter(_.src == srcCol).flatMap { f =>
      f.fn match {
        case "years" => localDate(l).map(d => ("n", relax(op), (d.getYear - 1970).toString))
        case "months" => localDate(l).map(d =>
          ("n", relax(op), ((d.getYear - 1970) * 12 + d.getMonthValue - 1).toString))
        case "days" => l.dataType match {
          case TimestampType =>
            Some(("n", relax(op), Math.floorDiv(l.value.asInstanceOf[Long], 86400000000L).toString))
          case DateType => Some(("n", relax(op), l.value.asInstanceOf[Int].toString))
          case _ => None
        }
        case "hours" => l.dataType match {
          case TimestampType =>
            Some(("n", relax(op), Math.floorDiv(l.value.asInstanceOf[Long], 3600000000L).toString))
          case _ => None
        }
        case "bucket" if op == "=" && bucketable(l.dataType) =>
          // same murmur3(seed 42) as the write side's hash(col)
          val h = Murmur3Hash(Seq(l), 42).eval().asInstanceOf[Int]
          Some(("n", "=", (((h % f.param.get) + f.param.get) % f.param.get).toString))
        case "truncate" => l.dataType match {
          case t if integral(t) =>
            val v = l.value.asInstanceOf[Number].longValue()
            Some(("n", relax(op), (v - Math.floorMod(v, f.param.get.toLong)).toString))
          case StringType =>
            Some(("s", relax(op),
              l.value.asInstanceOf[UTF8String].substringSQL(1, f.param.get).toString))
          case _ => None
        }
        case _ => None
      }
    }
  }

  private def localDate(l: Literal): Option[java.time.LocalDate] = l.dataType match {
    case TimestampType =>
      val s = Math.floorDiv(l.value.asInstanceOf[Long], 1000000L)
      Some(java.time.LocalDateTime.ofEpochSecond(s, 0, java.time.ZoneOffset.UTC).toLocalDate)
    case DateType => Some(java.time.LocalDate.ofEpochDay(l.value.asInstanceOf[Int].toLong))
    case _ => None
  }

  /** Validate + canonicalize a user spec against the table schema. */
  def canonical(spec: Seq[String], schema: StructType): Seq[String] = spec.map { s =>
    val f = parse(s).getOrElse(
      throw new IllegalArgumentException(s"unparseable partition transform: '$s'"))
    val dt = schema.fields.find(_.name == f.src).getOrElse(
      throw new IllegalArgumentException(
        s"partition transform '$s' references unknown column '${f.src}'")).dataType
    if (f.fn != "identity" && exprAndKind(f, dt).isEmpty)
      throw new IllegalArgumentException(
        s"partition transform '$s' unsupported for ${dt.simpleString}")
    f.key
  }
}
