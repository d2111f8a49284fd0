package graft.sink

import org.apache.spark.sql.types._

/** File-skipping decisions from per-file column bounds ([[ColStat]]) — the
  * engine analog of Iceberg's scan planning over manifest
  * `lower_bounds`/`upper_bounds`. Shared by the merge overlap test
  * ([[Warehouse.merge]]) and the SQL catalog's predicate-driven file pruning
  * (`graft.catalog.ManifestPruneRule`).
  *
  * All decisions are CONSERVATIVE: `true` means "the file may contain a
  * matching row". Unknown columns, unsupported types, or domain mismatches
  * always yield `true`; pruning can only ever skip provably-disjoint files.
  */
object StatsPruning {

  /** Comparison in a stat domain: "s" UTF-8 binary, "n" BigDecimal.
    * String bounds MUST compare the way Spark's min/max computed them —
    * UTF8String binary (UTF-8 byte) order. Java's String.compareTo uses
    * UTF-16 code units, which ranks supplementary-plane characters (e.g.
    * emoji, surrogate pairs) BELOW U+E000..U+FFFF instead of above; a
    * pruning decision made in the wrong order silently drops matching rows.
    */
  def cmp(kind: String, a: String, b: String): Int =
    if (kind == "n") BigDecimal(a).compare(BigDecimal(b))
    else org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  /** Render a literal comparison value into a stat domain, mirroring
    * [[Warehouse]]'s stat collection (timestamps → epoch micros, dates →
    * epoch days, booleans → 0/1). `v` uses Catalyst internal representations
    * (UTF8String, Long micros, Int days, Decimal). None = can't compare
    * (unsupported type / NaN) → caller must not prune.
    */
  def render(dt: DataType, v: Any): Option[(String, String)] = {
    if (v == null) return None // null literals never match rows; handled upstream
    dt match {
      case StringType                       => Some(("s", v.toString))
      case ByteType | ShortType | IntegerType | LongType => Some(("n", v.toString))
      case FloatType =>
        val f = v.asInstanceOf[Float]
        if (f.isNaN || f.isInfinite) None else Some(("n", f.toString))
      case DoubleType =>
        val d = v.asInstanceOf[Double]
        if (d.isNaN || d.isInfinite) None else Some(("n", d.toString))
      case _: DecimalType =>
        Some(("n", v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal.toString))
      case TimestampType                    => Some(("n", v.toString)) // Long micros
      case DateType                         => Some(("n", v.toString)) // Int days
      case BooleanType                      => Some(("n", if (v.asInstanceOf[Boolean]) "1" else "0"))
      case _                                => None
    }
  }

  /** May a row of a file with bounds `st` start with string prefix `p`?
    * (`col LIKE 'p%'` — Catalyst's StartsWith.) Strings with prefix `p`
    * occupy exactly the range [p, succ(p)) in UTF-8 binary order, where
    * succ(p) increments p's last non-0xFF byte and truncates — so the file
    * may match iff its bounds intersect that range. When every byte of `p`
    * is 0xFF no successor exists and only the lower bound applies.
    */
  def mayMatchPrefix(st: ColStat, p: String): Boolean = {
    if (st.kind == "z") return false
    if (st.kind != "s") return true // domain mismatch: unknown
    if (p.isEmpty) return true      // every string has the empty prefix
    if (cmp("s", st.max, p) < 0) return false // whole file before the range
    val bytes = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = bytes.length - 1
    while (i >= 0 && bytes(i) == 0xFF.toByte) i -= 1
    if (i < 0) return true // no successor: upper bound unbounded
    val succ = java.util.Arrays.copyOf(bytes, i + 1)
    succ(i) = (succ(i) + 1).toByte
    // byte-order compare against the successor (UTF8String = UTF-8 bytes)
    org.apache.spark.unsafe.types.UTF8String.fromString(st.min)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromBytes(succ)) < 0
  }

  /** May a row of a file with bounds `st` satisfy `col OP value`?
    * An all-null file ("z") satisfies no comparison (SQL null semantics);
    * a domain mismatch is unknown → true.
    */
  def mayMatch(st: ColStat, op: String, kind: String, value: String): Boolean = {
    if (st.kind == "z") return false
    if (st.kind != kind) return true
    op match {
      case "="  => cmp(kind, st.min, value) <= 0 && cmp(kind, st.max, value) >= 0
      case ">"  => cmp(kind, st.max, value) > 0
      case ">=" => cmp(kind, st.max, value) >= 0
      case "<"  => cmp(kind, st.min, value) < 0
      case "<=" => cmp(kind, st.min, value) <= 0
      case _    => true
    }
  }
}
