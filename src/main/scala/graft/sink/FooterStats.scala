package graft.sink

import java.nio.file.{Files => JFiles, Path}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.{DateLogicalTypeAnnotation, DecimalLogicalTypeAnnotation, IntLogicalTypeAnnotation, StringLogicalTypeAnnotation, TimestampLogicalTypeAnnotation, TimeUnit}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types._

/** Manifest stats from parquet FOOTERS instead of a second data scan.
  *
  * [[Warehouse]]`.writeData` used to re-read every just-written batch in
  * full (`groupBy(input_file_name).agg(min/max/count)`) to build the
  * per-file manifest stats — doubling ingest IO on every
  * append/merge/morMerge/compact commit. The parquet footers already carry
  * row counts and per-row-group column bounds for exactly those columns
  * (the same footer metadata Iceberg's writers harvest into manifest
  * `lower_bounds`/`upper_bounds`), so a commit now pays O(files)
  * metadata-only reads instead of O(batch) data IO.
  *
  * Everything here is deliberately CONSERVATIVE and bit-compatible with the
  * scan path:
  *
  *   - Decoded bounds come back as the SAME JVM values the grouped scan's
  *     aggregate row would hold (String; Byte-box-compatible Int; Long;
  *     Float; Double; java BigDecimal with the declared scale; epoch-micros
  *     Long for timestamps; epoch-day Int for dates; 0/1 Int for booleans),
  *     and [[Warehouse]] renders both paths through the one `renderStat`,
  *     so a footer-derived manifest is BYTE-IDENTICAL to a scan-derived one
  *     (`FooterStatsSpec` pins this property on generated data).
  *   - Anything undecodable — missing/disabled chunk statistics, an
  *     unexpected physical/logical type (INT96 timestamps, nanos, scale
  *     mismatch), an unset null count, or bounds parquet-mr itself dropped
  *     (NaN, >4 KB binaries) — returns [[FooterStats.Unknown]] and the
  *     caller falls back to a column-pruned scan FOR THAT COLUMN ONLY.
  *     Correctness never rests on the footer.
  *
  * NaN/zero alignment with parquet-mr's reader: footers with NaN bounds are
  * filtered out by parquet's own metadata converter (→ Unknown → fallback,
  * where the scan's NaN bound is dropped by `renderStat` — same outcome),
  * and the converter widens float/double zero bounds to (-0.0, +0.0), which
  * `renderStat` re-normalizes so both paths render "0.0".
  */
object FooterStats {

  sealed trait Outcome
  /** Column has no non-null value in the file (renders as the "z" stat). */
  case object AllNull extends Outcome
  /** Proven bounds, as the JVM values the scan aggregate would produce,
    * plus the column's exact null count (footers that can't prove the null
    * count are [[Unknown]] — the `isNumNullsSet` gate in [[mergeChunks]]).
    */
  final case class Bounds(min: Any, max: Any, nulls: Long) extends Outcome
  /** Footer can't prove this column — fall back to the scan for it. */
  case object Unknown extends Outcome

  /** Row count + per-wanted-column outcome for one parquet file, or None if
    * the footer itself is unreadable (caller falls back wholesale).
    * `vgets` adds variant-path stat keys ([[VariantStats]]) proven from the
    * SHREDDED leaf chunks — outcomes keyed by the vget key string.
    */
  def read(file: Path, conf: Configuration,
           wanted: Seq[(String, DataType)],
           vgets: Seq[VariantStats.VKey] = Nil,
           autoVgetSrcs: Seq[String] = Nil): Option[(Long, Map[String, Outcome])] =
    try {
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toUri), conf)
      val r = ParquetFileReader.open(in)
      try {
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val out = wanted.map { case (name, dt) =>
          val chunks = blocks.flatMap(_.getColumns.asScala.find { cc =>
            val p = cc.getPath.toArray
            p.length == 1 && p(0) == name
          })
          // a column absent from the file's physical schema reads back
          // all-null under the manifest schema (scan path: min == null);
          // present-in-some-blocks-only can't happen in a well-formed file,
          // so treat it as undecodable rather than guessing
          val oc = if (blocks.nonEmpty && chunks.isEmpty) AllNull
                   else if (chunks.size != blocks.size) Unknown
                   else mergeChunks(dt, chunks)
          name -> oc
        }.toMap
        val vout = vgets.map(vk => vk.key -> vgetOutcome(blocks, vk)).toMap
        // auto-collected shredded-leaf keys: DISCOVERED from the footer, no
        // declaration needed — only clean (Bounds/AllNull-provable) leaves
        // record; Unknown is simply not collected (there is no scan
        // fallback to fund for a key nobody declared)
        val auto = autoVgetSrcs.flatMap(src => discoverVgets(blocks, src))
          .filterNot(vk => vgets.exists(_.key == vk.key))
          .flatMap(vk => vgetOutcome(blocks, vk) match {
            case Unknown => None
            case oc      => Some(vk.key -> oc)
          }).toMap
        Some((rows, out ++ auto ++ vout))
      } finally r.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Variant-path stat keys DISCOVERABLE from this footer with no
    * declaration: every shredded leaf `src.typed_value.<field>.typed_value`
    * whose primitive type maps into the vget stat domain (INT64 → long,
    * DOUBLE → double, BINARY+UTF8 → string) proposes its own
    * `vget(src,$.field,type)` key. Soundness is NOT decided here —
    * [[vgetOutcome]] re-applies the full residual/decode gates per proposed
    * key (a timestamp-annotated INT64 leaf, a dirty residual, a
    * non-round-trippable field name all fall out there or at the key-syntax
    * check). The footers are already open, so discovery costs O(chunks) of
    * metadata — this is what makes UNDECLARED JSON-path predicates prune.
    */
  private def discoverVgets(blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
                            src: String): Seq[VariantStats.VKey] = {
    if (blocks.isEmpty) return Nil
    blocks.head.getColumns.asScala.toSeq.flatMap { cc =>
      val p = cc.getPath.toArray.toSeq
      if (p.length == 4 && p(0) == src && p(1) == "typed_value" && p(3) == "typed_value") {
        val tpe = (cc.getPrimitiveType.getPrimitiveTypeName,
            cc.getPrimitiveType.getLogicalTypeAnnotation) match {
          case (PrimitiveTypeName.INT64, null)                             => Some("long")
          case (PrimitiveTypeName.INT64, a: IntLogicalTypeAnnotation)
            if a.isSigned && a.getBitWidth == 64                           => Some("long")
          case (PrimitiveTypeName.DOUBLE, null)                            => Some("double")
          case (PrimitiveTypeName.BINARY, _: StringLogicalTypeAnnotation)  => Some("string")
          case _                                                           => None
        }
        tpe.map(t => VariantStats.VKey(src, s"$$.${p(2)}", t))
          // the key must round-trip its own syntax AND the footer-path
          // grammar (commas/parens in src, exotic field names refuse)
          .filter(vk => VariantStats.parseKey(vk.key).contains(vk) &&
            VariantStats.footerField(vk.path).contains(p(2)))
      } else None
    }.distinct
  }

  /** One vget stat key's outcome from the shredded-variant footer layout
    * (`src { metadata, value, typed_value { <field> { value, typed_value
    * } } }`). The shredded leaf's own chunk stats ARE the extraction's
    * bounds/null count — but only when the residuals prove no row escaped
    * the typed path:
    *
    *   - `src.value` (top-level residual) all-null in every block: no row
    *     fell outside the shredding schema (an unshredded file, a
    *     non-object row, or an extra-field row could otherwise hold the
    *     field invisibly);
    *   - `src.typed_value.<field>.value` (field residual) all-null: no
    *     row held the field at a MISMATCHED type (try-cast at query time
    *     could still extract a value from those — e.g. a long from the
    *     string "7" — outside the typed leaf's bounds);
    *   - the leaf decodes under the key's own Spark type ([[decode]]'s
    *     physical/logical gates — an int64 leaf under a `double` key, or
    *     vice versa, refuses rather than mixing truncation domains).
    *
    * A leaf ABSENT with clean residuals means the shredding schema never
    * saw the field: the extraction is provably all-null. Anything else —
    * including paths deeper than `$.name` — returns [[Unknown]] and the
    * caller's scan fallback computes the stat exactly.
    */
  private def vgetOutcome(blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
                          vk: VariantStats.VKey): Outcome = {
    val field = VariantStats.footerField(vk.path).getOrElse(return Unknown)
    if (blocks.isEmpty) return AllNull
    def chunksAt(path: Seq[String]): Seq[Option[ColumnChunkMetaData]] =
      blocks.map(_.getColumns.asScala.find(cc => cc.getPath.toArray.toSeq == path))
    def provenEmpty(path: Seq[String]): Boolean = chunksAt(path).forall {
      case Some(cc) =>
        val st = cc.getStatistics
        st != null && st.isNumNullsSet && st.getNumNulls == cc.getValueCount
      case None => false
    }
    if (!provenEmpty(Seq(vk.src, "value"))) return Unknown
    val leaf = chunksAt(Seq(vk.src, "typed_value", field, "typed_value"))
    if (leaf.forall(_.isEmpty)) {
      // no typed leaf — but the field may still HOLD values: a mixed-type
      // field can shred with only its `value` residual, and an object/
      // array-typed field makes typed_value a GROUP whose chunks live at
      // DEEPER paths. All-null is provable only when NOTHING exists under
      // the field's subtree at all (the shredding schema never saw it and
      // the clean top residual already proved nothing escaped).
      val fieldPrefix = Seq(vk.src, "typed_value", field)
      val anyUnderField = blocks.exists(_.getColumns.asScala.exists(
        cc => cc.getPath.toArray.toSeq.startsWith(fieldPrefix)))
      return if (anyUnderField) Unknown else AllNull
    }
    if (leaf.exists(_.isEmpty)) return Unknown
    if (!provenEmpty(Seq(vk.src, "typed_value", field, "value"))) return Unknown
    val dt: DataType = vk.tpe match {
      case "long"   => LongType
      case "double" => DoubleType
      case _        => StringType
    }
    mergeChunks(dt, leaf.flatten)
  }

  /** Merge one column's per-row-group stats into a single outcome. */
  private def mergeChunks(dt: DataType, chunks: Seq[ColumnChunkMetaData]): Outcome = {
    var mn: Any = null
    var mx: Any = null
    var sawValue = false
    var nulls = 0L
    for (cc <- chunks) {
      val st: Statistics[_] = cc.getStatistics
      if (st == null || !st.isNumNullsSet) return Unknown
      val nonNull = cc.getValueCount - st.getNumNulls
      if (nonNull < 0) return Unknown
      nulls += st.getNumNulls
      if (nonNull > 0) {
        if (!st.hasNonNullValue) return Unknown // bounds dropped (NaN, huge binary)
        decode(dt, cc, st) match {
          case Some((lo, hi)) =>
            if (!sawValue) { mn = lo; mx = hi; sawValue = true }
            else {
              if (cmp(dt, lo, mn) < 0) mn = lo
              if (cmp(dt, hi, mx) > 0) mx = hi
            }
          case None => return Unknown
        }
      }
    }
    if (!sawValue) AllNull else Bounds(mn, mx, nulls)
  }

  private def signedInt(ann: LogicalTypeAnnotation): Boolean = ann match {
    case i: IntLogicalTypeAnnotation => i.isSigned
    case _                           => false
  }

  /** Decode one chunk's (min, max) into scan-aggregate JVM values, or None
    * if the physical/logical type is not the shape Spark's writer produces
    * for `dt` (then the caller falls back — never guesses).
    */
  private def decode(dt: DataType, cc: ColumnChunkMetaData,
                     st: Statistics[_]): Option[(Any, Any)] = {
    val pt = cc.getPrimitiveType
    val ann = pt.getLogicalTypeAnnotation
    def asBinary(v: Any) = v.asInstanceOf[Binary]
    (dt, pt.getPrimitiveTypeName) match {
      case (StringType, PrimitiveTypeName.BINARY)
          if ann.isInstanceOf[StringLogicalTypeAnnotation] =>
        Some((new String(asBinary(st.genericGetMin).getBytes, java.nio.charset.StandardCharsets.UTF_8),
              new String(asBinary(st.genericGetMax).getBytes, java.nio.charset.StandardCharsets.UTF_8)))
      case (ByteType | ShortType | IntegerType, PrimitiveTypeName.INT32)
          if ann == null || signedInt(ann) =>
        Some((st.genericGetMin, st.genericGetMax))
      case (LongType, PrimitiveTypeName.INT64)
          if ann == null || signedInt(ann) =>
        Some((st.genericGetMin, st.genericGetMax))
      case (FloatType, PrimitiveTypeName.FLOAT) =>
        Some((st.genericGetMin, st.genericGetMax))
      case (DoubleType, PrimitiveTypeName.DOUBLE) =>
        Some((st.genericGetMin, st.genericGetMax))
      case (d: DecimalType, ptn) => ann match {
        case dec: DecimalLogicalTypeAnnotation if dec.getScale == d.scale => ptn match {
          case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
            val lo = st.genericGetMin.asInstanceOf[Number].longValue()
            val hi = st.genericGetMax.asInstanceOf[Number].longValue()
            Some((java.math.BigDecimal.valueOf(lo, d.scale),
                  java.math.BigDecimal.valueOf(hi, d.scale)))
          case PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY | PrimitiveTypeName.BINARY =>
            // two's-complement big-endian unscaled value (parquet DECIMAL
            // spec; compared with the signed-big-integer comparator)
            def dec64(b: Binary) = new java.math.BigDecimal(
              new java.math.BigInteger(b.getBytes), d.scale)
            Some((dec64(asBinary(st.genericGetMin)), dec64(asBinary(st.genericGetMax))))
          case _ => None
        }
        case _ => None
      }
      case (TimestampType, PrimitiveTypeName.INT64) => ann match {
        case ts: TimestampLogicalTypeAnnotation => ts.getUnit match {
          case TimeUnit.MICROS =>
            Some((st.genericGetMin, st.genericGetMax))
          case TimeUnit.MILLIS =>
            Some((java.lang.Long.valueOf(st.genericGetMin.asInstanceOf[java.lang.Long] * 1000L),
                  java.lang.Long.valueOf(st.genericGetMax.asInstanceOf[java.lang.Long] * 1000L)))
          case _ => None // nanos: not a scan-domain match
        }
        case _ => None
      }
      case (DateType, PrimitiveTypeName.INT32)
          if ann.isInstanceOf[DateLogicalTypeAnnotation] =>
        Some((st.genericGetMin, st.genericGetMax))
      case (BooleanType, PrimitiveTypeName.BOOLEAN) =>
        def b01(v: Any) = java.lang.Integer.valueOf(if (v.asInstanceOf[java.lang.Boolean]) 1 else 0)
        Some((b01(st.genericGetMin), b01(st.genericGetMax)))
      case _ => None // INT96 timestamps land here → scan fallback
    }
  }

  /** Compare two decoded values of one column, in the SAME order the write
    * side's min/max aggregates use: UTF8-byte order for strings, natural
    * numeric order otherwise (NaN never reaches here — parquet's reader
    * filters NaN bounds to Unknown upstream).
    */
  private def cmp(dt: DataType, a: Any, b: Any): Int = dt match {
    case StringType => org.apache.spark.unsafe.types.UTF8String
      .fromString(a.asInstanceOf[String])
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.asInstanceOf[String]))
    case _: DecimalType =>
      a.asInstanceOf[java.math.BigDecimal].compareTo(b.asInstanceOf[java.math.BigDecimal])
    case FloatType  => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case _ => java.lang.Long.compare(a.asInstanceOf[Number].longValue(),
                                     b.asInstanceOf[Number].longValue())
  }

  /** All data files under `dir` (recursive — hive-split writes nest files
    * under `__graft_p<i>=<value>` directories), sorted for determinism.
    */
  def listParquetFiles(dir: Path): Seq[Path] = {
    val s = JFiles.walk(dir)
    try s.iterator().asScala
      .filter(p => JFiles.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)
    finally s.close()
  }
}
