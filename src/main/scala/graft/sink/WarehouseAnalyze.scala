package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.SchemaOps

/** ANALYZE: per-column NDV (HLL) / null-count / length statistics, stored
  * beside the table and served to Catalyst as DSv2 columnStats for CBO.
  *
  * One of [[Warehouse]]'s section traits — a pure textual split of the
  * original single file (unchanged public face, same `private[sink]`
  * surface); the self-type is the class itself, so every member reads as
  * before.
  */
private[sink] trait WarehouseAnalyze { self: Warehouse =>

  // ----------------------------------------------- column statistics (NDV) --

  /** One analyzed column: approximate distinct count (Datasketches HLL,
    * ~2% standard error), exact null count, and for variable-width columns
    * the average/max byte-ish length (−1 = not applicable). `sketchB64` is
    * the HLL sketch itself, kept so future re-analyzes / cross-table
    * estimates can UNION sketches instead of rescanning.
    */
  final case class ColNdv(ndv: Long, nullCount: Long, avgLen: Long,
                          maxLen: Long, sketchB64: String)

  /** Stored table statistics: the snapshot version analyzed, its exact row
    * count, and per-column [[ColNdv]].
    */
  final case class TableColStats(version: Long, rows: Long,
                                 cols: Map[String, ColNdv])

  private def colStatsPath(name: String) = tableDir(name).resolve("_colstats")

  /** `ANALYZE` (the Iceberg Puffin/theta-sketch analog, Spark-served): ONE
    * column-pruned pass over the current snapshot computes per-column HLL
    * distinct sketches + null counts + length stats and stores them beside
    * the table. Every later scan serves them to Catalyst as DSv2
    * `columnStats` ([[graft.catalog.GraftParquetScan]]), where CBO's join
    * reorder / selectivity / broadcast decisions read them — at 100 TB the
    * difference between a plan keyed on real NDVs and one keyed on
    * defaults. Stats are a SNAPSHOT measurement: later commits serve the
    * last analyzed values until the next analyze (ordinary staleness, the
    * contract every warehouse's ANALYZE has); `$snapshots`-style freshness
    * is visible by comparing versions.
    *
    * `cols` empty = every atomic column. Non-HLL-native types are cast to
    * string for sketching — injective renders (timestamps, dates, decimals,
    * floats render distinctly), so distinctness is preserved.
    */
  def analyzeTable(name: String, cols: Seq[String] = Nil): TableColStats = {
    require(exists(name), s"no such table: $name")
    val man = currentManifest(name)
    val version = currentVersion(name)
    def atomic(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.MapType |
           _: org.apache.spark.sql.types.StructType => false
      case _ => true
    }
    val targets = man.schema.fields.filter(f =>
      if (cols.isEmpty) atomic(f.dataType) else cols.contains(f.name)).toSeq
    val unknown = cols.filterNot(c => man.schema.fieldNames.contains(c))
    require(unknown.isEmpty, s"no such column(s): ${unknown.mkString(", ")}")
    val bad = targets.filterNot(f => atomic(f.dataType))
    require(bad.isEmpty,
      s"cannot sketch non-atomic column(s): ${bad.map(_.name).mkString(", ")}")
    import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}
    def sketchIn(f: StructField) = f.dataType match {
      case IntegerType | LongType | StringType | BinaryType => col(f.name)
      case _ => col(f.name).cast("string")
    }
    def isVarWidth(f: StructField) =
      f.dataType == StringType || f.dataType == BinaryType
    val aggs: Seq[Column] = count(lit(1)).as("__rows") +: targets.zipWithIndex.flatMap {
      case (f, i) =>
        Seq(hll_sketch_agg(sketchIn(f)).as(s"__s$i"), count(col(f.name)).as(s"__c$i")) ++
          (if (!isVarWidth(f)) Nil else Seq(
            avg(length(col(f.name))).as(s"__a$i"), max(length(col(f.name))).as(s"__m$i")))
    }
    val r = load(name).select(targets.map(f => col(f.name)): _*)
      .agg(aggs.head, aggs.tail: _*).head()
    val rows = r.getLong(r.fieldIndex("__rows"))
    val entries = targets.zipWithIndex.map { case (f, i) =>
      val sketch = r.getAs[Array[Byte]](r.fieldIndex(s"__s$i"))
      val ndv = org.apache.datasketches.hll.HllSketch.heapify(sketch)
        .getEstimate.round
      val (avgL, maxL) =
        if (!isVarWidth(f)) (-1L, -1L)
        else (Option(r.get(r.fieldIndex(s"__a$i"))).fold(-1L)(v =>
          math.ceil(v.asInstanceOf[Double]).toLong),
          if (r.isNullAt(r.fieldIndex(s"__m$i"))) -1L
          else r.getInt(r.fieldIndex(s"__m$i")).toLong)
      f.name -> ColNdv(ndv, rows - r.getLong(r.fieldIndex(s"__c$i")), avgL, maxL,
        java.util.Base64.getEncoder.encodeToString(sketch))
    }.toMap
    val out = TableColStats(version, rows, entries)
    val sb = new StringBuilder
    sb.append("graft-colstats v1\n").append(version).append('\t').append(rows).append('\n')
    entries.toSeq.sortBy(_._1).foreach { case (c, e) =>
      sb.append(java.util.Base64.getEncoder.encodeToString(
          c.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        .append('\t').append(e.ndv).append('\t').append(e.nullCount)
        .append('\t').append(e.avgLen).append('\t').append(e.maxLen)
        .append('\t').append(e.sketchB64).append('\n')
    }
    val tmp = tableDir(name).resolve("_colstats.tmp")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, colStatsPath(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    out
  }

  /** The stored [[analyzeTable]] result, if any. */
  def columnStats(name: String): Option[TableColStats] = {
    val p = colStatsPath(name)
    if (!Files.exists(p)) return None
    val lines = Files.readString(p).linesIterator.toSeq
    if (lines.isEmpty || lines.head != "graft-colstats v1") return None
    val Array(v, rows) = lines(1).split('\t')
    val cols = lines.drop(2).filter(_.nonEmpty).map { l =>
      val f = l.split('\t')
      new String(java.util.Base64.getDecoder.decode(f(0)),
        java.nio.charset.StandardCharsets.UTF_8) ->
        ColNdv(f(1).toLong, f(2).toLong, f(3).toLong, f(4).toLong, f(5))
    }.toMap
    Some(TableColStats(v.toLong, rows.toLong, cols))
  }

}
