package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.sink.Warehouse

/** Z-order layout: per-file manifest bounds must become rectangles in
  * (x, y) space, so predicates on the NON-leading dimension prune files —
  * which single-column range clustering structurally cannot do. The
  * converse trade (leading-column predicates prune best under plain range
  * clustering) is asserted too, so the spec documents both sides.
  */
class ZOrderSpec extends SparkSpec {

  private val Files = 16

  // 20k deterministic points uniform over [0,1000)^2 (md5-derived y: no RNG)
  private def points = spark.range(20000)
    .select(col("id"),
      (col("id") % 1000).as("x"),
      (conv(substring(md5(col("id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 1000).as("y"))

  /** Files whose [min,max] bounds overlap the given per-column ranges. */
  private def overlapping(wh: Warehouse, table: String,
      ranges: (String, Long, Long)*): Int =
    wh.dataFiles(table).count { f =>
      ranges.forall { case (c, lo, hi) =>
        f.stats.get(c).exists(s =>
          s.min.nonEmpty && s.max.nonEmpty && s.min.toLong <= hi && s.max.toLong >= lo)
      }
    }

  test("z-order files prune on the non-leading dimension; range clustering cannot") {
    val wh = new Warehouse(spark, tmpDir("wh-zorder"))
    wh.append("byx",
      points.repartitionByRange(Files, col("x")).sortWithinPartitions("x"),
      statsCols = Seq("x", "y"))
    wh.append("byz", ZOrder.layout(points, "x", "y", Files),
      statsCols = Seq("x", "y"))
    assert(wh.dataFiles("byx").length == Files)
    assert(wh.dataFiles("byz").length == Files)

    // y-only predicate (10% of the y range): x-clustered files are thin
    // full-height stripes — every single one overlaps; z-ordered files are
    // rectangles — most don't.
    val byxY = overlapping(wh, "byx", ("y", 100, 199))
    val byzY = overlapping(wh, "byz", ("y", 100, 199))
    assert(byxY == Files, s"x-clustered layout unexpectedly pruned y: $byxY")
    // inclusive bound: RangePartitioner's sampling makes the rectangle
    // boundaries drift ±1 file across suite orderings (seen: exactly 8/16)
    assert(byzY <= Files / 2,
      s"z-order pruned only ${Files - byzY} of $Files files for a 10% y-range")

    // x-only predicate: plain x clustering is optimal here (the documented
    // trade) — it must touch no more files than z-order does.
    val byxX = overlapping(wh, "byx", ("x", 100, 199))
    val byzX = overlapping(wh, "byz", ("x", 100, 199))
    assert(byxX <= byzX, s"range clustering lost its own dimension: $byxX vs $byzX")
    assert(byxX <= 3, s"x-clustered stripes not tight: $byxX files for a 10% x-range")

    // 2-D box: z-order must beat the full scan decisively
    val byzBox = overlapping(wh, "byz", ("x", 100, 199), ("y", 100, 199))
    assert(byzBox <= Files / 2, s"z-order box overlap too wide: $byzBox")
  }

  test("compact(zOrderBy) re-lays an existing table into prunable rectangles") {
    val wh = new Warehouse(spark, tmpDir("wh-zcompact"))
    // many tiny unclustered appends — the shape an incremental ingest leaves
    (0 until 8).foreach { i =>
      wh.append("t", points.filter(col("id") % 8 === i).coalesce(2),
        statsCols = Seq("x", "y"))
    }
    val before = overlapping(wh, "t", ("y", 100, 199))
    assert(before == wh.dataFiles("t").length, "unclustered files already pruned?")
    // target small enough that the rewrite spans >= 8 files — the z-curve
    // needs at least the two leading (x, y) bit splits materialized as
    // separate files before y-bounds tighten
    wh.compact("t", targetBytes = 12L << 10, zOrderBy = Some(("x", "y")))
    val files = wh.dataFiles("t").length
    assert(files >= 8, s"compaction produced too few files for the assertion: $files")
    val after = overlapping(wh, "t", ("y", 100, 199))
    assert(after < files, s"z-order compact did not make y prunable: $after/$files")
    // content is preserved exactly
    assert(wh.load("t").count() == 20000)
  }

  test("interleave is monotone in locality: nearby cells share high bits") {
    // (0,0) and (1,1) interleave to adjacent z-values; far cells diverge in
    // the high-order bits — the property the range partitioner relies on.
    val r = spark.range(1)
      .select(
        ZOrder.interleave(lit(0), lit(0)).as("z00"),
        ZOrder.interleave(lit(1), lit(1)).as("z11"),
        ZOrder.interleave(lit(0xffff), lit(0xffff)).as("zmax"),
        ZOrder.interleave(lit(1), lit(0)).as("z10"),
        ZOrder.interleave(lit(0), lit(1)).as("z01"))
      .head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) == (1L << 32) - 1)
    assert(r.getLong(3) == 2L) // a's bit sits above b's
    assert(r.getLong(4) == 1L)
  }
}
