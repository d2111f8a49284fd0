package graft.sink

/** Per-file SORT-ORDER marker — a pseudo-stat (`kind "s"`, min == max)
  * recording the FIELD IDS, in order, of the cluster keys each file's rows
  * were written sorted by ([[Warehouse]]'s `writeData(sortedBy = ...)`).
  *
  * Field ids, not names: a rename keeps the marker valid untouched (same
  * id, same bytes), and a dropped column's id is never reused, so a stale
  * marker can only ever fail to RESOLVE — never resolve to the wrong
  * column (the bloom-sidecar discipline). Consumers
  * ([[graft.catalog.KeyGroupedParquetScan]]) prove per-partition ordering
  * from this plus chain-disjoint bounds and report it to Spark
  * (`SupportsReportOrdering`), which is what lets a co-partitioned
  * sort-merge join plan with no per-partition sorts.
  */
object SortMarker {
  val Key = "__graft_sorted"

  /** Leading sorted field id recorded in a marker stat, if parseable. */
  def leadingId(st: ColStat): Option[Long] =
    st.min.split(',').headOption.filter(_.nonEmpty)
      .flatMap(s => scala.util.Try(s.toLong).toOption)
}
