package graft.catalog

import graft.sink.{ColStat, DataFile, StatsPruning}

/** File selection for LIMIT / ORDER-BY-LIMIT (top-k) pushdown over
  * warehouse scans — pure manifest math, zero data IO.
  *
  * At 100 TB, `SELECT * FROM t ORDER BY ts DESC LIMIT 100` is the worst
  * offender among "small" queries: Spark's TakeOrderedAndProject must read
  * EVERY row to find the global top-k. But the manifest already bounds each
  * file's sort-key range (min/max) and its null count
  * ([[graft.sink.ColStat]]), which is enough to pick a provably-sufficient
  * subset of files:
  *
  *   1. '''Credit phase''' — walk files in the order that makes their rows
  *      provably "at or before" a running threshold in the requested sort
  *      order (ascending: by file max ascending; descending: by file min
  *      descending), accumulating rows until ≥ k are credited. The bound of
  *      the last credited file is the threshold τ: the table provably holds
  *      ≥ k rows sorting at-or-before τ.
  *   2. '''Prune phase''' — any file whose rows ALL sort strictly after τ
  *      cannot contribute to the top-k and is dropped.
  *
  * Null ordering decides what "credit" and "after" mean:
  *   - nulls-first: every row of a statted file credits (nulls sort before
  *     everything; all-null "z" files credit with a bound BEFORE every
  *     value). A file prunes only if it provably has NO nulls (null count
  *     0) and its value range starts after τ (τ = "still in the nulls" —
  *     possible when k all-null rows were credited — means every value row
  *     is after it).
  *   - nulls-last: only a file's PROVEN non-null rows credit
  *     (rows − nulls, requiring a recorded null count); once ≥ k non-null
  *     rows are credited, nulls can't reach the top-k, so all-null files
  *     prune and the bound test alone decides the rest.
  *
  * Everything unknown is conservative: a file with no stat for the sort
  * column neither credits nor prunes (always read); an unknown null count
  * (−1) credits nothing under nulls-last and blocks pruning under
  * nulls-first; if crediting never reaches k, nothing prunes. Ties prune
  * only STRICTLY-after files, so rows equal to τ are always read. For a
  * range-clustered table (the write path's default) the file ranges barely
  * overlap and the kept set degenerates to ~⌈k / rows-per-file⌉ files.
  *
  * The caller ([[SpjScanBuilder]]) only applies this when no filters were
  * pushed into the scan: a filter makes per-file row counts overcount the
  * SURVIVING rows and the ≥ k guarantee would be unsound. (Spark only
  * offers a TopN/Limit pushdown when the operator sits directly on the
  * scan, so the guard is belt-and-braces.)
  */
object TopNPruning {

  /** Smallest file subset (by descending row count) whose rows cover a bare
    * LIMIT `k` — no ordering, any `k` rows are a valid answer, so the only
    * goal is fewest files. None = every file is needed.
    */
  def limitKeep(files: Seq[DataFile], k: Long): Option[Set[String]] = {
    if (files.isEmpty || k <= 0) return None
    var acc = 0L
    val keep = files.sortBy(-_.rows).takeWhile { f =>
      val need = acc < k
      acc += f.rows
      need
    }
    if (acc >= k && keep.size < files.size) Some(keep.map(_.path).toSet) else None
  }

  /** File subset provably containing the global top-`k` under
    * (`col`, `asc`, `nullsFirst`). None = no pruning possible/safe.
    */
  def topNKeep(files: Seq[DataFile], col: String, asc: Boolean,
               nullsFirst: Boolean, k: Long): Option[Set[String]] = {
    if (files.isEmpty || k <= 0) return None
    val stOf: Map[String, Option[ColStat]] =
      files.map(f => f.path -> f.stats.get(col)).toMap
    // one comparison domain: every non-"z" stat must agree on kind
    val kinds = files.flatMap(f => stOf(f.path)).filterNot(_.kind == "z")
      .map(_.kind).distinct
    if (kinds.size > 1) return None
    val kind = kinds.headOption.getOrElse(if (nullsFirst) "s" else return None)

    // credit bound: the value every credited row provably sorts at-or-before
    // (asc: file max; desc: file min). None = before every value ("z" files
    // under nulls-first).
    def creditBound(st: ColStat): Option[String] =
      if (st.kind == "z") None else Some(if (asc) st.max else st.min)
    // does a file's value range start strictly AFTER τ in sort order?
    def startsAfter(st: ColStat, tau: String): Boolean =
      if (asc) StatsPruning.cmp(kind, st.min, tau) > 0
      else StatsPruning.cmp(kind, st.max, tau) < 0

    // ---- credit phase
    val creditable: Seq[(Option[String], Long)] = files.flatMap { f =>
      stOf(f.path).flatMap { st =>
        val credit =
          if (nullsFirst) f.rows // nulls sort first: every row credits
          else if (st.kind == "z") 0L
          else if (st.nulls >= 0L) f.rows - st.nulls
          else 0L // unknown null count: no provable non-null rows
        if (credit > 0) Some((creditBound(st), credit)) else None
      }
    }
    val ordered = creditable.sortWith {
      // strict: two all-null-file entries are EQUAL, not mutually "before"
      // (TimSort rejects a comparator where lt(a,b) && lt(b,a))
      case ((None, _), (None, _)) => false
      case ((None, _), _) => true
      case (_, (None, _)) => false
      case ((Some(a), _), (Some(b), _)) =>
        if (asc) StatsPruning.cmp(kind, a, b) < 0 else StatsPruning.cmp(kind, a, b) > 0
    }
    var acc = 0L
    var tau: Option[String] = None
    var tauIsNullRegion = true // only "z"-file credits so far (before every value)
    val it = ordered.iterator
    while (it.hasNext && acc < k) {
      val (b, credit) = it.next()
      acc += credit
      b.foreach { v => tau = Some(v); tauIsNullRegion = false }
    }
    if (acc < k) return None // can't prove k rows exist at-or-before any bound

    // ---- prune phase
    val keep = files.filter { f =>
      stOf(f.path) match {
        case None => true // unknown contents: always read
        case Some(st) =>
          if (nullsFirst) {
            val nullFree = st.kind != "z" && st.nulls == 0L
            // τ still inside the null region ⇒ every value row is after it
            // (short-circuit keeps startsAfter off "z" stats' empty bounds)
            !(nullFree && (tauIsNullRegion || startsAfter(st, tau.get)))
          } else {
            // ≥ k non-null rows at-or-before τ: nulls are out of the top-k
            st.kind != "z" && !startsAfter(st, tau.get)
          }
      }
    }.map(_.path).toSet
    if (keep.size < files.size) Some(keep) else None
  }
}
