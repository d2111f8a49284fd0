package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Incremental INVERTED-INDEX ingestion — the search-serving sibling of
  * [[NearDupIngest]] (q113's BM25 algebra served from index tables instead
  * of a corpus scan).
  *
  * The scale problem this solves: batch-mode search (q113) tokenizes the
  * whole corpus per query — fine for one audit, wrong for a serving path
  * that answers many queries against 100 TB of text. Here ingestion
  * maintains bounded index tables beside the corpus, so a SEARCH reads only
  * the postings of its query terms and two one-row/slim side tables — never
  * corpus text:
  *
  *   `<name>__postings` (term, pk, tf, dl) — the classic posting list with
  *     the doc length denormalized onto each posting (no per-doc join at
  *     query time). Appends are range-CLUSTERED on `term` with per-file
  *     min/max term stats, so a probe prunes to the manifest files whose
  *     term range intersects the query — the LSM-ish analog of a sorted
  *     term dictionary;
  *   `<name>__doclens` (pk, dl) — the append-only fact feeding the corpus
  *     stats rollup;
  *   `<name>__cstats` — ONE-ROW additive rollup (n_docs, total_dl)
  *     maintained by [[IncrementalRollup.maintainFromFeed]] off the doclens
  *     change feed: O(batch) per ingest, ledger-idempotent across replays,
  *     and the BM25 normalizer never rescans doclens.
  *
  * Commit order and replay safety follow [[NearDupIngest]]'s discipline:
  * index tables first (postings, doclens, then the ledger-guarded rollup),
  * corpus LAST, every index append IDEMPOTENT BY PK (anti-join against the
  * stored pks) and the corpus append deduplicated by pk
  * ([[Warehouse.appendDeduped]]) — so replaying a batch after a crash at
  * ANY commit boundary converges to the fully-committed state and no table
  * accretes duplicates. An orphan posting (index committed, corpus append
  * lost, batch never replayed) can surface a pk [[search]] scores but the
  * corpus lacks — callers that must not see them pass
  * `confirmed = true` to semi-join results against corpus membership (one
  * pk-pruned column probe), the same reconciliation trade NearDupIngest
  * makes.
  *
  * BM25 scoring matches q113 bit-for-bit: same rational-idf form (no
  * `log()`), per-term parts summed left-to-right in ONE fixed-order per-row
  * expression over term-pivoted tf columns — never a float SUM over posting
  * rows, whose accumulation order is partition-dependent.
  */
final class SearchIndexIngest(wh: Warehouse, pkCol: String, textCol: String) {

  final case class Report(version: Long, docs: Long, postings: Long)

  private def postingsTable(name: String) = s"${name}__postings"
  private def doclensTable(name: String) = s"${name}__doclens"
  private def cstatsTable(name: String) = s"${name}__cstats"

  private val statsSpec = IncrementalRollup.Spec(Nil, Seq(
    IncrementalRollup.CountStar("n_docs"),
    // dl is a bounded per-doc token count; the DECIMAL sum keeps the corpus
    // total exact (and association-free) at any corpus size
    IncrementalRollup.SumOf(col("dl").cast(
      org.apache.spark.sql.types.DataTypes.createDecimalType(28, 0)), "total_dl")))

  // ---- tokenizer-format stamp -------------------------------------------
  // [[NearDupIngest]]'s signature stamp, applied to the postings family: a
  // change to the tokenization algebra ([[TextFns.TokenizerGeneration]])
  // makes stored postings silently mismatch query-side tokens — searches
  // under-score pre-change documents and dedup-by-terms misses them, with
  // no error anywhere. The stamp rides the postings table's batch-id
  // ledger; every entry point refuses loudly on mismatch. Stamped BEFORE
  // any posting rows commit (create-then-stamp), so a committed index is
  // never stampless; an EMPTY stampless postings table (crash between
  // create and stamp) reads as fresh.
  private val FmtSid = "idxformat"
  private[sink] val formatStamp: Long = graft.functions.TextFns.TokenizerGeneration

  private def formatGuard(name: String): Unit = {
    if (!wh.exists(postingsTable(name))) return
    val got = wh.lastCommittedBatchId(postingsTable(name), FmtSid)
    if (got == formatStamp) return
    if (got < 0) {
      val man = wh.currentManifest(postingsTable(name))
      if (man.files.isEmpty && man.deletes.isEmpty) return // fresh, pre-stamp crash
      throw new IllegalStateException(
        s"search index for '$name' carries no tokenizer-format stamp — it was " +
          "built before format stamping. If it was provably built with the " +
          "CURRENT tokenizer generation, adopt it explicitly with " +
          "adoptFormat(name); otherwise rebuild the index (drop the " +
          "__postings/__doclens/__cstats tables and re-ingest).")
    }
    throw new IllegalStateException(
      s"search index for '$name' was built with tokenizer generation $got; this " +
        s"build tokenizes at generation $formatStamp. Stored postings would " +
        "silently mismatch query-side tokens (under-scored or missed documents), " +
        "so the index must be rebuilt (re-ingest), not mixed.")
  }

  private def ensureStamped(name: String,
      postsSchema: org.apache.spark.sql.types.StructType): Unit = {
    if (!wh.exists(postingsTable(name))) wh.create(postingsTable(name), postsSchema)
    if (wh.lastCommittedBatchId(postingsTable(name), FmtSid) != formatStamp)
      wh.recordBatchId(postingsTable(name), FmtSid, formatStamp)
  }

  /** Operator override for a pre-stamp index KNOWN to be tokenized at the
    * current generation: records the stamp so the guard passes. Misuse
    * reintroduces the silent cross-era mixing the guard prevents.
    */
  def adoptFormat(name: String): Unit = {
    require(wh.exists(postingsTable(name)), s"no search index for table: $name")
    wh.recordBatchId(postingsTable(name), FmtSid, formatStamp)
  }

  /** Tokenize `df` and append its NEW pks' postings + doclens rows
    * (idempotent by pk — the shared middle of [[ingest]] and
    * [[followChanges]]). Returns the posting rows appended.
    */
  private def indexRows(name: String, df: DataFrame): Long = {
    // one tokenization pass feeds postings AND doclens
    val toks = df.select(col(pkCol), TextFns.tokens(col(textCol)).as("tk"))
      .select(col(pkCol), col("tk"), size(col("tk")).cast("long").as("dl"))
      .persist()
    try {
      val posts = toks
        .select(col(pkCol), col("dl"), explode(col("tk")).as("term"))
        .groupBy(col("term"), col(pkCol), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .select(col("term"), col(pkCol), col("tf"), col("dl"))
      // localCheckpoint: counted after the commit below, and the anti-join
      // must not re-plan against the table AFTER its own append lands (it
      // would then see every batch pk as already present)
      val newPosts = (
        if (!wh.exists(postingsTable(name))) posts
        else posts.join(wh.load(postingsTable(name)).select(col(pkCol)).distinct(),
          Seq(pkCol), "left_anti")
        ).localCheckpoint()
      // clusterBy term: postings land range-sorted on the term, so each
      // file's [min,max] term stats are TIGHT and the search-time manifest
      // prune touches ~query-terms/term-range files, not every batch's
      ensureStamped(name, newPosts.schema)
      wh.append(postingsTable(name), newPosts,
        statsCols = Seq("term", pkCol), clusterBy = Seq("term"))

      val lens = toks.select(col(pkCol), col("dl"))
      val newLens =
        if (!wh.exists(doclensTable(name))) lens
        else lens.join(wh.load(doclensTable(name)).select(col(pkCol)),
          Seq(pkCol), "left_anti")
      wh.append(doclensTable(name), newLens, statsCols = Seq(pkCol))
      // change-feed-driven (not the append-only file feed): doclens MUTATES
      // once followChanges deletes from it, and the signed fold subtracts
      // deleted docs' contributions exactly; identical folds on pure appends
      IncrementalRollup.maintainFromChangeFeed(wh, doclensTable(name),
        cstatsTable(name), statsSpec)
      newPosts.count()
    } finally toks.unpersist()
  }

  /** Ingest one batch: maintain postings/doclens/cstats, then append the
    * batch rows to the corpus. All commits are O(batch).
    */
  def ingest(name: String, df: DataFrame): Report = {
    formatGuard(name)
    val preV = if (wh.exists(name)) wh.currentVersion(name) else -1L
    val postings = indexRows(name, df)
    val rep = wh.appendDeduped(name, df, fpCol = pkCol, pk = pkCol,
      statsCols = Seq(pkCol))
    advanceFollowerLedger(name, preV)
    Report(rep.version, rep.appended, postings)
  }

  /** [[IndexFollower.advance]] on the postings table — the shared ledger
    * discipline (head == preAppendVersion + 1, judged on the head; see the
    * object doc for why foreign commits landing DURING an ingest stay in
    * the next followChanges window).
    */
  private[graft] def advanceFollowerLedger(name: String, preAppendVersion: Long): Unit =
    IndexFollower.advance(wh, name, postingsTable(name), preAppendVersion)

  final case class FollowReport(corpusVersion: Long, deletedDocs: Long, indexedDocs: Long)

  /** INCREMENTAL INDEX MAINTENANCE from the corpus change feed — closes the
    * loop between a MUTATING corpus and its warehouse-resident index
    * without a blue/green rebuild: deletes/update-retractions on the corpus
    * (morMerge, deleteWhere, equality deletes) become equality-delete
    * commits on postings/doclens keyed by pk (O(changed pks) metadata, zero
    * posting rewrites — the MOR discipline), and inserted/updated rows
    * re-index through the same idempotent path ingests use. The corpus
    * window consumed is tracked in the warehouse batch ledger (streamId
    * `idxfollow:<name>`, recorded by [[ingest]] too), so crashed/replayed
    * calls converge: re-deleting deleted pks is a no-op overlay, re-indexing
    * anti-joins to empty. The cstats rollup follows through its own signed
    * change-feed fold.
    *
    * First call on an index built BEFORE this ledger existed treats the
    * whole current corpus as insertions — already-indexed pks no-op, but
    * postings of rows deleted before that first call are NOT retracted
    * (shield with `search(confirmed = true)`, or rebuild).
    */
  def followChanges(name: String): FollowReport = {
    require(wh.exists(postingsTable(name)),
      s"no search index for table: $name (ingest first)")
    formatGuard(name)
    IndexFollower.window(wh, name, postingsTable(name), pkCol) match {
      case None => FollowReport(wh.currentVersion(name), 0L, 0L)
      case Some(w) =>
        if (w.nDel > 0) {
          // order matters: retract BEFORE re-indexing, so an updated pk's new
          // postings (seq > the delete's) are shielded by the strict-< rule
          // and the re-index anti-join sees the pk as absent
          wh.equalityDelete(postingsTable(name), w.delPks)
          wh.equalityDelete(doclensTable(name), w.delPks)
        }
        val nIns = w.ins.select(col(pkCol)).distinct().count()
        if (nIns > 0) indexRows(name, w.ins)
        // a pure-delete window still folds the doclens retraction into cstats
        else IncrementalRollup.maintainFromChangeFeed(wh, doclensTable(name),
          cstatsTable(name), statsSpec)
        IndexFollower.record(wh, name, postingsTable(name), w.now)
        FollowReport(w.now, w.nDel, nIns)
    }
  }

  /** [[ingest]] with the three membership-bearing commits — postings,
    * doclens, corpus — fused into ONE [[Warehouse.transact]] unit. The
    * crash-orphan window `ingest` documents (index rows whose corpus row
    * never landed, shielded by `confirmed = true`) does not exist here: no
    * reader can observe a posting without its corpus row, so searches never
    * need the reconciliation semi-join. The cstats rollup stays FEED-driven
    * (maintained after the transaction, ledger-idempotent) — it is a
    * derived normalizer whose one-poll lag is benign, and feed discipline
    * keeps `ingest`/`ingestAtomic` freely mixable on one index: the ledger
    * folds each doclens commit exactly once regardless of which path made
    * it. Replay-safe the same way: a crashed transaction commits NOTHING,
    * and a full re-run anti-joins to empty everywhere.
    */
  def ingestAtomic(name: String, df: DataFrame): Report = {
    import org.apache.spark.sql.expressions.Window
    formatGuard(name)
    val toks = df.select(col(pkCol), TextFns.tokens(col(textCol)).as("tk"))
      .select(col(pkCol), col("tk"), size(col("tk")).cast("long").as("dl"))
      .persist()
    try {
      val posts = toks
        .select(col(pkCol), col("dl"), explode(col("tk")).as("term"))
        .groupBy(col("term"), col(pkCol), col("dl"))
        .agg(count(lit(1)).as("tf"))
        .select(col("term"), col(pkCol), col("tf"), col("dl"))
      val newPosts = (
        if (!wh.exists(postingsTable(name))) posts
        else posts.join(wh.load(postingsTable(name)).select(col(pkCol)).distinct(),
          Seq(pkCol), "left_anti")
        ).localCheckpoint()
      val lens = toks.select(col(pkCol), col("dl"))
      val newLens = (
        if (!wh.exists(doclensTable(name))) lens
        else lens.join(wh.load(doclensTable(name)).select(col(pkCol)),
          Seq(pkCol), "left_anti")
        ).localCheckpoint()
      // appendDeduped's algebra at STAGING time (same json-minimal keeper,
      // same fp anti-join), so the corpus append can ride the transaction
      val w = Window.partitionBy(pkCol)
        .orderBy(col(pkCol).asc, to_json(struct(df.columns.map(col): _*)).asc)
      val inBatch = df.withColumn("__keeper", row_number().over(w))
        .filter(col("__keeper") === 1).drop("__keeper")
      val fresh = (
        if (!wh.exists(name)) inBatch
        else inBatch.join(wh.load(name).select(pkCol).distinct(), Seq(pkCol), "left_anti")
        ).localCheckpoint()
      val preV = if (wh.exists(name)) wh.currentVersion(name) else -1L
      // stamp BEFORE the transaction commits (the ledger pointer is outside
      // the transactional manifest commit — see NearDupIngest.ingestAtomic)
      ensureStamped(name, newPosts.schema)
      wh.transact { tx =>
        tx.append(postingsTable(name), newPosts,
          statsCols = Seq("term", pkCol), clusterBy = Seq("term"))
        tx.append(doclensTable(name), newLens, statsCols = Seq(pkCol))
        tx.append(name, fresh, statsCols = Seq(pkCol))
      }
      IncrementalRollup.maintainFromChangeFeed(wh, doclensTable(name),
        cstatsTable(name), statsSpec)
      advanceFollowerLedger(name, preV)
      Report(wh.currentVersion(name), fresh.count(), newPosts.count())
    } finally toks.unpersist()
  }

  /** Compact the postings table's ingest-granularity files
    * ([[Warehouse.compactFiles]] with `clusterBy = term`): every per-batch
    * append lands one term-range file, and after many small batches their
    * ranges overlap — each probe then opens a file per batch. Compaction
    * rewrites the small files into few DISJOINT term-range files, restoring
    * the O(query-terms) probe; search results are unchanged (spec-pinned).
    */
  def compact(name: String, smallRows: Long = 100000L): Long =
    wh.compactFiles(postingsTable(name), smallRows, clusterBy = Seq("term"))

  /** Postings of `terms` only: manifest-stat file pruning on the `term`
    * column (a file is skipped when NO query term falls inside its [min,max]
    * term range — same comparison domain as every other stat prune), then
    * the residual `isin` filter handles row groups within kept files.
    */
  private[graft] def probePostings(name: String, terms: Seq[String]): DataFrame = {
    val t = postingsTable(name)
    val man = wh.currentManifest(t)
    val kept = man.files.filter { f =>
      f.stats.get("term") match {
        case Some(ColStat("z", _, _, _)) => false
        case Some(s) => terms.exists(q =>
          StatsPruning.cmp(s.kind, s.min, q) <= 0 &&
            StatsPruning.cmp(s.kind, s.max, q) >= 0)
        case None => true // no stats recorded => cannot prune
      }
    }
    // MOR overlay over the pruned subset: followChanges retracts a doc's
    // postings as an equality delete, and a raw parquet read of the kept
    // files would resurrect them — the overlay is exactly the corpus read
    // path's, restricted to the files the term prune kept
    val base = wh.morFrame(t, Manifest(man.schema, kept, man.deletes))
    base.filter(col("term").isin(terms: _*))
  }

  /** Top-`k` BM25 over the index: cost ∝ postings of the query terms (a
    * pruned probe), one broadcast one-row stats frame, one TakeOrdered —
    * the corpus text is never read. `confirmed = true` additionally
    * semi-joins hits against corpus membership (crash-orphan shielding).
    */
  def search(name: String, terms: Seq[String], k: Int,
             k1: Double = 1.2, b: Double = 0.75,
             confirmed: Boolean = false): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    require(terms.distinct.size == terms.size, "query terms must be distinct")
    // one pivot column pair per term: right for the keyword-query shape this
    // serves; a wide "query" (document-sized term sets) belongs on the
    // corpus-scan path (q113's algebra), not a thousand-column pivot
    require(terms.size <= 64,
      s"search supports at most 64 terms (got ${terms.size}); use the corpus-scan BM25 for document-shaped queries")
    require(wh.exists(postingsTable(name)) && wh.exists(cstatsTable(name)),
      s"no search index for table: $name (ingest first)")
    formatGuard(name) // query-side tokens must match the stored postings' era
    // persisted: consumers = per-term df aggregate + the scoring pivot
    val probe = probePostings(name, terms).persist()
    try {
      // one-row broadcast stats: corpus n/total_dl from the rollup, df per
      // term from the probe itself (a posting exists iff tf > 0, so the
      // probe's per-term row count IS the document frequency)
      val corpus = IncrementalRollup.read(wh, cstatsTable(name), statsSpec)
        .select(col("n_docs").as("n"), col("total_dl").cast("double").as("total_dl"))
      val dfCols = terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, 1L).otherwise(0L)).as(s"df$i") }
      val dfs = probe.agg(dfCols.head, dfCols.tail: _*)
      val stats = corpus.crossJoin(broadcast(dfs)) // one-row frames both sides

      // term-pivoted tf columns: the per-doc score is ONE fixed-order
      // expression (q113's exact shape), bit-stable under any partitioning
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"tf$i") }
      val pivoted = probe.groupBy(col(pkCol), col("dl"))
        .agg(tfCols.head, tfCols.tail: _*)
      def part(i: Int) =
        ((col(s"tf$i").cast("double") * (k1 + 1.0)
          / (col(s"tf$i").cast("double") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl").cast("double") * col("n").cast("double")
              / col("total_dl"))))
          * ((col("n") - col(s"df$i")).cast("double") + 0.5)
          / (col(s"df$i").cast("double") + 0.5))
      val scored = pivoted.crossJoin(broadcast(stats))
        .withColumn("n_hits",
          terms.indices.map(i => when(col(s"tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _))
        .withColumn("bm25", round(terms.indices.map(part).reduce(_ + _), 6))
        .select(col(pkCol), col("n_hits"), col("bm25"))
      val shielded =
        if (!confirmed) scored
        else scored.join(wh.load(name).select(col(pkCol)), Seq(pkCol), "left_semi")
      shielded.orderBy(col("bm25").desc, col(pkCol)).limit(k)
    } finally probe.unpersist()
  }
}
