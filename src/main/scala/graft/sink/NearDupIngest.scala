package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Incremental NEAR-duplicate ingestion — [[Warehouse.appendDeduped]]'s
  * MinHash/LSH sibling (q57's algebra applied across commits): append only
  * documents that are not near-duplicates of (a) a kept smaller-key doc in
  * the same batch or (b) any document already in the corpus.
  *
  * The scale problem this solves: batch-mode near-dup (q57) is a self-join
  * over the whole corpus — re-running it on every ingest rescans 100 TB of
  * text. Here the corpus side is two bounded INDEX TABLES maintained beside
  * the corpus, so an ingest's cost depends on the batch, never on corpus
  * text:
  *
  *   `<name>__bands` (pk, band_idx, band_key) — the LSH probe index; a
  *     batch doc's candidates are the stored rows sharing a band key
  *     (equi-join, fan-out bounded by real near-dups + LSH false positives);
  *   `<name>__sigs` (pk, sig: array<string>) — MinHash signatures for
  *     candidate verification: estimated Jaccard = matching positions / k.
  *     No corpus text is ever re-read — the k-element signature IS the
  *     verification state (the standard corpus-scale trade: estimator
  *     variance ~1/sqrt(k) instead of an exact intersect over raw shingle
  *     sets).
  *
  * In-batch semantics are principled, not greedy: candidate pairs at or
  * above the similarity threshold form a graph whose connected components
  * each keep their MINIMUM pk (deterministic under any partitioning, same
  * keeper rule as q71) — so a chain a~b~c keeps only a even when a and c
  * are not directly similar, exactly like the batch-mode dedup pipeline.
  *
  * Replay safety: re-ingesting a batch finds each doc's existing copy at
  * signature similarity 1.0 and appends 0 rows (the near-dup analog of the
  * exact-dedup retry guard). All three appends (bands, sigs, then corpus —
  * index FIRST) are O(batch) manifest commits. The ordering picks which
  * side of the crash window you live on: index-first means a crash before
  * the corpus commit leaves orphan index rows, so replaying that batch
  * drops its docs as 1.0-similarity "dups" — a BOUNDED under-admission
  * (at most one batch, recoverable by re-ingesting under fresh pks or
  * rebuilding the index from corpus text). Corpus-first would instead
  * leave admitted docs invisible to the index — an UNBOUNDED recall hole
  * where every future near-dup of them sails in silently. For curation,
  * bounded under-admission beats silent duplicate admission.
  */
final class NearDupIngest(wh: Warehouse, pkCol: String, textCol: String,
                          shingleW: Int = 3, k: Int = 16, bands: Int = 4,
                          simT: Double = 0.5) {
  require(k % bands == 0, s"bands ($bands) must divide k ($k)")
  private val r = k / bands
  // positions that must agree for estimated Jaccard >= simT
  private val minMatches = math.ceil(simT * k).toInt

  final case class Report(version: Long, appended: Long,
    dupInBatch: Long, dupVsCorpus: Long)

  private def bandsTable(name: String) = s"${name}__bands"
  private def sigsTable(name: String) = s"${name}__sigs"

  /** (pk, sig, band rows) for a batch — one codegen'd pass over the text. */
  private def signed(df: DataFrame): DataFrame = {
    val sh = array_distinct(TextFns.shingles(TextFns.tokens(col(textCol)), shingleW))
    df.select(col(pkCol), TextFns.minhashSignature(sh, k).as("sig"))
      .withColumn("bands", TextFns.lshBands(col("sig"), bands, r))
  }

  /** Matching signature positions of two k-element signatures. */
  private def sigMatches(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m))

  def ingest(name: String, df: DataFrame): Report = {
    val total = df.count()
    val sigs = signed(df).persist() // consumers: in-batch pairs, corpus probe, survivor joins
    try {
      // ---- in-batch near-dup: banded candidate pairs -> estimated Jaccard
      // -> connected components -> min-pk keeper per component.
      val banded = sigs.select(col(pkCol), col("sig"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      val cand = banded.alias("a").join(banded.alias("b"),
          col(s"a.band_idx") === col(s"b.band_idx") &&
            col(s"a.band_key") === col(s"b.band_key") &&
            col(s"a.$pkCol") < col(s"b.$pkCol"))
        .select(col(s"a.$pkCol").as("d1"), col(s"b.$pkCol").as("d2"),
          col("a.sig").as("s1"), col("b.sig").as("s2"))
        .distinct()
      val simPairs = cand
        .filter(sigMatches(col("s1"), col("s2")) >= minMatches)
        .select(col("d1"), col("d2"))
      val comp = graft.functions.Graph.connectedComponents(simPairs)
      // CC ids are the component minimum -> dup rows are id != comp
      val inBatchDups = comp.filter(col("id") =!= col("comp"))
        .select(col("id").as(pkCol))
      val kept = sigs.join(inBatchDups, Seq(pkCol), "left_anti")

      // ---- corpus probe: batch band keys against the stored band index,
      // then signature verification against the stored signatures. The
      // batch side broadcasts (it is one ingest); the index side is a keyed
      // equi-join — never a corpus-text scan.
      val dupVsCorpus =
        if (!wh.exists(bandsTable(name))) kept.limit(0).select(col(pkCol))
        else {
          val keptBands = kept.select(col(pkCol).as("bpk"), col("sig").as("bsig"),
            posexplode(col("bands")).as(Seq("band_idx", "band_key")))
          val hits = wh.load(bandsTable(name))
            .join(broadcast(keptBands.select(col("bpk"), col("band_idx"), col("band_key"))),
              Seq("band_idx", "band_key"))
            .select(col(pkCol).as("epk"), col("bpk")).distinct()
          wh.load(sigsTable(name)).withColumnRenamed(pkCol, "epk")
            .join(hits, Seq("epk"))
            .join(broadcast(kept.select(col(pkCol).as("bpk"), col("sig").as("bsig"))), "bpk")
            .filter(sigMatches(col("sig"), col("bsig")) >= minMatches)
            .select(col("bpk").as(pkCol)).distinct()
        }
      val survivors = kept.join(dupVsCorpus, Seq(pkCol), "left_anti")
        .select(col(pkCol)).localCheckpoint()

      val keptCount = kept.select(pkCol).count()
      val appended = survivors.count()

      // ---- three O(batch) appends: INDEX TABLES FIRST, corpus last. A
      // crash between the commits then leaves index rows for docs absent
      // from the corpus — harmless false-positive probes (a replayed batch
      // re-verifies against its own signature at 1.0 and is dropped, and a
      // genuinely new doc matching an orphan row is a near-dup of content
      // we intended to admit anyway). The reverse order would leave admitted
      // docs INVISIBLE to the index — a silent recall hole where their
      // future near-dups sail in.
      val survSigs = sigs.join(survivors, Seq(pkCol))
      wh.append(bandsTable(name), survSigs
        .select(col(pkCol), posexplode(col("bands")).as(Seq("band_idx", "band_key"))),
        statsCols = Seq("band_key"))
      wh.append(sigsTable(name), survSigs.select(col(pkCol), col("sig")),
        statsCols = Seq(pkCol))
      val outRows = df.join(survivors, Seq(pkCol))
      val version = wh.append(name, outRows, statsCols = Seq(pkCol))

      Report(version, appended, total - keptCount, keptCount - appended)
    } finally sigs.unpersist()
  }
}
