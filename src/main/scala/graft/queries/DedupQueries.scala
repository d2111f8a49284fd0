package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.functions.TextFns._
import Tables._

/** Deduplication family over `documents` (builder contract): exact
  * (hash-groupBy), fingerprint-block near-dup, n-gram Jaccard with prefix
  * blocking, MinHash+LSH (shingle -> salted-md5 minhash -> banded bucket
  * join), SimHash (q58). Scale posture: every variant blocks
  * candidates FIRST (hash buckets / LSH bands), so the pair space stays
  * linear-ish in corpus size — never the quadratic all-pairs cross join.
  */
object DedupQueries {

  private val W = 3         // shingle width (word trigrams)
  private val K = 12        // minhash signature length
  private val SALTS = 3     // md5 invocations per shingle; each yields 4 hash fns
  private val CHUNK = 4     // 8-hex-char slices per md5 (K = SALTS * CHUNK)
  private val BANDS = 3     // LSH bands (r = K / BANDS = 4 rows per band)
  private val R = K / BANDS
  private val JACCARD_T = 0.5

  /** Compact `(doc_id, sh)` shingle-set frame — the shared upstream of the
    * whole near-dup family (q56/q57/q119/q128). ~4 KB/doc: the thing worth
    * caching is THIS, never the exploded gram frame (corpus-scale grams are
    * ~W× the text; the compact arrays re-explode from cache for pennies).
    */
  private def shingleSets(s: SparkSession, dir: String): DataFrame =
    spread(read(s, dir, "documents"))
      .select(col("doc_id"), array_distinct(shingles(tokens(col("text")), W)).as("sh"))

  /** q119's implementation; `prebuilt` lets q128 inject an already-persisted
    * shingle frame so the audit's two pipelines share one text scan.
    *
    * Persist discipline (the contention lesson from round 7): only COMPACT
    * frames are cached — `sets` (arrays, ~4 KB/doc) and `sorted` (rarity-
    * ordered arrays + lengths). The exploded gram frame is NEVER persisted:
    * at corpus scale it is ~W× the text and was the first thing to spill
    * under memory pressure; re-deriving it from the cached arrays is a
    * cheap codegen'd explode. Verification intersects read the UNSORTED
    * `sets` arrays (set intersection is order-independent), so `sorted`
    * exists only for the prefix-candidate stage.
    */
  private[queries] def setsimJoin(s: SparkSession, dir: String,
      prebuilt: Option[DataFrame]): DataFrame = {
    val sets = prebuilt.getOrElse(
      shingleSets(s, dir).persist(StorageLevel.MEMORY_AND_DISK))
    val base = sets.select(col("doc_id"), explode(col("sh")).as("g"))
    val df = base.groupBy("g").agg(count(lit(1)).as("df"))
    // rarity order decides only WHICH elements form the prefix; the
    // carried array drops to plain md5 STRINGS immediately (struct<df,g>
    // arrays made the verify intersects interpreted struct-compares —
    // measured 19.4 s -> the string form keeps q56's codegen'd intersect).
    // (Tried: md5-string global order to skip this join+struct-sort —
    // recall-complete under any fixed order, but candidates explode
    // without rarity concentration: 14.5 s vs 8.4 s at sf0.1. Rarity
    // order EARNS its construction cost.)
    val sorted = base.join(df, "g")
      .groupBy("doc_id")
      .agg(transform(sort_array(collect_list(struct(col("df"), col("g")))),
        p => p.getField("g")).as("sh"))
      .withColumn("n", size(col("sh")))
      .withColumn("plen", col("n") - ceil(lit(JACCARD_T) * col("n")).cast("int") + 1)
      .persist(StorageLevel.MEMORY_AND_DISK) // 2 consumers: the prefix self-join sides
    // A df=1 gram matches only itself, so the candidate join would drop it
    // AFTER the exchange; the semi-join drops it BEFORE. Rarity-first
    // prefixes are DOMINATED by the singleton tail, and the semi-join
    // shuffles on the same key `g` as the candidate join, so the pruned
    // exchange is reused — strictly less data through the heavy self-join.
    val shared = df.filter(col("df") >= 2).select("g")
    val prefixes = sorted.select(col("doc_id"), col("n"),
        posexplode(slice(col("sh"), lit(1), col("plen"))).as(Seq("pos", "g")))
      .join(shared, Seq("g"), "left_semi")
    val cand = prefixes.select(col("doc_id").as("d1"), col("n").as("n1"),
        col("pos").as("p1"), col("g"))
      .join(prefixes.select(col("doc_id").as("d2"), col("n").as("n2"),
        col("pos").as("p2"), col("g")), Seq("g"))
      .filter(col("d1") < col("d2") &&
        // length filter: Jaccard >= T forces T <= n1/n2 <= 1/T
        col("n2") * lit(JACCARD_T) <= col("n1") && col("n1") * lit(JACCARD_T) <= col("n2") &&
        // positional filter (PPJoin): a shared element at (p1, p2) caps
        // the achievable overlap at min remaining suffix; Jaccard >= T
        // needs inter >= T/(1+T)·(n1+n2). Recall-safe: the pair's FIRST
        // shared element always has the full common suffix behind it.
        (least(col("n1") - col("p1"), col("n2") - col("p2"))
          >= ceil(lit(JACCARD_T / (1 + JACCARD_T)) * (col("n1") + col("n2")))))
      .select("d1", "d2").distinct()
    cand
      .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("long").as("inter"),
        size(col("sh1")).cast("long").as("n1"), size(col("sh2")).cast("long").as("n2"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= JACCARD_T)
      .withColumn("jaccard", round(col("jaccard"), 4))
      .orderBy("d1", "d2")
  }

  /** q57's implementation; see [[setsimJoin]] for the `prebuilt` contract.
    * The shingle frame feeds the signature aggregate AND both jaccard-verify
    * joins; uncached it would recompute 3x. Deliberately not unpersisted
    * (the returned plan still references it); ~4 KB/doc. MEMORY_AND_DISK:
    * at corpus scale the frame exceeds executor memory, and MEMORY_ONLY
    * eviction would silently turn the cache into a 3x recompute —
    * spilled-to-disk partitions keep the reuse real.
    */
  private[queries] def minhashLsh(s: SparkSession, dir: String,
      prebuilt: Option[DataFrame]): DataFrame = {
    val docs = prebuilt.getOrElse(
      shingleSets(s, dir).persist(StorageLevel.MEMORY_AND_DISK))
    val shingleRows = docs.select(col("doc_id"), explode(col("sh")).as("h"))
    val hashed = shingleRows.select(
      Seq(col("doc_id")) ++
        (0 until SALTS).map(t => md5(concat(lit(s"$t:"), col("h"))).as(s"m$t")): _*)
    val sigCols = (0 until K).map { j =>
      min(substring(col(s"m${j / CHUNK}"), (j % CHUNK) * 8 + 1, 8)).as(s"sig$j")
    }
    // localCheckpoint: the banded candidate join reads the signature frame
    // on both sides — one row per doc (K 8-char min-hashes), tiny, and it
    // pins the salted-md5 min aggregate to a single run
    val sig = hashed.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      .localCheckpoint()
    val bandCols = (0 until BANDS).map { b =>
      md5(concat_ws("|", Seq(lit(b.toString)) ++
        (0 until R).map(i => col(s"sig${b * R + i}")): _*)).as(s"band$b")
    }
    val banded = sig.select(Seq(col("doc_id")) ++ bandCols: _*)
      .select(col("doc_id"), posexplode(array((0 until BANDS).map(b => col(s"band$b")): _*))
        .as(Seq("band_idx", "band_key")))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
    cand.join(docs.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(docs.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= JACCARD_T)
      .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("d1", "d2")
  }

  private val RUN_W = 15 // q130: minimum verbatim token run (gram width)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EXACT substring-level dedup (Lee et al. 2022's ExactSubstr criterion,
    // re-expressed relationally): doc pairs sharing a verbatim run of >=
    // RUN_W tokens, with the MAXIMAL shared run length recovered by offset
    // chaining — q82 only detects a shared window, this measures it. A
    // shared gram at positions (p1, p2) lies on diagonal p1-p2; consecutive
    // p1 on one diagonal chain into one maximal run of c + RUN_W - 1 tokens
    // (gaps-and-islands over the match set: island = p1 - row_number()).
    // Every reported run is a true verbatim overlap and every >= RUN_W
    // overlap is found — exact both ways, no suffix array needed. Scale
    // posture: the join is keyed on 15-token-verbatim hashes, so fan-out is
    // bounded by real duplication (run AFTER q76's boilerplate strip, which
    // removes the only grams with corpus-scale occurrence counts); the
    // chaining window partitions by (pair, diagonal) — output-bounded, and
    // positional grams are re-derived per side rather than persisted (the
    // exploded frame is the one thing never worth caching at corpus scale).
    "q130_substring_dedup" -> { (s, dir) =>
      val tk = spread(read(s, dir, "documents"))
        .select(col("doc_id"), tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= RUN_W) // only full windows participate
      val grams = tk.select(col("doc_id"),
        posexplode(wideShingles(col("tk"), RUN_W)).as(Seq("pos", "g")))
      val m = grams.select(col("doc_id").as("d1"), col("pos").as("p1"), col("g"))
        .join(grams.select(col("doc_id").as("d2"), col("pos").as("p2"), col("g")), Seq("g"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"), col("p1"), (col("p1") - col("p2")).as("diag"))
      val w = Window.partitionBy("d1", "d2", "diag").orderBy("p1")
      m.withColumn("isl", col("p1") - row_number().over(w))
        .groupBy("d1", "d2", "diag", "isl").agg(count(lit(1)).as("c"))
        .select(col("d1"), col("d2"), (col("c") + lit(RUN_W - 1)).as("run_len"))
        .groupBy("d1", "d2")
        .agg(max("run_len").as("max_run"), count(lit(1)).as("n_runs"))
        .orderBy("d1", "d2")
    },

    // Exact dedup: hash-groupBy on the normalized-text fingerprint; keeper =
    // min doc_id per group (pure map-side expr + one keyed window).
    "q54_exact_dedup" -> { (s, dir) =>
      val g = Window.partitionBy("fp_norm")
      spread(read(s, dir, "documents"))
        .select(col("doc_id"), md5(normalize(col("text"))).as("fp_norm"))
        .withColumn("keeper", min("doc_id").over(g))
        .withColumn("is_dup", col("doc_id") =!= col("keeper"))
        .orderBy("doc_id")
    },

    // Fingerprint-block near-dup groups: docs sharing an 80-char normalized
    // prefix; emits only groups with >1 member.
    "q55_prefix_dup_groups" -> { (s, dir) =>
      spread(read(s, dir, "documents"))
        .select(col("doc_id"), md5(substring(normalize(col("text")), 1, 80)).as("grp"))
        .groupBy("grp")
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("copies"),
          array_join(sort_array(collect_list("doc_id")), ",").as("members"))
        .filter(col("copies") > 1)
        .orderBy("keeper")
    },

    // EXACT set-similarity join by prefix filtering (Bayardo et al.'s
    // AllPairs / PPJoin candidate rule) — the recall-COMPLETE upgrade over
    // q56's prefix-fingerprint blocking and q57's probabilistic LSH: every
    // pair at Jaccard >= T is found, with no all-pairs cross join. Shingle
    // sets are globally ordered by (document frequency asc, hash) — rarest
    // first — and a pair at Jaccard >= T must share at least one element
    // within each side's first n − ceil(T·n) + 1 elements (if all >=
    // ceil(T·n) intersecting elements hid outside the prefix, there'd be
    // only ceil(T·n) − 1 slots). Candidates = equi-join on prefix elements
    // (fan-out bounded by how rare prefix shingles are — that's why the
    // order puts rare first); verification = exact integer intersect. The
    // df frame joins g-keyed (NOT broadcast: a 100 TB corpus's shingle
    // vocabulary outgrows any executor). Oracle = the UNBLOCKED brute-force
    // all-pairs in DuckDB, so the gate itself proves completeness at sf.
    "q119_setsim_join" -> { (s, dir) => setsimJoin(s, dir, None) },

    // LSH recall audit (q69's pattern applied to the dedup family): q57's
    // banded MinHash pairs measured against q119's recall-complete exact
    // join, same shingle space and threshold. Both sides verify the true
    // Jaccard, so precision is 1 by construction — RECALL is the number a
    // team quotes when it swaps the exact O(prefix-pairs) join for the
    // probabilistic O(bands·rows) path at corpus scale. The two pipelines
    // SHARE one persisted shingle frame (the audit's dominant cost was the
    // same tokens->shingles scan run twice).
    "q128_dedup_recall" -> { (s, dir) =>
      val sets = shingleSets(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
      val exact = setsimJoin(s, dir, Some(sets)).select("d1", "d2")
      // localCheckpoint: TWO consumers (the hit-mark join and the n_lsh
      // aggregate) — without it the whole banded-MinHash pipeline runs twice
      val lsh = minhashLsh(s, dir, Some(sets)).select("d1", "d2").localCheckpoint()
      val marked = exact.join(lsh.withColumn("hit", lit(1L)), Seq("d1", "d2"), "left")
      marked.agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_found"))
        .crossJoin(broadcast(lsh.agg(count(lit(1)).as("n_lsh"))))
        .select(col("n_exact"), col("n_lsh"), col("n_found"),
          round(col("n_found").cast("double") / col("n_exact"), 6).as("recall"))
    },

    // n-gram Jaccard near-dup pairs, blocked on a 40-char prefix fingerprint
    // so the join fans out only within tiny candidate buckets.
    "q56_ngram_jaccard" -> { (s, dir) =>
      val base = spread(read(s, dir, "documents"))
        .withColumn("tk", tokens(col("text")))
        .select(col("doc_id"),
          md5(substring(normalize(col("text")), 1, 40)).as("blk"),
          array_distinct(shingles(col("tk"), W)).as("sh"))
      val a = base.select(col("doc_id").as("d1"), col("blk"), col("sh").as("sh1"))
      val b = base.select(col("doc_id").as("d2"), col("blk"), col("sh").as("sh2"))
      a.join(b, Seq("blk")).filter(col("d1") < col("d2"))
        .withColumn("jaccard",
          size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
            size(array_union(col("sh1"), col("sh2"))))
        .filter(col("jaccard") >= JACCARD_T)
        .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("d1", "d2")
    },

    // Edit-distance record linkage (q56's character-level sibling): block on
    // an 8-char raw prefix so candidate buckets stay tiny, then score each
    // in-bucket pair with levenshtein over a fixed 24-char head — bounded
    // O(24²) per pair, equi-join on the block key (hash join, never a
    // cartesian). Levenshtein with unit costs is the same metric in both
    // engines.
    "q96_fuzzy_linkage" -> { (s, dir) =>
      val k = spread(read(s, dir, "documents"))
        .select(col("doc_id"),
          substring(col("text"), 1, 8).as("blk"),
          substring(col("text"), 1, 24).as("head"))
      val a = k.select(col("doc_id").as("id_a"), col("blk"), col("head").as("h_a"))
      val b = k.select(col("doc_id").as("id_b"), col("blk"), col("head").as("h_b"))
      a.join(b, Seq("blk")).filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("h_a"), col("h_b")).cast("long"))
        .filter(col("dist") <= 8)
        .select(col("id_a"), col("id_b"), col("dist"))
        .orderBy("id_a", "id_b")
    },

    // Bag-of-words cosine over candidate pairs (q56's WEIGHTED sibling:
    // token-count vectors instead of shingle sets). Everything stays
    // integer until one final division: dot = Σ tf₁·tf₂ and the norms are
    // Σ tf² (BIGINT), and the emitted score is cos² = dot²/(n₁·n₂) — no
    // sqrt, whose libm rounding differs across engines. Candidates come
    // from the same 40-char-prefix blocks as q56 (bounded fan-out); the
    // per-pair dot is two keyed joins through the tf frame, never a
    // vector materialization.
    "q107_bow_cosine" -> { (s, dir) =>
      val base = spread(read(s, dir, "documents"))
      val tfc = base
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK) // 3 consumers: t1, t2, norms
      val nrm = tfc.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
      val blk = base.select(col("doc_id"),
        md5(substring(normalize(col("text")), 1, 40)).as("b"))
      val cand = blk.select(col("doc_id").as("d1"), col("b"))
        .join(blk.select(col("doc_id").as("d2"), col("b")), Seq("b"))
        .filter(col("d1") < col("d2")).select("d1", "d2")
      val t1 = tfc.select(col("doc_id").as("d1"), col("term"), col("tf").as("tf1"))
      val t2 = tfc.select(col("doc_id").as("d2"), col("term"), col("tf").as("tf2"))
      val dot = cand.join(t1, Seq("d1")).join(t2, Seq("d2", "term"))
        .groupBy("d1", "d2").agg(sum(col("tf1") * col("tf2")).as("dot"))
      val cos2 = col("dot").cast("double") * col("dot").cast("double") /
        (col("n2_1").cast("double") * col("n2_2").cast("double"))
      dot
        .join(nrm.select(col("doc_id").as("d1"), col("n2").as("n2_1")), Seq("d1"))
        .join(nrm.select(col("doc_id").as("d2"), col("n2").as("n2_2")), Seq("d2"))
        .filter(cos2 >= 0.5)
        .select(col("d1"), col("d2"), col("dot"), round(cos2, 6).as("cos2"))
        .orderBy("d1", "d2")
    },

    // MinHash + LSH, the scale-path shape: explode shingles to rows, compute
    // SALTS md5s per row as FLAT codegen'd exprs (no nested higher-order
    // functions — those run interpreted), take the K minima with one hash
    // aggregate keyed by doc, band the signature, and self-join on band
    // keys. Each md5 is sliced into CHUNK 8-hex sub-hashes, so K hash
    // functions cost only SALTS md5 calls per shingle. At 100 TB: shuffle
    // keys are doc_id then band key; bucket sizes stay bounded, no quadratic
    // blowup, and every stage is whole-stage-codegen.
    "q57_minhash_lsh" -> { (s, dir) => minhashLsh(s, dir, None) },

    // NEAR-DUP INDEX FOLLOWS THE MUTATING CORPUS: the warehouse-resident
    // LSH band/signature index ([[graft.sink.NearDupIngest]]) maintained
    // from the corpus CHANGE FEED — the last member of the index-follower
    // family (q165 BM25, q166 ANN). The corpus builds by PLAIN appends
    // (no admission), the first followChanges bootstraps the index
    // wholesale, then the corpus mutates out of band (morMerge re-texts %5
    // docs, deleteWhere drops %7) and the second followChanges turns the
    // window's net -D pks into ONE equality-delete commit per index table
    // (O(changed pks) metadata, zero band/signature rewrites) while +I rows
    // re-sign through the idempotent path. The served VERIFIED pair set
    // (banded candidates x signature agreement >= simT·k) must equal DuckDB
    // running the same MinHash algebra over the corpus's FINAL state — a
    // stale signature (deleted doc still pairing, updated doc pairing with
    // its old text) is a row the oracle doesn't have. The 100 TB shape:
    // dedup-index freshness at O(changes) per tick, no blue/green rebuild.
    "q169_neardup_index_follow" -> { (s, dir) =>
      val ndi = q169Index(s, dir)
      ndi.pairs("corpus").orderBy("d1", "d2").localCheckpoint()
    },

    // From the FEED-MAINTAINED index to dedup DECISIONS: q169's exact
    // mutation script, but the served surface is NearDupIngest.clusters()
    // — connected components over the index's verified pairs, min-pk
    // keeper + cluster size per doc (q71's algebra applied to the followed
    // index instead of a batch self-join). The oracle recomputes the
    // transitive closure with a recursive CTE over the SAME final-state
    // pair algebra, so both the index freshness AND the fixpoint are
    // cross-checked. 100 TB shape: decisions at O(index pairs), zero
    // corpus-text reads, no blue/green rebuild.
    "q172_neardup_index_clusters" -> { (s, dir) =>
      val ndi = q169Index(s, dir)
      ndi.clusters("corpus").orderBy("doc_id").localCheckpoint()
    },

    // From near-dup PAIRS to dedup DECISIONS: connected components over the
    // q56 candidate graph (iterative min-label propagation, functions/Graph)
    // labels every clustered doc with its component's minimum id — the
    // keeper — plus the cluster size. The oracle recomputes the transitive
    // closure with a recursive CTE, independently of the propagation
    // algorithm, so the fixpoint itself is cross-checked.
    "q71_dup_clusters" -> { (s, dir) =>
      val pairs = queries("q56_ngram_jaccard")(s, dir).select(col("d1"), col("d2"))
      val comp = graft.functions.Graph.connectedComponents(pairs)
      val sizes = comp.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      comp.join(sizes, "comp")
        .select(col("id").as("doc_id"), col("comp").as("keeper"),
          col("cluster_size"), (col("id") =!= col("comp")).as("is_dup"))
        .orderBy("doc_id")
    },

    // Repetition quality filter (Gopher-style): fraction of duplicate word
    // trigrams per document. High ratios mark boilerplate/templated text —
    // the in-document complement of the cross-document dedup family. Pure
    // per-row array math: zero shuffle at any scale.
    "q70_repetition" -> { (s, dir) =>
      spread(read(s, dir, "documents"))
        .withColumn("tk", tokens(col("text")))
        .select(col("doc_id"), shingles(col("tk"), W).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n_tri"),
          size(array_distinct(col("sh"))).as("n_uniq"))
        .withColumn("rep_ratio",
          round(lit(1.0) - col("n_uniq").cast("double") / col("n_tri"), 4))
        .withColumn("flagged", col("rep_ratio") > 0.2)
        .orderBy("doc_id")
    },

    // SimHash near-dup: 64-bit signature (default; 32-bit via the same
    // builder, oracle-checked as q58b) from per-token md5 bit-majorities,
    // computed as `bits` flat sum-aggregates over exploded token rows (all
    // codegen'd — no nested HOFs). Candidates come from MULTI-BAND blocking:
    // a pair within Hamming distance 4 differs in at most 4 bands, so with
    // B >= 5 bands it agrees EXACTLY on at least one — multi-band OR-ing is
    // therefore full-recall for the verify threshold (pigeonhole), unlike a
    // single wide band, which silently drops pairs whose differing bits land
    // in it. Exactly 5 bands is the candidate-minimal full-recall split:
    // the fewest bands the guarantee allows, with the widest
    // (finest-bucketed) keys — 13+13+13+13+12 bits at 64, so each band key
    // has 4096-8192 buckets vs the 32-bit form's 64-128: candidate sets
    // shrink ~64x at the same recall, which is why 64-bit is the scale
    // default. Frequency-weighted: duplicate tokens count.
    "q58_simhash" -> { (s, dir) => simhashPairs(s, dir, 64) },
    "q58b_simhash32" -> { (s, dir) => simhashPairs(s, dir, 32) },

    // Train/eval DECONTAMINATION — the n-gram leakage check every serious
    // LLM training pipeline runs before training (flag training documents
    // sharing any word n-gram with the held-out benchmark set; LLaMA/GPT
    // use 8-13-grams). The "benchmark" here is a deterministic md5 split of
    // the corpus (~1/16) so the oracle can mirror it. Scale posture: grams
    // are md5 keys, the join is keyed on the gram — and since a benchmark
    // suite is tiny next to a 100 TB corpus, the eval gram set is the
    // broadcast side in production; per-doc distinct aggregation bounds
    // the fan-in.
    "q72_decontamination" -> { (s, dir) =>
      // Pre-tokenize into its own column (so the split/regex runs once per
      // doc, not once per try_element_at inside the shingle lambda) and
      // persist the gram frame BEFORE the eval/train split — the q57
      // pattern. Without the persist, aliasing the expensive HOF into both
      // branches lets InferFiltersFromGenerate clone the whole shingle tree
      // into a size()>0 Filter that pushdown then moves below the spread()
      // repartition onto the raw one-partition scan: the full corpus gets
      // shingled twice, interpreted, on a single core (28.3s -> 1.6s at
      // sf0.1). PlanLintSpec ("no HOF-bearing Filter below spread()") lints
      // that plan shape across all queries. Deliberately not unpersisted
      // (the returned plan still references the cache — q57's rationale);
      // MEMORY_AND_DISK so eviction at corpus scale spills instead of
      // silently degrading the cache into a double shingle scan.
      val docs = spread(read(s, dir, "documents"))
        .withColumn("tk", tokens(col("text")))
        .select(col("doc_id"), array_distinct(shingles(col("tk"), DECON_W)).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) === "0"
      // The eval side is benchmark-suite-sized by construction here (a ~1/16
      // md5 split), which is only broadcast-safe at benchmark scale factors:
      // 1/16 of a 100 TB corpus is NOT broadcastable, and the hint bypasses
      // Spark's size gate. In production the eval side is a FIXED benchmark
      // suite (MMLU/HumanEval/...; MBs of grams, independent of corpus
      // size), which is what the hint models; a deployment joining against
      // a corpus-proportional eval split must drop the hint and let
      // AQE/size stats pick the build side. PlanLintSpec asserts the
      // broadcast actually happens (a silent fallback to SMJ here would
      // shuffle the full gram frame).
      val evalGrams = broadcast(docs.filter(isEval)
        .select(col("doc_id").as("eval_id"), explode(col("sh")).as("g")))
      val trainGrams = docs.filter(!isEval)
        .select(col("doc_id"), explode(col("sh")).as("g"))
      trainGrams.join(evalGrams, "g")
        .groupBy("doc_id")
        .agg(countDistinct("g").as("n_overlap"),
          countDistinct("eval_id").as("n_eval_docs"))
        .orderBy("doc_id")
    }
  )

  private val DECON_W = 8 // decontamination n-gram width (docs here are 10-99 tokens)

  private val HAMMING_T = 4

  /** (shift, mask) per band, MSB-first — 5 bands (HAMMING_T + 1, the
    * pigeonhole minimum for full recall at Hamming ≤ 4) of near-equal
    * width covering all `bits`.
    */
  private def bandDefs(bits: Int): Seq[(Int, Long)] = bits match {
    case 64 => Seq((51, 8191L), (38, 8191L), (25, 8191L), (12, 8191L), (0, 4095L))
    case 32 => Seq((25, 127L), (18, 127L), (12, 63L), (6, 63L), (0, 63L))
    case other => throw new IllegalArgumentException(s"unsupported simhash width: $other")
  }

  /** Near-dup pairs within Hamming ≤ [[HAMMING_T]] of a `bits`-wide SimHash.
    * Bit j (MSB-first) of the signature carries weight 1L << (bits-1-j); at
    * 64 bits that makes bit 0 the sign bit — harmless, because every band
    * is extracted as `shiftright(sig, shift) & mask` with mask ≤ the shifted
    * width, so arithmetic-shift sign-fill never reaches a key (the identity
    * both Spark and DuckDB agree on), and the bit-majority partial sums
    * stay inside [Long.MinValue, Long.MaxValue] (monotone from the sign
    * term toward -1).
    */
  private def simhashPairs(s: SparkSession, dir: String, bits: Int): DataFrame = {
    val bands = bandDefs(bits)
    val docs = spread(read(s, dir, "documents"))
      .withColumn("tk", tokens(col("text")))
    val tokRows = docs.select(col("doc_id"), explode(col("tk")).as("w"))
      .select(col("doc_id"), md5(col("w")).as("h"))
    // bit j of the word hash, from hex digit j/4, bit (3 - j%4)
    def bit(j: Int) =
      shiftright(conv(substring(col("h"), j / 4 + 1, 1), 16, 10).cast("int"), 3 - j % 4)
        .bitwiseAND(lit(1))
    val aggs = (0 until bits).map(j => sum(bit(j)).as(s"s$j")) :+
      count(lit(1)).as("n")
    val sums = tokRows.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val simhash = (0 until bits).map { j =>
      when(col(s"s$j") * 2 >= col("n"), lit(1L << (bits - 1 - j))).otherwise(0L)
    }.reduce(_ + _)
    // localCheckpoint: the banded candidate join reads the signature frame
    // on BOTH sides — one row per doc (id + one long), pennies to hold,
    // and it cuts the tokenize+md5+bit-sum aggregate to a single run
    val sig = sums.select(col("doc_id"), simhash.as("simhash")).localCheckpoint()
    val bkCase = "CASE bi " + bands.zipWithIndex.map { case ((sh, m), j) =>
      s"WHEN $j THEN shiftright(simhash, $sh) & ${m}L" }.mkString(" ") + " END"
    val banded = sig
      .select(col("doc_id"), col("simhash"),
        explode(array(bands.indices.map(lit): _*)).as("bi"))
      .withColumn("bk", expr(bkCase))
    // A pair can match in several bands; keep it only at its FIRST
    // matching band — a per-row predicate over the two signatures, which
    // dedups candidates WITHOUT the distinct()'s shuffle of the whole
    // candidate set.
    val firstMatch = bands.init.zipWithIndex.map { case ((sh, m), j) =>
      s"($j >= a.bi OR (shiftright(a.simhash, $sh) & ${m}L) != (shiftright(b.simhash, $sh) & ${m}L))"
    }.mkString(" AND ")
    banded.as("a").join(banded.as("b"),
        col("a.bi") === col("b.bi") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .filter(expr(firstMatch))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .filter(col("hamming") <= HAMMING_T)
      .orderBy("d1", "d2")
  }

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  /** Tokens + distinct shingle set, precomputed once per doc in a CTE chain. */
  private val docShinglesCte =
    s"""tk AS (SELECT doc_id, text, string_split($normSql, ' ') AS toks FROM documents),
       |base AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, greatest(len(toks) - ${W - 1}, 1)),
       |    i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh
       |  FROM tk)""".stripMargin

  private lazy val q56Oracle =
    s"""WITH $docShinglesCte,
       |blocked AS (
       |  SELECT doc_id, md5(substring($normSql, 1, 40)) AS blk, sh
       |  FROM base JOIN documents USING (doc_id))
       |SELECT a.doc_id AS d1, b.doc_id AS d2,
       |  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
       |FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
       |    len(list_distinct(list_concat(a.sh, b.sh))) >= $JACCARD_T
       |ORDER BY d1, d2""".stripMargin

  /** DuckDB mirror of the per-token bit extraction in q58. */
  private def bitSql(j: Int) =
    s"((strpos('0123456789abcdef', substring(h, ${j / 4 + 1}, 1)) - 1) >> ${3 - j % 4}) & 1"

  /** DuckDB mirror of [[simhashPairs]] at the same bit width. The 64-bit
    * sign-bit weight renders as the literal -9223372036854775808 (BIGINT in
    * DuckDB); band extraction masks after the shift exactly like the Spark
    * side, so shift signedness never leaks into a key.
    */
  private def simhashOracle(bits: Int): String = {
    val bands = bandDefs(bits)
    val sumCols = (0 until bits).map(j => s"sum(${bitSql(j)}) AS s$j").mkString(", ")
    val shExpr = (0 until bits).map { j =>
      s"CASE WHEN s$j * 2 >= n THEN CAST(${1L << (bits - 1 - j)} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    val bkCase = "CASE g.bi " + bands.zipWithIndex.map { case ((sh, m), j) =>
      s"WHEN $j THEN (simhash >> $sh) & $m" }.mkString(" ") + " END"
    s"""WITH tk AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
       |tok_rows AS (SELECT doc_id, md5(t.w) AS h FROM tk, unnest(toks) AS t(w)),
       |sums AS (SELECT doc_id, $sumCols, count(*) AS n FROM tok_rows GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($shExpr AS BIGINT) AS simhash FROM sums),
       |banded AS (
       |  SELECT doc_id, simhash, g.bi, $bkCase AS bk
       |  FROM sig, generate_series(0, ${bands.size - 1}) AS g(bi))
       |SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $HAMMING_T
       |ORDER BY d1, d2""".stripMargin
  }

  // Deliberately UNBLOCKED brute force (O(n²) is fine at oracle scale):
  // equality against it is what certifies the prefix-filter candidates
  // are recall-complete, not merely self-consistent.
  private lazy val q119Oracle =
    s"""WITH $docShinglesCte
       |SELECT d1, d2, inter, n1, n2, round(jac, 4) AS jaccard FROM (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       |    CAST(len(a.sh) AS BIGINT) AS n1, CAST(len(b.sh) AS BIGINT) AS n2,
       |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
       |  FROM base a JOIN base b ON a.doc_id < b.doc_id)
       |WHERE jac >= $JACCARD_T ORDER BY d1, d2""".stripMargin

  val oracles: Map[String, String] = Map(
    "q130_substring_dedup" ->
      s"""WITH tk AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents
         |           WHERE len(string_split($normSql, ' ')) >= $RUN_W),
         |g AS (SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(toks) - ${RUN_W - 1}),
         |    i -> struct_pack(pos := i - 1,
         |      g := md5(array_to_string(toks[i:i+${RUN_W - 1}], ' '))))) AS e
         |  FROM tk),
         |ge AS (SELECT doc_id, e.pos AS pos, e.g AS g FROM g),
         |m AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1,
         |        a.pos - b.pos AS diag
         |      FROM ge a JOIN ge b ON a.g = b.g AND a.doc_id < b.doc_id),
         |isl AS (SELECT d1, d2, diag,
         |          p1 - row_number() OVER (PARTITION BY d1, d2, diag ORDER BY p1) AS isl
         |        FROM m),
         |runs AS (SELECT d1, d2, count(*) + ${RUN_W - 1} AS run_len
         |         FROM isl GROUP BY d1, d2, diag, isl)
         |SELECT d1, d2, CAST(max(run_len) AS BIGINT) AS max_run,
         |  CAST(count(*) AS BIGINT) AS n_runs
         |FROM runs GROUP BY d1, d2 ORDER BY d1, d2""".stripMargin,

    "q119_setsim_join" -> q119Oracle,

    // LSH recall audited against the exact join (q69's ANN-recall pattern
    // applied to the dedup family): both sides verify the true Jaccard, so
    // precision is 1 by construction and RECALL is the number that justifies
    // the probabilistic path at scale.
    "q128_dedup_recall" ->
      s"""WITH ex AS ($q119Oracle),
         |lsh AS ($q57Oracle),
         |m AS (
         |  SELECT e.d1, e.d2,
         |    CASE WHEN l.d1 IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM ex e LEFT JOIN lsh l ON e.d1 = l.d1 AND e.d2 = l.d2)
         |SELECT CAST(count(*) AS BIGINT) AS n_exact,
         |  (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh,
         |  CAST(sum(hit) AS BIGINT) AS n_found,
         |  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS recall
         |FROM m""".stripMargin,
    "q70_repetition" ->
      s"""WITH tk AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         |raw AS (
         |  SELECT doc_id, list_transform(
         |    generate_series(1, greatest(len(toks) - ${W - 1}, 1)),
         |    i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS sh
         |  FROM tk)
         |SELECT doc_id, len(sh) AS n_tri, len(list_distinct(sh)) AS n_uniq,
         |  round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh), 4) AS rep_ratio,
         |  round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh), 4) > 0.2 AS flagged
         |FROM raw ORDER BY doc_id""".stripMargin,

    "q58_simhash" -> simhashOracle(64),
    "q58b_simhash32" -> simhashOracle(32),

    "q72_decontamination" -> {
      val joins = (0 until DECON_W).map(o => s"toks[i+$o]").mkString(", ")
      s"""WITH tk AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM documents),
         |sh AS (SELECT doc_id, list_distinct(list_transform(
         |  generate_series(1, greatest(len(toks) - ${DECON_W - 1}, 1)),
         |  i -> md5(concat_ws(' ', $joins)))) AS sh FROM tk),
         |grams AS (SELECT doc_id, unnest(sh) AS g FROM sh),
         |ev AS (SELECT doc_id AS eval_id, g FROM grams
         |       WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
         |tr AS (SELECT doc_id, g FROM grams
         |       WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0')
         |SELECT t.doc_id, CAST(count(DISTINCT t.g) AS BIGINT) AS n_overlap,
         |  CAST(count(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs
         |FROM tr t JOIN ev e ON t.g = e.g
         |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin
    },

    "q54_exact_dedup" ->
      s"""SELECT doc_id, fp_norm, min(doc_id) OVER (PARTITION BY fp_norm) AS keeper,
         |  doc_id <> min(doc_id) OVER (PARTITION BY fp_norm) AS is_dup
         |FROM (SELECT doc_id, md5($normSql) AS fp_norm FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "q55_prefix_dup_groups" ->
      s"""SELECT grp, min(doc_id) AS keeper, count(*) AS copies,
         |  array_to_string(list_sort(list(doc_id)), ',') AS members
         |FROM (SELECT doc_id, md5(substring($normSql, 1, 80)) AS grp FROM documents)
         |GROUP BY grp HAVING count(*) > 1 ORDER BY keeper""".stripMargin,

    "q56_ngram_jaccard" -> q56Oracle,

    "q107_bow_cosine" ->
      s"""WITH tf AS (
         |  SELECT doc_id, unnest(string_split($normSql, ' ')) AS term FROM documents),
         |tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM tf GROUP BY 1, 2),
         |nrm AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM tfc GROUP BY 1),
         |blk AS (SELECT doc_id, md5(substring($normSql, 1, 40)) AS b FROM documents),
         |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM blk a JOIN blk b
         |  ON a.b = b.b AND a.doc_id < b.doc_id),
         |dot AS (
         |  SELECT c.d1, c.d2, CAST(sum(t1.tf * t2.tf) AS BIGINT) AS dot
         |  FROM cand c JOIN tfc t1 ON t1.doc_id = c.d1
         |    JOIN tfc t2 ON t2.doc_id = c.d2 AND t2.term = t1.term
         |  GROUP BY c.d1, c.d2)
         |SELECT d.d1, d.d2, d.dot,
         |  round(CAST(d.dot AS DOUBLE) * CAST(d.dot AS DOUBLE)
         |    / (CAST(n1.n2 AS DOUBLE) * CAST(n2.n2 AS DOUBLE)), 6) AS cos2
         |FROM dot d JOIN nrm n1 ON n1.doc_id = d.d1 JOIN nrm n2 ON n2.doc_id = d.d2
         |WHERE CAST(d.dot AS DOUBLE) * CAST(d.dot AS DOUBLE)
         |    / (CAST(n1.n2 AS DOUBLE) * CAST(n2.n2 AS DOUBLE)) >= 0.5
         |ORDER BY d1, d2""".stripMargin,

    "q96_fuzzy_linkage" ->
      """WITH k AS (
        |  SELECT doc_id, substring(text, 1, 8) AS blk,
        |    substring(text, 1, 24) AS head
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        |FROM k a JOIN k b ON a.blk = b.blk AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.head, b.head) <= 8
        |ORDER BY id_a, id_b""".stripMargin,

    // Independent fixpoint cross-check: transitive closure via recursive
    // CTE, not label propagation.
    "q71_dup_clusters" ->
      s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($q56Oracle)),
         |bidir AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM bidir),
         |reach(id, dst) AS (
         |  SELECT a, b FROM bidir
         |  UNION
         |  SELECT r.id, e.b FROM reach r JOIN bidir e ON r.dst = e.a),
         |comp AS (
         |  SELECT n.id, least(n.id, min(r.dst)) AS keeper
         |  FROM nodes n JOIN reach r ON n.id = r.id GROUP BY n.id)
         |SELECT c.id AS doc_id, c.keeper, s.cluster_size, c.id <> c.keeper AS is_dup
         |FROM comp c JOIN (
         |  SELECT keeper, count(*) AS cluster_size FROM comp GROUP BY keeper) s
         |  USING (keeper)
         |ORDER BY doc_id""".stripMargin,

    "q57_minhash_lsh" -> q57Oracle,

    // q169: [[graft.sink.NearDupIngest]]'s exact MinHash algebra (w=3,
    // k=16, 4 bands of 4, est-Jaccard >= 0.5 ⇔ >= 8 matching positions)
    // over the corpus's FINAL mutated state — the feed-maintained index
    // must serve precisely this pair set.
    "q169_neardup_index_follow" -> q169Oracle,

    // q172: decisions from the feed-maintained index — transitive closure
    // via recursive CTE over the q169 final-state pair algebra (q71's
    // independent-fixpoint cross-check applied to the followed index).
    "q172_neardup_index_clusters" ->
      s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($q169Oracle)),
         |bidir AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |nodes AS (SELECT DISTINCT a AS id FROM bidir),
         |reach(id, dst) AS (
         |  SELECT a, b FROM bidir
         |  UNION
         |  SELECT r.id, e.b FROM reach r JOIN bidir e ON r.dst = e.a),
         |comp AS (
         |  SELECT n.id, least(n.id, min(r.dst)) AS keeper
         |  FROM nodes n JOIN reach r ON n.id = r.id GROUP BY n.id)
         |SELECT c.id AS doc_id, c.keeper, s.cluster_size, c.id <> c.keeper AS is_dup
         |FROM comp c JOIN (
         |  SELECT keeper, count(*) AS cluster_size FROM comp GROUP BY keeper) s
         |  USING (keeper)
         |ORDER BY doc_id""".stripMargin
  )

  /** q169/q172 shared corpus+index build, per JVM and KEYED BY SF DIR —
    * the q128 `prebuilt` discipline applied at warehouse grain: both
    * queries exercise the identical scripted mutation history (append
    * evens → bootstrap follow → append odds + morMerge %5 + deleteWhere
    * %7 → second follow), so the first toucher pays the build and the
    * sibling serves from the already-maintained index (its own surface —
    * pairs() vs clusters() — is what the oracle gates). The build is
    * deterministic per dir and IMMUTABLE once complete, so sharing cannot
    * leak state between runs; the dir key keeps sf0.001 smoke and sf0.01
    * verify apart. The temp root lives for the JVM (stable-path
    * discipline — never wiped mid-process).
    */
  private val q169Roots = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def q169Index(s: SparkSession, dir: String): graft.sink.NearDupIngest = {
    val root = q169Roots.computeIfAbsent(dir, { _ =>
      val whDir = java.nio.file.Files.createTempDirectory("graft-q169").toString
      val wh = new graft.sink.Warehouse(s, whDir)
      val ndi = new graft.sink.NearDupIngest(wh, "doc_id", "text")
      val docs = read(s, dir, "documents").select(col("doc_id"), col("text"))
      wh.append("corpus", docs.filter(col("doc_id") % 2 === 0),
        statsCols = Seq("doc_id"))
      ndi.followChanges("corpus") // bootstrap: whole snapshot as +I
      wh.append("corpus", docs.filter(col("doc_id") % 2 === 1),
        statsCols = Seq("doc_id"))
      wh.morMerge("corpus", docs.filter(col("doc_id") % 5 === 0)
        .withColumn("text", concat(col("text"), lit(" zebra zebra zebra"))),
        Seq("doc_id"))
      wh.deleteWhere("corpus", col("doc_id") % 7 === 0)
      ndi.followChanges("corpus")
      whDir
    })
    new graft.sink.NearDupIngest(new graft.sink.Warehouse(s, root), "doc_id", "text")
  }

  // q169/q172 shared: [[graft.sink.NearDupIngest]]'s exact MinHash algebra
  // (w=3, k=16, 4 bands of 4, est-Jaccard >= 0.5 <=> >= 8 matching
  // positions) over the corpus's FINAL mutated state — the feed-maintained
  // index must serve precisely this pair set.
  private lazy val q169Oracle =
    s"""WITH src AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0 THEN text || ' zebra zebra zebra'
         |         ELSE text END AS text
         |  FROM documents WHERE doc_id % 7 <> 0),
         |tk AS (SELECT doc_id, string_split($normSql, ' ') AS toks FROM src),
         |sh AS (SELECT doc_id, list_distinct(list_transform(
         |    generate_series(1, greatest(len(toks) - 2, 1)),
         |    i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh
         |  FROM tk),
         |sig AS (SELECT doc_id, list_transform(generate_series(0, 15),
         |    j -> list_min(list_transform(sh,
         |      h -> substring(md5(CAST((j // 4) AS VARCHAR) || ':' || h),
         |                     ((j % 4) * 8) + 1, 8)))) AS sig
         |  FROM sh),
         |bd AS (SELECT doc_id, g.b AS band_idx,
         |    md5(concat_ws('|', sig[g.b*4+1], sig[g.b*4+2],
         |                       sig[g.b*4+3], sig[g.b*4+4])) AS band_key
         |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b) g),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bd a JOIN bd b
         |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |      AND a.doc_id < b.doc_id),
         |v AS (SELECT c.d1, c.d2,
         |    len(list_filter(generate_series(1, 16),
         |      i -> s1.sig[i] = s2.sig[i])) AS n_match
         |  FROM cand c JOIN sig s1 ON s1.doc_id = c.d1
         |    JOIN sig s2 ON s2.doc_id = c.d2)
         |SELECT d1, d2, CAST(n_match AS BIGINT) AS n_match FROM v
         |WHERE n_match >= 8 ORDER BY d1, d2""".stripMargin

  private lazy val q57Oracle =
    s"""WITH $docShinglesCte,
       |sig AS (
       |  SELECT doc_id, sh,
       |    list_transform(generate_series(0, ${K - 1}),
       |      j -> list_min(list_transform(sh,
       |        h -> substring(md5(concat(j // $CHUNK, ':', h)), (j % $CHUNK) * 8 + 1, 8)))) AS sig
       |  FROM base),
       |banded AS (
       |  SELECT doc_id, sh, t.b AS band_idx,
       |    md5(concat_ws('|', t.b, sig[t.b*$R+1], sig[t.b*$R+2], sig[t.b*$R+3], sig[t.b*$R+4])) AS band_key
       |  FROM sig, generate_series(0, ${BANDS - 1}) AS t(b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.sh AS sh1, b.sh AS sh2
       |  FROM banded a JOIN banded b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |    AND a.doc_id < b.doc_id)
       |SELECT d1, d2,
       |  round(CAST(len(list_intersect(sh1, sh2)) AS DOUBLE) /
       |    len(list_distinct(list_concat(sh1, sh2))), 4) AS jaccard
       |FROM cand
       |WHERE CAST(len(list_intersect(sh1, sh2)) AS DOUBLE) /
       |    len(list_distinct(list_concat(sh1, sh2))) >= $JACCARD_T
       |ORDER BY d1, d2""".stripMargin
}
