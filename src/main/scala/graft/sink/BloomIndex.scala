package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom sidecars for POINT-LOOKUP file pruning — the missing
  * piece when min/max stats can't prune ([[graft.catalog.ManifestPruneRule]]
  * consults them for `=` / `IN` conjuncts).
  *
  * The 100 TB shape: `WHERE id = '<uuid>'` on a HIGH-CARDINALITY key the
  * table is NOT clustered by. Every file's (min, max) spans ~the whole key
  * domain, so range stats keep every file and the "point lookup" scans the
  * table. A per-file Bloom filter of the key column answers "might this
  * file contain this exact value?" from O(files) driver-side metadata —
  * no false negatives, so pruning on a miss is exact (Iceberg's parquet
  * bloom / puffin analog, lifted from row-group grain to FILE grain so
  * non-matching files aren't even opened).
  *
  * Design invariants:
  *   - '''Sidecars are derived, optional metadata.''' One per (data file,
  *     column), stored NEXT to the data file (`<file>.bloom.<colB64>`), so
  *     compaction/expiry sweeps them with their file. A missing sidecar
  *     just means "can't prune" — partial indexes, crashed builds, and
  *     pre-index files are all correct by construction.
  *   - '''Incremental by immutability.''' Data files never change, so
  *     [[Warehouse.buildBloomIndex]] only scans files whose sidecar is
  *     missing — re-running after each append indexes the new batch only.
  *   - '''One hash domain.''' Filters are built from `xxhash64(col)` on the
  *     executors (the layout Spark's own runtime bloom filters use) and
  *     probed driver-side with the identical [[XxHash64]] of the predicate
  *     literal — same type, same seed, same bytes.
  */
object BloomIndex {

  /** Sidecar path for one (data file, column). The column rides URL-safe
    * base64 so arbitrary names can't corrupt the file name.
    */
  def sidecar(dataFileAbs: String, col: String): Path =
    Paths.get(dataFileAbs + ".bloom." +
      java.util.Base64.getUrlEncoder.withoutPadding
        .encodeToString(col.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Driver-side sidecar cache. Data files are immutable and sidecar writes
    * are atomic, so a loaded filter never goes stale; a cached MISS can go
    * stale when an index is built later in the same JVM, so
    * [[invalidate]] clears on every build. Bounded: evicts wholesale past
    * `MaxEntries` (point lookups touch few files; a full-table probe of a
    * million-file table must not pin GBs of filters).
    */
  private val MaxEntries = 256
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[BloomFilter]]()

  private[sink] def invalidate(): Unit = cache.clear()

  private def load(p: Path): Option[BloomFilter] = {
    val key = p.toString
    val hit = cache.get(key)
    if (hit != null) return hit
    val v =
      if (!Files.exists(p)) None
      else try {
        val in = Files.newInputStream(p)
        try Some(BloomFilter.readFrom(in)) finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None } // unreadable: never prune
    if (cache.size >= MaxEntries) cache.clear()
    cache.putIfAbsent(key, v)
    v
  }

  /** xxhash64 (seed 42, Spark's default) of a predicate literal — the
    * driver-side twin of the executor-side `xxhash64(col)` the build used.
    * None = this type can't be hashed (caller must not prune).
    */
  def hashLiteral(l: Literal): Option[Long] =
    try Some(XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long])
    catch { case scala.util.control.NonFatal(_) => None }

  /** May `dataFileAbs` contain a row whose `col` equals the value hashed as
    * `h`? Missing/unreadable sidecar → true (can't prune).
    */
  def mightContain(dataFileAbs: String, col: String, h: Long): Boolean =
    load(sidecar(dataFileAbs, col)).forall(_.mightContainLong(h))

  /** True when a sidecar exists for (file, col) — test/introspection hook. */
  def exists(dataFileAbs: String, col: String): Boolean =
    Files.exists(sidecar(dataFileAbs, col))

  private[sink] def writeSidecar(dataFileAbs: String, col: String,
                                 bytes: Array[Byte]): Unit = {
    val target = sidecar(dataFileAbs, col)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
