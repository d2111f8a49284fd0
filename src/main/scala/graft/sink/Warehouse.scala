package graft.sink

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{ResourceDef, WriteMode}
import graft.schema.SchemaOps

/** Load side of the engine: a snapshot-versioned parquet warehouse standing in
  * for the reference's Iceberg REST catalog + three write dispositions
  * (`salesforce_pipeline.py:62-176`; SURVEY.md §2.1 S5-S9, §2.3 J1).
  *
  * No Iceberg runtime jar ships in this environment (SURVEY §7.6.1), so table
  * semantics are emulated the way Iceberg itself does it — immutable snapshot
  * directories plus an atomically-swapped current-version pointer:
  *
  *   warehouse/<table>/v=<n>/part-*.parquet   immutable snapshot data
  *   warehouse/<table>/_current               pointer file containing <n>
  *
  * Every disposition writes a NEW snapshot dir and then swaps the pointer —
  * readers of the old snapshot are never disturbed, and the read-modify-write
  * cycle of merge/replace never overwrites files it is lazily reading (the
  * classic parquet self-overwrite trap). Single-writer, like the reference
  * (`README.md:269-277`); a real Iceberg catalog would add OCC retries here.
  * The `Warehouse` API is deliberately thin so `spark.writeTo(...)` against a
  * real Iceberg catalog can drop in (SURVEY §7.6.1).
  */
final class Warehouse(spark: SparkSession, root: String) {

  private def tableDir(name: String) = Paths.get(root, name)
  private def pointer(name: String) = tableDir(name).resolve("_current")

  /** S6 existence probe. */
  def exists(name: String): Boolean = Files.exists(pointer(name))

  /** S12 catalog listing. */
  def listTables(): Seq[String] =
    if (!Files.exists(Paths.get(root))) Nil
    else {
      val s = Files.list(Paths.get(root))
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.filter(p => Files.exists(p.resolve("_current")))
        .map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }

  def currentVersion(name: String): Long =
    if (!exists(name)) -1L else Files.readString(pointer(name)).trim.toLong

  /** S11 full-table scan of the current snapshot. */
  def load(name: String): DataFrame = loadVersion(name, currentVersion(name))

  /** Time travel: scan a specific committed snapshot (snapshots are
    * immutable, so any version ever committed stays readable — the Iceberg
    * `VERSION AS OF` analog).
    */
  def loadVersion(name: String, version: Long): DataFrame = {
    require(version >= 0 && Files.exists(tableDir(name).resolve(s"v=$version")),
      s"no such snapshot: $name v=$version")
    spark.read.parquet(tableDir(name).resolve(s"v=$version").toString)
  }

  /** All committed snapshot versions of a table, oldest first. */
  def history(name: String): Seq[Long] =
    if (!Files.exists(tableDir(name))) Nil
    else {
      val s = Files.list(tableDir(name))
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v=")).map(_.stripPrefix("v=").toLong).toSeq.sorted
      finally s.close()
    }

  /** Commit `df` as the next snapshot of `name` and swap the pointer.
    * ATOMIC_MOVE on the pointer file ≈ Iceberg's catalog commit.
    */
  private def commit(name: String, df: DataFrame): Long = {
    val next = currentVersion(name) + 1
    Files.createDirectories(tableDir(name))
    df.write.mode("overwrite").parquet(tableDir(name).resolve(s"v=$next").toString)
    val tmp = tableDir(name).resolve(s"_current.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Conform incoming data to the existing table schema — target schema wins,
    * extras dropped, missing null-filled (`salesforce_pipeline.py:153-174`).
    * On first write the table is auto-created (S7) with the widened schema
    * (§1.3 lattice).
    */
  private def conformed(name: String, df: DataFrame): DataFrame =
    if (exists(name)) SchemaOps.conform(df, load(name).schema)
    else SchemaOps.conform(df, SchemaOps.widenSchema(df.schema))

  /** S8 append disposition: union with current snapshot. */
  def append(name: String, df: DataFrame): Long = {
    val in = conformed(name, df)
    commit(name, if (exists(name)) load(name).unionByName(in) else in)
  }

  /** P8 replace disposition: delete-all (`AlwaysTrue()`,
    * `salesforce_pipeline.py:79-81`) then append ⇒ the new snapshot IS the
    * incoming batch.
    */
  def replace(name: String, df: DataFrame): Long = commit(name, conformed(name, df))

  /** J1 merge disposition: delete target rows whose PK tuple appears in the
    * incoming batch, then append the WHOLE batch (duplicate PKs included —
    * preserving the reference's delete-then-append-all semantics,
    * `salesforce_pipeline.py:108-130, 176`; see `mergeLatest` for the
    * dedup-by-latest variant, SURVEY §7.6.2).
    *
    * The reference builds an O(n) OR-of-equalities delete predicate
    * (`salesforce_pipeline.py:121-130`) — its scaling cliff. Here the delete
    * set is a broadcast LEFT ANTI join on the distinct incoming PK tuples:
    * at 100 TB the target side streams through executors while the batch keys
    * stay a broadcast hash table; no predicate tree, no driver materialization.
    * Plain (non-null-safe) equality keeps the reference's null-PK contract:
    * null-keyed rows are appended but never match/delete (SURVEY §7.6.4).
    */
  def merge(name: String, df: DataFrame, pks: Seq[String]): Long = {
    // PK-presence guard: fall back to append, like `salesforce_pipeline.py:131-134`.
    if (pks.isEmpty || !pks.forall(df.columns.contains) || !exists(name))
      return append(name, df)
    val in = conformed(name, df)
    val keys = in.select(pks.map(col): _*).distinct()
    val kept = load(name).join(broadcast(keys), pks, "left_anti")
    commit(name, kept.unionByName(in))
  }

  /** Engine variant of merge: when one batch carries several versions of a PK,
    * keep only the latest by `orderCol` (row_number over PK partition) — the
    * semantically intended behavior given the reference's `ORDER BY rk ASC`
    * extraction (SURVEY §2.5, §7.6.2). Documented divergence from `merge`.
    */
  def mergeLatest(name: String, df: DataFrame, pks: Seq[String], orderCol: String): Long = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(pks.map(col): _*).orderBy(col(orderCol).desc)
    val latest = df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
    merge(name, latest, pks)
  }

  /** Dispatch on a resource's declared disposition (I6). */
  def write(res: ResourceDef, df: DataFrame): Long = res.mode match {
    case WriteMode.Replace => replace(res.name, df)
    case WriteMode.Merge   => merge(res.name, df, res.primaryKeys)
    case WriteMode.Append  => append(res.name, df)
  }
}
