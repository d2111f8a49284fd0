package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.{ResourceDef, WriteMode}
import graft.schema.SchemaOps

import scala.jdk.CollectionConverters._

/** Streaming-consumer state: the per-(table, stream) batch-id ledger and
  * the exactly-once FILE ledger micro-batch ingestion rides on.
  *
  * One of [[Warehouse]]'s section traits — a pure textual split of the
  * original single file (unchanged public face, same `private[sink]`
  * surface); the self-type is the class itself, so every member reads as
  * before.
  */
private[sink] trait WarehouseStreamState { self: Warehouse =>

  // ------------------------------------------------------- streaming state --

  private def streamStatePath(name: String, streamId: String) =
    tableDir(name).resolve(s"_stream_$streamId")

  /** Highest micro-batch id already committed for `streamId` into `name`
    * (-1 if none) — the replay guard for foreachBatch sinks.
    */
  def lastCommittedBatchId(name: String, streamId: String): Long = {
    val p = streamStatePath(name, streamId)
    if (Files.exists(p)) Files.readString(p).trim.toLong else -1L
  }

  /** Record `batchId` as committed (atomic pointer swap, same protocol as the
    * snapshot pointer). Written AFTER the data commit: a crash inside the
    * two-write window re-applies at most one batch — harmless for the
    * idempotent merge/replace dispositions, at-least-once for append (the
    * same guarantee foreachBatch itself gives).
    */
  def recordBatchId(name: String, streamId: String, batchId: Long): Unit = {
    Files.createDirectories(tableDir(name))
    val tmp = tableDir(name).resolve(s"_stream_$streamId.tmp")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, streamStatePath(name, streamId), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Small STRING metadata sidecar beside a table (atomic pointer swap,
    * same protocol as [[recordBatchId]]): durable discovery state for
    * maintenance — e.g. a stream-maintained rollup records its fact table
    * and measure spec so [[Warehouse.maintain]] can repair it without the
    * maintainer process. Not part of any snapshot commit; overwrite-last-
    * wins, single-writer by the owning discipline.
    */
  def putTableMeta(name: String, key: String, value: String): Unit = {
    Files.createDirectories(tableDir(name))
    val tmp = tableDir(name).resolve(s"_meta_$key.tmp")
    Files.writeString(tmp, value)
    Files.move(tmp, tableDir(name).resolve(s"_meta_$key"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read a [[putTableMeta]] sidecar; None when never written. */
  def getTableMeta(name: String, key: String): Option[String] = {
    val p = tableDir(name).resolve(s"_meta_$key")
    if (Files.exists(p)) Some(Files.readString(p)) else None
  }

  private def streamFilesDir(name: String, streamId: String) =
    tableDir(name).resolve(s"_stream_files_$streamId")

  /** Segment-count threshold beyond which [[recordFiles]] folds the ledger
    * into one segment. 64 keeps reads at ≤64 small file opens while commits
    * stay O(batch) between compactions.
    */
  private val LedgerCompactSegments = 64

  private def ledgerSegments(name: String, streamId: String): Seq[Path] = {
    val dir = streamFilesDir(name, streamId)
    if (!Files.isDirectory(dir)) Nil
    else {
      val s = Files.list(dir)
      try s.iterator().asInstanceOf[java.util.Iterator[Path]].asScala
        .filter(_.getFileName.toString.startsWith("seg-")).toSeq
      finally s.close()
    }
  }

  /** Source files already loaded into `name` by `streamId` — the FILE-level
    * idempotence ledger for file-source streams. Unlike a batch-id
    * high-watermark, file identity survives checkpoint loss (a rebuilt
    * checkpoint renumbers batches from 0 but redelivers the same paths).
    * Stored as the UNION of append-only segment files, so reads tolerate
    * duplicate entries across segments. Metadata scale: O(#source files),
    * the same order as the manifest.
    */
  def loadedFiles(name: String, streamId: String): Set[String] =
    ledgerSegments(name, streamId)
      .flatMap(p => Files.readString(p).linesIterator.filter(_.nonEmpty)).toSet

  /** Record one batch's `files` in the loaded-files ledger by APPENDING a
    * new segment — O(batch), not O(total files) (a long-lived stream
    * rewriting the full ledger per micro-batch is cumulatively quadratic).
    * Called AFTER the data commit: a crash in the window re-applies at most
    * one batch's unrecorded files.
    *
    * When segments exceed [[LedgerCompactSegments]] the ledger is folded:
    * the merged set is written as a fresh segment FIRST, then the old
    * segments are removed — a crash mid-fold only leaves duplicate entries,
    * which the set union in [[loadedFiles]] absorbs. Safe because
    * foreachBatch serializes the stream's commits (single writer per
    * streamId).
    */
  def recordFiles(name: String, streamId: String, files: Seq[String]): Unit = {
    val dir = streamFilesDir(name, streamId)
    Files.createDirectories(dir)
    def writeSegment(lines: Seq[String]): Unit = {
      val id = java.util.UUID.randomUUID().toString.take(12)
      val tmp = dir.resolve(s".seg-$id.tmp")
      Files.writeString(tmp, lines.mkString("\n"))
      Files.move(tmp, dir.resolve(s"seg-$id"), StandardCopyOption.ATOMIC_MOVE)
    }
    writeSegment(files.distinct.sorted)
    val segments = ledgerSegments(name, streamId)
    if (segments.size > LedgerCompactSegments) {
      writeSegment(loadedFiles(name, streamId).toSeq.sorted)
      segments.foreach(Files.deleteIfExists(_))
    }
  }

  /** Dispatch on a resource's declared disposition (I6), collecting per-file
    * stats on the resource's PKs (+ replication key) AND range-clustering
    * each batch on its keys — unclustered batch files all span the full key
    * range, making every stat bound vacuous; clustered ones are disjoint,
    * so later merges and predicate file skipping actually prune. One extra
    * batch-sized shuffle per micro-batch buys O(matching files) IO on every
    * subsequent merge/scan of a 100 TB table.
    */
  def write(res: ResourceDef, df: DataFrame): Long = {
    val keys = (res.primaryKeys ++ res.replicationKey).filter(df.columns.contains)
    res.mode match {
      case WriteMode.Replace => replace(res.name, df, keys, clusterBy = keys)
      case WriteMode.Merge   => merge(res.name, df, res.primaryKeys, clusterBy = res.primaryKeys)
      case WriteMode.Append  => append(res.name, df, keys, clusterBy = keys)
    }
  }

  /** The staging face of [[transact]] — append-shaped writes only, because
    * only append-shaped commits are unconditionally rebase-safe (the
    * all-or-nothing guarantee must never meet a true OCC conflict mid-loop).
    * Each op writes its data files NOW (in per-txn attempt dirs, invisible
    * to readers) and stages manifest entries; the transaction's commit
    * point is the durable intent marker.
    */
  final class WarehouseTxn private[sink] (txnId: String) {
    private[sink] final class TxnDelta(val schema: StructType) {
      var files: Vector[DataFile] = Vector.empty
      var dels: Vector[DeleteFile] = Vector.empty
    }
    private[sink] val deltas =
      scala.collection.mutable.LinkedHashMap.empty[String, TxnDelta]
    private var opN = 0

    private def deltaFor(name: String, schema: StructType): TxnDelta =
      deltas.getOrElseUpdate(name, new TxnDelta(schema))

    /** Staged [[Warehouse.append]]; auto-creates the table (the create
      * itself is an ordinary empty-v0 commit, visible but contentless).
      */
    def append(name: String, df: DataFrame, statsCols: Seq[String] = Nil,
               clusterBy: Seq[String] = Nil): Unit = {
      if (!self.exists(name)) self.create(name, df.schema)
      val man = currentManifest(name)
      val spec = partitionSpec(name)
      val in = cluster(SchemaOps.conform(df, man.schema), clusterBy, spec)
      opN += 1
      val entries = writeData(name, in, man.schema, s"dtx$txnId-$opN",
        statsCols ++ clusterBy ++ spec ++ inheritedStatsCols(name, Some(man)),
        seq = 0L, spec = spec)
      deltaFor(name, man.schema).files ++= entries
    }

    /** Staged [[Warehouse.morMerge]] (one-commit merge-on-read upsert).
      * Staged deletes apply to PRE-transaction rows only: every entry of a
      * table lands at one sequence number, so this op's delete shields the
      * whole transaction's staged rows, not just its own batch.
      */
    def morMerge(name: String, df: DataFrame, pks: Seq[String],
                 clusterBy: Seq[String] = Nil): Unit = {
      if (pks.isEmpty || !pks.forall(df.columns.contains) ||
          !self.exists(name)) {
        append(name, df, pks.filter(df.columns.contains),
          clusterBy.filter(df.columns.contains))
        return
      }
      val man = currentManifest(name)
      val schema = man.schema
      val in = SchemaOps.conform(df, schema)
      val spec = partitionSpec(name)
      opN += 1
      val dataEntries = writeData(name, cluster(in, clusterBy, spec), schema,
        s"dtx$txnId-$opN",
        pks ++ clusterBy ++ spec ++ inheritedStatsCols(name, Some(man)),
        seq = 0L, spec = spec, sortedBy = clusterBy)
      val keySchema = StructType(schema.fields.filter(f => pks.contains(f.name)))
      val delEntries = writeData(name, in.select(pks.map(col): _*).distinct(),
        keySchema, s"deltx$txnId-$opN", pks, seq = 0L)
      val d = deltaFor(name, schema)
      d.files ++= dataEntries
      d.dels ++= delEntries.filter(_.rows > 0)
        .map(e => DeleteFile(e.path, e.rows, 0L, pks, e.stats))
    }

    /** Staged [[Warehouse.equalityDelete]]. */
    def equalityDelete(name: String, keys: DataFrame): Unit = {
      require(self.exists(name), s"no such table: $name")
      val man = currentManifest(name)
      val cols = keys.columns.toSeq
      require(cols.nonEmpty && cols.forall(man.schema.fieldNames.contains),
        s"delete key columns must be table columns: ${cols.mkString(",")}")
      val keySchema = StructType(man.schema.fields.filter(f => cols.contains(f.name)))
      opN += 1
      val entries = writeData(name, SchemaOps.conform(keys, keySchema).distinct(),
        keySchema, s"deltx$txnId-$opN", cols, seq = 0L)
      deltaFor(name, man.schema).dels ++= entries.filter(_.rows > 0)
        .map(e => DeleteFile(e.path, e.rows, 0L, cols, e.stats))
    }
  }
}
