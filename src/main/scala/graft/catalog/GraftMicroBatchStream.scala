package graft.catalog

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sink.Warehouse

/** A stream offset IS a snapshot version: the warehouse ledger is already a
  * totally-ordered, durable, replayable log of commits, so the streaming
  * contract (deterministic `(start, end]` batches, replay after restart)
  * falls out of manifest immutability — no extra state beyond Spark's own
  * offset log.
  */
private[catalog] final case class VersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Structured-Streaming micro-batch read of a warehouse table — the Iceberg
  * streaming-source analog: `spark.readStream.table("cat.t")`.
  *
  * Each micro-batch `(start, end]` delivers exactly the data files ADDED by
  * the commits in that version window (manifests share unchanged files by
  * path, so the diff is O(changed files), zero data IO to plan). Appends are
  * the only commit kind a row-append stream can represent, so a commit that
  * removes files (compaction, merge, delete) or adds merge-on-read delete
  * entries REFUSES loudly by default — the exact row-level +I/-D consumer is
  * [[graft.streaming.ChangeFeedStream]]; `stream-skip-changes=true` instead
  * skips non-append commits entirely (Iceberg's skip-overwrite/delete
  * options). `stream-start-version` picks the first delivered commit
  * (default 0 = full history; `latest` = only commits after stream start).
  *
  * Exactly-once: offsets are snapshot versions in Spark's checkpoint offset
  * log, and a version window's file set is immutable, so a restarted query
  * re-plans the SAME batch and never double-delivers. Reading reuses the
  * planned [[GraftParquetScan]]'s reader factory, so column pruning and
  * pushed data filters behave exactly as the batch path. Requires the
  * consumed snapshots to stay unexpired (keepLast covers it; a feed this
  * hot is consumed far inside any retention window).
  */
final class GraftMicroBatchStream(table: String, root: String,
    scan: GraftParquetScan, options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def spark = SparkSession.active
  private def wh = new Warehouse(spark, root)

  private val skipChanges: Boolean =
    Option(options.get("stream-skip-changes")).exists(_.toBoolean)
  private lazy val startVersion: Long = Option(options.get("stream-start-version")) match {
    case Some("latest") => wh.currentVersion(table) + 1
    case Some(s)        => s.toLong
    case None           => 0L
  }

  override def initialOffset(): Offset = VersionOffset(startVersion - 1)
  override def latestOffset(): Offset =
    VersionOffset(math.max(wh.currentVersion(table), startVersion - 1))

  // ---- admission control (stream-max-files-per-trigger): without it, the
  // first trigger on a grown table would deliver the ENTIRE history as one
  // micro-batch — at 100 TB a non-starter. With it, the backlog drains in
  // bounded windows: the end offset advances commit by commit until the
  // next commit would exceed the file budget (a single over-budget commit
  // still delivers whole — commits are the atomic unit, and progress beats
  // the cap). Same semantics as the file-source/Iceberg option.

  override def getDefaultReadLimit: ReadLimit =
    Option(options.get("stream-max-files-per-trigger")) match {
      case Some(n) => ReadLimit.maxFiles(n.toInt)
      case None    => ReadLimit.allAvailable()
    }

  override def reportLatestOffset(): Offset = latestOffset()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = math.max(wh.currentVersion(table), startVersion - 1)
    val s = start.asInstanceOf[VersionOffset].v
    limit match {
      case m: ReadMaxFiles =>
        var e = s
        var files = 0
        var full = false
        while (!full && e < head) {
          val c = addedFiles(e, e + 1).size // metadata-only: manifest diff
          if (files > 0 && files + c > m.maxFiles()) full = true
          else { files += c; e += 1 }
        }
        VersionOffset(e)
      case _ => VersionOffset(head)
    }
  }
  override def deserializeOffset(json: String): Offset = VersionOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** Absolute paths + manifest entries of the files commits `(start, end]`
    * added. O(changed files) per window: manifests share unchanged entries.
    */
  private def addedFiles(start: Long, end: Long): Seq[String] = {
    val w = wh
    (start + 1 to end).flatMap { v =>
      val cur = w.manifestAt(table, v)
      val prevFiles = if (v == 0) Nil else w.manifestAt(table, v - 1).files
      val prevDeletes = if (v == 0) Nil else w.manifestAt(table, v - 1).deletes
      val prevPaths = prevFiles.map(_.path).toSet
      val removed = prevPaths -- cur.files.map(_.path).toSet
      val newDeletes = cur.deletes.map(_.path).toSet -- prevDeletes.map(_.path).toSet
      if (removed.nonEmpty || newDeletes.nonEmpty) {
        if (!skipChanges) throw new IllegalStateException(
          s"streaming read of $table requires an append-only history, but v$v " +
            (if (removed.nonEmpty) s"removed ${removed.size} file(s) " else "") +
            (if (newDeletes.nonEmpty) s"added ${newDeletes.size} delete file(s) " else "") +
            "(compaction/merge/delete). Consume exact row-level +I/-D changes with " +
            s"spark.readStream.table(\"...`$table$$changes`\") (the CDC face; see also " +
            "ChangeFeedStream.mirror/maintainRollup), or set stream-skip-changes=true " +
            "to skip non-append commits (Iceberg's skip-overwrite semantics).")
        Nil
      } else cur.files.collect { case f if !prevPaths(f.path) => w.resolvePath(table, f.path) }
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    val pfs = addedFiles(s, e).map { p =>
      val len = java.nio.file.Files.size(java.nio.file.Paths.get(p))
      PartitionedFile(InternalRow.empty, SparkPath.fromPathString(p), 0, len,
        Array.empty, 0L, len)
    }
    FilePartition.getFilePartitions(spark, pfs,
      spark.sessionState.conf.filesMaxPartitionBytes).toArray
  }

  /** The planned batch scan's own factory: identical column pruning, pushed
    * parquet filters, and vectorization as a batch read of this table.
    */
  override def createReaderFactory(): PartitionReaderFactory = scan.createReaderFactory()
}
