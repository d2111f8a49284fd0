package graft.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.sink.Warehouse

/** SQL stored procedures — the Iceberg maintenance-procedures analog on
  * Spark 4's DSv2 `ProcedureCatalog` face:
  *
  * {{{
  * CALL graft.system.compact(tbl => 'events', target_mb => 256)
  * CALL graft.system.compact_files(tbl => 'idx')
  * CALL graft.system.compact_deletes(tbl => 'events')
  * CALL graft.system.expire_snapshots(tbl => 'events', keep_last => 5)
  * CALL graft.system.maintain(tbl => 'events')
  * CALL graft.system.expire_cdc_stages(tbl => 'events', older_than_ms => 0)
  * CALL graft.system.rewrite_manifests(tbl => 'events')
  * CALL graft.system.restore(tbl => 'events', version => 3)
  * CALL graft.system.create_tag(tbl => 'events', tag => 'audited')
  * CALL graft.system.drop_tag(tbl => 'events', tag => 'audited')
  * CALL graft.system.create_branch(tbl => 'events', branch => 'wap')
  * CALL graft.system.publish_branch(tbl => 'events', branch => 'wap')
  * CALL graft.system.drop_branch(tbl => 'events', branch => 'wap')
  * }}}
  *
  * Every procedure returns a one-row result scan describing what it did
  * (version after, action flags) — driver-materialized via [[LocalScan]],
  * the same vehicle as the `$files`/`$snapshots` metadata tables, because
  * a maintenance outcome is O(1) rows at any table size. Named and
  * positional arguments, defaults, and type coercion are Spark's: the
  * analyzer binds against [[ProcedureParameter]] declarations.
  *
  * (Maintenance actions never change query results — compaction is
  * content-preserving, expiry only drops history — so exposing them to SQL
  * operators costs nothing in isolation guarantees; each lands through the
  * same OCC commit protocol as every write.)
  */
private[catalog] object GraftProcedures {

  private def param(name: String, dt: DataType) =
    ProcedureParameter.in(name, dt).build()
  private def param(name: String, dt: DataType, default: String) =
    ProcedureParameter.in(name, dt).defaultValue(default).build()

  /** One registered procedure: parameter declarations, result schema, and
    * the warehouse action. `run` receives the bound arguments in
    * declaration order.
    */
  private final case class Proc(name: String, description: String,
      params: Array[ProcedureParameter], resultSchema: StructType,
      run: (Warehouse, InternalRow) => Seq[Row])

  private def str(in: InternalRow, i: Int): String = in.getUTF8String(i).toString

  private val procs: Seq[Proc] = Seq(
    Proc("compact",
      "bin-pack small data files (byte grain) into ~target_mb files; " +
        "content-preserving, one OCC commit",
      Array(param("tbl", StringType), param("target_mb", IntegerType, "128")),
      StructType(Seq(StructField("version", LongType),
        StructField("files_before", IntegerType), StructField("files_after", IntegerType))),
      (wh, in) => {
        val t = str(in, 0)
        val before = wh.currentManifest(t).files.size
        val v = wh.compact(t, in.getInt(1).toLong << 20)
        Seq(Row(v, before, wh.currentManifest(t).files.size))
      }),

    Proc("compact_files",
      "rewrite sub-threshold files by manifest ROW counts, re-clustering " +
        "partitioned tables by their transform values",
      Array(param("tbl", StringType), param("small_rows", LongType, "100000")),
      StructType(Seq(StructField("version", LongType),
        StructField("files_before", IntegerType), StructField("files_after", IntegerType))),
      (wh, in) => {
        val t = str(in, 0)
        val before = wh.currentManifest(t).files.size
        val v = wh.compactFiles(t, in.getLong(1))
        Seq(Row(v, before, wh.currentManifest(t).files.size))
      }),

    Proc("compact_deletes",
      "materialize pending merge-on-read delete files into their data files",
      Array(param("tbl", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("pending_deletes_before", IntegerType))),
      (wh, in) => {
        val t = str(in, 0)
        val before = wh.currentManifest(t).deletes.size
        Seq(Row(wh.compactDeletes(t), before))
      }),

    Proc("expire_snapshots",
      "drop snapshots beyond keep_last (tags protected; older_than_ms > 0 " +
        "additionally restricts to commits before that epoch instant) and " +
        "sweep unreferenced data files, segments and aged orphans",
      Array(param("tbl", StringType), param("keep_last", IntegerType, "10"),
        param("older_than_ms", LongType, "-1")),
      StructType(Seq(StructField("kept_snapshots", IntegerType))),
      (wh, in) => {
        val t = str(in, 0)
        wh.expireSnapshots(t, in.getInt(1),
          olderThanMillis = Some(in.getLong(2)).filter(_ > 0))
        Seq(Row(wh.history(t).size))
      }),

    Proc("maintain",
      "policy-driven maintenance off manifest-resident signals: compacts " +
        "deletes/files, expires snapshots, drains a stream-maintained " +
        "rollup's pending-extremes side table (from its recorded fact/spec " +
        "sidecars), and re-clusters followed-index family tables " +
        "(__bands/__sigs/__postings/__doclens/__codes) — exactly when " +
        "thresholds justify it",
      Array(param("tbl", StringType)),
      StructType(Seq(StructField("version", LongType),
        StructField("deletes_compacted", BooleanType),
        StructField("files_compacted", BooleanType),
        StructField("snapshots_expired", BooleanType),
        StructField("pending_drained", LongType),
        StructField("index_compacted", StringType))),
      (wh, in) => {
        val r = wh.maintain(str(in, 0))
        Seq(Row(r.version, r.deletesCompacted, r.filesCompacted, r.snapshotsExpired,
          r.pendingDrained, r.indexCompacted.mkString(",")))
      }),

    Proc("maintain_all",
      "policy sweep over EVERY table in the warehouse (maintain's " +
        "whole-catalog face) — one metadata-scale decision per table, one " +
        "result row per table; the scheduler entry point",
      Array.empty[ProcedureParameter],
      StructType(Seq(StructField("tbl", StringType),
        StructField("version", LongType),
        StructField("deletes_compacted", BooleanType),
        StructField("files_compacted", BooleanType),
        StructField("snapshots_expired", BooleanType),
        StructField("pending_drained", LongType),
        StructField("index_compacted", StringType))),
      (wh, _) => wh.maintainAll().map { case (t, r) =>
        Row(t, r.version, r.deletesCompacted, r.filesCompacted,
          r.snapshotsExpired, r.pendingDrained, r.indexCompacted.mkString(","))
      }),

    Proc("analyze",
      "one column-pruned pass computing per-column HLL distinct sketches + " +
        "null counts + length stats, stored beside the table and served to " +
        "CBO as DSv2 columnStats on every later scan; cols '' = all atomic",
      Array(param("tbl", StringType), param("cols", StringType, "''")),
      StructType(Seq(StructField("version", LongType),
        StructField("row_count", LongType), StructField("columns", IntegerType))),
      (wh, in) => {
        val cols = str(in, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val r = wh.analyzeTable(str(in, 0), cols)
        Seq(Row(r.version, r.rows, r.cols.size))
      }),

    Proc("analyze_incremental",
      "refresh stored column stats by UNIONING new files' HLL sketches " +
        "into the stored ones when the window since the last analyze is " +
        "append-only — O(new files), never a table rescan; falls back to " +
        "a full analyze when unprovable (incremental = false)",
      Array(param("tbl", StringType), param("cols", StringType, "''")),
      StructType(Seq(StructField("version", LongType),
        StructField("row_count", LongType), StructField("columns", IntegerType),
        StructField("scanned_files", IntegerType),
        StructField("incremental", BooleanType))),
      (wh, in) => {
        val cols = str(in, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val r = wh.analyzeIncremental(str(in, 0), cols)
        Seq(Row(r.stats.version, r.stats.rows, r.stats.cols.size,
          r.scannedFiles, r.incremental))
      }),

    Proc("build_bloom_index",
      "per-file Bloom sidecars for point-lookup file pruning on " +
        "high-cardinality unclustered keys; incremental — only files " +
        "missing a sidecar are scanned, so re-running after appends " +
        "indexes just the new batch",
      Array(param("tbl", StringType), param("cols", StringType),
        param("fpp", DoubleType, "0.01D")),
      StructType(Seq(StructField("sidecars_written", IntegerType))),
      (wh, in) => {
        val cols = str(in, 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        require(cols.nonEmpty, "build_bloom_index needs at least one column")
        Seq(Row(wh.buildBloomIndex(str(in, 0), cols, in.getDouble(2))))
      }),

    Proc("expire_cdc_stages",
      "sweep staged t$changes window dirs (and crashed stagers' tmp-*) " +
        "older than older_than_ms — the batch-only consumer's janitor " +
        "(streams sweep on offset commit, expire_snapshots backstops); a " +
        "swept window a reader still wants simply re-materializes",
      Array(param("tbl", StringType), param("older_than_ms", LongType, "86400000")),
      StructType(Seq(StructField("swept", IntegerType))),
      (wh, in) => {
        val t = str(in, 0)
        require(wh.exists(t), s"no such table: $t")
        Seq(Row(wh.expireCdcStages(t, in.getLong(1))))
      }),

    Proc("rewrite_manifests",
      "coalesce the snapshot's manifest segments into one (metadata-only, " +
        "zero data IO) — the explicit handle on the automatic segment budget",
      Array(param("tbl", StringType)),
      StructType(Seq(StructField("version", LongType))),
      (wh, in) => Seq(Row(wh.rewriteManifests(str(in, 0))))),

    Proc("restore",
      "commit a NEW snapshot pointing at an older version's file list " +
        "(rollback without erasing history)",
      Array(param("tbl", StringType), param("version", LongType)),
      StructType(Seq(StructField("version", LongType))),
      (wh, in) => Seq(Row(wh.restore(str(in, 0), in.getLong(1))))),

    Proc("create_tag",
      "pin a snapshot under a named tag (protected from expiry); " +
        "version -1 = current",
      Array(param("tbl", StringType), param("tag", StringType),
        param("version", LongType, "-1")),
      StructType(Seq(StructField("tagged_version", LongType))),
      (wh, in) => Seq(Row(wh.tagSnapshot(str(in, 0), str(in, 1), in.getLong(2))))),

    Proc("drop_tag",
      "release a tag (its snapshot becomes expirable)",
      Array(param("tbl", StringType), param("tag", StringType)),
      StructType(Seq(StructField("dropped", BooleanType))),
      (wh, in) => Seq(Row(wh.dropTag(str(in, 0), str(in, 1))))),

    Proc("create_branch",
      "fork a writable branch ledger (`tbl@branch`) from a committed " +
        "snapshot — hard-linked fork manifest, zero data IO; version -1 = current",
      Array(param("tbl", StringType), param("branch", StringType),
        param("version", LongType, "-1")),
      StructType(Seq(StructField("branch_version", LongType),
        StructField("fork_version", LongType))),
      (wh, in) => {
        val (t, b) = (str(in, 0), str(in, 1))
        val bv = wh.createBranch(t, b, in.getLong(2))
        Seq(Row(bv, wh.forkVersion(t, b)))
      }),

    Proc("publish_branch",
      "fast-forward main to the branch head in ONE atomic commit " +
        "(refuses loudly if main advanced since the fork — that is a merge)",
      Array(param("tbl", StringType), param("branch", StringType)),
      StructType(Seq(StructField("version", LongType))),
      (wh, in) => Seq(Row(wh.publishBranch(str(in, 0), str(in, 1))))),

    Proc("drop_branch",
      "abandon a branch: its ledger goes; branch-only files become " +
        "orphans the next expire_snapshots reclaims",
      Array(param("tbl", StringType), param("branch", StringType)),
      StructType(Seq(StructField("dropped", BooleanType))),
      (wh, in) => Seq(Row(wh.dropBranch(str(in, 0), str(in, 1)))))
  )

  private val byName: Map[String, Proc] = procs.map(p => p.name -> p).toMap

  val Namespace: Array[String] = Array("system")

  def list(): Array[Identifier] =
    procs.map(p => Identifier.of(Namespace, p.name)).toArray

  def load(name: String, root: String): Option[UnboundProcedure] =
    byName.get(name).map { p =>
      new UnboundProcedure {
        override def name(): String = p.name
        override def description(): String = p.description
        override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
          override def name(): String = p.name
          override def description(): String = p.description
          override def parameters(): Array[ProcedureParameter] = p.params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): util.Iterator[Scan] = {
            val wh = new Warehouse(SparkSession.active, root)
            val rows = p.run(wh, input)
            val conv = CatalystTypeConverters.createToCatalystConverter(p.resultSchema)
            val data = rows.map(r => conv(r).asInstanceOf[InternalRow]).toArray
            val scan: Scan = new LocalScan {
              override def rows(): Array[InternalRow] = data
              override def readSchema(): StructType = p.resultSchema
            }
            util.Collections.singletonList(scan).iterator()
          }
        }
      }
    }
}
