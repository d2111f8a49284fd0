package graft.sink

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.Base64

import org.apache.spark.sql.types.{DataType, StructType}

/** Per-column min/max statistics of one data file.
  *
  * `kind` is the comparison domain the values live in:
  *   - `"s"` — string, compared lexicographically;
  *   - `"n"` — numeric (integers, floats, decimals; timestamps as epoch
  *     micros, dates as epoch days, booleans as 0/1), compared as BigDecimal;
  *   - `"z"` — the file has NO non-null value in this column (min/max empty).
  *
  * A column *absent* from a file's stats map is "unknown" — pruning must
  * assume the file may match. `"z"` is the opposite: under plain (non
  * null-safe) equality a null key never matches, so a `"z"` file is provably
  * disjoint from any key set on that column.
  */
final case class ColStat(kind: String, min: String, max: String)

/** One immutable data file of a table snapshot: path relative to the table
  * directory, its row count, and optional per-column stats used for merge
  * pruning (the engine analog of Iceberg's per-file `lower_bounds` /
  * `upper_bounds` manifest entries).
  *
  * `seq` is the data sequence number — the snapshot version at which the
  * file entered the table (Iceberg v2 `data_sequence_number`). An equality
  * [[DeleteFile]] applies only to data files with a STRICTLY SMALLER seq,
  * so rows (re-)inserted after a delete are never retro-deleted. Files from
  * before the field existed read as seq 0 — "older than every delete",
  * which is exactly right.
  */
final case class DataFile(path: String, rows: Long, stats: Map[String, ColStat],
                          seq: Long = 0L)

/** One merge-on-read delete file (Iceberg v2 analog). Two kinds:
  *
  *   - `"eq"` (equality): a parquet file of key tuples over `cols`; a row
  *     of any data file with `seq < this.seq` is deleted when it equals
  *     some tuple on ALL of `cols` (plain equality — null keys never
  *     match, same contract as merge).
  *   - `"pos"` (positional): a parquet file of (data-file relative path,
  *     row index) pairs — Iceberg v2 position deletes; a row is deleted
  *     when its (file, ordinal) matches a pair. `cols` is empty; the
  *     file-path column's stat bounds let pruning skip whole data files.
  *
  * `stats` carries per-column min/max of the tuples so
  * [[Warehouse.compactDeletes]] can prove data files untouched.
  */
final case class DeleteFile(path: String, rows: Long, seq: Long,
                            cols: Seq[String], stats: Map[String, ColStat],
                            kind: String = "eq")

/** One table snapshot: the table schema plus the list of data files that make
  * up the snapshot, plus any pending equality-delete files (merge-on-read).
  * Snapshots share data files — an append's manifest references every prior
  * file plus the new batch's files, which is what makes an incremental
  * commit O(batch) instead of O(table) (reference: the PyIceberg sink
  * appends data files + metadata per run and never rewrites the table,
  * `salesforce_pipeline.py:176`).
  */
final case class Manifest(schema: StructType, files: Seq[DataFile],
                          deletes: Seq[DeleteFile] = Nil)

/** Text serialization of a [[Manifest]]:
  *
  * {{{
  * graft-manifest v1
  * <schema json, one line>
  * <relpath>\t<rows>\t<colB64>:<kind>:<minB64>:<maxB64> <colB64>:... ...[\t<seq>]
  * D\t<relpath>\t<rows>\t<seq>\t<colB64>,<colB64>...\t<stats as above>
  * }}}
  *
  * Column names and stat values are base64-encoded so arbitrary key values
  * (tabs, colons, newlines) can never corrupt the framing. Data-file lines
  * written before the `seq` field existed have 3 fields and read as seq 0.
  * Written atomically (tmp + ATOMIC_MOVE) like every other piece of
  * warehouse metadata.
  */
object Manifest {
  private val Header = "graft-manifest v1"

  private def b64(s: String) =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String) =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  private def statsStr(stats: Map[String, ColStat]): String =
    stats.toSeq.sortBy(_._1).map { case (c, st) =>
      if (st.kind == "z") s"${b64(c)}:z::"
      else s"${b64(c)}:${st.kind}:${b64(st.min)}:${b64(st.max)}"
    }.mkString(" ")

  private def parseStats(s: String): Map[String, ColStat] =
    if (s.isEmpty) Map.empty
    else s.split(' ').iterator.map { tok =>
      val f = tok.split(":", -1)
      unb64(f(0)) -> (if (f(1) == "z") ColStat("z", "", "")
                      else ColStat(f(1), unb64(f(2)), unb64(f(3))))
    }.toMap

  def write(target: Path, m: Manifest): Unit = {
    val sb = new StringBuilder
    sb.append(Header).append('\n')
    sb.append(m.schema.json).append('\n')
    m.files.foreach { f =>
      sb.append(f.path).append('\t').append(f.rows).append('\t')
        .append(statsStr(f.stats)).append('\t').append(f.seq).append('\n')
    }
    m.deletes.foreach { d =>
      sb.append("D\t").append(d.path).append('\t').append(d.rows).append('\t')
        .append(d.seq).append('\t').append(d.cols.map(b64).mkString(","))
        .append('\t').append(statsStr(d.stats)).append('\t').append(d.kind).append('\n')
    }
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, sb.toString)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def read(source: Path): Manifest = {
    val lines = Files.readAllLines(source)
    require(lines.size() >= 2 && lines.get(0) == Header, s"not a graft manifest: $source")
    val schema = DataType.fromJson(lines.get(1)).asInstanceOf[StructType]
    val entries = (2 until lines.size()).iterator.map(lines.get).filter(_.nonEmpty).toSeq
    val (delLines, dataLines) = entries.partition(_.startsWith("D\t"))
    val files = dataLines.map { l =>
      val parts = l.split('\t')
      val stats = if (parts.length < 3) Map.empty[String, ColStat] else parseStats(parts(2))
      val seq = if (parts.length < 4) 0L else parts(3).toLong
      DataFile(parts(0), parts(1).toLong, stats, seq)
    }
    val deletes = delLines.map { l =>
      val parts = l.split('\t')
      DeleteFile(parts(1), parts(2).toLong, parts(3).toLong,
        if (parts(4).isEmpty) Nil else parts(4).split(',').toSeq.map(unb64),
        if (parts.length < 6) Map.empty else parseStats(parts(5)),
        // lines written before the kind field existed are equality deletes
        if (parts.length < 7) "eq" else parts(6))
    }
    Manifest(schema, files, deletes)
  }
}
