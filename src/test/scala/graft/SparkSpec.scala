package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide session, lazy). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Match Verify/Bench: a col(...) that names a sibling alias in the same
    // select fails analysis instead of silently binding to it (q75 class).
    .config("spark.sql.lateralColumnAlias.enableImplicitResolution", "false")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  lazy val sf = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** File count of the pruned warehouse scan in `q`'s EXECUTED plan — the
    * GraftTable name carries a `[k files]` label only when file pruning
    * fired (logical catalog relations print the catalog identifier
    * instead, so only the executed plan shows it). Falls back to `total`
    * when no label is present.
    */
  def scannedFiles(q: org.apache.spark.sql.DataFrame, total: Int): Int = {
    val s = q.queryExecution.executedPlan.toString
    "\\[(\\d+) files\\]".r.findFirstMatchIn(s).map(_.group(1).toInt).getOrElse(total)
  }
}
