package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.functions.Graph

/** PageRank contract: matches an independent in-memory power iteration
  * (same dangling-redistribution model) to tight tolerance, conserves rank
  * mass every run, contracts geometrically, and — the decimal-arithmetic
  * point — produces BIT-IDENTICAL ranks under different partitionings.
  */
class PageRankSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def edgeDf(edges: Seq[(Long, Long)], parts: Int = 1) = {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    spark.createDataFrame(edges.map(e => Row(e._1, e._2)).asJava, schema)
      .repartition(parts)
  }

  /** Reference power iteration in doubles with uniform dangling spread. */
  private def refPageRank(edges: Seq[(Long, Long)], d: Double, iters: Int)
    : Map[Long, Double] = {
    val simple = edges.filter(e => e._1 != e._2).distinct
    val nodes = simple.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = simple.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(r).sum
      val in = simple.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s).size }.sum).toMap
      r = nodes.map(v =>
        v -> ((1 - d) / n + d * (in.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  // chain into a cycle + a dangling sink + a hub: exercises in-degree
  // asymmetry, dangling mass, and multi-path accumulation
  private val graph: Seq[(Long, Long)] = Seq(
    1L -> 2L, 2L -> 3L, 3L -> 1L, // cycle
    1L -> 4L, 2L -> 4L, 3L -> 4L, // hub feeding the sink
    4L -> 5L)                     // 5 is dangling

  test("matches the reference power iteration (dangling model included)") {
    val (ranks, hist) = Graph.pageRank(edgeDf(graph), maxIter = 60, tol = 1e-12)
    val got = ranks.collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    val ref = refPageRank(graph, 0.85, 200)
    got.foreach { case (id, v) =>
      assert(math.abs(v - ref(id)) < 1e-9, s"node $id: $v vs ${ref(id)}")
    }
    assert(hist.nonEmpty && hist.last.l1Delta <= 1e-12)
  }

  test("rank mass is conserved every run (sums to 1)") {
    val (ranks, _) = Graph.pageRank(edgeDf(graph), maxIter = 25, tol = 1e-10)
    val total = ranks.agg(org.apache.spark.sql.functions.sum("rank"))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(total - 1.0) < 1e-9, s"mass drifted: $total")
  }

  test("bit-identical ranks under 1-way vs 7-way partitioning") {
    val (r1, h1) = Graph.pageRank(edgeDf(graph, 1), maxIter = 20, tol = 1e-10)
    val (r7, h7) = Graph.pageRank(edgeDf(graph, 7), maxIter = 20, tol = 1e-10)
    val m1 = r1.collect().map(r => r.getLong(0) -> r.getDecimal(1).toPlainString).toMap
    val m7 = r7.collect().map(r => r.getLong(0) -> r.getDecimal(1).toPlainString).toMap
    assert(m1 == m7, "decimal ranks must not depend on partitioning")
    assert(h1.map(_.l1Delta) == h7.map(_.l1Delta))
  }

  test("L1 delta contracts (geometric convergence witness)") {
    val (_, hist) = Graph.pageRank(edgeDf(graph), maxIter = 15, tol = 0.0)
    hist.map(_.l1Delta).sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-15, s"delta grew: $a -> $b")
      case _         =>
    }
  }

  test("in-degree dominance: the hub outranks cycle members, cycle outranks nothing-in") {
    val (ranks, _) = Graph.pageRank(edgeDf(graph), maxIter = 40, tol = 1e-12)
    val m = ranks.collect().map(r => r.getLong(0) -> r.getDecimal(1).doubleValue()).toMap
    assert(m(4L) > m(1L), "hub (3 in-edges) must outrank a cycle node")
    assert(m(5L) > 0 && m.values.forall(_ > 0), "every node keeps teleport mass")
  }
}
