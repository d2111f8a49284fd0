package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.functions.Graph

/** Connected components: the min-label fixpoint must be exact on shapes
  * that need multiple propagation rounds (chains) and must keep disjoint
  * components apart.
  */
class GraphSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))
  private def edges(es: (Long, Long)*) =
    spark.createDataFrame(es.map(e => Row(e._1, e._2)).asJava, schema)

  test("chain needs several rounds; disjoint components stay apart") {
    // chain 9-8-7-6-5 (min 5 must travel 4 hops), pair (1,2), triangle (10,11,12)
    val e = edges((9, 8), (8, 7), (7, 6), (6, 5), (1, 2), (10, 11), (11, 12), (12, 10))
    val comp = Graph.connectedComponents(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(5L, 6L, 7L, 8L, 9L).forall(comp(_) == 5L), s"chain: $comp")
    assert(comp(1L) == 1L && comp(2L) == 1L)
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L))
    assert(comp.size == 10)
  }

  test("star algorithm: path graph far deeper than maxIter converges in O(log n) rounds") {
    // a 200-deep path: propagation would need 200 rounds; large-star/
    // small-star contracts it within the default 25
    val path = edges((0L until 200L).map(i => (i, i + 1)): _*)
    val comp = Graph.connectedComponents(path, maxIter = 25, algorithm = "star")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 201)
    assert(comp.values.forall(_ == 0L), s"all 201 nodes must label 0")
    // and propagation on the same graph correctly refuses (diameter > maxIter)
    intercept[IllegalStateException] {
      Graph.connectedComponents(path, maxIter = 5, algorithm = "propagate")
    }
  }

  test("star and propagate agree on an arbitrary mixed graph") {
    val rnd = new scala.util.Random(42)
    // 120 nodes, 150 random edges: mixes cliques, chains, isolated-ish pairs
    val es = (0 until 150).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val e = edges(es: _*)
    val byStar = Graph.connectedComponents(e, maxIter = 25, algorithm = "star")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byProp = Graph.connectedComponents(e, maxIter = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byStar == byProp)
  }

  test("label propagation splits two cliques joined by one bridge edge") {
    // cliques {1..4} and {10..13}, bridged 4-10: CC sees ONE component,
    // LP's majority rule keeps the two dense groups distinct
    val c1 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val c2 = Seq((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L))
    val e = edges(c1 ++ c2 :+ ((4L, 10L)): _*)
    assert(Graph.connectedComponents(e).select("comp").distinct().count() == 1)
    val (labels, hist) = Graph.labelPropagation(e, maxRounds = 10)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g1 = Seq(1L, 2L, 3L, 4L).map(m).toSet
    val g2 = Seq(10L, 11L, 12L, 13L).map(m).toSet
    assert(g1.size == 1 && g2.size == 1, s"cliques must be uniform: $m")
    assert(g1 != g2, s"bridge must not merge the communities: $m")
    assert(hist.nonEmpty && hist.forall(_.changed >= 0))
  }

  test("label propagation is deterministic and stops at the round budget") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val e = edges(es: _*)
    val (l1, h1) = Graph.labelPropagation(e, maxRounds = 4)
    val (l2, h2) = Graph.labelPropagation(e, maxRounds = 4)
    assert(h1 == h2, "telemetry must be identical across runs")
    assert(l1.collect().map(_.toSeq).toSet == l2.collect().map(_.toSeq).toSet)
    assert(h1.size <= 4)
  }
}
