package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the step that turns near-dup PAIRS (MinHash/SimHash/Jaccard candidates)
  * into dedup DECISIONS: every document labeled with its cluster's minimum
  * id, one keeper per cluster.
  *
  * Each round is one shuffle join + aggregate (each node adopts the
  * smallest label among itself and its neighbors); the fixpoint — reached
  * in at most graph-diameter rounds, and dup clusters are shallow — is the
  * unique minimum-id labeling, so the result is deterministic regardless of
  * partitioning or join order. The driver loop only controls CONVERGENCE
  * (a changed-row count per round); no row data ever reaches the driver.
  *
  * 100 TB posture: rounds = O(diameter), each a keyed shuffle Catalyst
  * plans like any join; per-round `cache()` + eager materialization keeps
  * lineage from re-running prior rounds. Dedup clusters are near-cliques,
  * so plain propagation (`algorithm = "propagate"`) is the right default;
  * for adversarial long-chain graphs pass `algorithm = "star"` — the
  * alternating large-star/small-star algorithm (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) contracts
  * path lengths geometrically, bounding rounds at O(log n) instead of
  * O(diameter). Both return the identical unique minimum-id labeling.
  */
object Graph {

  /** @param edges two-column DataFrame (a, b) of undirected edges
    * @param algorithm `"propagate"` (min-label, O(diameter) rounds — default
    *   for shallow dup graphs) or `"star"` (large-star/small-star, O(log n)
    *   rounds — for graphs whose diameter may exceed `maxIter`)
    * @return (id, comp): every node labeled with its component's min id
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          algorithm: String = "propagate"): DataFrame = algorithm match {
    case "propagate" => propagate(edges, maxIter)
    case "star"      => alternatingStars(edges, maxIter)
    case other => throw new IllegalArgumentException(
      s"unknown algorithm '$other' (expected 'propagate' or 'star')")
  }

  private def propagate(edges: DataFrame, maxIter: Int): DataFrame = {
    val bidir = edges.toDF("a", "b")
      .unionByName(edges.toDF("b", "a").select(col("a"), col("b")))
      .distinct().cache()
    var labels = bidir.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = bidir.join(labels, bidir("b") === labels("id"))
        .groupBy(bidir("a").as("nid")).agg(min("comp").as("nbr"))
      // localCheckpoint (eager), not cache: caching truncates EXECUTION but
      // not the logical plan, which references the prior round's frame 3x —
      // 3^rounds nodes by round ~15 and the analyzer OOMs before any task
      // runs. Checkpointing makes each round's labels a leaf, so per-round
      // plans stay O(1).
      val updated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("nbr"), labels("comp"))).as("comp"))
        .localCheckpoint(true)
      changed = updated.as("u")
        .join(labels.withColumnRenamed("comp", "old").as("l"), "id")
        .filter(col("comp") =!= col("old")).count()
      labels = updated
      i += 1
    }
    bidir.unpersist()
    // The returned labels stay materialized (checkpoint blocks, a few bytes
    // per clustered node): the caller's downstream joins would otherwise
    // re-run every propagation round. Same deliberate choice as q57's
    // shingle persist.
    // A silent non-fixpoint would return WRONG labels (a component split in
    // two) with no oracle to catch it in production — fail loudly instead.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing); raise maxIter (graph diameter exceeds it), " +
          "or use algorithm = \"star\" (O(log n) rounds)")
    labels
  }

  /** Alternating large-star/small-star (Kiveris et al. 2014): each round is
    * two [groupBy-min + join] passes that rewire edges toward each
    * neighborhood's minimum, geometrically contracting long paths — the
    * fixpoint is a star forest where every node points at its component's
    * minimum id. O(log n) rounds on ANY graph shape, so a path graph of
    * depth ≫ maxIter converges where propagation would not.
    *
    *   large-star(u): m = min(Γ(u) ∪ {u}); link every STRICTLY LARGER
    *     neighbor v > u to m (applied over both orientations of each edge);
    *   small-star(u): orient edges toward their larger endpoint; m =
    *     min(Γ≤(u) ∪ {u}); link u and its smaller neighbors to m.
    *
    * Both steps preserve connectivity (paper, Lemma 1-2); edge count never
    * grows. Fixpoint test: the round's edge set equals the previous round's
    * (set equality via count + anti-join on cached frames — no driver data).
    */
  private def alternatingStars(edges: DataFrame, maxIter: Int): DataFrame = {
    // localCheckpoint (eager), not cache: each round's plan references the
    // previous round's frame ~16 times (two union+groupBy+join passes), so
    // an uncut LOGICAL plan grows 16^rounds nodes — the analyzer itself
    // OOMs long before execution. Checkpointing truncates lineage to the
    // materialized blocks each round (the standard iterative-graph idiom).
    val init = edges.toDF("a", "b").filter(col("a") =!= col("b"))
      .distinct().localCheckpoint(true)
    val allNodes = init.select(col("a").as("id"))
      .unionByName(init.select(col("b").as("id"))).distinct().cache()
    allNodes.count()

    def largeStar(e: DataFrame): DataFrame = {
      val nbr = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
      val m = nbr.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      nbr.join(m, "u").where(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .where(col("a") =!= col("b")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      // v < u throughout, so the neighborhood min already includes u's bound
      val m = or.groupBy("u").agg(min("v").as("m"))
      or.join(m, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(m.select(col("u").as("a"), col("m").as("b")))
        .where(col("a") =!= col("b")).distinct()
    }

    var curr = init
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(curr)).localCheckpoint(true)
      // equal cardinality + empty difference ⇔ identical edge sets
      converged = next.count() == curr.count() && next.except(curr).count() == 0
      curr = next
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents(star) did not converge in $maxIter rounds; raise maxIter")
    // fixpoint edges are (node -> component min); isolated minima label themselves
    val labels = allNodes
      .join(curr.select(col("a").as("id"), col("b").as("root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("comp"))
      .cache()
    labels.count()
    allNodes.unpersist()
    // checkpoint blocks of intermediate rounds are released by the context
    // cleaner once unreferenced
    labels
  }

  /** One label-propagation round's driver-side telemetry (the lloydTrain
    * shape): scalars only, no row data.
    */
  final case class LpRound(round: Int, changed: Long, nLabels: Long)

  /** Community detection by synchronous label propagation (Raghavan et al.
    * 2007): every node starts as its own community and each round adopts
    * the MOST FREQUENT label among its neighbors — ties broken by the
    * smaller label, so every round (and therefore the result at any round
    * budget) is fully deterministic, unlike the randomized original.
    *
    * Communities are denser-than-chance neighborhoods; connected components
    * ([[connectedComponents]]) answers "reachable at all", LP answers
    * "densely tied" — e.g. splitting a dup cluster bridged by one spurious
    * candidate pair into its two real groups.
    *
    * Same scale posture as the CC loop: each round is one keyed shuffle
    * join + two aggregates, per-round `localCheckpoint` keeps the plan a
    * leaf, and the driver holds only [[LpRound]] scalars. Synchronous LP
    * can oscillate (bipartite 2-cycles), so the loop stops at `maxRounds`
    * or when no label changes, WITHOUT declaring non-convergence an error —
    * any round's labeling is a valid community assignment (monotone quality
    * is not part of LP's contract); callers read the history to decide.
    */
  /** One PageRank round's driver-side telemetry: scalars only. */
  final case class PrRound(round: Int, l1Delta: Double)

  /** PageRank with uniform dangling-mass redistribution (the full model,
    * not the drop-dangling shortcut): rank' = (1−d)/N + d·(Σ_in rank/outdeg
    * + dangling/N). Third member of the graph family — CC answers
    * "reachable", LP answers "densely tied", PageRank answers "structurally
    * important" (e.g. ranking documents by citation/link weight before
    * curation sampling).
    *
    * Fully DETERMINISTIC across partitionings, which float PageRank is not:
    * ranks live in DECIMAL(38,18) — per-edge contributions divide and the
    * damping product rounds at fixed scale (HALF_UP, order-free), and the
    * per-node sum of decimals is exact, so two runs produce bit-identical
    * ranks where a double implementation's sums depend on partition order.
    *
    * Scale posture: per round one keyed join + one aggregate over edges
    * (linear), a one-row dangling-mass aggregate, per-round
    * `localCheckpoint`, driver holds only [[PrRound]] scalars. Rounds are a
    * contraction at rate d (L1 delta shrinks ≥ geometrically — asserted in
    * the spec), so `tol` is reached in O(log(1/tol)/log(1/d)) rounds
    * regardless of graph size. Self-loops are dropped; parallel edges
    * collapse (simple-graph semantics).
    */
  def pageRank(edges: DataFrame, damping: Double = 0.85, maxIter: Int = 40,
               tol: Double = 1e-9): (DataFrame, Seq[PrRound]) = {
    import java.math.{BigDecimal => JBig, RoundingMode}
    // 28, not 38: the damping product (28,18)×(2,2) and the per-node sums
    // must stay INSIDE precision 38 — at (38,18) Spark's precision-loss
    // adjustment would silently truncate products to scale 6.
    val dec38 = org.apache.spark.sql.types.DecimalType(28, 18)
    val e = edges.toDF("src", "dst").filter(col("src") =!= col("dst"))
      .distinct().cache()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val outdeg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg")).cache()
    outdeg.count()

    val d = JBig.valueOf(damping)
    val oneMinusD = JBig.ONE.subtract(d)
    val nBig = JBig.valueOf(n)
    val uniform = JBig.ONE.divide(nBig, 18, RoundingMode.HALF_UP)
    val basePer = oneMinusD.divide(nBig, 18, RoundingMode.HALF_UP)

    var ranks = nodes.withColumn("rank", lit(uniform).cast(dec38)).localCheckpoint(true)
    val hist = scala.collection.mutable.ArrayBuffer.empty[PrRound]
    var i = 0
    var delta = Double.MaxValue
    while (i < maxIter && delta > tol) {
      val withDeg = ranks.join(outdeg, Seq("id"), "left")
      val dangling = withDeg.filter(col("outdeg").isNull)
        .agg(coalesce(sum("rank"), lit(0).cast(dec38)).as("s"))
        .head().getDecimal(0)
      val dangPer = dangling.divide(nBig, 18, RoundingMode.HALF_UP)
      val contrib = e
        .join(withDeg.select(col("id").as("src"),
          (col("rank") / col("outdeg")).cast(dec38).as("c")), "src")
        .groupBy(col("dst").as("id")).agg(sum("c").as("in"))
      val updated = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(basePer) + lit(d) *
            (coalesce(col("in"), lit(0).cast(dec38)) + lit(dangPer)))
            .cast(dec38).as("rank"))
        .localCheckpoint(true)
      delta = updated.as("u")
        .join(ranks.withColumnRenamed("rank", "old").as("r"), "id")
        .agg(sum(abs(col("rank") - col("old"))).cast("double")).head().getDouble(0)
      ranks = updated
      i += 1
      hist += PrRound(i, delta)
    }
    e.unpersist(); nodes.unpersist(); outdeg.unpersist()
    (ranks, hist.toSeq)
  }

  def labelPropagation(edges: DataFrame, maxRounds: Int = 10): (DataFrame, Seq[LpRound]) = {
    val bidir = edges.toDF("a", "b")
      .unionByName(edges.toDF("b", "a").select(col("a"), col("b")))
      .distinct().cache()
    var labels = bidir.select(col("a").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint(true)
    val hist = scala.collection.mutable.ArrayBuffer.empty[LpRound]
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxRounds) {
      // per (node, neighbor-label) counts -> majority label, min on ties
      val freq = bidir.join(labels, bidir("b") === labels("id"))
        .groupBy(bidir("a").as("nid"), col("label")).agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("nid")
        .orderBy(col("n").desc, col("label").asc)
      val adopted = freq.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
        .select(col("nid"), col("label").as("new_label"))
      val updated = labels.join(adopted, labels("id") === adopted("nid"), "left")
        .select(labels("id"),
          coalesce(col("new_label"), labels("label")).as("label"))
        .localCheckpoint(true)
      changed = updated.as("u")
        .join(labels.withColumnRenamed("label", "old").as("l"), "id")
        .filter(col("label") =!= col("old")).count()
      labels = updated
      i += 1
      hist += LpRound(i, changed, labels.select("label").distinct().count())
    }
    bidir.unpersist()
    (labels, hist.toSeq)
  }
}
