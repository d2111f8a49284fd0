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
  * lineage from re-running prior rounds. For adversarial long-chain graphs
  * the large-star/small-star variant (alternating halving) bounds rounds at
  * O(log n); dedup clusters are near-cliques, so plain propagation is the
  * right default.
  */
object Graph {

  /** @param edges two-column DataFrame (a, b) of undirected edges
    * @return (id, comp): every node labeled with its component's min id
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val bidir = edges.toDF("a", "b")
      .unionByName(edges.toDF("b", "a").select(col("a"), col("b")))
      .distinct().cache()
    var labels = bidir.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id")).cache()
    labels.count()

    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = bidir.join(labels, bidir("b") === labels("id"))
        .groupBy(bidir("a").as("nid")).agg(min("comp").as("nbr"))
      val updated = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(labels("id"),
          least(labels("comp"), coalesce(col("nbr"), labels("comp"))).as("comp"))
        .cache()
      changed = updated.as("u")
        .join(labels.withColumnRenamed("comp", "old").as("l"), "id")
        .filter(col("comp") =!= col("old")).count() // also materializes `updated`
      labels.unpersist()
      labels = updated
      i += 1
    }
    bidir.unpersist()
    // The returned labels stay cached (MEMORY_AND_DISK, LRU-evictable, a few
    // bytes per clustered node): the caller's downstream joins would
    // otherwise re-run every propagation round. Same deliberate choice as
    // q57's shingle persist.
    // A silent non-fixpoint would return WRONG labels (a component split in
    // two) with no oracle to catch it in production — fail loudly instead.
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          s"($changed labels still changing); raise maxIter (graph diameter exceeds it)")
    labels
  }
}
