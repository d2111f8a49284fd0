package graft

import graft.queries.SimilarityQueries

/** Multi-iteration Lloyd training (SimilarityQueries.lloydTrain) — the
  * open-ended companion to the oracle-checked single step (q73) and fixed
  * two-step (q74): convergence is witnessed by churn, the count of vectors
  * that changed cells in a round.
  */
class LloydSpec extends SparkSpec {

  test("lloydTrain: churn decreases to convergence, assignment stays total") {
    val nVectors = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val (finalAssign, hist) = SimilarityQueries.lloydTrain(spark, sf, maxIter = 8)
    assert(hist.nonEmpty)
    val churns = hist.map(_.churn)
    // Lloyd progress: churn never increases round over round, and collapses
    // overall (observed at sf0.001: 313, 65, 31, 20, 10, 9, 5, 5 — a
    // plateau above zero is legitimate for cosine + mean centroids, which
    // can cycle on boundary vectors, so strict per-round decrease would be
    // asserting more than the algorithm guarantees).
    churns.zip(churns.tail).foreach { case (a, b) =>
      assert(b <= a, s"churn increased: $churns")
    }
    // churns.last * 10 < churns.head, not integer-divided head/10: if the
    // loop converges in round 1 (head == last == 0) or initial churn < 10,
    // the divided form rejects a perfectly converged run.
    assert(churns.last == 0L || churns.last * 10 < churns.head,
      s"churn did not collapse across rounds: $churns")
    // every vector keeps exactly one assignment (reassign is a total map)
    assert(finalAssign.count() == nVectors)
    assert(finalAssign.select("vec_id").distinct().count() == nVectors)
    // the quantizer improved over the initial labeling: the last round's
    // mean cohesion is at least the first round's
    assert(hist.last.avgCohesion >= hist.head.avgCohesion - 1e-9,
      s"cohesion regressed: ${hist.map(_.avgCohesion)}")
    // centroid movement is finite and shrinks as assignments settle
    assert(hist.forall(h => !h.movement.isNaN && !h.movement.isInfinite))
    assert(hist.last.movement <= hist.head.movement,
      s"movement grew: ${hist.map(_.movement)}")
  }

  test("lloydTrain convergence witness holds at the correctness scale factor (sf0.01)") {
    // The monotone-churn contract is checked at sf0.001 above; one bounded
    // run at sf0.01 (the driver's correctness SF, 10x the vectors) guards
    // against the witness being a small-sample artifact. maxIter=3 keeps it
    // to three linear passes.
    val (_, hist) = SimilarityQueries.lloydTrain(spark, "/root/testdata/sf0.01", maxIter = 3)
    assert(hist.nonEmpty)
    val churns = hist.map(_.churn)
    churns.zip(churns.tail).foreach { case (a, b) =>
      assert(b <= a, s"churn increased at sf0.01: $churns")
    }
    assert(hist.forall(h => !h.movement.isNaN && !h.movement.isInfinite))
  }

  test("q74 equals composing lloydTrain's first two reassignment rounds") {
    // The fixed two-step oracle query and the loop must agree on the
    // iteration-2 assignment: same churn total (a2's n_changed sum equals
    // the loop's round-2 churn) — guards the two code paths against drift.
    import org.apache.spark.sql.functions._
    val q74 = SparkEntry.queries("q74_ivf_train2")(spark, sf)
    val changedViaQuery = q74.agg(sum("n_changed")).head().getLong(0)
    val (_, hist) = SimilarityQueries.lloydTrain(spark, sf, maxIter = 2)
    val churn2 = if (hist.size >= 2) hist(1).churn else 0L
    assert(changedViaQuery == churn2,
      s"q74 n_changed=$changedViaQuery but loop round-2 churn=$churn2")
  }
}
