package graft

/** Plan lint: every declared query's PHYSICAL plan is swept for scale
  * red flags, so a regression that silently degrades a join into a
  * cartesian product (or drops whole-stage codegen entirely) fails CI
  * instead of surfacing as a 100 TB incident.
  *
  * Known exception: q65/q69 cross-join probes against the CELL CENTROID
  * table — cells x dim doubles, broadcast, bounded — which is a deliberate
  * tiny-cross, not a fact-fact blowup.
  */
class PlanLintSpec extends SparkSpec {

  // q60 is the DELIBERATE brute-force baseline (probes broadcast against the
  // whole corpus, non-equi); q65/q69 cross-join probes against the broadcast
  // cell-centroid table (cells x dim, bounded).
  // q73 reassigns every vector against the broadcast centroid table (cells
  // x dim — the Lloyd step's inherent shape), same bounded cross as q65.
  private val allowedCartesian =
    Set("q60_cosine_topk", "q65_ivf_search", "q69_ann_recall", "q73_ivf_refine")

  test("no unintended cartesian products; codegen present") {
    val dir = sf
    // AQE wraps plans before stage codegen is decided; plan statically so
    // the `*(n)` whole-stage-codegen markers are visible in the tree text.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val cartesian = (plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")) && !allowedCartesian(name)
        val noCodegen = !plan.contains("*(")
        if (cartesian) Some(s"$name: cartesian/nested-loop join")
        else if (noCodegen) Some(s"$name: no whole-stage-codegen span")
        else None
      }
      assert(offenders.isEmpty, offenders.mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
