package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's self-defense arithmetic: median robustness and the
  * suspect-sample criterion that drives contended-iteration re-runs and the
  * artifact's self-declared `contended` flag.
  */
class BenchSpec extends AnyFunSuite {

  test("median: odd, even, and outlier robustness") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    // one poisoned sample among clean ones does not own the median
    assert(Bench.median(Seq(1.0, 1.1, 30.0)) == 1.1)
    // an extra clean sample votes the poisoned one further out
    assert(Bench.median(Seq(1.0, 1.5, 30.0, 1.0)) == 1.25)
  }

  test("suspect: steady-state spread triggers, cold first iteration does not") {
    // iteration 1 is legitimately cold (cache population) — 3x on the first
    // sample alone must NOT trigger a re-run
    assert(!Bench.suspect(Seq(3.0, 1.0, 1.1), Seq(1.0, 1.0, 1.0), 2.5, 32.0))
    // a poisoned steady-state iteration DOES trigger
    assert(Bench.suspect(Seq(1.0, 1.0, 3.0), Seq(1.0, 1.0, 1.0), 2.5, 32.0))
    // re-run samples restoring a tight steady majority still flag until the
    // spread itself tightens — the criterion is spread, not vote count
    assert(Bench.suspect(Seq(1.0, 1.0, 3.0, 1.0, 1.0), Seq.fill(5)(1.0), 2.5, 32.0))
  }

  test("suspect: oversubscription loadavg ceiling triggers regardless of times") {
    assert(Bench.suspect(Seq(1.0, 1.0, 1.0), Seq(1.0, 40.0, 1.0), 2.5, 32.0))
    assert(!Bench.suspect(Seq(1.0, 1.0, 1.0), Seq(1.0, 20.0, 1.0), 2.5, 32.0))
  }

  test("tainted: outvoted spike is clean, unmoved median or uniform load is not") {
    // one spike among clean samples: re-runs protected the median -> clean
    assert(!Bench.tainted(Seq(1.0, 1.0, 3.0, 1.0, 1.0), Seq.fill(5)(1.0), 2.5, 32.0))
    // majority poisoned: the median IS the contention -> tainted
    assert(Bench.tainted(Seq(1.0, 3.0, 3.0, 3.0, 3.0), Seq.fill(5)(1.0), 2.5, 32.0))
    // uniform contention is invisible to spread; load evidence flags it
    assert(Bench.tainted(Seq(3.0, 3.0, 3.0), Seq(40.0, 40.0, 40.0), 2.5, 32.0))
    assert(!Bench.tainted(Seq(3.0, 3.0, 3.0), Seq(40.0, 20.0, 40.0), 2.5, 32.0))
  }

  test("suspect: too few samples never triggers the spread arm") {
    assert(!Bench.suspect(Seq(1.0), Seq(1.0), 2.5, 32.0))
    assert(!Bench.suspect(Seq(1.0, 9.0), Seq(1.0, 1.0), 2.5, 32.0))
  }

  test("bandwidth calibration: positive, finite, stable; staggered mt sweep completes") {
    val arr = Bench.bwArray()
    Bench.calibrateBw(arr, 1) // JIT warmup, discarded like the main's
    val a = Bench.calibrateBw(arr, 2)
    val b = Bench.calibrateBw(arr, 2)
    assert(a > 0 && b > 0 && a.isFinite && b.isFinite)
    assert(math.max(a, b) / math.min(a, b) < 3.0, s"bw calibration unstable: $a vs $b")
    val m = Bench.calibrateBwMt(arr, 4)
    assert(m > 0 && m.isFinite)
  }

  test("requeueSelect: wide/tainted rows qualify, partial window pulls movers, cap holds") {
    val quiet = Seq(
      ("q1", Seq(1.0, 1.0, 1.05), false),
      ("q2", Seq(2.0, 2.0, 2.1), false),
      ("q3", Seq(5.0, 5.1, 5.0), false))
    // clean sweep, no window shift: nothing requeues
    assert(Bench.requeueSelect(quiet, partialWindow = false, 1.5, 8).isEmpty)
    // a wide row requeues; worst spread first
    val wide = quiet :+ ("q4", Seq(1.0, 1.0, 2.0), false) :+ ("q5", Seq(1.0, 3.3, 3.4), false)
    assert(Bench.requeueSelect(wide, partialWindow = false, 1.5, 8) == Seq("q5", "q4"))
    // a tainted row requeues even under the spread bound
    val bad = quiet :+ ("q6", Seq(1.0, 1.1, 1.2), true)
    assert(Bench.requeueSelect(bad, partialWindow = false, 1.5, 8) == Seq("q6"))
    // partial window: the 4 widest rows requeue even when individually tame
    val sel = Bench.requeueSelect(quiet, partialWindow = true, 1.5, 8)
    assert(sel.toSet == Set("q1", "q2", "q3"), sel.toString)
    // cap bounds the pass
    assert(Bench.requeueSelect(wide, partialWindow = true, 1.5, 2).size == 2)
  }

  test("requeueSelect ranks by absolute excess: the row distorting the TOTAL wins the cap") {
    // contended-sweep simulation (round-17 driver artifact): q119-shaped
    // row with a huge ABSOLUTE excess (median 24.75 s vs min 21.7 s =
    // +3.05 s in the total) but a modest spread ratio, against several
    // small rows running 3-4x wide (big ratio, pennies of excess). Under
    // a tight cap the absolute offender must ALWAYS be selected.
    val rows = Seq(
      ("q119", Seq(21.7, 24.75, 39.8), false),  // excess 3.05 s, ratio 1.83
      ("qa", Seq(0.1, 0.35, 0.4), false),       // excess 0.25 s, ratio 4.0
      ("qb", Seq(0.2, 0.6, 0.7), false),        // excess 0.4 s, ratio 3.5
      ("qc", Seq(0.1, 0.3, 0.45), false),       // excess 0.2 s, ratio 4.5
      ("qd", Seq(0.15, 0.5, 0.5), false))       // excess 0.35 s, ratio 3.3
    val sel = Bench.requeueSelect(rows, partialWindow = false, 1.5, 2)
    assert(sel.head == "q119",
      s"largest-absolute offender must be requeued first, got $sel")
    // every left-behind row carries a small absolute excess
    val left = rows.filterNot(r => sel.contains(r._1))
    assert(left.forall(r => Bench.excessSec(r._2) < 2.0),
      s"left-behind rows must each distort the total by <2 s: $left")
  }

  test("requeueSelect: big absolute excess qualifies even under the ratio bound") {
    // round-18 artifact residual: a 9 s row with spread [7.08, 9.96]
    // (ratio 1.41 < 1.5) carried ~2 s of excess and stood — the absolute
    // arm must catch it; a tight row never qualifies under either arm
    val rows = Seq(
      ("q143", Seq(7.08, 9.03, 9.96), false), // ratio 1.41, excess 1.95
      ("tight", Seq(5.0, 5.05, 5.1), false))  // ratio 1.02, excess 0.05
    assert(Bench.requeueSelect(rows, partialWindow = false, 1.5, 8) == Seq("q143"))
    // the excess bound is honored (raised bound → nothing qualifies)
    assert(Bench.requeueSelect(rows, partialWindow = false, 1.5, 8,
      excessBound = 3.0).isEmpty)
  }

  test("substituteClean: a failed re-run (sentinel) never lowers the total") {
    val medians = Seq("q1" -> 2.0, "q2" -> 5.0, "q3" -> 1.0)
    // clean substitution applies
    assert(Bench.substituteClean(medians, Map("q2" -> 3.0)) == 6.0)
    // the -1.0 sentinel (isolated re-run crashed every iteration) must NOT
    // substitute: the sweep's median stands
    assert(Bench.substituteClean(medians, Map("q2" -> -1.0)) == 8.0)
    assert(Bench.substituteClean(medians, Map("q2" -> -1.0, "q3" -> 0.5)) == 7.5)
  }

  test("calibrate: positive, finite, and stable enough to serve as a speed index") {
    Bench.calibrate() // JIT warmup, discarded like the main's
    val a = Bench.calibrate()
    val b = Bench.calibrate()
    assert(a > 0 && b > 0 && a.isFinite && b.isFinite)
    // back-to-back warmed runs on one box should agree within 3x — the
    // signal it exists for (cross-RUN host drift) is far larger than that
    assert(math.max(a, b) / math.min(a, b) < 3.0, s"calibration unstable: $a vs $b")
  }
}
