package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bench self-heal decision (VERDICT r13 next #1) as
  * pure functions — the live trigger is host dirt, which cannot be
  * reproduced on demand (three deliberate CPU-hog attempts failed to
  * land a burst on a 0.3 s sentinel shot), so the retry/choice logic
  * is pinned here and the artifact byte layout by check.py --cut. No
  * SparkSession needed. */
class BenchLogicSpec extends AnyFunSuite {

  private def window(first: Double, mid: Seq[Double], last: Double) =
    Bench.SweepWindow(Seq("q01" -> 1.0), Seq(first), mid, last, Seq.empty)

  test("verdict arithmetic: max/median over the window's own samples") {
    val w = window(0.2, Seq(0.3, 0.4, 0.3), 0.3)
    // sorted samples (0.2, 0.3, 0.3, 0.3, 0.4): median idx 2 -> 0.3
    assert(math.abs(w.ratio - 0.4 / 0.3) < 1e-12 && w.clean)
    val dirty = window(0.2, Seq(0.3, 1.2, 0.3), 0.3)
    assert(dirty.ratio > 1.5 && !dirty.clean)
  }

  test("failed shots (-1) are excluded; an underdetermined window is never clean and never retried") {
    val under = window(-1.0, Seq(-1.0), 0.3) // one positive sample
    assert(under.samples.size == 1 && under.ratio == -1.0 && !under.clean)
    assert(!Bench.wantRetry(under, isolation = false),
      "a window whose verdict is underdetermined must not buy a retry")
  }

  test("retry fires exactly on a determinable dirty full-sweep window") {
    val dirty = window(0.2, Seq(0.3, 1.2, 0.3), 0.3)
    val clean = window(0.2, Seq(0.3, 0.3, 0.3), 0.3)
    assert(Bench.wantRetry(dirty, isolation = false))
    assert(!Bench.wantRetry(clean, isolation = false))
    assert(!Bench.wantRetry(dirty, isolation = true),
      "isolation mode skips sentinels — its window can never earn a retry")
  }

  test("the retry wins only when strictly cleaner; a dirtier or undetermined retry never displaces the first window") {
    val dirty = window(0.2, Seq(0.3, 1.2, 0.3), 0.3)    // ratio 4.0
    val cleaner = window(0.2, Seq(0.3, 0.4, 0.3), 0.3)  // ratio 1.33
    val dirtier = window(0.2, Seq(0.3, 2.4, 0.3), 0.3)  // ratio 8.0
    val under = window(-1.0, Seq(-1.0), 0.3)
    assert(Bench.chooseWindow(dirty, Some(cleaner)) eq cleaner)
    assert(Bench.chooseWindow(dirty, Some(dirtier)) eq dirty)
    assert(Bench.chooseWindow(dirty, Some(under)) eq dirty)
    assert(Bench.chooseWindow(dirty, None) eq dirty)
    // both dirty, retry marginally cleaner: the cleaner evidence wins
    // and the (still-dirty) flag rides the artifact
    val slightly = window(0.2, Seq(0.3, 1.1, 0.3), 0.3)
    assert(Bench.chooseWindow(dirty, Some(slightly)) eq slightly)
    assert(!Bench.chooseWindow(dirty, Some(slightly)).clean)
  }
}
