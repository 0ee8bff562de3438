package graft

import org.scalatest.funsuite.AnyFunSuite

/** The must-agree decision logic behind the streaming bench's
  * stateless envelope pair (the r8 defect: a contention-corrupted
  * sample shipped as the round's figure because the invariant was
  * reported but never acted on). No Spark needed — the decision
  * function and the wall budget are pure.
  */
class BenchStreamingSpec extends AnyFunSuite {

  test("disagree fires strictly above the 1.5x ratio") {
    assert(BenchStreaming.disagree(100000L, 160000L)) // 1.6x
    assert(BenchStreaming.disagree(160000L, 100000L)) // symmetric
    assert(!BenchStreaming.disagree(100000L, 150000L)) // exactly 1.5x
    assert(!BenchStreaming.disagree(100000L, 149999L))
    assert(!BenchStreaming.disagree(100000L, 100000L))
  }

  test("failed measurements (-1 / 0) never count as disagreement") {
    // a failed pass must not trigger re-measure loops on garbage
    assert(!BenchStreaming.disagree(-1L, 200000L))
    assert(!BenchStreaming.disagree(200000L, -1L))
    assert(!BenchStreaming.disagree(0L, 200000L))
    assert(!BenchStreaming.disagree(-1L, -1L))
  }

  test("WallBudget counts down and exhausts") {
    val none = new BenchStreaming.WallBudget(0L)
    assert(none.exhausted)
    val plenty = new BenchStreaming.WallBudget(3600L)
    assert(!plenty.exhausted)
    assert(plenty.remainingSec <= 3600L && plenty.remainingSec > 3590L)
    assert(!BenchStreaming.unbounded.exhausted)
  }
}
