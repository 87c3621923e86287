package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for Bench's statistical rules — the self-correction machinery
  * (round 16) keys off these, so their edge cases get exact unit
  * coverage: failed passes (-1), even/odd medians, and the
  * median-vs-best spread boundary.
  */
class BenchSpec extends AnyFunSuite {

  test("medianOf ignores failed passes and reports -1 when all failed") {
    assert(Bench.medianOf(Nil) == -1.0)
    assert(Bench.medianOf(List(-1.0, -1.0)) == -1.0)
    assert(Bench.medianOf(List(3.0)) == 3.0)
    assert(Bench.medianOf(List(1.0, 3.0)) == 2.0)
    assert(Bench.medianOf(List(1.0, 2.0, 9.0)) == 2.0)
    // a crashed pass must not drag the median
    assert(Bench.medianOf(List(-1.0, 2.0, 4.0)) == 3.0)
  }

  test("spread fires on median > 2x best AND median > 1s") {
    // classic contamination: most passes slow, median far from best
    assert(Bench.spread(List(1.0, 5.0, 5.5)))
    // one slow pass is JIT noise — median stays at the fast pair
    assert(!Bench.spread(List(1.0, 1.1, 9.0)))
    // sub-second queries never flag (ratio alone isn't enough)
    assert(!Bench.spread(List(0.1, 0.5, 0.6)))
    // exactly 2x is NOT a trip (strict >)
    assert(!Bench.spread(List(1.0, 2.0, 2.0)))
    assert(Bench.spread(List(1.0, 2.1, 2.1)))
    // all passes failed: no evidence, no flag
    assert(!Bench.spread(List(-1.0, -1.0, -1.0)))
    // failed passes are excluded from min/median before the test
    assert(Bench.spread(List(-1.0, 1.0, 3.0, 3.5)))
  }
}
