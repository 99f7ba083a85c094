package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.ScaleGate

/** The scale-gate comparator is a pure function — spec'd without a
  * Spark session. */
class ScaleGateSpec extends AnyFunSuite {

  test("verdict: linear growth passes, superlinear fails, floor absorbs noise") {
    val small = Map("linear" -> 1.0, "quadratic" -> 0.5, "tiny" -> 0.05)
    val large = Map("linear" -> 12.0, "quadratic" -> 50.0, "tiny" -> 4.0)
    val rows = ScaleGate.verdict(small, large,
      dataRatio = 10.0, slack = 3.0, floorSec = 10.0).map(r => r.name -> r).toMap
    // 12x at 10x data is inside the 30x slack bound
    assert(rows("linear").ok && rows("linear").bound == 30.0)
    // 100x growth blows through max(0.5*30, 10) = 15
    assert(!rows("quadratic").ok)
    // a 0.05 s query growing to 4 s is overhead noise under the floor
    assert(rows("tiny").ok && rows("tiny").bound == 10.0)
  }

  test("verdict: a query missing on either side is a failure") {
    val rows = ScaleGate.verdict(Map("a" -> 1.0), Map("b" -> 1.0),
      10.0, 3.0, 10.0)
    assert(rows.size == 2 && rows.forall(!_.ok))
  }

  test("verdict: zero small-side time cannot divide away a regression") {
    val rows = ScaleGate.verdict(Map("z" -> 0.0), Map("z" -> 60.0),
      10.0, 3.0, 10.0)
    assert(!rows.head.ok, "bound must fall back to the floor, not 0*ratio")
    assert(rows.head.ratio.isPosInfinity)
  }
}
