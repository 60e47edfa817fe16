package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.runtime.PowerLawFit

/** The scale-trend exponent the bench evidence reports is this fit's
  * slope — pin its algebra on closed-form cases (no Spark needed).
  */
class PowerLawFitSpec extends AnyFunSuite {

  test("exact power law recovers the exponent with r2 = 1") {
    for (k <- Seq(0.5, 1.0, 1.17, 2.0)) {
      val pts = Seq(1e3, 3e3, 1e4, 3e4).map(x => (x, 2.5 * math.pow(x, k)))
      val f = PowerLawFit.fit(pts).get
      assert(math.abs(f.exponent - k) < 1e-9, s"k=$k got ${f.exponent}")
      assert(math.abs(f.r2 - 1.0) < 1e-9)
    }
  }

  test("two points reduce to the log-ratio (and r2 is definitionally 1)") {
    val f = PowerLawFit.fit(Seq((5000.0, 6.42), (50000.0, 94.21))).get
    val expected = math.log(94.21 / 6.42) / math.log(10.0)
    assert(math.abs(f.exponent - expected) < 1e-12)
    assert(math.abs(f.r2 - 1.0) < 1e-12)
  }

  test("constant time across sizes fits slope 0 with r2 = 1") {
    val f = PowerLawFit.fit(Seq((1e3, 7.0), (1e4, 7.0), (1e5, 7.0))).get
    assert(f.exponent == 0.0)
    assert(f.r2 == 1.0)
  }

  test("non-monotone overhead-dominated times yield a LOW r2, not a clean slope") {
    // the round-5 SCC capture shape: mid point faster than base
    val f = PowerLawFit.fit(
      Seq((250000.0, 51.89), (500000.0, 39.83), (2000000.0, 59.04))).get
    assert(f.r2 < 0.5, s"r2=${f.r2} should expose the non-monotone fit")
  }

  test("unidentifiable inputs return None") {
    assert(PowerLawFit.fit(Nil).isEmpty)
    assert(PowerLawFit.fit(Seq((1e3, 5.0))).isEmpty)
    assert(PowerLawFit.fit(Seq((1e3, 5.0), (1e3, 6.0))).isEmpty) // same size
    assert(PowerLawFit.fit(Seq((0.0, 5.0), (1e3, 6.0))).isEmpty) // log undefined
    assert(PowerLawFit.fit(Seq((1e3, 0.0), (1e4, 6.0))).isEmpty)
  }

  test("noise around a linear law still recovers ~1.0 with r2 below 1") {
    val pts = Seq((1e3, 1.0 * 1.1), (1e4, 10.0 * 0.92), (1e5, 100.0 * 1.05))
    val f = PowerLawFit.fit(pts).get
    assert(math.abs(f.exponent - 1.0) < 0.05)
    assert(f.r2 < 1.0 && f.r2 > 0.99)
  }
}
