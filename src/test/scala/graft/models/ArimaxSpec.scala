package graft.models

import graft.SparkSpec

class ArimaxSpec extends SparkSpec {

  test("ARIMAX recovers the regression coefficient under AR(1) errors") {
    val rnd = new scala.util.Random(3)
    val n = 300
    val x = Array.tabulate(n)(i => math.sin(i / 7.0) * 10 + i * 0.05)
    val u = new Array[Double](n)
    for (i <- 1 until n) u(i) = 0.6 * u(i - 1) + rnd.nextGaussian()
    val y = Array.tabulate(n)(i => 2.5 * x(i) + u(i))
    val m = new Arimax(1, 0, 0).fit(y, x.map(Array(_)))
    assert(math.abs(m.fittedBeta.head - 2.5) < 0.05,
      s"beta=${m.fittedBeta.toSeq}")
    assert(math.abs(m.arimaPart.fittedPhi.head - 0.6) < 0.15,
      s"phi=${m.arimaPart.fittedPhi.toSeq}")

    val futureX = Array.tabulate(5)(h => Array(x.last + 0.05 * (h + 1)))
    val (fo, lo, hi) = m.predict(futureX)
    (0 until 5).foreach { h =>
      assert(fo(h) > lo(h) && fo(h) < hi(h))
      // forecast should be near the regression line (error process mean-reverts)
      assert(math.abs(fo(h) - 2.5 * futureX(h).head) < 5.0)
    }
  }

  test("ARIMAX with d=1 integrates back onto the level scale") {
    val rnd = new scala.util.Random(9)
    val n = 200
    val x = Array.tabulate(n)(i => i * 0.3)
    val y = Array.tabulate(n)(i => 5.0 + 1.5 * x(i) + rnd.nextGaussian() * 0.1)
    val m = new Arimax(1, 1, 0).fit(y, x.map(Array(_)))
    val futureX = Array.tabulate(3)(h => Array(x.last + 0.3 * (h + 1)))
    val (fo, _, _) = m.predict(futureX)
    // the trend is 1.5 * 0.3 = 0.45/step from the regression part
    (0 until 3).foreach { h =>
      val expected = y.last + 0.45 * (h + 1)
      assert(math.abs(fo(h) - expected) < 1.0, s"h=$h: ${fo(h)} vs $expected")
    }
  }

  test("d=1 CI half-width accumulates through integration (grows ≥ √h)") {
    val rnd = new scala.util.Random(11)
    val n = 300
    val x = Array.tabulate(n)(i => i * 0.2)
    val y = new Array[Double](n)
    y(0) = 1.0
    for (i <- 1 until n) y(i) = y(i - 1) + 0.3 + 0.5 * rnd.nextGaussian()
    val m = new Arimax(1, 1, 0).fit(y, x.map(Array(_)))
    val futureX = Array.tabulate(8)(h => Array(x.last + 0.2 * (h + 1)))
    val (fo, lo, hi) = m.predict(futureX)
    val hw = (0 until 8).map(h => (hi(h) - lo(h)) / 2)
    // an integrated (random-walk-like) process has Var(h) ≈ h·σ²; the d=0
    // ARMA half-width would flatten to a constant instead
    assert(hw(7) > hw(0) * 2.0, s"halfWidths=$hw")
    (1 until 8).foreach(h => assert(hw(h) >= hw(h - 1) - 1e-9, s"non-monotone at $h: $hw"))
    (0 until 8).foreach(h => assert(fo(h) > lo(h) && fo(h) < hi(h)))
  }
}
