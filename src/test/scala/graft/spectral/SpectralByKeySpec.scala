package graft.spectral

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.functions._

/** Grouped spectral ops must equal running the single-series operator on
  * each key's slice independently (the `MultiSeriesSpec` property), for
  * every supported per-key detrend. */
class SpectralByKeySpec extends SparkSpec {

  /** Three series: different lengths, trends, and dominant periods; series
    * 'c' has irregular (non-equispaced) times for the Lomb–Scargle case. */
  private def series = {
    import spark.implicits._
    val a = (0 until 60).map(i =>
      ("a", i.toDouble, 10.0 + 0.3 * i + 5 * math.sin(2 * math.Pi * i / 6)))
    val b = (0 until 45).map(i =>
      ("b", i.toDouble, 80.0 - 0.1 * i + 3 * math.cos(2 * math.Pi * i / 9)))
    val c = (0 until 50).map { i =>
      val t = i + 0.3 * math.sin(i * 2.7) // jittered sampling
      ("c", t, 5.0 + 4 * math.sin(2 * math.Pi * t / 7.5))
    }
    (a ++ b ++ c).toDF("k", "t", "x")
  }

  private def keyed = TimeseriesFrame(series, Some("t"), Nil, Seq("k"))
  private def single(key: String) =
    TimeseriesFrame(series.filter(col("k") === key), Some("t"))

  test("spectrumByKey == per-key spectrum for quadratic/cubic poly detrends") {
    // the per-key moment-solve path vs the single-series driver Breeze
    // solve — same s∈[−1,1] conditioning, so the residuals agree to
    // rounding and the spectra follow
    for (detrend <- Seq("quadratic", "cubic")) {
      val grouped = Periodogram.spectrumByKey(keyed, "x", detrend)
      for (key <- Seq("a", "b", "c")) {
        val g = grouped.filter(col("k") === key)
        val s = Periodogram.spectrum(single(key), "x", detrend)
        assert(g.count() == s.count(), s"$detrend/$key row count")
        assertSeqAlmost(col1(g, "power", "period"), col1(s, "power", "period"),
          tol = 1e-6)
      }
    }
    // degenerate short series (n <= order): values pass through unchanged
    import spark.implicits._
    val tiny = TimeseriesFrame(
      Seq(("z", 0.0, 4.0), ("z", 1.0, 9.0)).toDF("k", "t", "x"),
      Some("t"), Nil, Seq("k"))
    val out = Periodogram.spectrumByKey(tiny, "x", "cubic")
    // n=2 ≤ order → zero coefficients, x passes through; m=2 yields the
    // single k=1 frequency (the single-series path would throw here —
    // grouped ops degrade gracefully instead)
    assert(out.count() == 1)
  }

  test("lombScargleByKey == per-key lombScargle (quadratic detrend)") {
    val grouped = Periodogram.lombScargleByKey(keyed, "x", nPeriods = 80,
      detrend = "quadratic")
    for (key <- Seq("a", "b", "c")) {
      val g = grouped.filter(col("k") === key)
      val s = Periodogram.lombScargle(single(key), "x", nPeriods = 80,
        detrend = "quadratic")
      assert(g.count() == s.count(), s"$key row count")
      assertSeqAlmost(col1(g, "pgram", "period"), col1(s, "pgram", "period"),
        tol = 1e-6)
    }
  }

  test("spectrumByKey == per-key spectrum for diff/constant/linear detrends") {
    for (detrend <- Seq("diff", "constant", "linear")) {
      val grouped = Periodogram.spectrumByKey(keyed, "x", detrend)
      for (key <- Seq("a", "b", "c")) {
        val g = grouped.filter(col("k") === key)
        val s = Periodogram.spectrum(single(key), "x", detrend)
        assert(g.count() == s.count(), s"$detrend/$key row count")
        assertSeqAlmost(col1(g, "power", "period"), col1(s, "power", "period"),
          tol = 1e-8)
      }
    }
  }

  test("spectrumByKeyFft == spectrumByKey for every detrend") {
    // the O(m log m) gathered-FFT scale path against the explode-DFT
    // form: identical per-series grid, doubling rule, and detrend math —
    // only the transform algorithm differs, so spectra agree to FP noise
    for (detrend <- Seq("diff", "constant", "linear", "quadratic", "cubic")) {
      val fft = Periodogram.spectrumByKeyFft(keyed, "x", detrend)
      val dft = Periodogram.spectrumByKey(keyed, "x", detrend)
      for (key <- Seq("a", "b", "c")) {
        val f = fft.filter(col("k") === key)
        val d = dft.filter(col("k") === key)
        assert(f.count() == d.count(), s"$detrend/$key row count")
        assertSeqAlmost(col1(f, "period", "period"), col1(d, "period", "period"))
        assertSeqAlmost(col1(f, "power", "period"), col1(d, "power", "period"),
          tol = 1e-8)
      }
    }
    // degenerate rules carry over: one-row series → empty; n ≤ order under
    // a poly detrend → pass-through residuals, not a throw
    import spark.implicits._
    val tiny = TimeseriesFrame(
      Seq(("z", 0.0, 4.0), ("z", 1.0, 9.0), ("w", 3.0, 1.0))
        .toDF("k", "t", "x"), Some("t"), Nil, Seq("k"))
    val out = Periodogram.spectrumByKeyFft(tiny, "x", "cubic")
    assert(out.filter(col("k") === "z").count() == 1)
    assert(out.filter(col("k") === "w").count() == 0)
  }

  test("property: FFT == DFT spectrum over random series incl. prime/odd lengths") {
    // seeded-random lengths hit the mixed-radix FFT's awkward cases (prime
    // m → Bluestein, odd m → no Nyquist bin, even m → undoubled Nyquist);
    // the two engines share no transform code, so agreement is a real check
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val lengths = Seq(7, 16, 31, 53, 97, 128) ++ Seq.fill(3)(8 + rnd.nextInt(150))
    val rows = lengths.zipWithIndex.flatMap { case (len, ki) =>
      (0 until len).map(i => (s"s$ki", i.toDouble,
        rnd.nextDouble() * 10 + 4 * math.sin(i / (1.0 + ki))))
    }
    val tsf = TimeseriesFrame(rows.toDF("k", "t", "x"), Some("t"), Nil, Seq("k"))
    def grouped(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(t => (t._2, t._3)).toSeq).toMap
    for (detrend <- Seq("diff", "constant", "linear")) {
      val f = grouped(Periodogram.spectrumByKeyFft(tsf, "x", detrend))
      val d = grouped(Periodogram.spectrumByKey(tsf, "x", detrend))
      assert(f.keySet == d.keySet, s"$detrend key sets")
      for (k <- f.keySet) {
        val (fv, dv) = (f(k), d(k))
        assert(fv.size == dv.size, s"$detrend/$k row count")
        fv.zip(dv).foreach { case ((fp, fpow), (dp, dpow)) =>
          assert(math.abs(fp - dp) < 1e-9, s"$detrend/$k period $fp vs $dp")
          assert(math.abs(fpow - dpow) < 1e-7 * (1 + math.abs(dpow)),
            s"$detrend/$k power@$fp: $fpow vs $dpow")
        }
      }
    }
  }

  test("spectrumFft == spectrum (single series, diff + linear)") {
    for (detrend <- Seq("diff", "linear"); key <- Seq("a", "c")) {
      val f = Periodogram.spectrumFft(single(key), "x", detrend)
      val d = Periodogram.spectrum(single(key), "x", detrend)
      assert(f.count() == d.count(), s"$detrend/$key row count")
      assertSeqAlmost(col1(f, "period", "period"), col1(d, "period", "period"))
      assertSeqAlmost(col1(f, "power", "period"), col1(d, "power", "period"),
        tol = 1e-8)
    }
  }

  test("periodogramByKey peaks == per-key periodogram peaks") {
    val grouped = Periodogram.periodogramByKey(keyed, "x")
    for (key <- Seq("a", "b", "c")) {
      val g = grouped.filter(col("k") === key)
      val s = Periodogram.periodogram(single(key), "x")
      assertSeqAlmost(col1(g, "period", "period"), col1(s, "period", "period"))
      assertSeqAlmost(col1(g, "pgram", "period"), col1(s, "pgram", "period"),
        tol = 1e-8)
    }
  }

  test("lombSpectrumByKey == per-key lombScargle spectrum (linear detrend)") {
    val grouped = Periodogram.lombScargleByKey(keyed, "x", nPeriods = 100)
    for (key <- Seq("a", "b", "c")) {
      val g = grouped.filter(col("k") === key)
      val s = Periodogram.lombScargle(single(key), "x", nPeriods = 100)
      assertSeqAlmost(col1(g, "period", "period"), col1(s, "period", "period"))
      assertSeqAlmost(col1(g, "pgram", "period"), col1(s, "pgram", "period"),
        tol = 1e-6)
    }
  }

  test("degenerate series: single-row key yields empty spectrum, no crash") {
    import spark.implicits._
    val df = series.union(Seq(("d", 0.0, 1.0)).toDF("k", "t", "x"))
    val tsf = TimeseriesFrame(df, Some("t"), Nil, Seq("k"))
    assert(Periodogram.spectrumByKey(tsf, "x").filter(col("k") === "d").count() == 0)
  }
}
