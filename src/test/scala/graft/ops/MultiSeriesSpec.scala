package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import graft.spectral.Correlation
import org.apache.spark.sql.functions._

/** Multi-series (`seriesKeys`) correctness: grouped operators must equal
  * running the single-series operator on each key's slice independently —
  * the property the round-1 review found violated in SeasonalDecompose
  * (global df.count() leaked across series). */
class MultiSeriesSpec extends SparkSpec {

  /** Two series of different lengths with different seasonal/trend shape. */
  private def twoSeries = {
    import spark.implicits._
    val a = (0 until 28).map(i =>
      ("a", i.toLong, 10.0 + i * 0.5 + math.sin(i * math.Pi / 3.5) * 3 + (i % 3) * 0.1))
    val b = (0 until 21).map(i =>
      ("b", i.toLong, 50.0 - i * 0.2 + math.cos(i * math.Pi / 3.5) * 7))
    (a ++ b).toDF("k", "i", "x")
  }

  test("per-series seasonal decomposition == per-key independent runs") {
    val df = twoSeries
    val grouped = SeasonalDecompose(
      TimeseriesFrame(df, None, Seq("i"), Seq("k")), Seq("x"),
      period = 7, model = "additive")
    for (key <- Seq("a", "b")) {
      val single = SeasonalDecompose(
        TimeseriesFrame(df.filter(col("k") === key), None, Seq("i")), Seq("x"),
        period = 7, model = "additive")
      for (c <- Seq("x_trend", "x_seasonal", "x_adjusted", "x_residual")) {
        val g = col1(grouped.filter(col("k") === key), c)
        val s = col1(single, c)
        assertSeqAlmost(g, s, 1e-9)
      }
    }
  }

  test("grouped ACF == per-key acfVector") {
    val df = twoSeries
    val grouped = Correlation.acfByKey(
      TimeseriesFrame(df, None, Seq("i"), Seq("k")), "x", maxLag = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (key <- Seq("a", "b")) {
      val vec = Correlation.acfVector(
        TimeseriesFrame(df.filter(col("k") === key), None, Seq("i")), "x", 5)
      (1 to 5).foreach { k =>
        assert(math.abs(grouped((key, k.toLong)) - vec(k)) < 1e-9,
          s"$key lag $k: ${grouped((key, k.toLong))} vs ${vec(k)}")
      }
    }
  }

  test("acfByKeyFft == acfByKey, and full-lag default == per-key acfVector") {
    val df = twoSeries
    val tsf = TimeseriesFrame(df, None, Seq("i"), Seq("k"))
    // bounded lags: FFT form must reproduce the window form exactly
    val win = Correlation.acfByKey(tsf, "x", maxLag = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val fft = Correlation.acfByKeyFft(tsf, "x", maxLag = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(win.keySet == fft.keySet)
    win.foreach { case (key, v) =>
      assert(math.abs(fft(key) - v) < 1e-9, s"$key: ${fft(key)} vs $v")
    }
    // reference-default lag depth (0.9·m per series) against the direct
    // single-series vector at the same depth
    val full = Correlation.acfByKeyFft(tsf, "x")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((key, m) <- Seq(("a", 28), ("b", 21))) {
      val nl = (0.9 * m).toInt
      assert(full.keys.count(_._1 == key) == nl, s"$key default lag depth")
      val vec = Correlation.acfVector(
        TimeseriesFrame(df.filter(col("k") === key), None, Seq("i")), "x", nl)
      (1 to nl).foreach { k =>
        assert(math.abs(full((key, k.toLong)) - vec(k)) < 1e-9,
          s"$key lag $k: ${full((key, k.toLong))} vs ${vec(k)}")
      }
    }
    // constant series drop carries over
    import spark.implicits._
    val flat = ((0 until 20).map(i => ("v", i.toLong, math.sin(i * 0.7))) ++
      (0 until 20).map(i => ("f", i.toLong, 5.0))).toDF("k", "i", "x")
    val keys = Correlation.acfByKeyFft(
        TimeseriesFrame(flat, None, Seq("i"), Seq("k")), "x", maxLag = 3)
      .select("k").collect().map(_.getString(0)).toSet
    assert(keys == Set("v"))
  }

  test("pacfByKeyFft == per-key Levinson-Durbin over acfVector") {
    val df = twoSeries
    val tsf = TimeseriesFrame(df, None, Seq("i"), Seq("k"))
    val grouped = Correlation.pacfByKeyFft(tsf, "x", maxLag = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (key <- Seq("a", "b")) {
      val vec = Correlation.pacfVector(Correlation.acfVector(
        TimeseriesFrame(df.filter(col("k") === key), None, Seq("i")), "x", 5))
      (1 to 5).foreach { k =>
        assert(math.abs(grouped((key, k.toLong)) - vec(k)) < 1e-9,
          s"$key lag $k: ${grouped((key, k.toLong))} vs ${vec(k)}")
      }
    }
    // reference default depth min(m/2 − 1, m − 1) per series
    val full = Correlation.pacfByKeyFft(tsf, "x")
    assert(full.filter(col("k") === "a").count() == 13) // m=28
    assert(full.filter(col("k") === "b").count() == 9)  // m=21
  }

  test("acfConfintByKey == per-key acfConfint over acfVector") {
    val df = twoSeries
    val tsf = TimeseriesFrame(df, None, Seq("i"), Seq("k"))
    val grouped = Correlation.acfConfintByKey(tsf, "x", alpha = 0.05, maxLag = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    for ((key, m) <- Seq(("a", 28L), ("b", 21L))) {
      val vec = Correlation.acfVector(
        TimeseriesFrame(df.filter(col("k") === key), None, Seq("i")), "x", 5)
      val ci = Correlation.acfConfint(vec, m, 0.05)
      (1 to 5).foreach { k =>
        val (a, lo, hi) = grouped((key, k.toLong))
        assert(math.abs(a - vec(k)) < 1e-9, s"$key acf lag $k")
        assert(math.abs(lo - ci(k)._1) < 1e-9, s"$key ci_low lag $k")
        assert(math.abs(hi - ci(k)._2) < 1e-9, s"$key ci_high lag $k")
      }
    }
  }

  test("acf routes deep lag counts through the FFT path with equal values") {
    import spark.implicits._
    val n = 4500
    val df = (0 until n).map(i =>
      (i.toLong, math.sin(i * 0.05) * 10 + (i % 7))).toDF("i", "x")
    val tsf = TimeseriesFrame(df, None, Seq("i"))
    // maxLag 4200 > the 4096 routing threshold → constant-key FFT path
    val deep = Correlation.acf(spark, tsf, "x", maxLag = Some(4200))
      .collect().map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    val direct = Correlation.significantPeaks(
      Correlation.acfVector(tsf, "x", 4200), order = 3).filter(_._1 > 0).toMap
    assert(deep.keySet == direct.keySet, "peak sets differ between paths")
    deep.foreach { case (lag, v) =>
      assert(math.abs(v - direct(lag)) < 1e-9, s"lag $lag: $v vs ${direct(lag)}")
    }
  }

  test("grouped ACF drops constant series instead of aborting (ANSI /0)") {
    import spark.implicits._
    val df = ((0 until 20).map(i => ("varies", i.toLong, math.sin(i * 0.7))) ++
      (0 until 20).map(i => ("flat", i.toLong, 5.0))).toDF("k", "i", "x")
    val keys = Correlation.acfByKey(
        TimeseriesFrame(df, None, Seq("i"), Seq("k")), "x", maxLag = 3)
      .select("k").collect().map(_.getString(0)).toSet
    assert(keys == Set("varies"))
  }
}
