package graft.spectral

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.{DataFrame, functions => F}

/** Closes the cross-algorithm rounding-flake class (r8's q81 red cell):
  * every hash-gated spectral query whose Spark algorithm differs from its
  * DuckDB oracle replay (FFT vs DFT, moment-solve vs Cramer, gathered vs
  * windowed) is only deterministic if no UNROUNDED gate-data value sits
  * closer to its quantization boundary than the two engines' numerical
  * deviation. This spec computes the unrounded spectra on the actual gate
  * data (sf0.01 events) and asserts a per-row margin bound derived from
  * the worst MEASURED Spark-vs-DuckDB deviations (r9 analysis):
  *
  *   family                    grid          worst measured dev   bar
  *   q48/q81 diff-detrend      1e-3 + shift  4.98e-9 (FFT)        50×dev
  *   q76 quadratic-detrend     1e-3 + shift  4.4e-11              50×dev
  *   q83/q84/q85 ACF/PACF/CI   1e-6          2.7e-14              1e-11
  *   q49 Lomb by key           1e-6          3.1e-16              1e-12
  *
  * The by-key periodogram families additionally carry the boundary SHIFT
  * (SparkEntry.powerShiftByKey/-Poly): cent-valued diffs at exact-angle
  * harmonics make powers terminate in decimal exactly ON unshifted
  * boundaries, so the margin must be created by construction, not hoped
  * for. If this spec fails after a testdata regeneration, re-scan the
  * shift constants (tools history in PLANS_r9.md). */
class BoundaryMarginSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private def haveData = new java.io.File(s"$sfDir/events.parquet").exists()

  private lazy val t: TimeseriesFrame = TimeseriesFrame.fromColumn(
    graft.SparkEntry.tbl(spark, sfDir, "events"), "ts", Seq("event_id"))
    .withSeriesKeys("user_id")

  /** distance of the rounded quantity v+shift to the nearest 0.5·grid
    * HALF_UP boundary (HALF_UP is symmetric: boundaries at ±(k+½)·grid,
    * so the distance is computed on |v + shift|) */
  private def margin(v: Double, grid: Double, shift: Double): Double = {
    val f = (math.abs(v + shift) / grid) % 1.0
    math.abs(f - 0.5) * grid
  }

  private def assertMargins(df: DataFrame, valueCols: Seq[String],
      grid: Double, shift: Double, bar: Double => Double, tag: String): Unit = {
    val rows = df.select(valueCols.map(F.col): _*).collect()
    var n = 0
    rows.foreach { r =>
      (0 until r.length).foreach { i =>
        if (!r.isNullAt(i)) {
          val v = r.getDouble(i)
          val m = margin(v, grid, shift)
          assert(m >= bar(math.abs(v)),
            s"$tag: value $v margin $m < bar ${bar(math.abs(v))} " +
              s"(grid $grid shift $shift) — boundary-flake risk; re-scan shift")
          n += 1
        }
      }
    }
    assert(n > 0, s"$tag: no values checked")
  }

  // 50× the measured FFT-vs-DuckDB deviation envelope (4.98e-9 abs at
  // power≈2e4, i.e. ≤ 3e-13·|v| + 2e-11); headroom also covers DuckDB
  // build-to-build sum-order noise, which is DFT-class (≤1.5e-11).
  private def fftBar(va: Double): Double = 50 * (3e-13 * va + 2e-11)

  test("q48/q81 by-key diff-detrend powers clear the shifted 3dp grid") {
    assume(haveData)
    val spec = Periodogram.spectrumByKey(t, "value", "diff")
    assertMargins(spec, Seq("power"), 1e-3, graft.SparkEntry.powerShiftByKey,
      fftBar, "q48/q81")
  }

  test("q76 by-key quadratic-detrend powers clear the shifted 3dp grid") {
    assume(haveData)
    val spec = Periodogram.spectrumByKey(t, "value", "quadratic")
    assertMargins(spec, Seq("power"), 1e-3, graft.SparkEntry.powerShiftPoly,
      fftBar, "q76")
  }

  test("q83/q85 ACF + confint values clear the 6dp grid") {
    assume(haveData)
    val acf = Correlation.acfConfintByKey(t, "value", alpha = 0.05, maxLag = 6)
    assertMargins(acf, Seq("acf", "ci_low", "ci_high"), 1e-6, 0.0,
      _ => 1e-11, "q83/q85")
  }

  test("q84 PACF values clear the 6dp grid") {
    assume(haveData)
    val p = Correlation.pacfByKeyFft(t, "value", maxLag = 8)
    assertMargins(p, Seq("pacf"), 1e-6, 0.0, _ => 1e-11, "q84")
  }

  test("q49 Lomb powers clear the 6dp grid") {
    assume(haveData)
    val withT = t.copy(df = t.df.withColumn("tsec", F.col("ts").cast("double")),
      timeCol = Some("tsec")).withSeriesKeys("user_id")
    val l = Periodogram.lombSpectrumByKey(withT, "value", nPeriods = 60)
    assertMargins(l, Seq("power"), 1e-6, 0.0, _ => 1e-12, "q49")
  }

  // ---- r9 interpolation gates (q106/q108): values land on a binary
  // lattice (2⁻¹²/2⁻⁶) whose residues mod 1e-4 CONTAIN the HALF_UP
  // boundaries, so the gate quantization shifts by half the lattice gap.
  // The margin is then guaranteed by arithmetic; what this spec pins is
  // that the SOLVE error (tridiagonal spline / HCT with LS gradients)
  // stays far inside it on the actual gate data.

  private def rnFrame: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wU = Window.partitionBy("user_id").orderBy("ts", "event_id")
    graft.SparkEntry.tbl(spark, sfDir, "events")
      .select(F.col("event_id"), F.col("user_id"), F.col("ts"))
      .withColumn("rn", F.row_number().over(wU))
      .withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
  }

  test("q106 spline fills clear the shifted 4dp grid (2^-12 lattice)") {
    assume(haveData)
    val base = rnFrame
    val x = F.col("rn") / F.lit(16.0)
    val a = F.col("user_id") % 5
    val b = F.col("user_id") % 7
    val vExact = x * x * x + a * x * x + b * x + F.lit(100.0)
    val gap = F.col("rn") % 4 === 2 && F.col("rn") < F.col("cnt")
    val df = base.withColumn("t", x)
      .withColumn("v", F.when(gap, F.lit(null).cast("double")).otherwise(vExact))
    val tsf = TimeseriesFrame(df, Some("t"), Seq("event_id"), Seq("user_id"))
    val filled = graft.ops.CubicSpline.interpolateByKey(tsf, "v")
    // solve error measured ≤ ~3e-10 at |v|≤300; bar 1e-9, margin 1.95e-7
    assertMargins(filled, Seq("v"), 1e-4, 1.953125e-7, _ => 1e-9, "q106")
  }

  test("q110 KN avg_logp/ppl clear their grids (4dp / 2dp)") {
    assume(haveData)
    val d = graft.SparkEntry.tbl(spark, sfDir, "documents")
    val model = graft.text.NgramLm.trainKneserNey(d, "text")
    val scored = graft.text.NgramLm.kneserNeyPerplexity(d, "doc_id", "text", model)
    // measured cross-engine deviation ~5e-14 (avg_logp) / ~2e-12 (ppl);
    // bars 1e-10 / 1e-8 leave 500-5000× beyond that, and the r9-measured
    // margins (5.3e-8 / 1.1e-5) clear the bars by 500×+
    assertMargins(scored, Seq("avg_logp"), 1e-4, 0.0, _ => 1e-10, "q110 logp")
    assertMargins(scored, Seq("ppl"), 1e-2, 0.0, _ => 1e-8, "q110 ppl")
  }

  test("q86 rolling-origin metrics clear the shifted 4dp grid") {
    assume(haveData)
    // the q81 class can land anywhere cross-engine float pipelines meet
    // a grid: exact-cents metric ratios terminate in decimal ON 6dp AND
    // unshifted-4dp boundaries (an sf0.1 rmse actually flipped; an
    // sf0.01 mae sat 1.7e-9 from its 6dp boundary, and 23.06425 exactly
    // on 4dp) — hence the scanned metricShift on a 4dp grid
    val t = graft.SparkEntry.tbl(spark, sfDir, "events")
    val tsf = TimeseriesFrame.fromColumn(t, "ts", Seq("event_id"))
      .withSeriesKeys("user_id")
    val m = graft.models.ModelEvaluation.evaluateNaiveDriftByKey(
      tsf, "value", nFolds = 3, steps = 3)
    assertMargins(m, Seq("rmse", "mae", "mape", "pocid", "r2"),
      1e-4, graft.SparkEntry.metricShift,
      va => 1e-12 * math.max(1.0, va) * 100, "q86")
  }

  test("q91 spectrogram magnitudes clear the 4dp grid") {
    assume(haveData)
    // FFT (JTransforms) vs the oracle's direct DFT — cross-algorithm like
    // q81; measured min margin 9.2e-7 on the gate data (~10⁶× deviation)
    val m = graft.multimodal.Multimodal.audioSpectrogram(
      graft.SparkEntry.plantedMedia(spark, sfDir, parity = Some(0)),
      "id", "payload")
    assertMargins(m, Seq("mag"), 1e-4, 0.0,
      va => 1e-12 * math.max(1.0, va) * 100, "q91")
  }

  test("q47 single-series metrics clear the 6dp grid") {
    assume(haveData)
    // q47's twin surface: 10 values over the daily means (not exact
    // cents), so 6dp margins are healthy — locked here so a testdata
    // regeneration that lands one on a boundary fails loudly instead of
    // flaking the gate (the q86 lesson)
    import graft.models.{Metrics, ModelEvaluation}
    val y = ModelEvaluation.collectSeries(
      graft.SparkEntry.daily(spark, sfDir), Seq("v")).map(_.head)
    val steps = 3; val nFolds = 3
    def pool(pred: (Int, Int) => Double): (Array[Double], Array[Double]) = {
      val pairs = for {
        fold <- 1 to nFolds
        te = y.length - fold * steps
        h <- 0 until steps
      } yield (y(te + h), pred(te, h))
      (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
    }
    val vals = Seq[(Int, Int) => Double](
      (te, _) => y(te - 1),
      (te, h) => y(te - 1) + (h + 1) * (y(te - 1) - y(0)) / (te - 1))
      .flatMap { p =>
        val (t, pr) = pool(p)
        Seq(Metrics.rmse(t, pr), Metrics.mae(t, pr), Metrics.mape(t, pr),
          Metrics.pocid(t, pr), Metrics.r2(t, pr))
      }
    vals.foreach { v =>
      val m = margin(v, 1e-6, 0.0)
      assert(m >= 1e-9, s"q47: value $v margin $m < 1e-9")
    }
  }

  test("q108 HCT fills clear the shifted 4dp grid (2^-6 lattice)") {
    assume(haveData)
    val base = rnFrame
    val i = (F.col("rn") - 1).cast("double")
    val p = (F.col("user_id") % 3 + 1).cast("double")
    val q = (F.col("user_id") % 5 + 1).cast("double")
    def vAt(j: Int) =
      p * i * i / 64.0 + i * F.lit(j) / 16.0 + F.lit(j * j) / 4.0 +
        q * i / 8.0 + F.lit(j) / 2.0 + F.lit(20.0)
    def gapAt(j: Int) =
      F.col("rn") > 1 && F.col("rn") < F.col("cnt") &&
        (F.col("rn") + F.lit(3 * j)) % 4 === 1
    val df = (0 until 4).foldLeft(base) { (d, j) =>
      val v = if (j == 0 || j == 3) vAt(j)
      else F.when(gapAt(j), F.lit(null).cast("double")).otherwise(vAt(j))
      d.withColumn(s"c$j", v)
    }
    val tsf = TimeseriesFrame(df, Some("ts"), Seq("event_id"), Seq("user_id"))
    val filled = graft.ops.Interpolate.multivariateByKey(
      tsf, Seq("c0", "c1", "c2", "c3"), "cubic")
    // estimated-gradient error ~1e-7 envelope; margin 1.25e-5 by lattice
    assertMargins(filled, Seq("c0", "c1", "c2", "c3"), 1e-4, 1.25e-5,
      _ => 1e-6, "q108")
  }
}
