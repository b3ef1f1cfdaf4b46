package graft.spectral

import graft.SparkSpec
import graft.core.TimeseriesFrame
import graft.ingest.OrangeCsv
import graft.ops.SeasonalDecompose
import org.apache.spark.sql.functions._

/** End-to-end spectral/seasonal goldens on the canonical airpassengers
  * fixture, transcribed from `tests/test_correlation.py:11-18`,
  * `tests/test_periodogram.py:11-18`, `tests/test_seasonal.py:11-22`. */
class SpectralSpec extends SparkSpec {

  private lazy val air: TimeseriesFrame = {
    val path = getClass.getResource("/airpassengers.csv").getPath
    OrangeCsv.read(spark, path)
  }

  test("fixture loads: 144 monthly rows, time column detected") {
    assert(air.df.count() == 144)
    assert(air.timeCol.contains("Month"))
    val td = air.timeDelta
    // mixed month lengths → not equispaced on raw deltas (`timeseries.py:44-47`),
    // but classified to a single calendar step with gcd = min = (1, month)
    assert(!td.isEquispaced)
    assert(td.deltas == Seq(Right((1, "month"))))
    assert(td.gcd.contains(Right((1, "month"))))
  }

  test("ACF peaks at lags 12/24/36/48, positive (test_correlation.py:12-15)") {
    val peaks = Correlation.acf(spark, air, "Air passengers")
      .orderBy("lag").limit(4).collect()
    assert(peaks.map(_.getLong(0)).toSeq == Seq(12L, 24L, 36L, 48L))
    assert(peaks.forall(_.getDouble(1) > 0))
  }

  test("all three ACF formulations agree (ring-pass, window, explode-join)") {
    val a = Correlation.acfVector(air, "Air passengers", 30)
    val w = Correlation.acfVectorWindow(air, "Air passengers", 30)
    val b = Correlation.acfVectorDistributed(air, "Air passengers", 30)
    a.zip(w).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"ring vs window must be bit-identical, lag $i: $x vs $y")
    }
    a.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(math.abs(x - y) < 1e-10, s"lag $i: $x vs $y")
    }
  }

  test("PACF peaks at lags 9/13/25 (test_correlation.py:17-19)") {
    val peaks = Correlation.pacf(spark, air, "Air passengers")
      .orderBy("lag").limit(3).collect()
    assert(peaks.map(_.getLong(0)).toSeq == Seq(9L, 13L, 25L))
    assert(peaks.head.getDouble(1) > 0)
  }

  test("periodogram: max scaled power 1 at period ≈ 6 (test_periodogram.py:11-14)") {
    val p = Periodogram.periodogram(air, "Air passengers").collect()
    val top = p.maxBy(_.getDouble(1))
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-9)
    assert(math.round(top.getDouble(0)) == 6)
  }

  test("Lomb-Scargle on epoch times: max scaled power 1 (test_periodogram.py:16-18)") {
    val withEpoch = air.copy(df =
      air.df.withColumn("t", col("Month").cast("double")), timeCol = Some("t"))
    val p = Periodogram.lombScargle(withEpoch, "Air passengers", detrend = "diff")
      .collect()
    assert(p.nonEmpty)
    assert(math.abs(p.map(_.getDouble(1)).max - 1.0) < 1e-9)
  }

  test("multiplicative decomposition identities (test_seasonal.py:12-22)") {
    val out = SeasonalDecompose(air, Seq("Air passengers"), period = 12)
    val rows = out.orderBy("Month").select(
      col("Air passengers"), col("Air passengers_adjusted"),
      col("Air passengers_seasonal"), col("Air passengers_trend"),
      col("Air passengers_residual")).collect()
    assert(rows.length == 144)
    rows.foreach { r =>
      val Seq(x, adj, sea, tr, res) = (0 until 5).map(r.getDouble).toSeq
      assert(math.abs(adj - tr * res) < 1e-8 * math.abs(adj),
        s"adjusted != trend*residual: $adj vs ${tr * res}")
      assert(math.abs(x - adj * sea) < 1e-8 * math.abs(x),
        s"observed != adjusted*seasonal: $x vs ${adj * sea}")
    }
  }
}
