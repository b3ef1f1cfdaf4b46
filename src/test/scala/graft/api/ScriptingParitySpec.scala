package graft.api

import graft.SparkSpec
import graft.models.ModelEvaluation

/** Runs the reference's canonical scripting flow (`doc/scripting.rst`,
  * itself executed as a doctest by `tests/test_doctests.py:53-73`)
  * end-to-end through the facade. */
class ScriptingParitySpec extends SparkSpec {

  test("scripting.rst canonical flow end-to-end") {
    import Timeseries._
    val data = fromFile(spark, getClass.getResource("/airpassengers.csv").getPath)
    assert(data.df.count() == 144)

    val pgram = periodogram(data, "Air passengers").collect()
    assert(math.round(pgram.maxBy(_.getDouble(1)).getDouble(0)) == 6)

    val acorr = autocorrelation(data, "Air passengers")
      .orderBy("lag").limit(1).head()
    assert(acorr.getLong(0) == 12)

    val interp = interpolateTimeseries(data, Seq("Air passengers"))
    assert(interp.filter(interp("Air passengers").isNull).count() == 0)

    val decomp = seasonalDecompose(data, Seq("Air passengers"), period = 12)
    assert(decomp.columns.count(_.startsWith("Air passengers_")) == 4)

    val forecast = ARIMA((2, 1, 1)).fit(data, "Air passengers")
      .predictAsTable(10)
    assert(forecast.count() == 10)
    assert(forecast.columns.toSeq.contains("Air passengers (forecast)"))

    val scores = modelEvaluation(data, "Air passengers",
      Seq(ModelEvaluation.ArimaSpec2(1, 1, 0), ModelEvaluation.VarSpec(1)),
      nFolds = 3, forecastSteps = 3)
    assert(scores.count() == 4) // 2 models × (cv + in-sample)

    // the remaining facade functions the doctest flow does not reach
    val pacf = partialAutocorrelation(data, "Air passengers").collect()
    assert(pacf.nonEmpty && pacf.forall(r => math.abs(r.getDouble(1)) <= 1.0001))
    val ls = periodogramNonequispaced(data, "Air passengers")
    assert(ls.count() > 0)
  }

  test("ARIMA.fit interpolates BEFORE fitting (the _owmodel.py:71-72 glue)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import Timeseries._
    // AR(1)-ish series with a block of nulls: the glue's linear interp
    // bridges the gap; fitting the null-dropped series instead would see
    // a spliced jump and land on different coefficients/forecasts
    val n = 120
    val vals = Array.tabulate(n)(i =>
      50.0 + 10.0 * math.sin(i * 0.7) + 5.0 * math.sin(i * 2.3) + (i * 37) % 11 - 5)
    val rows = (0 until n).map { i =>
      val v: java.lang.Double =
        if (i >= 40 && i < 52) null else Double.box(vals(i))
      (i.toLong, v)
    }
    val df = rows.toDF("t", "y")
    val data = graft.core.TimeseriesFrame(df, Some("t"))
    val glue = ARIMA((1, 1, 0)).fit(data, "y").predict(5)._1
    // same model on the null-DROPPED series (no interp): must differ —
    // proves the golden gate (q127) actually pins the interp step
    val dropped = graft.core.TimeseriesFrame(df.filter(col("y").isNotNull), Some("t"))
    val yDrop = ModelEvaluation.collectSeries(dropped, Seq("y")).map(_.head)
    val noInterp = new graft.models.Arima(1, 1, 0).fit(yDrop).predict(5)._1
    assert(glue.length == 5 && noInterp.length == 5)
    assert(glue.zip(noInterp).exists { case (a, b) => math.abs(a - b) > 1e-6 },
      s"interp step not load-bearing: ${glue.toSeq} == ${noInterp.toSeq}")
    // and the glue result equals fit-on-explicitly-interpolated — the
    // documented equivalence, not just "different from wrong"
    val interpDf = interpolateTimeseries(data, Seq("y"))
    val yIn = ModelEvaluation.collectSeries(
      graft.core.TimeseriesFrame(interpDf, Some("t")), Seq("y")).map(_.head)
    val explicit = new graft.models.Arima(1, 1, 0).fit(yIn).predict(5)._1
    assert(glue.zip(explicit).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      s"glue != fit-on-interp: ${glue.toSeq} vs ${explicit.toSeq}")
  }
}
