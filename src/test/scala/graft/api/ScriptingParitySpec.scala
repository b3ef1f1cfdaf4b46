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
}
