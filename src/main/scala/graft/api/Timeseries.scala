package graft.api

import graft.core.TimeseriesFrame
import graft.models.{Arima, Granger, ModelEvaluation, Var}
import graft.ops.{Interpolate, SeasonalDecompose}
import graft.spectral.{Correlation, Periodogram}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The scripting-API facade — one-to-one with the reference's public
  * surface (`orangecontrib/timeseries/__init__.py` re-exports +
  * `doc/scripting.rst`): a user of the reference can switch by mapping
  * each call below.
  *
  * {{{
  * import graft.api.Timeseries._
  * val data   = fromFile(spark, "datasets/airpassengers.csv")
  * val pgram  = periodogram(data, "Air passengers")
  * val acorr  = autocorrelation(data, "Air passengers")
  * val interp = interpolateTimeseries(data, Seq("Air passengers"))
  * val decomp = seasonalDecompose(data, Seq("Air passengers"), period = 12)
  * val fcast  = ARIMA((2, 1, 1)).fit(data, "Air passengers").predictAsTable(10)
  * val scores = modelEvaluation(data, "Air passengers", models, 10, 3)
  * val gc     = grangerCausality(data, cols, maxLag = 10)
  * }}}
  */
object Timeseries {

  /** `Timeseries.from_file` (`timeseries.py:183-186`). */
  def fromFile(spark: SparkSession, path: String): TimeseriesFrame =
    graft.ingest.OrangeCsv.read(spark, path)

  /** `Timeseries.make_timeseries_from_continuous_var`. */
  def fromColumn(df: DataFrame, timeCol: String): TimeseriesFrame =
    TimeseriesFrame.fromColumn(df, timeCol)

  /** `periodogram(data)` (`functions.py:76-106`). */
  def periodogram(data: TimeseriesFrame, col: String,
      detrend: String = "diff"): DataFrame =
    Periodogram.periodogram(data, col, detrend)

  /** `periodogram_nonequispaced` (`functions.py:109-174`). */
  def periodogramNonequispaced(data: TimeseriesFrame, col: String,
      nPeriods: Int = 1000, detrend: String = "linear"): DataFrame =
    Periodogram.lombScargle(data, col, nPeriods, detrend)

  /** `autocorrelation(data)` (`functions.py:192-218`). */
  def autocorrelation(data: TimeseriesFrame, col: String): DataFrame =
    Correlation.acf(data.df.sparkSession, data, col)

  /** `partial_autocorrelation(data)` (`functions.py:221-246`). */
  def partialAutocorrelation(data: TimeseriesFrame, col: String): DataFrame =
    Correlation.pacf(data.df.sparkSession, data, col)

  /** `interpolate_timeseries(data, method)` (`functions.py:249-345`). */
  def interpolateTimeseries(data: TimeseriesFrame, cols: Seq[String],
      method: String = "linear"): DataFrame =
    Interpolate(data, cols, method)

  /** `seasonal_decompose(data, model, period)` (`functions.py:348-430`). */
  def seasonalDecompose(data: TimeseriesFrame, cols: Seq[String], period: Int,
      model: String = "multiplicative"): DataFrame =
    SeasonalDecompose(data, cols, period, model)

  /** `moving_transform(data, spec)` (`doc/scripting.rst:93-115`; the
    * function was folded into the widget upstream —
    * `owmovingtransform.py:380-444` — spec = (variable, window length,
    * agg) tuples; the Spark shape fixes one shared width per call, one
    * `WindowExec` for every agg). */
  def movingTransform(data: TimeseriesFrame, specs: Seq[(String, String)],
      width: Int): DataFrame =
    graft.ops.MovingTransform.slidingWindow(data, specs, width)

  /** `granger_causality(data, max_lag, alpha)` (`functions.py:433-492`). */
  def grangerCausality(data: TimeseriesFrame, cols: Seq[String],
      maxLag: Int = 10, alpha: Double = 0.05): DataFrame =
    Granger.causality(data.df.sparkSession, data, cols, maxLag, alpha)

  /** `model_evaluation(data, models, n_folds, forecast_steps)`
    * (`functions.py:495-582`). */
  def modelEvaluation(data: TimeseriesFrame, target: String,
      models: Seq[ModelEvaluation.Spec], nFolds: Int,
      forecastSteps: Int): DataFrame =
    ModelEvaluation.evaluate(data.df.sparkSession, data, Seq(target),
      models, nFolds, forecastSteps)

  /** `ARIMA(order)` (`models.py:279-328`) with the fit/predict contract. */
  final case class ARIMA(order: (Int, Int, Int)) {
    def fit(data: TimeseriesFrame, target: String): FittedArima = {
      val interp = data.copy(df = Interpolate(data, Seq(target), "linear"))
      val y = ModelEvaluation.collectSeries(interp, Seq(target)).map(_.head)
      FittedArima(new Arima(order._1, order._2, order._3).fit(y),
        data.df.sparkSession, target)
    }
  }
  final case class FittedArima(model: Arima, spark: SparkSession, name: String) {
    def predict(steps: Int, alpha: Double = 0.05)
        : (Array[Double], Array[Double], Array[Double]) =
      model.predict(steps, alpha)
    def predictAsTable(steps: Int, alpha: Double = 0.05): DataFrame = {
      val (fo, lo, hi) = model.predict(steps, alpha)
      graft.models.ForecastTable.asTable(spark, name, fo, lo, hi,
        ((1 - alpha) * 100).toInt)
    }
    def errors(): Map[String, Double] = model.errors()
  }

  /** `VAR(maxlags, ic, trend)` (`models.py:331-402`). */
  final case class VAR(maxlags: Option[Int] = None, ic: Option[String] = None,
      trend: String = "c") {
    def fit(data: TimeseriesFrame, cols: Seq[String]): Var = {
      val interp = data.copy(df = Interpolate(data, cols, "linear"))
      new Var(maxlags, ic, trend)
        .fit(ModelEvaluation.collectSeries(interp, cols))
    }
  }
}
