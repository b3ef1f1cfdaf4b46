package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Spark-native carrier for an ordered (multi-)timeseries.
  *
  * Reference semantics (biolab/orange3-timeseries): a `Timeseries` is an
  * Orange `Table` plus a designated time column; constructing one sorts the
  * whole table by time and drops NaN-time rows
  * (reference `orangecontrib/timeseries/timeseries.py:219-239`). Spark
  * DataFrames are unordered, so instead of materializing a sort we carry the
  * ordering *specification* — `(timeCol, tieBreak*)` — and every positional
  * operator builds its `Window` from it. `seriesKeys` generalizes the
  * reference (which only ever has one global series) to grouped multi-series
  * operation: all window operators partition by these keys, which is what
  * makes the same code scale horizontally on a cluster — each series is an
  * independent partition, no global sort required.
  *
  * At 100 TB: single-series global windows are the reference's semantics and
  * inherently sequential; multi-series (`seriesKeys.nonEmpty`) is the scale
  * path and is what all operators here support natively.
  */
final case class TimeseriesFrame(
    df: DataFrame,
    timeCol: Option[String],
    tieBreak: Seq[String] = Nil,
    seriesKeys: Seq[String] = Nil,
    interpMethod: String = "linear",
    interpMultivariate: Boolean = false) {

  /** Total-order columns: time first, then tie-break (e.g. an ingest id) so
    * duplicate timestamps — legal in the reference (`timeseries.py:39-41`) —
    * still yield a deterministic order. */
  def orderCols: Seq[Column] = timeCol.map(col).toSeq ++ tieBreak.map(col)

  /** Base window: partitioned by series keys, ordered by the total order. */
  def window: WindowSpec =
    if (seriesKeys.isEmpty) Window.orderBy(orderCols: _*)
    else Window.partitionBy(seriesKeys.map(col): _*).orderBy(orderCols: _*)

  /** The base window with the total order REVERSED. Use for "next known
    * value" style lookaheads as `last(...).over(windowDesc.rowsBetween(
    * unboundedPreceding, 0))`: Spark evaluates unbounded-PRECEDING frames
    * incrementally (O(n) per partition) but recomputes unbounded-FOLLOWING
    * frames from scratch per row (O(n²) — `UnboundedFollowingWindow
    * FunctionFrame`), which turns a 600k-row interpolation into hours. */
  def windowDesc: WindowSpec = {
    val descCols = orderCols.map(_.desc)
    if (seriesKeys.isEmpty) Window.orderBy(descCols: _*)
    else Window.partitionBy(seriesKeys.map(col): _*).orderBy(descCols: _*)
  }

  /** Trailing row window of `width` rows ending at the current row. */
  def trailing(width: Int): WindowSpec =
    window.rowsBetween(-(width - 1L), 0L)

  /** Running window from the start of the series to the current row. */
  def running: WindowSpec =
    window.rowsBetween(Window.unboundedPreceding, 0L)

  /** Reference ingest semantics: drop rows with null/NaN time
    * (`timeseries.py:226-231`). The sort is NOT materialized — order is a
    * property of the windows, not of the physical data. */
  def dropNullTime: TimeseriesFrame = timeCol match {
    case Some(t) => copy(df = df.filter(col(t).isNotNull))
    case None    => this
  }

  def withSeriesKeys(keys: String*): TimeseriesFrame = copy(seriesKeys = keys)

  /** Reference `set_interp` (`timeseries.py:270-272`): remember the
    * interpolation settings on the table. */
  def withInterpolation(method: String, multivariate: Boolean = false): TimeseriesFrame =
    copy(interpMethod = method, interpMultivariate = multivariate)

  /** Reference `interp()` (`timeseries.py:274-299`): an interpolated copy
    * using the remembered settings, over `cols` or (default) every
    * numeric non-axis column. The multivariate griddata pre-pass applies
    * for all three reference variants ('nearest' / 'linear' / 'cubic' —
    * `Interpolate.multivariate*`); a univariate pass always follows, as
    * in the reference. */
  def interp(cols: Seq[String] = Nil): DataFrame = {
    val axis = timeCol.toSeq ++ tieBreak ++ seriesKeys
    val targets =
      if (cols.nonEmpty) cols
      else df.schema.fields.collect {
        case f if !axis.contains(f.name) &&
          f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
      }.toSeq
    val pre =
      if (interpMultivariate && targets.size >= 3) interpMethod match {
        case "nearest" =>
          copy(df = graft.ops.Interpolate.multivariateNearest(this, targets))
        case "linear" =>
          copy(df = graft.ops.Interpolate.multivariateLinear(this, targets))
        case "cubic" =>
          copy(df = graft.ops.Interpolate.multivariateCubic(this, targets))
        case _ => this
      }
      else this
    graft.ops.Interpolate(pre, targets, interpMethod)
  }

  /** Infer the time-spacing metadata (one small Spark job). */
  def timeDelta: TimeDelta = timeCol match {
    case Some(t) => TimeDelta.infer(df, t, seriesKeys)
    case None    => TimeDelta.empty
  }
}

object TimeseriesFrame {

  /** Reference `make_timeseries_from_continuous_var`
    * (`timeseries.py:219-239`): designate `timeCol` as the time axis and
    * drop rows where it is null. */
  def fromColumn(df: DataFrame, timeCol: String, tieBreak: Seq[String] = Nil): TimeseriesFrame =
    TimeseriesFrame(df, Some(timeCol), tieBreak).dropNullTime

  /** Reference `make_timeseries_from_sequence` (`timeseries.py:193-217`):
    * synthesize a time column `start + i*step` over the existing order given
    * by `orderBy` columns. Numeric units are plain epoch arithmetic (the
    * reference treats them as fixed second counts); month/year/century step
    * the calendar, clamping to month end (`add_months` matches the
    * reference's relativedelta path, `util.py:36-41`); century = 100 years
    * (`owtabletotimeseries.py:39-45`). */
  def fromSequence(
      df: DataFrame,
      orderBy: Seq[String],
      startEpochSec: Double,
      stepCount: Int,
      unit: String,
      outCol: String = "t"): TimeseriesFrame = {
    val w = Window.orderBy(orderBy.map(col): _*)
    val i = row_number().over(w) - lit(1)
    val start = timestamp_seconds(lit(startEpochSec))
    val numericSeconds: Map[String, Long] = Map(
      "second" -> 1L, "minute" -> 60L, "hour" -> 3600L,
      "day" -> 86400L, "week" -> 604800L)
    // `add_months` returns a DATE; re-attach the start's time-of-day so a
    // 1949-01-01T12:30 start keeps its clock time like relativedelta does.
    val secondsOfDay = ((startEpochSec % 86400) + 86400) % 86400
    def calendar(months: Column): Column =
      timestamp_seconds(
        unix_timestamp(add_months(start, months)) + lit(secondsOfDay))
    val ts = unit match {
      case u if numericSeconds.contains(u) =>
        timestamp_seconds(
          lit(startEpochSec) + i.cast("double") * stepCount * numericSeconds(u))
      case "month"   => calendar(i * stepCount)
      case "year"    => calendar(i * stepCount * 12)
      case "century" => calendar(i * stepCount * 1200)
      case u => throw new IllegalArgumentException(s"unknown unit: $u")
    }
    TimeseriesFrame(df.withColumn(outCol, ts), Some(outCol), orderBy)
  }
}
