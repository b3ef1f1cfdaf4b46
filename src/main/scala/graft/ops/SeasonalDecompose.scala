package graft.ops

import graft.agg.AggRegistry.nanToNull
import graft.core.TimeseriesFrame
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classical seasonal decomposition — the Spark re-expression of the
  * reference's `seasonal_decompose` (`orangecontrib/timeseries/
  * functions.py:348-430`, statsmodels `seasonal_decompose` semantics):
  *
  *  - trend: centered moving average; for even periods the convolution
  *    filter is `[0.5, 1, …, 1, 0.5]/p` over p+1 points (expressed as one
  *    window sum minus half the two endpoint lags — one `WindowExec`);
  *  - trend edges (the p/2 rows with no full window) are extrapolated by a
  *    least-squares line over the first/last ≤3 defined trend points
  *    (`_interp_trend`, `functions.py:377-394`) — fitted with
  *    `regr_slope`/`regr_intercept` aggregates;
  *  - seasonal: per-phase mean of the detrended series (phase = row index
  *    mod p relative to the series start), re-centered by the mean of the p
  *    phase averages (subtract for additive, divide for multiplicative) —
  *    one tiny groupBy broadcast back;
  *  - adjusted = observed ∘ seasonal, residual = adjusted ∘ trend
  *    (∘ = − or ÷ per model); original nulls re-applied (`:411-415`).
  *
  * Output appends 4 columns per input column:
  * `<c>_adjusted`, `<c>_seasonal`, `<c>_trend`, `<c>_residual`.
  */
object SeasonalDecompose {

  def apply(tsf: TimeseriesFrame, cols: Seq[String], period: Int,
      model: String = "multiplicative"): DataFrame = {
    require(model == "multiplicative" || model == "additive",
      s"unknown model: $model")
    val comp: (Column, Column) => Column =
      if (model == "additive") (a, b) => a - b else (a, b) => a / b
    cols.foldLeft(tsf.df) { (df, c) => decomposeOne(tsf.copy(df = df), c, period, comp) }
  }

  private def decomposeOne(tsf: TimeseriesFrame, c: String, p: Int,
      comp: (Column, Column) => Column): DataFrame = {
    val w = tsf.window
    val x = nanToNull(col(c))
    val rn = row_number().over(w) - 1 // 0-based position
    val even = p % 2 == 0
    val h = p / 2

    // --- trend: centered MA (only defined on full windows) --------------
    val trendRaw =
      if (even) {
        val frame = w.rowsBetween(-h, h)
        (sum(x).over(frame)
          - lit(0.5) * (lag(x, h).over(w) + lead(x, h).over(w))) / p
      } else {
        avg(x).over(w.rowsBetween(-h, h))
      }
    val n = tsf.df.count()
    val first = h.toLong                 // first defined trend position
    val last = n - 1 - h                 // last defined trend position
    val base = tsf.df
      .withColumn("__rn", rn.cast("long"))
      .withColumn("__trend0",
        when(col("__rn") >= first && col("__rn") <= last, trendRaw))

    // --- edge extrapolation over ≤3 defined points (functions.py:377-394)
    val firstEnd = math.min(first + 3, last)
    val lastStart = math.max(first, last - 3)
    val fits = base.agg(
      regr_slope(when(col("__rn") >= first && col("__rn") < firstEnd, col("__trend0")),
        when(col("__rn") >= first && col("__rn") < firstEnd, col("__rn"))).as("k1"),
      regr_intercept(when(col("__rn") >= first && col("__rn") < firstEnd, col("__trend0")),
        when(col("__rn") >= first && col("__rn") < firstEnd, col("__rn"))).as("c1"),
      regr_slope(when(col("__rn") >= lastStart && col("__rn") < last, col("__trend0")),
        when(col("__rn") >= lastStart && col("__rn") < last, col("__rn"))).as("k2"),
      regr_intercept(when(col("__rn") >= lastStart && col("__rn") < last, col("__trend0")),
        when(col("__rn") >= lastStart && col("__rn") < last, col("__rn"))).as("k2c"))
      .head()
    val (k1, c1, k2, c2) =
      (fits.getDouble(0), fits.getDouble(1), fits.getDouble(2), fits.getDouble(3))
    val trend =
      when(col("__rn") < first, col("__rn") * k1 + c1)
        .when(col("__rn") > last, col("__rn") * k2 + c2)
        .otherwise(col("__trend0"))

    // --- seasonal: per-phase mean of detrended, re-centered --------------
    val withDetr = base
      .withColumn("__phase", col("__rn") % p)
      .withColumn("__detr", comp(x, col("__trend0")))
    val phaseAvg = withDetr.groupBy(col("__phase"))
      .agg(avg(col("__detr")).as("__pavg"))
    val grand = phaseAvg.agg(avg(col("__pavg"))).head().getDouble(0)
    val seasonalCol =
      if (grand.isNaN) lit(Double.NaN)
      else comp(col("__pavg"), lit(grand))
    val withSeason = withDetr
      .join(broadcast(phaseAvg), "__phase")
      .withColumn(s"${c}_seasonal", seasonalCol)

    val adjusted = comp(x, col(s"${c}_seasonal"))
    val origNull = col(c).isNull || isnan(col(c).cast("double"))
    withSeason
      .withColumn(s"${c}_adjusted", when(origNull, lit(null)).otherwise(adjusted))
      .withColumn(s"${c}_trend", when(origNull, lit(null)).otherwise(trend))
      .withColumn(s"${c}_residual",
        when(origNull, lit(null)).otherwise(comp(adjusted, trend)))
      .drop("__rn", "__trend0", "__phase", "__detr", "__pavg")
  }
}
