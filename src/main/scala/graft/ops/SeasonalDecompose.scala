package graft.ops

import graft.agg.AggRegistry.nanToNull
import graft.core.TimeseriesFrame
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
      if (model == "additive") (a, b) => a - b
      // zero trend/seasonal index → null component (statsmodels yields
      // inf/nan; under ANSI a raw `/` would abort the job instead)
      else (a, b) => when(b === 0.0, lit(null).cast("double")).otherwise(a / b)
    cols.foldLeft(tsf.df) { (df, c) => decomposeOne(tsf.copy(df = df), c, period, comp) }
  }

  private def decomposeOne(tsf: TimeseriesFrame, c: String, p: Int,
      comp: (Column, Column) => Column): DataFrame = {
    val w = tsf.window
    val keys = tsf.seriesKeys
    val keyCols = keys.map(col)
    val x = nanToNull(col(c))
    val rn = row_number().over(w) - 1 // 0-based position within the series
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
    // per-series length/edge positions as columns — no driver-side count(),
    // correct under seriesKeys partitioning
    val wholePart = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val base = tsf.df
      .withColumn("__rn", rn.cast("long"))
      .withColumn("__n", count(lit(1)).over(wholePart))
      .withColumn("__trend0",
        when(col("__rn") >= h && col("__rn") <= col("__n") - 1 - h, trendRaw))

    // --- edge extrapolation over ≤3 defined points (functions.py:377-394),
    // fitted per series with regr_slope/regr_intercept; the per-window mean
    // backs a flat-line fallback when <2 points leave the regression null
    val lastPos = col("__n") - 1 - h
    val firstEnd = least(lit(h.toLong) + 3, lastPos)
    val lastStart = greatest(lit(h.toLong), lastPos - 3)
    val c1cond = col("__rn") >= h && col("__rn") < firstEnd
    val c2cond = col("__rn") >= lastStart && col("__rn") < lastPos
    val fits = base.groupBy(keyCols: _*).agg(
      regr_slope(when(c1cond, col("__trend0")), when(c1cond, col("__rn"))).as("__k1"),
      regr_intercept(when(c1cond, col("__trend0")), when(c1cond, col("__rn"))).as("__c1"),
      avg(when(c1cond, col("__trend0"))).as("__m1"),
      regr_slope(when(c2cond, col("__trend0")), when(c2cond, col("__rn"))).as("__k2"),
      regr_intercept(when(c2cond, col("__trend0")), when(c2cond, col("__rn"))).as("__c2"),
      avg(when(c2cond, col("__trend0"))).as("__m2"))
    val withFits =
      if (keys.isEmpty) base.crossJoin(broadcast(fits))
      else base.join(fits, keys) // one tiny row per series; AQE broadcasts
    val trend =
      when(col("__rn") < h,
        col("__rn") * coalesce(col("__k1"), lit(0.0)) + coalesce(col("__c1"), col("__m1")))
        .when(col("__rn") > lastPos,
          col("__rn") * coalesce(col("__k2"), lit(0.0)) + coalesce(col("__c2"), col("__m2")))
        .otherwise(col("__trend0"))

    // --- seasonal: per-phase mean of detrended, re-centered --------------
    val withDetr = withFits
      .withColumn("__phase", col("__rn") % p)
      .withColumn("__detr", comp(x, col("__trend0")))
    val grandW =
      if (keys.isEmpty) Window.partitionBy()
      else Window.partitionBy(keyCols: _*)
    val phaseAvg = withDetr.groupBy((keyCols :+ col("__phase")): _*)
      .agg(avg(col("__detr")).as("__pavg"))
      .withColumn("__grand", avg(col("__pavg")).over(grandW))
    val withSeason = withDetr
      .join(broadcast(phaseAvg), keys :+ "__phase")
      .withColumn(s"${c}_seasonal", comp(col("__pavg"), col("__grand")))

    val adjusted = comp(x, col(s"${c}_seasonal"))
    val origNull = col(c).isNull || isnan(col(c).cast("double"))
    withSeason
      .withColumn(s"${c}_adjusted", when(origNull, lit(null)).otherwise(adjusted))
      .withColumn(s"${c}_trend", when(origNull, lit(null)).otherwise(trend))
      .withColumn(s"${c}_residual",
        when(origNull, lit(null)).otherwise(comp(adjusted, trend)))
      .drop("__rn", "__n", "__trend0", "__phase", "__detr", "__pavg", "__grand",
        "__k1", "__c1", "__m1", "__k2", "__c2", "__m2")
  }
}
