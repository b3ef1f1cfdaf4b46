package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.core.TimeseriesFrame
import graft.ops.Interpolate
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Granger causality — `granger_causality`
  * (`orangecontrib/timeseries/functions.py:433-492`): for every ordered
  * pair of continuous variables on the INTERPOLATED data, find the smallest
  * lag ≤ maxLag whose `ssr_ftest` p-value < alpha; emit
  * [lag, p, antecedent, consequent].
  *
  * The F-test per (pair, lag) follows statsmodels `grangercausalitytests`:
  * unrestricted OLS of y on [y-lags, x-lags, const] vs restricted on
  * [y-lags, const]; F = ((RSSr − RSSu)/L) / (RSSu/(n − 2L − 1)).
  * Pairs×lags are independent — the loop parallelizes trivially (the
  * reference runs it on a worker thread; here each pair's regressions are
  * tiny driver-side solves on the collected pair of columns).
  */
object Granger {

  /** OLS residual sum of squares of y ~ X (with intercept appended). */
  private def rss(y: Array[Double], xCols: Array[Array[Double]]): Double = {
    val n = y.length
    val p = xCols.length + 1
    val X = DenseMatrix.zeros[Double](n, p)
    for (r <- 0 until n) {
      for (c <- xCols.indices) X(r, c) = xCols(c)(r)
      X(r, p - 1) = 1.0
    }
    val yv = DenseVector(y)
    val beta = X \ yv
    val resid = yv - X * beta
    resid dot resid
  }

  /** p-value of x Granger-causing y at the given lag. */
  def pValue(y: Array[Double], x: Array[Double], lag: Int): Double = {
    val n = y.length - lag
    if (n <= 2 * lag + 1) return Double.NaN
    val yv = y.drop(lag)
    val yLags = (1 to lag).map(l => y.slice(lag - l, y.length - l)).toArray
    val xLags = (1 to lag).map(l => x.slice(lag - l, x.length - l)).toArray
    val rssU = rss(yv, yLags ++ xLags)
    val rssR = rss(yv, yLags)
    val dfDenom = n - 2 * lag - 1
    val f = ((rssR - rssU) / lag) / (rssU / dfDenom)
    if (f.isNaN || f < 0) return Double.NaN
    val dist = new org.apache.commons.math3.distribution.FDistribution(lag, dfDenom)
    1.0 - dist.cumulativeProbability(f)
  }

  /** All ordered pairs over `cols`; returns DataFrame
    * (lag, p_value, antecedent, consequent) — only pairs with some
    * significant lag, like the reference. */
  def causality(
      spark: SparkSession,
      tsf: TimeseriesFrame,
      cols: Seq[String],
      maxLag: Int = 10,
      alpha: Double = 0.05): DataFrame = {
    val interp = tsf.copy(df = Interpolate(tsf, cols, "linear"))
    val series = ModelEvaluation.collectSeries(interp, cols)
    val byCol = cols.indices.map(i => series.map(_(i))).toArray

    // ordered pairs are independent — one Spark task each over the
    // broadcast series (the reference moves this loop to a worker thread,
    // `owgrangercausality.py:17-26`; here it fans out across executors)
    val sc = spark.sparkContext
    val bCols = sc.broadcast(byCol)
    val pairs = for { ai <- cols.indices; ci <- cols.indices if ai != ci }
      yield (ai, ci)
    val found = sc.parallelize(pairs, math.max(pairs.size, 1))
      .flatMap { case (ai, ci) =>
        (1 to maxLag).iterator
          .map(l => l -> pValue(bCols.value(ci), bCols.value(ai), l))
          .find { case (_, p) => !p.isNaN && p < alpha }
          .map { case (l, p) => (l.toLong, p, ai, ci) }.iterator
      }
      .collect()
    val rows = found.sortBy(r => (r._3, r._4)).toIndexedSeq
      .map { case (l, p, ai, ci) => Row(l, p, cols(ai), cols(ci)) }

    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("lag", LongType), StructField("p_value", DoubleType),
        StructField("antecedent", StringType), StructField("consequent", StringType))))
  }
}
