package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.core.TimeseriesFrame
import graft.ops.Interpolate
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
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

  /** Lag-1 Granger F-statistic in closed form from normal-equation sums —
    * the hash-checkable core of [[pValue]]: both regressions (restricted
    * `y ~ y₋₁ + c`, unrestricted `y ~ y₋₁ + x₋₁ + c`) are solved by
    * Cramer's rule over ten scalar sums accumulated in ONE map-side-
    * combined Spark aggregation. When `yCol`/`xCol` are integer columns
    * the sums are exact (no floating-point reassociation), so any SQL
    * engine replaying the same fixed-order Cramer arithmetic reproduces
    * F bit-for-bit — the same fixed-parameter trick as `Arima.fitFixed`,
    * applied to the test statistic itself. Scale shape: the lag columns
    * are one keyed/ordered window over the (short, per-series) series;
    * the sums never move row-level data to the driver. For the general
    * k-regressor path with floating inputs see [[DistributedOls]].
    *
    * Output (one row): n (regression rows), beta_ylag, beta_xlag
    * (unrestricted), rss_r, rss_u, f_stat.
    *
    * Exactness bound: every sum must stay below 2⁵³ — |y|,|x| ≤ 3·10⁵ at
    * n ≤ 10⁵ rows is safe (Σy² ≤ 9·10¹⁵); rescale inputs above that. */
  def lag1ClosedForm(df: DataFrame, yCol: String, xCol: String,
      orderCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(orderCol)
    val lagged = df
      .select(col(yCol).cast("long").as("y"),
        lag(col(yCol).cast("long"), 1).over(w).as("u"),
        lag(col(xCol).cast("long"), 1).over(w).as("wl"))
      .na.drop(Seq("y", "u", "wl"))
    val r = lagged.agg(
      count(lit(1)).as("n"),
      sum(col("u")).as("su"), sum(col("wl")).as("sw"), sum(col("y")).as("sy"),
      sum(col("u") * col("u")).as("suu"), sum(col("wl") * col("wl")).as("sww"),
      sum(col("u") * col("wl")).as("suw"), sum(col("u") * col("y")).as("suy"),
      sum(col("wl") * col("y")).as("swy"), sum(col("y") * col("y")).as("syy")
    ).head()
    val n = r.getLong(0).toDouble
    val Seq(su, sw, sy, suu, sww, suw, suy, swy, syy) =
      (1 to 9).map(i => r.getLong(i).toDouble)

    // restricted y ~ u + const (2×2 normal equations)
    val detR = n * suu - su * su
    val bR = (n * suy - su * sy) / detR
    val aR = (sy - bR * su) / n
    val rssR = syy - aR * sy - bR * suy
    // unrestricted y ~ u + w + const: Cramer on the 3×3 system — keep
    // this operation order in sync with the SQL oracle (grangerLag1Sql)
    val d = suu * (sww * n - sw * sw) - suw * (suw * n - sw * su) +
      su * (suw * sw - sww * su)
    val d1 = suy * (sww * n - sw * sw) - suw * (swy * n - sw * sy) +
      su * (swy * sw - sww * sy)
    val d2 = suu * (swy * n - sw * sy) - suy * (suw * n - sw * su) +
      su * (suw * sy - swy * su)
    val d3 = suu * (sww * sy - swy * sw) - suw * (suw * sy - swy * su) +
      suy * (suw * sw - sww * su)
    val b1 = d1 / d
    val b2 = d2 / d
    val c = d3 / d
    val rssU = syy - b1 * suy - b2 * swy - c * sy
    val f = (rssR - rssU) / (rssU / (n - 3))

    val spark = df.sparkSession
    import spark.implicits._
    Seq((r.getLong(0), b1, b2, rssR, rssU, f))
      .toDF("n", "beta_ylag", "beta_xlag", "rss_r", "rss_u", "f_stat")
  }

  /** Per-series lag-1 Granger F — [[lag1ClosedForm]] with the Cramer
    * arithmetic lifted into Column expressions, so the WHOLE computation
    * (lags → ten exact sums → F) is distributed: one keyed window, one
    * map-side-combined aggregate, scan-stage arithmetic. No driver math
    * at all — the formulation for "does x lead y" across millions of
    * independent series in one job. Series with fewer than `minRows`
    * regression rows are dropped (a 3-regressor fit needs headroom, and
    * degenerate series produce NaN/±Inf F anyway). Operation order is
    * kept identical to [[lag1ClosedForm]] and the q63/q64 oracles. */
  def lag1ClosedFormByKey(df: DataFrame, yCol: String, xCol: String,
      orderCol: String, keyCols: Seq[String], minRows: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(orderCol)
    val lagged = df
      .select(keys :+ col(yCol).cast("long").as("y") :+
        lag(col(yCol).cast("long"), 1).over(w).as("u") :+
        lag(col(xCol).cast("long"), 1).over(w).as("wl"): _*)
      .na.drop(Seq("y", "u", "wl"))
    val sums = lagged.groupBy(keys: _*).agg(
      count(lit(1)).as("nn"),
      sum(col("u")).as("lsu"), sum(col("wl")).as("lsw"), sum(col("y")).as("lsy"),
      sum(col("u") * col("u")).as("lsuu"), sum(col("wl") * col("wl")).as("lsww"),
      sum(col("u") * col("wl")).as("lsuw"), sum(col("u") * col("y")).as("lsuy"),
      sum(col("wl") * col("y")).as("lswy"), sum(col("y") * col("y")).as("lsyy"))
      .filter(col("nn") >= minRows)
    val n = col("nn").cast("double")
    def d(c: String) = col(c).cast("double")
    val (su, sw, sy) = (d("lsu"), d("lsw"), d("lsy"))
    val (suu, sww, suw) = (d("lsuu"), d("lsww"), d("lsuw"))
    val (suy, swy, syy) = (d("lsuy"), d("lswy"), d("lsyy"))
    val detR = n * suu - su * su
    val dd = suu * (sww * n - sw * sw) - suw * (suw * n - sw * su) +
      su * (suw * sw - sww * su)
    // ill-posed series (constant y or x lag → singular system) are
    // DROPPED, not emitted as NaN/Inf: under ANSI mode Column `/` throws
    // DIVIDE_BY_ZERO, and one degenerate key must not kill a million-
    // series job; the And short-circuits, so the divisions below never
    // see a zero denominator. The oracle applies the same two guards.
    val wellPosed = sums.filter(detR =!= 0.0 && dd =!= 0.0)
    val bR = (n * suy - su * sy) / detR
    val aR = (sy - bR * su) / n
    val rssR = syy - aR * sy - bR * suy
    val d1 = suy * (sww * n - sw * sw) - suw * (swy * n - sw * sy) +
      su * (swy * sw - sww * sy)
    val d2 = suu * (swy * n - sw * sy) - suy * (suw * n - sw * su) +
      su * (suw * sy - swy * su)
    val d3 = suu * (sww * sy - swy * sw) - suw * (suw * sy - swy * su) +
      suy * (suw * sw - sww * su)
    val b1 = d1 / dd
    val b2 = d2 / dd
    val cc = d3 / dd
    val rssU = syy - b1 * suy - b2 * swy - cc * sy
    val staged = wellPosed.select(keys :+ col("nn").as("n") :+
      b1.as("beta_ylag") :+ b2.as("beta_xlag") :+ rssR.as("rss_r") :+
      rssU.as("rss_u"): _*)
    // perfect unrestricted fits (rss_u = 0) have no F either
    staged.filter(col("rss_u") =!= 0.0)
      .withColumn("f_stat",
        (col("rss_r") - col("rss_u")) /
          (col("rss_u") / (col("n").cast("double") - 3)))
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
