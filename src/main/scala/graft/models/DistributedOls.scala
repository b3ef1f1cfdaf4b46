package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OLS by normal-equation aggregation — the horizontally-scalable
  * regression primitive behind Granger causality, VAR, and evaluation
  * scoring at corpus scale: accumulate `X'X` and `X'y` as ONE Spark
  * aggregation (k(k+3)/2 + 2 scalar sums, map-side partial-combined),
  * then solve the (k+1)-dimensional system on the driver. No row-level
  * data ever reaches the driver and nothing is windowed, so the same
  * plan regresses a 10¹¹-row design matrix; contrast with
  * [[Granger.pValue]]/[[Var]], which collect the (small, per-series)
  * series and fit with Breeze — the reference semantics
  * (`functions.py:433-492`), correct when series are bounded, with
  * [[PerSeries]] as the many-models fan-out. This is the path for the
  * single giant regression the reference cannot express.
  */
object DistributedOls {

  /** `beta` in `xCols` order, intercept fitted last. `rss` via the
    * normal-equation identity `y'y − β'X'y` (exact in exact arithmetic;
    * centered inputs keep it well-conditioned in floating point). */
  final case class Fit(beta: Array[Double], intercept: Double, rss: Double,
      n: Long, r2: Double)

  def fit(df: DataFrame, yCol: String, xCols: Seq[String]): Fit = {
    val k = xCols.size
    require(k >= 1, "need at least one regressor")
    val y = col(yCol).cast("double")
    val xs = xCols.map(c => col(c).cast("double"))
    val clean = df.na.drop(yCol +: xCols)
    val aggs = Seq(count(lit(1)).as("n"), sum(y), sum(y * y)) ++
      xs.map(x => sum(x)) ++
      xs.map(x => sum(x * y)) ++
      (for { i <- 0 until k; j <- i until k } yield sum(xs(i) * xs(j)))
    val r = clean.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    require(n > k + 1, s"need > ${k + 1} rows, got $n")
    val sy = r.getDouble(1)
    val syy = r.getDouble(2)
    val sx = Array.tabulate(k)(i => r.getDouble(3 + i))
    val sxy = Array.tabulate(k)(i => r.getDouble(3 + k + i))

    val xtx = DenseMatrix.zeros[Double](k + 1, k + 1)
    var idx = 3 + 2 * k
    for (i <- 0 until k; j <- i until k) {
      val v = r.getDouble(idx); idx += 1
      xtx(i, j) = v; xtx(j, i) = v
    }
    for (i <- 0 until k) { xtx(i, k) = sx(i); xtx(k, i) = sx(i) }
    xtx(k, k) = n.toDouble
    val xty = DenseVector(sxy :+ sy)
    val sol = xtx \ xty
    val rss = syy - (0 to k).map(i => sol(i) * xty(i)).sum
    val mean = sy / n
    val tss = syy - n * mean * mean
    Fit(Array.tabulate(k)(sol(_)), sol(k), rss, n,
      if (tss > 0) 1.0 - rss / tss else Double.NaN)
  }
}
