package graft.models

/** Forecast scoring metrics with the reference's (nonstandard) definitions
  * (`orangecontrib/timeseries/functions.py:21-49`):
  * `mae` is the MEDIAN absolute error, `mape` is `mean|err| / mean|true|`,
  * `pocid` is the percentage of same-sign direction changes. All align
  * `true` to the last `len(pred)` observations. */
object Metrics {

  private def tail(t: Array[Double], n: Int): Array[Double] = t.takeRight(n)

  def r2(trueV: Array[Double], pred: Array[Double]): Double = {
    val t = tail(trueV, pred.length)
    val mu = t.sum / t.length
    1 - t.zip(pred).map { case (a, b) => (a - b) * (a - b) }.sum /
      t.map(a => (a - mu) * (a - mu)).sum
  }

  def rmse(trueV: Array[Double], pred: Array[Double]): Double = {
    val t = tail(trueV, pred.length)
    math.sqrt(t.zip(pred).map { case (a, b) => (a - b) * (a - b) }.sum / pred.length)
  }

  def mape(trueV: Array[Double], pred: Array[Double]): Double = {
    val t = tail(trueV, pred.length)
    val num = t.zip(pred).map { case (a, b) => math.abs(a - b) }.sum / pred.length
    num / (trueV.map(math.abs).sum / trueV.length)
  }

  /** Median absolute error (`functions.py:40-43`). */
  def mae(trueV: Array[Double], pred: Array[Double]): Double = {
    val t = tail(trueV, pred.length)
    val abs = t.zip(pred).map { case (a, b) => math.abs(a - b) }.sorted
    val n = abs.length
    if (n == 0) Double.NaN
    else if (n % 2 == 1) abs(n / 2)
    else (abs(n / 2 - 1) + abs(n / 2)) / 2.0
  }

  /** Prediction on change of direction (`functions.py:46-49`). */
  def pocid(trueV: Array[Double], pred: Array[Double]): Double = {
    val t = tail(trueV, pred.length)
    val dt = t.sliding(2).map(a => a(1) - a(0)).toArray
    val dp = pred.sliding(2).map(a => a(1) - a(0)).toArray
    if (dt.isEmpty) return Double.NaN
    100.0 * dt.zip(dp).count { case (a, b) => a * b > 0 } / dt.length
  }
}
