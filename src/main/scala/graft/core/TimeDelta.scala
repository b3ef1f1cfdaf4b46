package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inferred spacing metadata of a timeseries — the Spark re-expression of
  * the reference's `TimeDelta` (`orangecontrib/timeseries/timeseries.py:17-91`):
  * unique sorted deltas with zero-delta removal (`:37-43`), calendar
  * recognition ({2419200, 2505600, 2592000, 2678400}s → 1 month,
  * {31536000, 31622400}s → 1 year, `:50-57`).
  *
  * Field semantics follow the reference's order of operations exactly:
  *  - `isEquispaced` / `timeInterval` are decided on the RAW numeric deltas
  *    BEFORE calendar classification (`:44-47`) — a monthly series with
  *    mixed month lengths is NOT equispaced, and an all-30-day monthly
  *    series is equispaced with a *numeric* `timeInterval` of 2592000;
  *  - `deltas` holds each distinct step either as Left(seconds) or
  *    Right((count, unit)), first-occurrence deduplicated (`:49-57`);
  *  - `min` is the first (smallest-raw) classified delta (`:59`);
  *  - `gcd` (`:61-72`): all numeric → gcd of integer seconds; all calendar
  *    tuples → `min`; mixed → gcd of the numerics and one day (86400).
  */
final case class TimeDelta(
    deltas: Seq[Either[Double, (Int, String)]],
    isEquispaced: Boolean,
    timeInterval: Option[Double],
    min: Option[Either[Double, (Int, String)]],
    gcd: Option[Either[Double, (Int, String)]]) {

  /** Scalar seconds of the single raw step, when equispaced. */
  def intervalSeconds: Option[Double] = timeInterval

  /** Numeric gcd seconds, when the gcd is numeric. */
  def gcdSeconds: Option[Double] = gcd.flatMap {
    case Left(s) => Some(s)
    case Right(_) => None
  }
}

object TimeDelta {
  val empty: TimeDelta = TimeDelta(Nil, isEquispaced = false, None, None, None)

  private val MonthSeconds = Set(2419200.0, 2505600.0, 2592000.0, 2678400.0)
  private val YearSeconds = Set(31536000.0, 31622400.0)
  private val DaySeconds = 86400.0

  private def gcdLong(a: Long, b: Long): Long = if (b == 0) a else gcdLong(b, a % b)

  /** One small Spark job: sort → lag → distinct deltas. The distinct-delta
    * set is tiny by construction (a handful of values even on billions of
    * rows), so collecting it is safe at any scale; the shuffle is a single
    * pass over (time) only — column-pruned at the scan. */
  def infer(df: DataFrame, timeCol: String, seriesKeys: Seq[String] = Nil): TimeDelta = {
    val w =
      if (seriesKeys.isEmpty) Window.orderBy(col(timeCol))
      else Window.partitionBy(seriesKeys.map(col): _*).orderBy(col(timeCol))
    val tt = col(timeCol).cast("double")
    val raw = df
      .select((seriesKeys.map(col) :+ col(timeCol)): _*)
      .withColumn("__d", tt - lag(tt, 1).over(w))
      .filter(col("__d").isNotNull && col("__d") =!= 0.0)
      .select("__d").distinct().collect().map(_.getDouble(0)).sorted
    fromRawDeltas(raw.toIndexedSeq)
  }

  /** `raw` = distinct nonzero deltas, ascending (as `np.unique` yields). */
  def fromRawDeltas(raw: Seq[Double]): TimeDelta = {
    val rawDistinct = raw.distinct.sorted
    if (rawDistinct.isEmpty) return empty
    // equispaced / time_interval use the pre-classification delta count
    // (`timeseries.py:44-47`)
    val equispaced = rawDistinct.size == 1
    val timeInterval = if (equispaced) Some(rawDistinct.head) else None
    val classified: Seq[Either[Double, (Int, String)]] = rawDistinct.map {
      case s if MonthSeconds(s) => Right((1, "month"))
      case s if YearSeconds(s)  => Right((1, "year"))
      case s                    => Left(s)
    }.distinct
    val minDelta = classified.headOption
    val numeric = classified.collect { case Left(s) => s }
    val hasCalendar = classified.exists(_.isRight)
    def numGcd(xs: Seq[Double]): Double =
      xs.map(d => math.max(1L, math.round(d))).reduce(gcdLong).toDouble
    val gcd: Option[Either[Double, (Int, String)]] =
      if (!hasCalendar) Some(Left(numGcd(numeric)))
      else if (numeric.isEmpty) minDelta // all-calendar → min (`timeseries.py:66-68`)
      else Some(Left(numGcd(numeric :+ DaySeconds)))
    TimeDelta(classified, equispaced, timeInterval, minDelta, gcd)
  }
}
