package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inferred spacing metadata of a timeseries — the Spark re-expression of
  * the reference's `TimeDelta` (`orangecontrib/timeseries/timeseries.py:17-91`):
  * unique sorted deltas with zero-delta removal (`:37-43`), calendar
  * recognition ({2419200, 2505600, 2592000, 2678400}s → 1 month,
  * {31536000, 31622400}s → 1 year, `:18-24,50-57`), `is_equispaced` +
  * scalar `time_interval` when a single delta survives (`:45-47`), and the
  * gcd of numeric deltas (mixed numeric/calendar → gcd of numerics and one
  * day, `:62-72`).
  *
  * `deltas` holds each distinct step either as Left(seconds) or
  * Right((count, unit)) for recognized calendar steps.
  */
final case class TimeDelta(
    deltas: Seq[Either[Double, (Int, String)]],
    isEquispaced: Boolean,
    timeInterval: Option[Either[Double, (Int, String)]],
    gcd: Option[Double]) {

  /** Scalar seconds of the single step, when equispaced and numeric. */
  def intervalSeconds: Option[Double] = timeInterval.flatMap {
    case Left(s) => Some(s)
    case Right(_) => None
  }
}

object TimeDelta {
  val empty: TimeDelta = TimeDelta(Nil, isEquispaced = false, None, None)

  private val MonthSeconds = Set(2419200.0, 2505600.0, 2592000.0, 2678400.0)
  private val YearSeconds = Set(31536000.0, 31622400.0)

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

  def fromRawDeltas(raw: Seq[Double]): TimeDelta = {
    if (raw.isEmpty) return empty
    val classified: Seq[Either[Double, (Int, String)]] = raw.map {
      case s if MonthSeconds(s) => Right((1, "month"))
      case s if YearSeconds(s)  => Right((1, "year"))
      case s                    => Left(s)
    }.distinct
    val equispaced = classified.size == 1
    val numeric = classified.collect { case Left(s) => s }
    val hasCalendar = classified.exists(_.isRight)
    // gcd over numeric deltas (+ one day when calendar steps are mixed in),
    // computed on integer seconds like the reference.
    val gcdInput = numeric ++ (if (hasCalendar && numeric.nonEmpty) Seq(86400.0) else Nil)
    val gcd =
      if (gcdInput.isEmpty) None
      else Some(gcdInput.map(d => math.max(1L, math.round(d))).reduce(gcdLong).toDouble)
    TimeDelta(classified, equispaced, if (equispaced) classified.headOption else None, gcd)
  }
}
