package graft.ops

import graft.agg.AggRegistry
import graft.core.TimeseriesFrame
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spiralogram — 2-D categorical aggregation
  * (`orangecontrib/timeseries/widgets/owspiralogram.py:749-823`): cross-tab
  * by an angular key × optional radial key, emitting per-cell `Count` and
  * optionally `agg(color_var)`; zero-count cells are dropped (they simply
  * don't appear in a groupBy). Keys are calendar period components
  * ([[MovingTransform.periodKey]]), any categorical column, or a continuous
  * column discretized by equal-width binning ([[binKey]] — the Spark
  * re-expression of the reference's `VariableBinner` `when`-chain).
  *
  * The whole operator is one hash aggregate with map-side partials — the
  * canonical scalable groupBy; cells are few, so the reduce side is tiny.
  */
object Spiralogram {

  sealed trait Key
  /** a `PeriodOptions` periodic component of the time column */
  final case class PeriodComponent(period: String) extends Key
  /** any existing (categorical) column */
  final case class Categorical(column: String) extends Key
  /** continuous column equal-width binned into `bins` buckets over [lo, hi],
    * labeled "< a", "a - b", "≥ b" like the reference's binner
    * (`owspiralogram.py:360-435`) */
  final case class Binned(column: String, lo: Double, hi: Double, bins: Int) extends Key
  /** time-typed column binned at a nice CALENDAR width — the reference's
    * binner routes time axes to Orange's `time_binnings`
    * (`owspiralogram.py:360-379`: `recompute_binnings(..., is_time)` →
    * `time_binnings`, thresholds at whole hours/days/weeks/months/years).
    * The bin label
    * is the bucket START ("2024-03" for a month, "2024-03-04" for a
    * Monday-start week); `every` groups unit multiples (e.g. 3 months). */
  final case class TimeBinned(column: String, unit: String, every: Int = 1) extends Key

  def keyExpr(tsf: TimeseriesFrame, key: Key): Column = key match {
    case PeriodComponent(p) =>
      val t = col(tsf.timeCol.getOrElse(
        throw new IllegalArgumentException("period key needs a time column")))
      MovingTransform.periodKey(p, t)
    case Categorical(c) => col(c)
    case Binned(c, lo, hi, bins) => binKey(col(c), lo, hi, bins)
    case TimeBinned(c, unit, every) => timeBinKey(col(c), unit, every)
  }

  /** Data-driven "nice decimal" binning — the shape of Orange's
    * `decimal_binnings` feeding the reference's interactive binner: pick a
    * bin width from {1, 2, 5}·10^k so that the data span yields about
    * `targetBins` bins, snap the low edge down to a width multiple, and
    * return the resulting [[Binned]] key. One tiny min/max aggregate over
    * the column; at any scale that is a single map-side-combined pass. */
  def autoBinned(tsf: TimeseriesFrame, column: String, targetBins: Int = 6): Binned = {
    val r = tsf.df.agg(
      min(col(column).cast("double")), max(col(column).cast("double"))).head()
    // degenerate columns: all-null (min/max are null) or constant (zero
    // span) would underflow the magnitude pick below — emit one unit bin
    if (r.isNullAt(0) || r.isNullAt(1))
      return Binned(column, -0.5, 0.5, 1)
    val (lo0, hi0) = (r.getDouble(0), r.getDouble(1))
    if (hi0 - lo0 <= 0)
      return Binned(column, lo0 - 0.5, lo0 + 0.5, 1)
    val span = math.max(hi0 - lo0, Double.MinPositiveValue)
    val raw = span / targetBins
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val width = Seq(1.0, 2.0, 5.0, 10.0).map(_ * mag).find(_ >= raw).get
    val lo = math.floor(lo0 / width) * width
    val bins = math.max(1, math.ceil((hi0 - lo) / width).toInt)
    Binned(column, lo, lo + bins * width, bins)
  }

  /** Calendar time-bin label for `unit` ∈ {hour, day, week, month, year}
    * × `every`: the bucket start, formatted at the unit's precision
    * ("yyyy-MM-dd HH:00" / "yyyy-MM-dd" / "yyyy-MM" / "yyyy"). Pure
    * scan-stage Column arithmetic (date_trunc + epoch/month-index floor
    * for multiples) — codegen'd, no UDF; nulls propagate. Weeks are
    * Monday-start (Spark and DuckDB `date_trunc('week')` agree) and
    * support every=1 only — a "2-week" grid has no calendar anchor. */
  def timeBinKey(t: Column, unit: String, every: Int): Column = {
    require(every >= 1, s"every must be positive: $every")
    // the every>1 hour/day paths floor the UTC epoch; under a non-UTC
    // session timezone those buckets would anchor to UTC boundaries while
    // date_format labels in local time — mislabeling DST-shifted days.
    // This library pins spark.sql.session.timeZone=UTC everywhere; make
    // that precondition explicit instead of silent (ADVICE r6).
    if (every > 1 && (unit == "hour" || unit == "day")) {
      val tz = org.apache.spark.sql.SparkSession.active
        .sessionState.conf.sessionLocalTimeZone
      require(Set("UTC", "Etc/UTC", "GMT", "Z").contains(tz),
        s"multi-unit $unit bins require a UTC session timezone " +
          s"(spark.sql.session.timeZone=$tz): epoch flooring anchors to " +
          "UTC while date_format labels in session time")
    }
    unit match {
      case "hour" =>
        val b = if (every == 1) date_trunc("hour", t)
          else timestamp_seconds(
            floor(unix_timestamp(date_trunc("hour", t)) / (3600L * every))
              .cast("long") * (3600L * every))
        date_format(b, "yyyy-MM-dd HH:00")
      case "day" =>
        val b = if (every == 1) date_trunc("day", t)
          else timestamp_seconds(
            floor(unix_timestamp(date_trunc("day", t)) / (86400L * every))
              .cast("long") * (86400L * every))
        date_format(b, "yyyy-MM-dd")
      case "week" =>
        require(every == 1, "week bins support every=1 (Monday start)")
        date_format(date_trunc("week", t), "yyyy-MM-dd")
      case "month" =>
        if (every == 1) date_format(t, "yyyy-MM")
        else {
          // month index since year 0 floored to the multiple; exact in
          // double far beyond any calendar year
          val m = year(t) * 12 + month(t) - 1
          val bm = (floor(m.cast("double") / every) * every).cast("int")
          val by = floor(bm.cast("double") / 12).cast("int")
          date_format(make_date(by, bm - by * 12 + 1, lit(1)), "yyyy-MM")
        }
      case "year" =>
        if (every == 1) date_format(t, "yyyy")
        else lpad(((floor(year(t).cast("double") / every) * every)
          .cast("int")).cast("string"), 4, "0")
      case u => throw new IllegalArgumentException(
        s"unknown time-bin unit: $u (hour|day|week|month|year)")
    }
  }

  /** Data-driven calendar binning — the time-axis twin of [[autoBinned]]:
    * pick the FINEST unit from the hour→day→week→month→year ladder whose
    * bin count over the data span stays ≤ maxBins (multi-year `every`
    * when even 1-year bins overflow) — Orange's `time_binnings` ladder
    * collapsed to one deterministic pick. One min/max aggregate. */
  def autoTimeBinned(tsf: TimeseriesFrame, column: String, maxBins: Int = 12): TimeBinned = {
    val r = tsf.df.agg(
      min(col(column).cast("timestamp")), max(col(column).cast("timestamp"))).head()
    if (r.isNullAt(0) || r.isNullAt(1)) return TimeBinned(column, "day", 1)
    val spanSec = (r.getTimestamp(1).getTime - r.getTimestamp(0).getTime) / 1000.0
    val ladder = Seq("hour" -> 3600.0, "day" -> 86400.0, "week" -> 604800.0,
      "month" -> 2629746.0, "year" -> 31556952.0)
    ladder.find { case (_, w) => spanSec / w <= maxBins } match {
      case Some((u, _)) => TimeBinned(column, u, 1)
      case None =>
        val years = spanSec / 31556952.0
        TimeBinned(column, "year", math.max(1, math.ceil(years / maxBins).toInt))
    }
  }

  /** Equal-width bin label: "< a" / "a - b" / "≥ b". */
  def binKey(c: Column, lo: Double, hi: Double, bins: Int): Column = {
    val width = (hi - lo) / bins
    val idx = least(greatest(floor((c - lo) / width), lit(0)), lit(bins - 1))
    val a = idx * width + lo
    val b = a + width
    when(c.isNull, lit(null).cast("string"))
      .when(idx === 0, concat(lit("< "), format_number(lit(lo + width), 4)))
      .when(idx === (bins - 1), concat(lit("≥ "), format_number(lit(hi - width), 4)))
      .otherwise(concat(format_number(a, 4), lit(" - "), format_number(b, 4)))
  }

  /** Cross-tab: per (angular, radial) cell → count + optional color agg
    * (`compute_data`, `owspiralogram.py:795-823`). */
  def apply(
      tsf: TimeseriesFrame,
      angular: Key,
      radial: Option[Key] = None,
      colorAgg: Option[(String, String)] = None): DataFrame = {
    val keys = Seq(keyExpr(tsf, angular).as("angular")) ++
      radial.map(k => keyExpr(tsf, k).as("radial"))
    val aggs = count(lit(1)).as("count") +:
      colorAgg.toSeq.map { case (c, a) =>
        AggRegistry.block(a, col(c)).as(s"${c}_$a")
      }
    tsf.df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Selection output (`owspiralogram.py:1063-1070`): raw rows of the
    * selected cells — a broadcast semi-join of the raw frame against the
    * (small) selected key set. */
  def selectRows(
      tsf: TimeseriesFrame,
      angular: Key,
      radial: Option[Key],
      selected: DataFrame): DataFrame = radial match {
    case Some(rk) =>
      val keyed = tsf.df
        .withColumn("angular", keyExpr(tsf, angular))
        .withColumn("radial", keyExpr(tsf, rk))
      keyed.join(broadcast(selected), keyed("angular") <=> selected("angular") &&
        keyed("radial") <=> selected("radial"), "left_semi")
        .drop("angular", "radial")
    case None =>
      // no radial key → match on angular alone. (A NullType literal on
      // both sides does NOT work here: Spark's null-safe hash-join rewrite
      // `coalesce(k, default) + isnull(k)` has no default for NullType, so
      // the null key never matches and the semi-join silently empties.)
      val keyed = tsf.df.withColumn("angular", keyExpr(tsf, angular))
      val sel = selected.select("angular")
      keyed.join(broadcast(sel), keyed("angular") <=> sel("angular"), "left_semi")
        .drop("angular")
  }
}
