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

  def keyExpr(tsf: TimeseriesFrame, key: Key): Column = key match {
    case PeriodComponent(p) =>
      val t = col(tsf.timeCol.getOrElse(
        throw new IllegalArgumentException("period key needs a time column")))
      MovingTransform.periodKey(p, t)
    case Categorical(c) => col(c)
    case Binned(c, lo, hi, bins) => binKey(col(c), lo, hi, bins)
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
      selected: DataFrame): DataFrame = {
    val keyed = tsf.df
      .withColumn("angular", keyExpr(tsf, angular))
      .withColumn("radial", radial.map(k => keyExpr(tsf, k)).getOrElse(lit(null)))
    keyed.join(broadcast(selected), keyed("angular") <=> selected("angular") &&
      keyed("radial") <=> selected("radial"), "left_semi")
      .drop("angular", "radial")
  }
}
