package graft.ops

import graft.core.TimeseriesFrame
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Half-open time-range filter (`owtimeslice.py:313-319`): rows with
  * `lo <= t < hi`. A pure predicate — pushed down to the parquet scan by
  * Catalyst (shows up under `PushedFilters`), so at 100 TB this reads only
  * the row groups whose min/max stats overlap the slice.
  */
object TimeSlice {

  def apply(tsf: TimeseriesFrame, loEpochSec: Double, hiEpochSec: Double,
      rawNanosCol: String = "ts_ns_raw"): DataFrame = {
    val tname = tsf.timeCol.getOrElse(
      throw new IllegalArgumentException("time slice needs a time column"))
    val t = col(tname)
    val base = tsf.df.schema(tname).dataType match {
      case tsType @ (TimestampType | TimestampNTZType) =>
        // Compare against timestamp LITERALS (timestamp_micros of a
        // literal constant-folds): a `attr >= literal` predicate on a
        // native timestamp column is pushed to the parquet scan
        // (row-group pruning), whereas `cast(attr as double) >= x` is an
        // expression of the column and is not. ceil: lo <= t in seconds
        // ⇔ t_us >= ceil(lo·1e6) for the half-open [lo, hi) slice. The
        // literal is cast to the column's exact type (TS vs NTZ — under
        // the engine's UTC session pin the cast is value-identity) so the
        // comparison never needs an implicit column-side cast.
        val loUs = math.ceil(loEpochSec * 1e6).toLong
        val hiUs = math.ceil(hiEpochSec * 1e6).toLong
        val loLit = timestamp_micros(lit(loUs)).cast(tsType)
        val hiLit = timestamp_micros(lit(hiUs)).cast(tsType)
        tsf.df.filter(t >= loLit && t < hiLit)
      case _ =>
        val tt = t.cast("double")
        tsf.df.filter(tt >= loEpochSec && tt < hiEpochSec)
    }
    // When the frame still carries the raw integer time column (the nanos
    // a derived timestamp was decoded from), add the equivalent range
    // predicate on it: the derived `ts` is an alias of an expression there,
    // so only the raw long comparison reaches the parquet row-group stats.
    if (tsf.df.columns.contains(rawNanosCol)) {
      val lo = math.ceil(loEpochSec * 1e9).toLong
      val hi = math.ceil(hiEpochSec * 1e9).toLong
      base.filter(col(rawNanosCol) >= lo && col(rawNanosCol) < hi)
    } else base
  }

  /** Successive playback windows (`owtimeslice.py:343-378`): the driver
    * loop advancing a window of `widthSec` by `stepSec`, looping at the
    * end. Returns the predicate sequence — each element is an independent
    * pushed-down filter. */
  def playback(
      loEpochSec: Double,
      hiEpochSec: Double,
      widthSec: Double,
      stepSec: Double): Iterator[(Double, Double)] =
    Iterator.iterate(loEpochSec)(_ + stepSec)
      .takeWhile(_ < hiEpochSec)
      .map(s => (s, math.min(s + widthSec, hiEpochSec)))
}
