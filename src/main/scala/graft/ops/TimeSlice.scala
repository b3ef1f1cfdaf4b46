package graft.ops

import graft.core.TimeseriesFrame
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Half-open time-range filter (`owtimeslice.py:313-319`): rows with
  * `lo <= t < hi`. A pure predicate — pushed down to the parquet scan by
  * Catalyst (shows up under `PushedFilters`), so at 100 TB this reads only
  * the row groups whose min/max stats overlap the slice.
  */
object TimeSlice {

  def apply(tsf: TimeseriesFrame, loEpochSec: Double, hiEpochSec: Double,
      rawNanosCol: String = "ts_ns_raw"): DataFrame = {
    val t = col(tsf.timeCol.getOrElse(
      throw new IllegalArgumentException("time slice needs a time column")))
    val tt = t.cast("double")
    val base = tsf.df.filter(tt >= loEpochSec && tt < hiEpochSec)
    // When the frame still carries the raw integer time column (e.g. the
    // nanos the timestamp was decoded from), add the equivalent range
    // predicate on it: a plain long comparison IS pushed to the parquet
    // scan (row-group pruning), whereas the converted-timestamp predicate
    // above is an expression of the column and is not.
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
