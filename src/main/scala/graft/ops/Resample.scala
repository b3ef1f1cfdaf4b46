package graft.ops

import graft.core.TimeseriesFrame
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid resampling — aggregate an irregular event stream into
  * fixed `everySeconds` buckets, materialize the COMPLETE grid (empty
  * buckets included) per series, and fill the gaps by interpolation:
  * the pandas `resample().mean().interpolate()` / InfluxDB
  * `GROUP BY time(...) fill(linear)` shape, and the grid-regularizing
  * step in front of every equispaced operator in this library
  * (periodogram, ACF, seasonal decomposition assume a regular axis —
  * see `functions.py:76-174`'s equispaced precondition).
  *
  * Scale shape: bucketing is one map-side-combined hash aggregate
  * (exact integer cent/count sums — engine-reproducible means); the
  * grid is generated per series by a `sequence()` explode of the
  * per-series [min, max] bucket range (no driver, no cross join); the
  * fill reuses [[Interpolate.expr]]'s O(n) forward/reversed window
  * carries, partitioned by the series keys. One shuffle for the
  * aggregate, one for the keyed windows.
  *
  * Output: (seriesKeys..., bucket_s, value_mean, n_events) — `n_events`
  * is 0 on grid-filled rows, so callers can distinguish measured from
  * interpolated points.
  */
object Resample {

  /** `centsCol` must be an integer-valued cents column (exact sums). */
  def meanGrid(
      tsf: TimeseriesFrame,
      centsCol: String,
      everySeconds: Long,
      fill: String = "linear",
      maxGridCellsPerSeries: Long = 10L * 1000 * 1000): DataFrame = {
    require(everySeconds > 0, s"everySeconds must be positive: $everySeconds")
    val tc = tsf.timeCol.getOrElse(
      throw new IllegalArgumentException("resample needs a time column"))
    val keys = tsf.seriesKeys
    val keyCols = keys.map(col)
    val bucket = (floor(unix_timestamp(col(tc)) / everySeconds)
      .cast("long") * everySeconds).as("bucket_s")

    val agg = tsf.df
      .select(keyCols :+ bucket :+ col(centsCol).as("__cents"): _*)
      .groupBy(keyCols :+ col("bucket_s"): _*)
      .agg(sum(col("__cents")).cast("long").as("__cents_sum"),
        count(lit(1)).as("n_events"))

    // complete per-series grid: explode the [min, max] bucket range.
    // Guard the explode first: a multi-year span at second resolution
    // would make sequence() emit billions of elements from ONE row — an
    // executor OOM with no useful message. The check is an aggregate
    // over the (small) per-series extents, not the data.
    val extents = agg
      .groupBy(keyCols: _*)
      .agg(min(col("bucket_s")).as("__lo"), max(col("bucket_s")).as("__hi"))
    val worstRow = extents
      .agg(max(expr(s"(__hi - __lo) div $everySeconds") + 1).as("m"))
      .head()
    // max() over zero rows is null (empty input): skip the guard — the
    // grid explode over empty extents is itself empty, schema intact.
    if (!worstRow.isNullAt(0)) {
      val worst = worstRow.getLong(0)
      require(worst <= maxGridCellsPerSeries,
        s"resample grid would emit $worst cells for one series " +
          s"(span/everySeconds); raise everySeconds or maxGridCellsPerSeries")
    }
    val grid = extents
      .select(keyCols :+ explode(
        sequence(col("__lo"), col("__hi"), lit(everySeconds))).as("bucket_s"): _*)

    val joined = grid.join(agg, keys :+ "bucket_s", "left")
      .withColumn("__mean",
        col("__cents_sum").cast("double") / 100.0 / col("n_events"))

    val gtsf = TimeseriesFrame(joined, Some("bucket_s"), Nil, keys)
    gtsf.df
      .withColumn("value_mean", Interpolate.expr(gtsf, "__mean", fill))
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .drop("__cents_sum", "__mean")
  }
}
