package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The shared per-series gather shell behind the executor-side
  * "millions of models" family (PerSeries forecasts, gathered-FFT
  * spectral/ACF, grouped evaluation): each `seriesKeys` group is
  * collected IN TIME ORDER into one row via
  * `sort_array(collect_list(struct(order..., values...)))` — map-side
  * partials, ONE shuffle of the grouped values — and a narrow flatMap
  * consumes the primitive arrays. At 100 TB each series is small even
  * when the table is not; this object is that assumption made reusable
  * (it replaced five hand-rolled copies of the same shell). */
object SeriesGather {

  /** `df` has the key columns plus one sorted `__series` struct array;
    * `xField` is the slot of the FIRST value column inside the struct
    * (order columns occupy slots 0 until xField). */
  final case class Gathered(df: DataFrame, keySchema: StructType, xField: Int)

  /** @param dropNulls filter rows whose FIRST value column is null before
    *   the gather (the spectral/ACF convention); the model shells keep
    *   all rows and let per-series extraction fail into their skip path. */
  def gather(tsf: TimeseriesFrame, valueCols: Seq[String],
      opName: String, dropNulls: Boolean = false): Gathered = {
    require(tsf.seriesKeys.nonEmpty, s"$opName needs seriesKeys")
    val keys = tsf.seriesKeys
    val ordNames = tsf.timeCol.toSeq ++ tsf.tieBreak
    require(ordNames.nonEmpty, s"$opName needs a time column or tieBreak order")
    val orderStruct = struct(
      ordNames.map(c => col(c).cast("double")) ++
        valueCols.map(c => col(c).cast("double")): _*)
    val base =
      if (dropNulls) tsf.df.filter(col(valueCols.head).isNotNull) else tsf.df
    val gathered = base.groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(orderStruct)).as("__series"))
    Gathered(gathered, StructType(keys.map(k => gathered.schema(k))), ordNames.size)
  }

  /** The gathered rows as an RDD with at least core-count partitions.
    *
    * Every consumer of this shell follows the gather with CPU-heavy
    * per-series work (model fits, FFTs, triangulations), but AQE sizes
    * the gather's post-shuffle stage by BYTES: a few MB of gathered
    * series coalesce to ONE partition and the whole "millions of models"
    * fan-out silently serializes onto one core (measured on q108: 1500
    * per-series HCT fills in a single 3.2 s task; 0.16 s across 32
    * threads). A Catalyst-side pinned repartition cannot express this —
    * it is pruned as redundant against the gather's own hash exchange —
    * so the guard lives at the RDD layer, where AQE's final partition
    * count is already known: rebalance ONLY when AQE under-partitioned,
    * i.e. exactly when the gathered bytes are small and the extra
    * row-count-balanced shuffle is noise. Large gathers keep their
    * byte-sized partitioning untouched. */
  def rows(g: Gathered): org.apache.spark.rdd.RDD[Row] = rows(g.df)

  /** [[rows]] for gathers not built through [[gather]] (e.g. the
    * multivariate-interpolation matrix gathers). */
  def rows(gathered: DataFrame): org.apache.spark.rdd.RDD[Row] = {
    val rdd = gathered.rdd
    val par = gathered.sparkSession.sparkContext.defaultParallelism
    if (rdd.getNumPartitions < par) rdd.repartition(par) else rdd
  }

  /** The j-th value column of a gathered row as a primitive array
    * (capture only `xField` in closures — not the Gathered frame). */
  def values(row: Row, xField: Int, j: Int = 0): Array[Double] = {
    val seq = row.getSeq[Row](row.length - 1)
    val arr = new Array[Double](seq.length)
    var i = 0
    seq.foreach { s => arr(i) = s.getDouble(xField + j); i += 1 }
    arr
  }

  /** All `nv` value columns of a gathered row as row-major
    * Array(time)(column) — the multivariate-model layout. */
  def valueRows(row: Row, xField: Int, nv: Int): Array[Array[Double]] =
    row.getSeq[Row](row.length - 1)
      .map(s => Array.tabulate(nv)(j => s.getDouble(xField + j))).toArray

  /** The key column values of a gathered row, in key order. */
  def keyVals(row: Row): Seq[Any] = (0 until row.length - 1).map(row.get)
}
