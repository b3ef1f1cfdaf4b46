package graft.ops

import graft.core.TimeseriesFrame
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range-partitioned sliding-window execution — the scale-out path for
  * single-series windows (SURVEY §4: "a `TimeseriesFrame` is globally
  * ordered by time; for window ops at scale, `repartitionByRange(t)` +
  * per-partition windows with boundary overlap is the standard recipe").
  *
  * A global `Window.orderBy(t)` plans a single-partition sort: correct at
  * any size but sequential — the 10⁷-row wall. This operator instead:
  *
  *  1. `repartitionByRange(t, tieBreak)` — each of P partitions holds a
  *     contiguous time slice, sorted within (`sortWithinPartitions`);
  *  2. collects each partition's LAST `width−1` rows (the boundary carry —
  *     P·(w−1) rows total, tiny by construction) in one narrow job;
  *  3. `mapPartitions` computes the trailing-window aggregates with the
  *     previous partition's carry rows prepended — every partition is
  *     independent, so the whole pass is embarrassingly parallel.
  *
  * This is the deliberate `(d) mapPartitions` case of the implementation
  * preference order: the semantics (cross-partition positional carry)
  * cannot be expressed with per-partition declarative windows, and the
  * alternative — a global sort — does not scale. Supported aggregations
  * are the O(1)-fold ones (sum/mean/min/max/count); results are verified
  * against the single-partition `Window` plan in the spec.
  */
object RangeWindow {

  val SupportedAggs: Set[String] = Set("mean", "sum", "min", "max", "defined")

  def slidingWindow(
      tsf: TimeseriesFrame,
      valueCol: String,
      aggs: Seq[String],
      width: Int,
      numPartitions: Int): DataFrame = {
    require(aggs.forall(SupportedAggs), s"supported: $SupportedAggs")
    val df = tsf.df
    val orderCols = tsf.orderCols
    val ranged = df
      .repartitionByRange(numPartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)

    val spark = df.sparkSession
    val schema = ranged.schema
    val valueIdx = schema.fieldIndex(valueCol)

    // pass 1: per-partition tails (the carry) — P·(w−1) rows
    val tails: Map[Int, Array[Double]] = ranged.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val buf = new scala.collection.mutable.ArrayBuffer[Double]()
        it.foreach { r =>
          buf += (if (r.isNullAt(valueIdx)) Double.NaN else
            r.get(valueIdx).toString.toDouble)
          if (buf.size > width - 1) buf.remove(0)
        }
        Iterator.single(pid -> buf.toArray)
      }
      .collect().toMap
    // chain the carries on the driver so short/empty partitions still see
    // the full width−1 preceding rows (carry(p) = last w−1 of everything
    // before partition p)
    val maxPid = if (tails.isEmpty) -1 else tails.keys.max
    val chained = scala.collection.mutable.Map[Int, Array[Double]]()
    var acc = Array.empty[Double]
    for (p <- 0 to maxPid) {
      chained(p) = acc
      acc = (acc ++ tails.getOrElse(p, Array.empty)).takeRight(width - 1)
    }
    val carry = spark.sparkContext.broadcast(chained.toMap)

    // pass 2: per-partition sliding aggregates with prepended carry
    val outSchema = StructType(schema.fields ++
      aggs.map(a => StructField(s"${valueCol}_$a", DoubleType)))
    val outRdd = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val prev: Array[Double] = carry.value.getOrElse(pid, Array.empty)
      val ring = new Array[Double](width)
      var filled = 0
      var pos = 0
      def push(v: Double): Unit = {
        ring(pos) = v; pos = (pos + 1) % width
        if (filled < width) filled += 1
      }
      prev.foreach(push)
      it.map { r =>
        val v = if (r.isNullAt(valueIdx)) Double.NaN
          else r.get(valueIdx).toString.toDouble
        push(v)
        val win = (0 until filled).map(i =>
          ring((pos - 1 - i + 2 * width) % width)).filterNot(_.isNaN)
        val extras = aggs.map { a =>
          val res: Double = a match {
            case "sum" => win.sum
            case "mean" => if (win.isEmpty) Double.NaN else win.sum / win.size
            case "min" => if (win.isEmpty) Double.NaN else win.min
            case "max" => if (win.isEmpty) Double.NaN else win.max
            case "defined" => win.size.toDouble
          }
          if (res.isNaN) null else Double.box(res)
        }
        Row.fromSeq(r.toSeq ++ extras)
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
