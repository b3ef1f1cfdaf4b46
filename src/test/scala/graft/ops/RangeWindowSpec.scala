package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.functions._

/** Differential test: the range-partitioned sliding-window runner must
  * reproduce the single-partition global-Window plan exactly. */
class RangeWindowSpec extends SparkSpec {

  test("range-partitioned sliding window == global window (with NaN gaps)") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(500)(
      if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(1000) / 8.0))
    val tsf = TimeseriesFrame(seriesDF(xs), None, Seq("i"))
    val w = 7

    val global = tsf.df
      .withColumn("g_mean", avg(col("x")).over(tsf.trailing(w)))
      .withColumn("g_sum", coalesce(sum(col("x")).over(tsf.trailing(w)), lit(0.0)))
      .withColumn("g_min", min(col("x")).over(tsf.trailing(w)))
      .withColumn("g_max", max(col("x")).over(tsf.trailing(w)))

    val ranged = RangeWindow.slidingWindow(tsf, "x",
      Seq("mean", "sum", "min", "max"), w, numPartitions = 7)

    val joined = global.alias("g").join(ranged.alias("r"), "i")
    for ((g, r) <- Seq("g_mean" -> "x_mean", "g_sum" -> "x_sum",
        "g_min" -> "x_min", "g_max" -> "x_max")) {
      val gv = col1(joined, g)
      val rv = col1(joined, r)
      assertSeqAlmost(rv, gv, tol = 1e-9)
    }
  }

  test("empty-ish partitions: correctness with more partitions than rows") {
    val xs = d(1, 2, 3, 4, 5)
    val tsf = TimeseriesFrame(seriesDF(xs), None, Seq("i"))
    val out = RangeWindow.slidingWindow(tsf, "x", Seq("sum"), 3, numPartitions = 12)
    assertSeqAlmost(col1(out, "x_sum"), d(1, 3, 6, 9, 12))
  }
}
