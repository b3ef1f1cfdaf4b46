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

  test("widened agg set == AggRegistry.windowed differentially (NaN rules included)") {
    // positive-only values so harmonic/geometric have defined goldens;
    // planted NaN gaps and a zero exercise the registry edge rules
    val rnd = new scala.util.Random(23)
    val xs = Seq.tabulate(400) { i =>
      if (i == 57) Some(0.0)
      else if (rnd.nextInt(7) == 0) None
      else Some((1 + rnd.nextInt(1000)) / 8.0)
    }
    val tsf = TimeseriesFrame(seriesDF(xs), None, Seq("i"))
    val w = 6
    val aggs = Seq("mean", "sum", "min", "max", "span", "std", "var",
      "nonzero", "defined", "harmonic", "geometric")
    val declarative = aggs.foldLeft(tsf.df) { (df, a) =>
      df.withColumn(s"g_$a",
        graft.agg.AggRegistry.windowed(a, col("x"), tsf.window, w).cast("double"))
    }
    val ranged = RangeWindow.slidingWindow(tsf, "x", aggs, w, numPartitions = 9)
    val joined = declarative.join(ranged.select(
      col("i") +: aggs.map(a => col(s"x_$a")): _*), "i")
    aggs.foreach { a =>
      assertSeqAlmost(col1(joined, s"x_$a"), col1(joined, s"g_$a"), tol = 1e-9)
    }
  }

  test("typed getters: integer and decimal value columns work without string decode") {
    val df = spark.createDataFrame(Seq((1L, 10), (2L, 20), (3L, 30))).toDF("i", "x")
    val out = RangeWindow.slidingWindow(
      TimeseriesFrame(df, None, Seq("i")), "x", Seq("sum", "max"), 2, 3)
    assertSeqAlmost(col1(out, "x_sum"), d(10, 30, 50))
    assertSeqAlmost(col1(out, "x_max"), d(10, 20, 30))
  }
}
