package graft.agg

import graft.SparkSpec
import graft.core.TimeseriesFrame
import graft.ops.MovingTransform
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential spec for the native [[WeightedMeanSlotsExpr]] against the
  * previous `zip_with`/`aggregate` higher-order-function formulation
  * ([[AggRegistry.weightedMAHof]]) — same slot semantics as the reference's
  * weighted MAs (`orangecontrib/timeseries/aggregate.py:50-70`): per-row
  * weight renormalization over non-null slots, all-null window → null,
  * partial leading windows weighted by the leading weight prefix.
  */
class WeightedMeanExprSpec extends SparkSpec {

  /** Deterministic NaN-gapped series: ~1/5 nulls, plus a long all-null run. */
  private def gappy(n: Int): Seq[Option[Double]] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { i =>
      if (i >= 40 && i < 40 + 17) None // all-null stretch longer than most widths
      else if (rnd.nextInt(5) == 0) None
      else Some(rnd.nextDouble() * 200 - 100)
    }
  }

  private def diff(key: String, width: Int, n: Int = 400): Unit = {
    val df = seriesDF(gappy(n))
    val w = Window.orderBy("i").rowsBetween(-(width - 1L), 0L)
    val weights = AggRegistry.maWeights(key, width)
    val v = AggRegistry.nanToNull(col("x"))
    val slots = collect_list(struct(v.as("v"))).over(w)
    val out = df.select(col("i"),
      WeightedMeanSlotsExpr(slots, weights).as("native"),
      AggRegistry.weightedMAHof(v, w, weights).as("hof"))
    assertSeqAlmost(col1(out, "native"), col1(out, "hof"), tol = 1e-12)
  }

  test("native == HOF: lin_ma width 4 on NaN-gapped data") { diff("lin_ma", 4) }
  test("native == HOF: exp_ma width 4 on NaN-gapped data") { diff("exp_ma", 4) }
  test("native == HOF: lin_ma width 100 (wide windows)") { diff("lin_ma", 100) }
  test("native == HOF: exp_ma width 100 (wide windows)") { diff("exp_ma", 100) }

  test("registry path uses the native node and matches the reference golden") {
    // same fixture as AggRegistrySpec's lin_ma golden (test_aggregate.py:273-279)
    val x = Seq(Some(5.0), Some(2.0), Some(7.0), Some(8.0), Some(6.0),
      Some(4.0), Some(2.0), Some(3.0), None, Some(-1.0), Some(0.0))
    val tsf = TimeseriesFrame(seriesDF(x), None, Seq("i"))
    val out = MovingTransform.slidingWindow(tsf, Seq("x" -> "lin_ma"), 4,
      MovingTransform.KeepComplete)
    assertSeqAlmost(col1(out, "x_lin_ma"),
      d((4 * 8 + 3 * 7 + 2 * 2 + 1 * 5) / 10.0,
        (4 * 6 + 3 * 8 + 2 * 7 + 1 * 2) / 10.0,
        5.7, 4, 3.2,
        (3 * 3 + 2 * 2 + 1 * 4) / 6.0,
        (4 * -1 + 2 * 3 + 1 * 2) / 7.0,
        (3 * -1 + 1 * 3) / 4.0))
  }

  test("all-null window yields null, partial windows use the weight prefix") {
    val x = Seq(Some(3.0), None, None, None, None, Some(1.0))
    val df = seriesDF(x)
    val w = Window.orderBy("i").rowsBetween(-2L, 0L)
    val weights = AggRegistry.maWeights("lin_ma", 3)
    val v = AggRegistry.nanToNull(col("x"))
    val out = df.select(col("i"),
      WeightedMeanSlotsExpr(collect_list(struct(v.as("v"))).over(w), weights)
        .as("ma"))
    // row0: partial [3] → 3; row1: [3,null] → 3; row2: [3,null,null] → 3;
    // row3: [null,null,null] → null; row4: all null → null; row5: [null,null,1] → 1
    assertSeqAlmost(col1(out, "ma"),
      Seq(Some(3.0), Some(3.0), Some(3.0), None, None, Some(1.0)))
  }
}
