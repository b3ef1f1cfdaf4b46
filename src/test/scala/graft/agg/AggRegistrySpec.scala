package graft.agg

import graft.SparkSpec
import graft.core.TimeseriesFrame
import graft.ops.MovingTransform
import org.apache.spark.sql.functions._

/** Golden values transcribed from the reference's
  * `orangecontrib/timeseries/test_aggregate.py:259-305` (sliding, width 4)
  * and the kernel tests at `:14-38` (moving_sum) / `:196-255`
  * (weighted MAs, harmonic, mode with NaN patterns). NaN ≡ null here.
  */
class AggRegistrySpec extends SparkSpec {

  private def sliding(xs: Seq[Option[Double]], agg: String, width: Int): Seq[Option[Double]] = {
    val tsf = TimeseriesFrame(seriesDF(xs), None, Seq("i"))
    val out = MovingTransform.slidingWindow(tsf, Seq("x" -> agg), width,
      MovingTransform.KeepComplete)
    col1(out, s"x_$agg")
  }

  // x from test_aggregate.py:260
  private val x = Seq(Some(5.0), Some(2.0), Some(7.0), Some(8.0), Some(6.0),
    Some(4.0), Some(2.0), Some(3.0), None, Some(-1.0), Some(0.0))

  test("countKeys aggs are integral (count_aggregate flag, owmovingtransform.py:560-562)") {
    // the reference marks 'nonzero'/'defined' as count aggregates whose
    // output is integral — ours produce BIGINT columns natively
    val df = spark.createDataFrame(Seq((0.0, 1), (2.5, 2), (0.0, 3))).toDF("x", "i")
    AggRegistry.countKeys.foreach { k =>
      val out = df.agg(AggRegistry.block(k, col("x")).as("v"))
      assert(out.schema("v").dataType ==
        org.apache.spark.sql.types.LongType, s"$k not integral")
    }
    assert(AggRegistry.countKeys == Set("nonzero", "defined"))
  }

  test("sliding mean (test_aggregate.py:262)") {
    assertSeqAlmost(sliding(x, "mean", 4),
      d(22 / 4.0, 23 / 4.0, 25 / 4.0, 20 / 4.0, 15 / 4.0, 9 / 3.0, 4 / 3.0, 2 / 3.0))
  }
  test("sliding sum (:263)") {
    assertSeqAlmost(sliding(x, "sum", 4), d(22, 23, 25, 20, 15, 9, 4, 2))
  }
  test("sliding product (:264)") {
    assertSeqAlmost(sliding(x, "product", 4),
      d(560, 672, 1344, 384, 144, 24, -6, 0))
  }
  test("sliding min/max (:267-268)") {
    assertSeqAlmost(sliding(x, "min", 4), d(2, 2, 4, 2, 2, 2, -1, -1))
    assertSeqAlmost(sliding(x, "max", 4), d(8, 8, 8, 8, 6, 4, 3, 3))
  }
  test("sliding span (:269)") {
    assertSeqAlmost(sliding(x, "span", 4), d(6, 6, 4, 6, 4, 2, 4, 4))
  }
  test("sliding median (:270)") {
    assertSeqAlmost(sliding(x, "median", 4), d(6, 6.5, 6.5, 5, 3.5, 3, 2, 0))
  }
  test("sliding std/var population (:271-272)") {
    assertSeqAlmost(sliding(x, "std", 4),
      d(2.2912878, 2.2776084, 1.4790199, 2.236068, 1.4790199, 0.8164966,
        1.6996732, 1.6996732))
    assertSeqAlmost(sliding(x, "var", 4),
      d(5.25, 5.1875, 2.1875, 5, 2.1875, 0.6666667, 2.8888889, 2.8888889))
  }
  test("sliding lin. MA with NaN renormalization (:273-279)") {
    assertSeqAlmost(sliding(x, "lin_ma", 4),
      d((4 * 8 + 3 * 7 + 2 * 2 + 1 * 5) / 10.0,
        (4 * 6 + 3 * 8 + 2 * 7 + 1 * 2) / 10.0,
        5.7, 4, 3.2,
        (3 * 3 + 2 * 2 + 1 * 4) / 6.0,
        (4 * -1 + 2 * 3 + 1 * 2) / 7.0,
        (3 * -1 + 1 * 3) / 4.0))
  }
  test("sliding exp. MA (:280)") {
    assertSeqAlmost(sliding(x, "exp_ma", 4),
      d(6.4338235, 6.3198529, 5.5110294, 3.8088235, 3.1875, 2.877551,
        0.3248731, 0.0264317))
  }
  test("sliding harmonic (:281)") {
    assertSeqAlmost(sliding(x, "harmonic", 4),
      Seq(Some(4.1328413), Some(4.2802548), Some(5.8434783), Some(3.84),
        Some(3.2), None, None, None))
  }
  test("sliding geometric (:282)") {
    assertSeqAlmost(sliding(x, "geometric", 4),
      Seq(Some(4.8645986), Some(5.0914598), Some(6.0548002), Some(4.4267277),
        Some(3.4641016), None, None, None))
  }
  test("sliding non-zero / defined (:283-284)") {
    assertSeqAlmost(sliding(x, "nonzero", 4), d(4, 4, 4, 4, 4, 3, 3, 2))
    assertSeqAlmost(sliding(x, "defined", 4), d(4, 4, 4, 4, 4, 3, 3, 3))
  }
  test("sliding cumsum / cumprod (:285-286)") {
    assertSeqAlmost(sliding(x, "cumsum", 4), d(22, 28, 32, 34, 37, 37, 36, 36))
    assertSeqAlmost(sliding(x, "cumprod", 4),
      d(560, 3360, 13440, 26880, 80640, 80640, -80640, 0))
  }

  test("sliding mode, scipy tie-break smallest (:298-305)") {
    val m = Seq(2, 2, 1, 2, 0, 1, 1, 1, 0, 2, 0, 0).map(v => Some(v.toDouble))
    assertSeqAlmost(sliding(m, "mode", 4), d(2, 2, 1, 1, 1, 1, 1, 0, 0))
  }
  test("windowed mode with NaNs (:221-227)") {
    val m = Seq(Some(3.0), Some(3.0), Some(2.0), Some(2.0), None, Some(2.0),
      None, None, None)
    assertSeqAlmost(sliding(m, "mode", 3),
      Seq(Some(3), Some(2), Some(2), Some(2), Some(2), Some(2), None))
  }
  test("windowed harmonic zeros and NaNs (:229-233)") {
    val a = Seq(Some(3.0), Some(3.0), Some(2.0), Some(2.0), Some(2.0), Some(0.0),
      Some(0.0), Some(0.0), Some(1.0), Some(2.0), Some(3.0), None, None, None)
    assertSeqAlmost(sliding(a, "harmonic", 3),
      Seq(Some(2.5714286), Some(2.25), Some(2.0), Some(0.0), Some(0.0),
        Some(0.0), Some(0.0), Some(0.0), Some(1.63636363), None, None, None))
  }
  test("windowed linear MA NaN patterns (:235-252)") {
    val a1 = d(1, 2, 3, 8, 5)
    assertSeqAlmost(sliding(a1, "lin_ma", 3),
      d((3 * 3 + 2 * 2 + 1 * 1) / 6.0, (8 * 3 + 3 * 2 + 2 * 1) / 6.0,
        (5 * 3 + 8 * 2 + 3 * 1) / 6.0))
    val a2 = Seq(Some(1.0), Some(2.0), Some(3.0), None, Some(5.0))
    assertSeqAlmost(sliding(a2, "lin_ma", 3),
      d((3 * 3 + 2 * 2 + 1 * 1) / 6.0, (3 * 2 + 2 * 1) / 3.0,
        (5 * 3 + 3 * 1) / 4.0))
    val a3 = Seq(Some(1.0), None, None, None, Some(5.0), Some(6.0))
    assertSeqAlmost(sliding(a3, "lin_ma", 3),
      Seq(Some(1.0), None, Some(5.0), Some((6 * 3 + 5 * 2) / 5.0)))
  }
  test("windowed exponential MA (:254-258)") {
    assertSeqAlmost(sliding(d(1, 2, 3, 4, 5), "exp_ma", 3),
      d(2.4285714, 3.4285714, 4.4285714))
  }
  test("moving sum with NaN → skip (:37-38)") {
    assertSeqAlmost(sliding(Seq(Some(1.0), Some(2.0), None, Some(4.0)), "sum", 3),
      d(3, 6))
  }

  test("sequential blocks match windowed shift=width (:287-296 block path)") {
    val tsf = TimeseriesFrame(seriesDF(x), None, Seq("i"))
    val out = MovingTransform.sequentialBlocks(tsf,
      Seq("x" -> "mean", "x" -> "sum", "x" -> "product", "x" -> "mode"), 4)
    assertSeqAlmost(col1(out, "x_mean", "block"), d(5.5, 3.75))
    assertSeqAlmost(col1(out, "x_sum", "block"), d(22, 15))
    assertSeqAlmost(col1(out, "x_product", "block"), d(560, 144))
  }
  test("block mode (:303-305)") {
    val m = Seq(2, 2, 1, 2, 0, 1, 1, 1, 0, 2, 0, 0).map(v => Some(v.toDouble))
    val tsf = TimeseriesFrame(seriesDF(m), None, Seq("i"))
    val out = MovingTransform.sequentialBlocks(tsf, Seq("x" -> "mode"), 4)
    assertSeqAlmost(col1(out, "x_mode", "block"), d(2, 1, 0))
  }
}
