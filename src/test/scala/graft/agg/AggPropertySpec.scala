package graft.agg

import graft.SparkSpec
import graft.core.TimeseriesFrame
import graft.ops.MovingTransform
import scala.util.Random

/** Differential property tests: Spark sliding aggregations vs an
  * independent Scala re-implementation of the NumPy kernels, over random
  * NaN-laced vectors (SURVEY §5 port strategy: property-test the window
  * identities in addition to the transcribed goldens). Seeded generation —
  * deterministic across runs. */
class AggPropertySpec extends SparkSpec {

  private def randomVec(rnd: Random, n: Int): Seq[Option[Double]] =
    Seq.fill(n)(
      if (rnd.nextInt(5) == 0) None
      else Some((rnd.nextInt(101) - 50) / 4.0))

  private def windows(xs: Seq[Option[Double]], w: Int): Seq[Seq[Double]] =
    xs.sliding(w).map(_.flatten.toSeq).toSeq

  // NumPy-kernel reference implementations (nan-skipping)
  private def refAgg(agg: String, win: Seq[Double], all: Seq[Option[Double]],
      upTo: Int): Option[Double] = agg match {
    case "mean" => if (win.isEmpty) None else Some(win.sum / win.size)
    case "sum" => Some(win.sum)
    case "product" => Some(win.product)
    case "min" => win.reduceOption((a, b) => math.min(a, b))
    case "max" => win.reduceOption((a, b) => math.max(a, b))
    case "defined" => Some(win.size.toDouble)
    case "nonzero" => Some(win.count(_ != 0.0).toDouble)
    case "var" =>
      if (win.isEmpty) None
      else {
        val mu = win.sum / win.size
        Some(win.map(v => (v - mu) * (v - mu)).sum / win.size)
      }
    case "cumsum" => Some(all.take(upTo).flatten.sum)
  }

  private def runSpark(xs: Seq[Option[Double]], specs: Seq[(String, String)],
      w: Int) = {
    val tsf = TimeseriesFrame(seriesDF(xs), None, Seq("i"))
    MovingTransform.slidingWindow(tsf, specs, w, MovingTransform.KeepComplete)
  }

  private val aggs = Seq("mean", "sum", "product", "min", "max", "defined",
    "nonzero", "var", "cumsum")

  test("property: sliding aggs match NumPy-kernel reference on random data") {
    val rnd = new Random(42)
    for (_ <- 1 to 6) {
      val xs = randomVec(rnd, 30 + rnd.nextInt(20))
      val w = 2 + rnd.nextInt(6)
      val out = runSpark(xs, aggs.map("x" -> _), w)
      for (agg <- aggs) {
        val got = col1(out, s"x_$agg")
        val expected = windows(xs, w).zipWithIndex.map { case (win, i) =>
          refAgg(agg, win, xs, i + w)
        }
        assert(got.size == expected.size, s"$agg w=$w size")
        got.zip(expected).zipWithIndex.foreach {
          case ((Some(a), Some(e)), i) =>
            assert(math.abs(a - e) <= 1e-9 * math.max(1.0, math.abs(e)),
              s"$agg w=$w at $i: $a vs $e\nxs=$xs")
          case ((a, e), i) =>
            assert(a.isDefined == e.isDefined, s"$agg w=$w at $i: $a vs $e\nxs=$xs")
        }
      }
    }
  }

  test("property: strided(shift=1) == sliding KeepComplete; strided(shift=width) == blocks") {
    val rnd = new Random(13)
    for (_ <- 1 to 4) {
      val xs = randomVec(rnd, 30 + rnd.nextInt(15))
      val w = 2 + rnd.nextInt(5)
      val tsf = TimeseriesFrame(seriesDF(xs), None, Seq("i"))
      val stride1 = col1(
        MovingTransform.strided(tsf, Seq("x" -> "sum"), w, 1), "x_sum", "window_index")
      val sliding = col1(
        MovingTransform.slidingWindow(tsf, Seq("x" -> "sum"), w,
          MovingTransform.KeepComplete), "x_sum")
      assertSeqAlmost(stride1, sliding)
      val strideW = col1(
        MovingTransform.strided(tsf, Seq("x" -> "sum"), w, w), "x_sum", "window_index")
      val blocks = col1(
        MovingTransform.sequentialBlocks(tsf, Seq("x" -> "sum"), w), "x_sum", "block")
      assertSeqAlmost(strideW, blocks)
    }
  }

  test("property: span == max - min; sum == mean * defined on NaN-free data") {
    val rnd = new Random(7)
    for (_ <- 1 to 4) {
      val xs = Seq.fill(25)(Some((rnd.nextInt(201) - 100) / 8.0))
      val out = runSpark(xs, Seq("x" -> "span", "x" -> "max", "x" -> "min",
        "x" -> "sum", "x" -> "mean", "x" -> "defined"), 4)
      out.collect().foreach { r =>
        val Seq(span, mx, mn, sm, mean, defined) =
          Seq("x_span", "x_max", "x_min", "x_sum", "x_mean", "x_defined")
            .map(c => r.getAs[Any](c).toString.toDouble)
        assert(math.abs(span - (mx - mn)) < 1e-9)
        assert(math.abs(sm - mean * defined) < 1e-9)
      }
    }
  }
}
