package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Interpolation semantics per `functions.py:249-345`: linear against the
  * time axis, out-of-range clamp to first/last known value (`:334-342`),
  * mean fill (`:329-331`), <2 known values untouched (`:323-327`),
  * 'nearest' ties round down (prev). */
class InterpolateSpec extends SparkSpec {

  private def fixture(ts: Seq[Double], xs: Seq[Option[Double]]): TimeseriesFrame = {
    val rows = ts.zip(xs).map { case (t, v) => Row(t, v.map(Double.box).orNull) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("t", DoubleType), StructField("x", DoubleType))))
    TimeseriesFrame(df, Some("t"))
  }

  test("linear with clamping at both ends") {
    val t = fixture(Seq(0, 1, 2, 3, 4, 5),
      Seq(None, None, Some(3.0), None, Some(5.0), None))
    val out = Interpolate(t, Seq("x"), "linear")
    assertSeqAlmost(col1(out, "x", "t"), d(3, 3, 3, 4, 5, 5))
  }

  test("linear respects non-uniform time spacing") {
    val t = fixture(Seq(0, 1, 10), Seq(Some(0.0), None, Some(100.0)))
    val out = Interpolate(t, Seq("x"), "linear")
    assertSeqAlmost(col1(out, "x", "t"), d(0, 10, 100))
  }

  test("nearest picks closer neighbor, tie → previous") {
    val t = fixture(Seq(0, 1, 2, 3, 4),
      Seq(Some(1.0), None, None, None, Some(9.0)))
    val out = Interpolate(t, Seq("x"), "nearest")
    // t=1: d(prev)=1 < d(next)=3 → 1; t=2: tie → prev; t=3: next closer → 9
    assertSeqAlmost(col1(out, "x", "t"), d(1, 1, 1, 9, 9))
  }

  test("mean fills with whole-series NaN-mean") {
    val t = fixture(Seq(0, 1, 2, 3), Seq(Some(2.0), None, Some(6.0), None))
    val out = Interpolate(t, Seq("x"), "mean")
    assertSeqAlmost(col1(out, "x", "t"), d(2, 4, 6, 4))
  }

  test("columns with fewer than 2 known values untouched") {
    val t = fixture(Seq(0, 1, 2), Seq(None, Some(7.0), None))
    val out = Interpolate(t, Seq("x"), "linear")
    assertSeqAlmost(col1(out, "x", "t"), Seq(None, Some(7.0), None))
  }

  test("property: linear/nearest match a local scipy-semantics reference on random gaps") {
    val rnd = new scala.util.Random(99)
    for (_ <- 1 to 8) {
      val n = 15 + rnd.nextInt(25)
      // strictly increasing, non-uniform times
      val ts = Iterator.iterate(0.0)(_ + 0.5 + rnd.nextInt(10)).take(n).toSeq
      val xs = Seq.fill(n)(
        if (rnd.nextInt(3) == 0) None else Some((rnd.nextInt(200) - 100) / 7.0))
      val t = fixture(ts, xs)
      def localRef(nearest: Boolean): Seq[Option[Double]] = {
        val known = ts.zip(xs).collect { case (tt, Some(v)) => (tt, v) }
        if (known.size < 2) xs
        else ts.zip(xs).map {
          case (_, Some(v)) => Some(v)
          case (tt, None) =>
            val before = known.filter(_._1 <= tt).lastOption
            val after = known.find(_._1 >= tt)
            (before, after) match {
              case (None, Some((_, v))) => Some(v)
              case (Some((_, v)), None) => Some(v)
              case (Some((t0, v0)), Some((t1, v1))) =>
                if (nearest) Some(if (tt - t0 <= t1 - tt) v0 else v1)
                else if (t1 == t0) Some(v0)
                else Some(v0 + (v1 - v0) * (tt - t0) / (t1 - t0))
              case _ => None
            }
        }
      }
      assertSeqAlmost(col1(Interpolate(t, Seq("x"), "linear"), "x", "t"),
        localRef(nearest = false), 1e-9)
      assertSeqAlmost(col1(Interpolate(t, Seq("x"), "nearest"), "x", "t"),
        localRef(nearest = true), 1e-9)
    }
  }

  test("interp() uses remembered settings over all numeric columns (timeseries.py:270-299)") {
    val t = fixture(Seq(0, 1, 2, 3), Seq(Some(2.0), None, Some(6.0), None))
      .withInterpolation("linear")
    assertSeqAlmost(col1(t.interp(), "x", "t"), d(2, 4, 6, 6))
    val tNearest = t.withInterpolation("nearest")
    assertSeqAlmost(col1(tNearest.interp(), "x", "t"), d(2, 2, 6, 6))
  }

  test("multivariateByKey == driver multivariate, per series, all methods") {
    import spark.implicits._
    // 20 series x 15 rows x 4 cols with deterministic hash-holes; the
    // executor fan-out must reproduce the driver path's fills EXACTLY
    // (same fillMatrix on the same per-series matrix)
    val rows = for (s <- 0 until 20; i <- 0 until 15) yield {
      def v(j: Int): Double = {
        val h = (s * 31 + i * 7 + j * 13) % 11
        if (h == 0) Double.NaN else s + 2.0 * i - 3.0 * j + 0.1 * h
      }
      (s.toLong, i.toLong, v(0), v(1), v(2), v(3))
    }
    val df = rows.toDF("k", "t", "c0", "c1", "c2", "c3")
    val tsf = TimeseriesFrame(df, Some("t"), Nil, Seq("k"))
    val cols = Seq("c0", "c1", "c2", "c3")
    for (method <- Seq("nearest", "linear", "cubic")) {
      val driver = (method match {
        case "nearest" => Interpolate.multivariateNearest(tsf, cols)
        case "linear" => Interpolate.multivariateLinear(tsf, cols)
        case "cubic" => Interpolate.multivariateCubic(tsf, cols)
      }).orderBy("k", "t").collect()
      val keyed =
        (if (method == "linear") Interpolate.multivariateLinearByKey(tsf, cols)
         else Interpolate.multivariateByKey(tsf, cols, method))
        .orderBy("k", "t").collect()
      driver.zip(keyed).foreach { case (a, b) =>
        (0 until a.length).foreach { j =>
          val (x, y) = (a.get(j), b.get(j))
          assert(x == y || (x.isInstanceOf[Double] && y.isInstanceOf[Double] &&
            (x.asInstanceOf[Double].isNaN && y.asInstanceOf[Double].isNaN ||
              x == y)), s"$method row ${a.get(0)},${a.get(1)} col $j: $x vs $y")
        }
      }
    }
  }
}
