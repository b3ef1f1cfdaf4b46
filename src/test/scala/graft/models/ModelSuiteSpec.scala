package graft.models

import graft.SparkSpec
import graft.core.TimeseriesFrame
import graft.ingest.OrangeCsv
import org.apache.spark.sql.functions._

/** VAR sanity (`tests/test_models.py:41-53`) + evaluation shape
  * (`:56-62`) + Granger smoke on airpassengers-derived data. */
class ModelSuiteSpec extends SparkSpec {

  private lazy val air: TimeseriesFrame = {
    val path = getClass.getResource("/airpassengers.csv").getPath
    OrangeCsv.read(spark, path)
  }
  private lazy val y: Array[Double] =
    air.df.orderBy("Month").select("Air passengers").collect().map(_.getDouble(0))

  /** The reference feeds [class_var; epoch time] — VAR on a Table uses
    * Y + X columns (`models.py:374-377`); with airpassengers that is the
    * passengers series and the time column. Time as a linear ramp makes the
    * VAR near-singular, so test on passengers + a lagged copy instead. */
  private lazy val mat: Array[Array[Double]] =
    y.indices.drop(1).map(i => Array(y(i), y(i - 1))).toArray

  test("VAR(2): forecast strictly inside its CI band (test_models.py:41-48)") {
    val m = new Var(Some(2)).fit(mat)
    val (fc, lo, hi) = m.predict(10)
    for (h <- 0 until 10; v <- 0 until 2) {
      assert(fc(h)(v) > lo(h)(v) && fc(h)(v) < hi(h)(v))
    }
    assert(m.k == 2 && m.nVars == 2)
  }

  test("VAR fitDistributed ≡ collected Breeze fit (coefs via predict surface)") {
    import spark.implicits._
    // a genuinely 2-D stable VAR-ish pair, long enough to matter
    var (a, b) = (120.0, 40.0)
    val rows = (0 until 300).map { t =>
      val na = ((t * 2654435761L) % 17).toDouble - 8
      val nb = ((t * 40503L) % 11).toDouble - 5
      val a1 = 30 + 0.5 * a + 0.3 * b + na
      val b1 = 10 + 0.2 * a + 0.4 * b + nb
      a = a1; b = b1
      (t.toLong, a1, b1)
    }
    val df = rows.toDF("t", "ya", "yb").repartition(5)

    val dist = new Var(trend = "c").fitDistributed(df, Seq("ya", "yb"), "t", lags = 2)
    val local = new Var(Some(2)).fit(rows.map(r => Array(r._2, r._3)).toArray)

    val (fd, ld, hd) = dist.predict(6)
    val (fl, ll, hl) = local.predict(6)
    for (h <- 0 until 6; v <- 0 until 2) {
      assert(math.abs(fd(h)(v) - fl(h)(v)) < 1e-7 * math.max(1, math.abs(fl(h)(v))),
        s"forecast h=$h v=$v: ${fd(h)(v)} vs ${fl(h)(v)}")
      assert(math.abs(ld(h)(v) - ll(h)(v)) < 1e-6 * math.max(1, math.abs(ll(h)(v))),
        s"ci_lo h=$h v=$v: ${ld(h)(v)} vs ${ll(h)(v)}")
      assert(math.abs(hd(h)(v) - hl(h)(v)) < 1e-6 * math.max(1, math.abs(hl(h)(v))))
    }
    assert(dist.k == 2 && dist.nVars == 2)
  }

  test("VAR fitFixed at the fitted coefficients reproduces fit's predict surface") {
    // extract (A1, c) from a VAR(1) OLS fit, refit at fixed parameters:
    // the residual covariance and hence forecasts and CI bands must agree
    val m = new Var(Some(1)).fit(mat)
    val (fc, lo, hi) = m.predict(5)
    val a1 = breeze.linalg.DenseMatrix.zeros[Double](2, 2)
    val fv = m.fittedValues()
    // recover A1 and c by solving the exact linear relation the fitted
    // values satisfy: fv(t) = c + A1 * y(t-1) — three independent points
    // are enough for the 2x3 per-equation system
    val pts = Seq(1, 2, 3).map(t => (mat(t - 1), fv(t - 1)))
    val x = breeze.linalg.DenseMatrix(pts.map { case (p, _) => Array(1.0, p(0), p(1)) }: _*)
    val b0 = breeze.linalg.DenseVector(pts.map(_._2(0)).toArray)
    val b1 = breeze.linalg.DenseVector(pts.map(_._2(1)).toArray)
    val s0 = x \ b0
    val s1 = x \ b1
    a1(0, 0) = s0(1); a1(0, 1) = s0(2); a1(1, 0) = s1(1); a1(1, 1) = s1(2)
    val mf = new Var().fitFixed(mat, Array(a1), Array(s0(0), s1(0)))
    val (fc2, lo2, hi2) = mf.predict(5)
    for (h <- 0 until 5; v <- 0 until 2) {
      assert(math.abs(fc(h)(v) - fc2(h)(v)) < 1e-6 * math.abs(fc(h)(v)),
        s"forecast drift at h=$h v=$v: ${fc(h)(v)} vs ${fc2(h)(v)}")
      assert(math.abs(lo(h)(v) - lo2(h)(v)) < 1e-5 * math.abs(lo(h)(v)))
      assert(math.abs(hi(h)(v) - hi2(h)(v)) < 1e-5 * math.abs(hi(h)(v)))
    }
  }

  test("VAR ic='magic' selects a lag ≤ maxlags") {
    val m = new Var(Some(6), ic = Some("magic")).fit(mat)
    assert(m.k >= 0 && m.k <= 6)
  }

  test("model evaluation shape + positive scores (test_models.py:56-62)") {
    val specs = Seq(
      ModelEvaluation.ArimaSpec2(1, 1, 0), ModelEvaluation.ArimaSpec2(2, 1, 1),
      ModelEvaluation.VarSpec(1), ModelEvaluation.VarSpec(3))
    val res = ModelEvaluation.evaluate(spark, air, Seq("Air passengers"),
      specs, nFolds = 10, forecastSteps = 3)
    val rows = res.collect()
    assert(rows.length == 4 * 2) // 2 rows per model (cv + in-sample)
    rows.foreach { r =>
      (1 to 4).foreach { i => // rmse, mae, mape, pocid
        val v = r.getDouble(i)
        assert(v.isNaN || v >= 0, s"${r.getString(0)} col $i: $v")
      }
      assert(!r.getDouble(1).isNaN, s"rmse NaN for ${r.getString(0)}")
    }
  }

  test("Granger causality: lagged copy Granger-causes the series") {
    val df = spark.createDataFrame(
      y.indices.drop(3).map(i => (i.toLong, y(i), y(i - 3))))
      .toDF("i", "a", "b")
    val tsf = TimeseriesFrame(df, None, Seq("i"))
    val out = Granger.causality(spark, tsf, Seq("a", "b"), maxLag = 5)
      .collect()
    // b is a 3-lagged copy of a → b must Granger-cause a
    assert(out.exists(r => r.getString(2) == "b" && r.getString(3) == "a"),
      out.mkString("; "))
  }
}
