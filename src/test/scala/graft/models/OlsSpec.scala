package graft.models

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Normal-equation OLS aggregation vs direct Breeze least squares, and
  * the closed-form lag-1 Granger F vs the rss-based formulation. */
class OlsSpec extends SparkSpec {

  private def breezeFit(y: Array[Double], xCols: Array[Array[Double]])
      : (DenseVector[Double], Double) = {
    val n = y.length
    val p = xCols.length + 1
    val X = DenseMatrix.zeros[Double](n, p)
    for (r <- 0 until n) {
      for (c <- xCols.indices) X(r, c) = xCols(c)(r)
      X(r, p - 1) = 1.0
    }
    val yv = DenseVector(y)
    val beta = X \ yv
    val resid = yv - X * beta
    (beta, resid dot resid)
  }

  // deterministic pseudo-random series (LCG — no library RNG dependency)
  private def lcg(seed: Long, n: Int): Array[Double] = {
    var s = seed
    Array.fill(n) { s = (s * 6364136223846793005L + 1442695040888963407L)
      (s >>> 11).toDouble / (1L << 53).toDouble }
  }

  test("DistributedOls.fit ≡ direct least squares (beta, rss, r2)") {
    import spark.implicits._
    val n = 500
    val x1 = lcg(1, n); val x2 = lcg(2, n); val noise = lcg(3, n)
    val y = Array.tabulate(n)(i => 2.5 * x1(i) - 1.25 * x2(i) + 0.75 + 0.1 * noise(i))
    val df = (0 until n).map(i => (y(i), x1(i), x2(i))).toDF("y", "x1", "x2")

    val fit = DistributedOls.fit(df, "y", Seq("x1", "x2"))
    val (bref, rssRef) = breezeFit(y, Array(x1, x2))
    assert(math.abs(fit.beta(0) - bref(0)) < 1e-9, s"${fit.beta(0)} vs ${bref(0)}")
    assert(math.abs(fit.beta(1) - bref(1)) < 1e-9)
    assert(math.abs(fit.intercept - bref(2)) < 1e-9)
    assert(math.abs(fit.rss - rssRef) < 1e-7 * math.max(1.0, rssRef))
    assert(fit.n == n && fit.r2 > 0.99, s"n=${fit.n} r2=${fit.r2}")
  }

  test("DistributedOls.fit drops rows with any null regressor or target") {
    import spark.implicits._
    val rows = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 1.0), (2.0, 2.0), (3.1, 3.0), (4.0, 4.0), (null, 5.0), (6.0, null))
    val df = rows.toDF("y", "x")
    val fit = DistributedOls.fit(df, "y", Seq("x"))
    assert(fit.n == 4)
    val (bref, _) = breezeFit(Array(1.0, 2.0, 3.1, 4.0),
      Array(Array(1.0, 2.0, 3.0, 4.0)))
    assert(math.abs(fit.beta(0) - bref(0)) < 1e-9)
  }

  test("lag1ClosedFormByKey ≡ independent per-key lag1ClosedForm runs") {
    import spark.implicits._
    val df = (for {
      k <- 0 until 4
      i <- 0 until 40
    } yield {
      val y = 100 + 7 * k + ((i * (2654435761L + k)) % 23) - 11 + 3 * (i % 5)
      val x = 10 + ((i * 40503L + k * 17) % 9)
      (s"key$k", i.toLong, y, x)
    }).toDF("k", "t", "y", "x").repartition(5)

    val grouped = Granger.lag1ClosedFormByKey(df, "y", "x", "t", Seq("k"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("f_stat"),
          r.getAs[Double]("beta_ylag"), r.getAs[Double]("rss_u"))).toMap
    assert(grouped.size == 4)
    (0 until 4).foreach { k =>
      val one = Granger.lag1ClosedForm(
        df.filter(col("k") === s"key$k"), "y", "x", "t").head()
      val (n, f, b1, rssU) = grouped(s"key$k")
      assert(n == one.getAs[Long]("n"))
      // exact integer sums + identical op order → bit-identical doubles
      assert(f == one.getAs[Double]("f_stat"), s"key$k F: $f")
      assert(b1 == one.getAs[Double]("beta_ylag"))
      assert(rssU == one.getAs[Double]("rss_u"))
    }
  }

  test("lag1ClosedFormByKey drops series shorter than minRows") {
    import spark.implicits._
    val df = ((0 until 30).map(i => ("long", i.toLong, 50L + i % 7, 5L + i % 3)) ++
      (0 until 5).map(i => ("short", i.toLong, 10L + i, 2L))).toDF("k", "t", "y", "x")
    val keys = Granger.lag1ClosedFormByKey(df, "y", "x", "t", Seq("k"), minRows = 10)
      .select("k").collect().map(_.getString(0)).toSet
    assert(keys == Set("long"))
  }

  test("Granger.lag1ClosedForm F ≡ rss-based unrestricted/restricted fits") {
    import spark.implicits._
    // integer AR-ish pair where x genuinely leads y
    var (y, x) = (50L, 10L)
    val series = (0 until 120).map { i =>
      val nse = ((i * 2654435761L) % 13) - 6
      x = math.max(1L, x + ((i * 40503L) % 7) - 3)
      y = math.max(1L, (y * 3) / 4 + 2 * x + nse)
      (i.toLong, y, x)
    }
    val df = series.toDF("t", "y", "x")
    val row = Granger.lag1ClosedForm(df, "y", "x", "t").head()
    val f = row.getAs[Double]("f_stat")

    val ys = series.map(_._2.toDouble).toArray
    val xs = series.map(_._3.toDouble).toArray
    val yv = ys.drop(1); val u = ys.dropRight(1); val w = xs.dropRight(1)
    val (_, rssU) = breezeFit(yv, Array(u, w))
    val (_, rssR) = breezeFit(yv, Array(u))
    val n = yv.length
    val fRef = (rssR - rssU) / (rssU / (n - 3))
    assert(math.abs(f - fRef) < 1e-7 * math.max(1.0, fRef), s"$f vs $fRef")
    assert(row.getAs[Long]("n") == n)
    assert(f > 10, s"x should Granger-cause y here, F=$f")
  }
}
