package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import graft.models.ForecastTable
import org.apache.spark.sql.functions._

class CubicAndContractSpec extends SparkSpec {

  test("cubic spline reproduces a cubic polynomial exactly at gap points") {
    // y = t^3 - 2t^2 + 3 sampled at integers; a cubic spline through exact
    // cubic data interpolates interior gaps exactly (not-a-knot property)
    def f(t: Double) = t * t * t - 2 * t * t + 3
    val ts = (0 to 10).map(_.toDouble)
    val xs = ts.map(t => if (t == 4.0 || t == 7.0) None else Some(f(t)))
    val df = spark.createDataFrame(ts.zip(xs).map { case (t, v) =>
      (t, v.map(Double.box).orNull.asInstanceOf[java.lang.Double])
    }).toDF("t", "x")
    val out = Interpolate(TimeseriesFrame(df, Some("t")), Seq("x"), "cubic")
    val got = col1(out, "x", "t")
    ts.zip(got).foreach { case (t, v) =>
      assert(v.isDefined && math.abs(v.get - f(t)) < 1e-6,
        s"at $t: ${v} vs ${f(t)}")
    }
  }

  test("cubicByKey: per-series fan-out ≡ independent driver splines per key (r6 task 7)") {
    // 4 series with different shapes/gaps (one with < 4 knots → untouched);
    // the differential: the grouped executor path must equal running the
    // driver path independently on each key's sub-frame
    def f(k: Long, t: Double) = math.sin(t / (k + 2.0)) * (k + 1) + 0.1 * t * t
    val rows = for (k <- 0L until 4L; i <- 0 until (if (k == 3) 3 else 25)) yield {
      val t = i * (1.0 + 0.1 * k)
      val gap = (k != 3 && (i % 7 == 3 || i % 11 == 5)) || (k == 3 && i == 1)
      (k, t, if (gap) null.asInstanceOf[java.lang.Double] else Double.box(f(k, t)))
    }
    val df = spark.createDataFrame(rows).toDF("k", "t", "x").repartition(4)
    val grouped = TimeseriesFrame(df, Some("t"), seriesKeys = Seq("k"))
    val got = CubicSpline.interpolateByKey(grouped, "x")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val expected = (0L until 4L).flatMap { k =>
      CubicSpline.interpolate(
          TimeseriesFrame(df.filter(col("k") === k), Some("t")), "x")
        .orderBy("t").collect()
        .map(r => (k, r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case ((gk, gt, gv), (ek, et, ev)) =>
      assert(gk == ek && math.abs(gt - et) < 1e-12, s"row order: ($gk,$gt) vs ($ek,$et)")
      (gv, ev) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9,
          s"series $gk t=$gt: byKey $a vs driver $b")
        case (a, b) => assert(a == b, s"series $gk t=$gt: $a vs $b")
      }
    }
    // the short gappy series (k=3: 2 knots < 4) stays untouched — its
    // null survives both paths
    assert(got.count(_._1 == 3L) == 3)
    assert(got.filter(_._1 == 3L).count(_._3.isEmpty) == 1)

    // multi-column overload: ONE gather ≡ per-column calls (second
    // column = a different shape with its own gaps, incl. an all-null
    // column on the short series)
    val df2 = df.withColumn("y",
      when(col("t") * 7 % 5 < 1 || col("k") === 3, lit(null).cast("double"))
        .otherwise(col("t") * col("t") / (col("k") + 1.0) + 2.0))
    val g2 = TimeseriesFrame(df2, Some("t"), seriesKeys = Seq("k"))
    val multi = CubicSpline.interpolateByKey(g2, Seq("x", "y"), 1000000L)
      .orderBy("k", "t").collect()
    val seq2 = CubicSpline.interpolateByKey(
      TimeseriesFrame(CubicSpline.interpolateByKey(g2, "x"),
        Some("t"), seriesKeys = Seq("k")), "y")
      .orderBy("k", "t").collect()
    assert(multi.length == seq2.length)
    multi.zip(seq2).foreach { case (a, b) =>
      (2 to 3).foreach { i =>
        val (av, bv) = (if (a.isNullAt(i)) None else Some(a.getDouble(i)),
          if (b.isNullAt(i)) None else Some(b.getDouble(i)))
        (av, bv) match {
          case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9,
            s"col $i at (${a.get(0)},${a.get(1)}): $x vs $y")
          case (x, y) => assert(x == y, s"col $i at (${a.get(0)},${a.get(1)})")
        }
      }
    }
  }

  test("discrete mode fill: most frequent value, smallest wins ties") {
    val df = spark.createDataFrame(Seq(
      (1L, "b"), (2L, null), (3L, "a"), (4L, "b"), (5L, null), (6L, "a")))
      .toDF("i", "d")
    val out = Interpolate.discrete(TimeseriesFrame(df, None, Seq("i")), "d", "mode")
    val vals = out.orderBy("i").select("d").collect().map(_.getString(0)).toSeq
    assert(vals == Seq("b", "a", "a", "b", "a", "a")) // tie a/b → a
  }

  test("forecast table contract: column naming + CI metadata (models.py:210-228)") {
    val t = ForecastTable.asTable(spark, "Air passengers",
      Array(1.0, 2.0), Array(0.5, 1.5), Array(1.5, 2.5))
    assert(t.columns.toSeq == Seq("step", "Air passengers (forecast)",
      "Air passengers (95%CI low)", "Air passengers (95%CI high)"))
    val meanField = t.schema("Air passengers (forecast)")
    assert(meanField.metadata.getLong("ci_percent") == 95)
    assert(meanField.metadata.getStringArray("ci_attrs").toSeq ==
      Seq("Air passengers (95%CI low)", "Air passengers (95%CI high)"))
  }

  test("line-chart continuation: history + extrapolated forecast times (owlinechart.py:749-803)") {
    import graft.core.TimeseriesFrame
    val df = spark.createDataFrame(
      (0 until 5).map(i => (i * 10.0, 100.0 + i))).toDF("t", "y")
    val hist = TimeseriesFrame(df, Some("t"))
    val out = ForecastTable.continuation(hist, "y",
      Array(200.0, 210.0), Array(190.0, 195.0), Array(210.0, 225.0))
    val rows = out.orderBy("t").collect()
    assert(rows.length == 7)
    assert(rows.take(5).forall(_.getString(0) == "history"))
    // forecast times extrapolate the 10-second step from t=40
    val fut = rows.drop(5)
    assert(fut.map(_.getDouble(1)).toSeq == Seq(50.0, 60.0))
    assert(fut.map(_.getString(0)).forall(_ == "forecast"))
    assert(fut.head.getDouble(2) == 200.0 && fut.head.getDouble(3) == 190.0)
    // history rows carry null CI columns
    assert(rows.take(5).forall(r => r.isNullAt(3) && r.isNullAt(4)))
  }

  test("nan_product registered for SQL via GraftExtensions") {
    // register on the live session the same way the extension does
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nan_product",
      exprs => graft.functions.NanProduct(exprs.head), "scala_udf")
    val got = spark.sql(
      "SELECT nan_product(x) FROM VALUES (2.0), (CAST(NULL AS DOUBLE)), (3.0) t(x)")
      .head().getDouble(0)
    assert(got == 6.0)
  }

  test("graft text/vector functions registered for SQL") {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_poly_hash",
      exprs => graft.functions.PolyHashExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      exprs => graft.functions.ShingleHashesExpr(exprs.head, 2), "scala_udf")
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => graft.functions.DotProductExpr(exprs.head, exprs(1)), "scala_udf")
    val r = spark.sql(
      """SELECT graft_poly_hash('the'),
        |  size(graft_shingle_hashes('a b c')),
        |  graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))""".stripMargin).head()
    assert(r.getLong(0) == (('t'.toLong * 31 + 'h') * 31 + 'e') % 1000000007L)
    assert(r.getInt(1) == 2) // bigrams "a b", "b c"
    assert(r.getDouble(2) == 11.0)
  }

  test("multivariate nearest pre-pass fills from the closest (row, col) cell") {
    // 4 rows x 3 cols; NaN at (1, b). Index-space neighbors at distance 1:
    // (0,b)=10 above, (2,b)=30 below, (1,a)=2, (1,c)=200. Tie-break picks
    // the smallest row index first → (0,b) = 10.
    val df = spark.createDataFrame(Seq(
      (1L, 1.0, 10.0, 100.0),
      (2L, 2.0, Double.NaN, 200.0),
      (3L, 3.0, 30.0, 300.0),
      (4L, 4.0, 40.0, 400.0)))
      .toDF("i", "a", "b", "c")
    val out = Interpolate.multivariateNearest(
      TimeseriesFrame(df, None, Seq("i")), Seq("a", "b", "c"))
    val b = col1(out, "b", "i")
    assert(b == Seq(Some(10.0), Some(10.0), Some(30.0), Some(40.0)), b.toString)
    // non-NaN cells untouched
    assert(col1(out, "a", "i") == Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0)))
  }

  test("multivariate nearest with seriesKeys: per-series matrices, fills never cross series") {
    // two series with the same per-series row indices; the gap in series s1
    // must fill from s1's own cells, never from s2 (the round-2 __rn
    // collision bug applied one series' fills to every series)
    val df = spark.createDataFrame(Seq(
      ("s1", 1L, 1.0, 10.0, 100.0),
      ("s1", 2L, 2.0, Double.NaN, 200.0),
      ("s1", 3L, 3.0, 30.0, 300.0),
      ("s2", 1L, 5.0, 777.0, 500.0),
      ("s2", 2L, 6.0, 888.0, Double.NaN),
      ("s2", 3L, 7.0, 999.0, 700.0)))
      .toDF("k", "i", "a", "b", "c")
    val tsf = TimeseriesFrame(df, None, Seq("i"), seriesKeys = Seq("k"))
    val out = Interpolate.multivariateNearest(tsf, Seq("a", "b", "c"))
    val rows = out.orderBy("k", "i").collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4))).toSeq
    // s1 row 2, col b: nearest in s1's matrix at distance 1 → (row 1, b)=10
    assert(rows(1)._2 == 10.0, rows.toString)
    // s2 row 2, col c: nearest in s2's matrix at distance 1 → (row 1, c)=500
    assert(rows(4)._3 == 500.0, rows.toString)
    // untouched cells stay put in both series
    assert(rows(3)._2 == 777.0 && rows(5)._3 == 700.0)
  }

  test("continuation widens integer time columns and rejects empty history") {
    val df = spark.createDataFrame((0 until 4).map(i => (i * 10, 1.0 + i))).toDF("t", "y")
    val out = ForecastTable.continuation(
      TimeseriesFrame(df, Some("t")), "y", Array(9.0), Array(8.0), Array(10.0))
    val fut = out.filter(col("segment") === "forecast").head()
    assert(fut.getDouble(1) == 40.0) // IntegerType time widened, +1 step of 10
    val empty = df.filter(col("t") < 0)
    intercept[IllegalArgumentException] {
      ForecastTable.continuation(
        TimeseriesFrame(empty, Some("t")), "y", Array(1.0), Array(0.0), Array(2.0))
    }
  }

  test("autoBinned guards degenerate columns (constant and all-null)") {
    val const = spark.createDataFrame(Seq((1L, 5.0), (2L, 5.0))).toDF("i", "x")
    val b1 = Spiralogram.autoBinned(TimeseriesFrame(const, None, Seq("i")), "x")
    assert(b1.bins == 1 && b1.lo < 5.0 && b1.hi > 5.0)
    val allNull = spark.createDataFrame(Seq((1L, "a"), (2L, "b"))).toDF("i", "s")
      .withColumn("x", lit(null).cast("double"))
    val b2 = Spiralogram.autoBinned(TimeseriesFrame(allNull, None, Seq("i")), "x")
    assert(b2.bins == 1)
  }
}
