package graft.core

import graft.SparkSpec
import graft.ops.Interpolate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Edge cases of the one-shuffle [[SeriesGather.fillSeries]] emit path
  * (the multivariateByKey/interpolateByKey carrier): pass-through of
  * non-numeric columns, NaN→null normalization on unfillable series, and
  * value-column type promotion — the contracts the old join-back shape
  * got from Catalyst for free and the direct emit must replicate. */
class FillSeriesSpec extends SparkSpec {

  private def frame() = {
    import spark.implicits._
    // series 1: 5 rows with interior holes (fillable: fully-known border)
    // series 2: 2 rows (< 3 ⇒ fillMatrix skips it entirely)
    val rows = Seq(
      // (k, t, c0, c1, c2, tag, xs)
      (1L, 1L, 1.0, 2.0, 3.0, "a", Seq(1L, 2L)),
      (1L, 2L, 2.0, Double.NaN, 4.0, "b", Seq(3L)),
      (1L, 3L, 3.0, 4.0, 5.0, "c", Seq.empty[Long]),
      (1L, 4L, 4.0, 5.0, Double.NaN, "d", Seq(4L, 5L, 6L)),
      (1L, 5L, 5.0, 6.0, 7.0, "e", Seq(7L)),
      (2L, 1L, 9.0, Double.NaN, 8.0, "f", Seq(8L)),
      (2L, 2L, 9.5, 7.0, Double.NaN, "g", Seq(9L)))
    val df = rows.toDF("k", "t", "c0", "c1", "c2", "tag", "xs")
      .withColumn("c1", when(isnan(col("c1")), lit(null).cast("double")).otherwise(col("c1")))
    // leave c2's NaN as a REAL NaN (not null) to exercise normalization
    TimeseriesFrame(df, Some("t"), Nil, Seq("k"))
  }

  test("pass-through columns (string, array) survive the emit exactly") {
    val out = Interpolate.multivariateByKey(frame(), Seq("c0", "c1", "c2"))
      .orderBy("k", "t").collect()
    assert(out.length == 7)
    assert(out.map(_.getString(5)).toSeq == Seq("a", "b", "c", "d", "e", "f", "g"))
    assert(out(0).getSeq[Long](6) == Seq(1L, 2L))
    assert(out(2).getSeq[Long](6).isEmpty)
    assert(out(5).getSeq[Long](6) == Seq(8L))
  }

  test("interior holes fill; short series pass through with NaN normalized to null") {
    val out = Interpolate.multivariateByKey(frame(), Seq("c0", "c1", "c2"))
      .orderBy("k", "t").collect()
    // series 1 row t=2: c1 hole is interior with a fully-known border → filled
    assert(!out(1).isNullAt(3), "series-1 interior c1 hole must be filled")
    // series 1 row t=4: c2 NaN (stored as real NaN) → filled, not NaN
    assert(!out(3).isNullAt(4) && !out(3).getDouble(4).isNaN)
    // series 2 (2 rows < 3): untouched by fillMatrix, but NaN normalizes
    assert(out(5).isNullAt(3), "series-2 null c1 stays null")
    assert(out(6).isNullAt(4), "series-2 NaN c2 normalizes to null")
    assert(out(6).getDouble(3) == 7.0, "known values pass through")
  }

  test("non-orderable pass-through columns (maps) survive the gather") {
    import spark.implicits._
    // sort_array would reject a struct containing a map at analysis time;
    // the JVM-side prefix sort must not (review finding, r9)
    val df = Seq(
      (1L, 1L, 1.0, 2.0, 3.0, Map("a" -> 1L)),
      (1L, 2L, 2.0, Double.NaN, 4.0, Map("b" -> 2L)),
      (1L, 3L, 3.0, 4.0, 5.0, Map.empty[String, Long]))
      .toDF("k", "t", "c0", "c1", "c2", "meta")
    val out = Interpolate.multivariateByKey(
      TimeseriesFrame(df, Some("t"), Nil, Seq("k")), Seq("c0", "c1", "c2"))
      .orderBy("t").collect()
    assert(out.length == 3)
    assert(out(0).getMap[String, Long](5) == Map("a" -> 1L))
    assert(out(1).getMap[String, Long](5) == Map("b" -> 2L))
    assert(!out(1).isNullAt(3), "the c1 hole still fills")
  }

  test("fill results invariant under input repartitioning") {
    import spark.implicits._
    val rows = for (k <- 1L to 12L; i <- 1L to 20L) yield {
      def v(j: Int): java.lang.Double =
        if ((k * 31 + i * 7 + j * 13) % 6 == 0) null
        else Double.box(k + 2.0 * i - 3.0 * j + 0.25)
      (k, i, v(0), v(1), v(2))
    }
    def run(parts: Int) = {
      val df = rows.toDF("k", "t", "c0", "c1", "c2").repartition(parts)
      Interpolate.multivariateByKey(
        TimeseriesFrame(df, Some("t"), Nil, Seq("k")), Seq("c0", "c1", "c2"))
        .collect().map(_.toString).sorted.toSeq
    }
    assert(run(1) == run(11))
  }

  test("integer value columns promote to nullable double") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1, 2, 3), (1L, 2L, 2, 3, 4), (1L, 3L, 3, 4, 5))
      .toDF("k", "t", "c0", "c1", "c2")
    val tsf = TimeseriesFrame(df, Some("t"), Nil, Seq("k"))
    val out = Interpolate.multivariateByKey(tsf, Seq("c0", "c1", "c2"))
    Seq("c0", "c1", "c2").foreach { c =>
      assert(out.schema(c).dataType == DoubleType && out.schema(c).nullable)
    }
    assert(out.orderBy("t").collect().map(_.getDouble(2)).toSeq == Seq(1.0, 2.0, 3.0))
  }
}
