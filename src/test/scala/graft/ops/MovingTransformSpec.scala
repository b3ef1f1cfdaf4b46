package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shell-level goldens from the Moving Transform widget tests:
  * sequential-blocks keep-instance rules
  * (`widgets/tests/test_owmovingtransform.py:399-462`: fixture c1 =
  * [1, 2.5, 4, 2.75, 3, 3.5], width 3 → min [1, 2.75], max [4, 3.5],
  * reference rows first/middle/last) and the period-aggregation golden
  * (`:535-633`: 10 timestamps per period kind, counts [4,2,3,1], means
  * [4.5, 1.5, 14, NaN]). */
class MovingTransformSpec extends SparkSpec {

  private val c1 = Seq(1.0, 2.5, 4.0, 2.75, 3.0, 3.5)

  private def fixture: TimeseriesFrame =
    TimeseriesFrame(seriesDF(d(c1: _*)).withColumnRenamed("x", "c1"), None, Seq("i"))

  test("strided windows: every width/shift golden from test_aggregate.py:89-121") {
    val a = Seq(3.0, 8.0, 6.0, 4.0, 2.0, 4.0, 6.0, 8.0, 1.0, 2.0, 4.0)
    def tsf(xs: Seq[Double]) =
      TimeseriesFrame(seriesDF(d(xs: _*)), None, Seq("i"))
    def sums(xs: Seq[Double], width: Int, shift: Int): Seq[Option[Double]] =
      col1(MovingTransform.strided(tsf(xs), Seq("x" -> "sum"), width, shift),
        "x_sum", "window_index")
    assertSeqAlmost(sums(a.take(6), 3, 1), d(17, 18, 12, 10))
    assertSeqAlmost(sums(a, 3, 3), d(17, 10, 15))
    assertSeqAlmost(sums(a, 3, 5), d(17, 18))
    assertSeqAlmost(sums(a, 10, 1), d(44, 45))
    assertSeqAlmost(sums(a, 4, 2), d(21, 16, 20, 17))
    assertSeqAlmost(sums(a, 11, 1), d(48))
    assertSeqAlmost(sums(a, 11, 2), d(48))
    assert(sums(a, 15, 2).isEmpty)
  }

  test("period names: month/day labels in calendar order (aggregate.py:210-221)") {
    import spark.implicits._
    val df = Seq(
      "2024-01-15 10:00:00", "2024-03-01 12:00:00", "2024-03-20 13:00:00",
      "2024-12-31 09:00:00")
      .map(s => Tuple2(java.sql.Timestamp.valueOf(s), 1.0)).toDF("ts", "v")
    val t = TimeseriesFrame(df, Some("ts"))
    val byMonth = MovingTransform.timePeriods(t, "month_of_year",
      Seq("v" -> "sum"), usePeriodNames = true)
    val names = byMonth.orderBy("instance_count")
      .select("month_of_year").collect().map(_.getString(0)).toSet
    assert(names == Set("January", "March", "December"), names.toString)
    val byDay = MovingTransform.timePeriods(t, "day_of_week",
      Seq("v" -> "sum"), usePeriodNames = true)
    val dayNames = byDay.select("day_of_week").collect().map(_.getString(0)).toSet
    // 2024-01-15 Mon, 2024-03-01 Fri, 2024-03-20 Wed, 2024-12-31 Tue
    assert(dayNames == Set("Monday", "Friday", "Wednesday", "Tuesday"), dayNames.toString)
  }

  test("sequential blocks: aggregates + trailing partial dropped") {
    val out = MovingTransform.sequentialBlocks(fixture,
      Seq("c1" -> "min", "c1" -> "max"), 3)
    assertSeqAlmost(col1(out, "c1_min", "block"), d(1, 2.75))
    assertSeqAlmost(col1(out, "c1_max", "block"), d(4, 3.5))
  }

  test("sequential blocks keep first/middle/last reference instance") {
    def refCol(ref: MovingTransform.BlockRef): Seq[Option[Double]] = {
      val out = MovingTransform.sequentialBlocks(fixture,
        Seq("c1" -> "min"), 3, ref)
      col1(out, "c1", "block")
    }
    assertSeqAlmost(refCol(MovingTransform.KeepFirst), d(1, 2.75))
    assertSeqAlmost(refCol(MovingTransform.KeepMiddle), d(2.5, 3.0))
    assertSeqAlmost(refCol(MovingTransform.KeepLast), d(4.0, 3.5))
  }

  test("KeepAll: leading incomplete windows null; cumulatives full-prefix (:347-384)") {
    val out = MovingTransform.slidingWindow(fixture,
      Seq("c1" -> "min", "c1" -> "max", "c1" -> "cumsum"), 3,
      MovingTransform.KeepAll)
    assertSeqAlmost(col1(out, "c1_min"),
      Seq(None, None, Some(1.0), Some(2.5), Some(2.75), Some(2.75)))
    assertSeqAlmost(col1(out, "c1_max"),
      Seq(None, None, Some(4.0), Some(4.0), Some(4.0), Some(3.5)))
    // cumulative uses the FULL prefix in KeepAll (owmovingtransform.py:413-414)
    assertSeqAlmost(col1(out, "c1_cumsum"),
      d(1.0, 3.5, 7.5, 10.25, 13.25, 16.75))
  }

  test("Discard keeps only order keys + aggregates (:317-327)") {
    val out = MovingTransform.slidingWindow(fixture,
      Seq("c1" -> "min", "c1" -> "max"), 3, MovingTransform.Discard)
    assert(out.columns.toSet == Set("i", "c1_min", "c1_max"))
    assertSeqAlmost(col1(out, "c1_min"), d(1, 2.5, 2.75, 2.75))
    assertSeqAlmost(col1(out, "c1_max"), d(4, 4, 4, 3.5))
  }

  private val periodColumn = Seq(Some(3.0), Some(4.0), Some(5.0), Some(6.0),
    Some(1.0), Some(2.0), None, Some(13.0), Some(15.0), None)

  private def periodFixture(dates: Seq[String]): TimeseriesFrame = {
    val rows = dates.zip(periodColumn).map { case (t, v) =>
      Row(java.sql.Timestamp.valueOf(t.replace("T", " ")), v.map(Double.box).orNull)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("t", TimestampType), StructField("x", DoubleType))))
    TimeseriesFrame(df, Some("t"))
  }

  // fixtures transcribed from test_owmovingtransform.py:545-607
  private val periodCases: Seq[(String, Seq[String], Seq[Double])] = Seq(
    ("days", Seq("1998-01-01T06:18:00", "1998-01-01T09:12:13",
      "1998-01-01T09:44:12", "1998-01-01T23:59:59", "1998-01-02T00:00:00",
      "1998-01-02T15:12:11", "1999-05-02T12:15:17", "1999-05-02T12:12:12",
      "1999-05-02T06:01:02", "2000-07-31T00:00:00"), Nil),
    ("month_of_year", Seq("1972-04-02T00:00:00", "1989-04-11T00:00:00",
      "1972-04-02T00:00:01", "1972-04-30T00:00:00", "1972-05-01T00:00:00",
      "1921-05-02T00:00:00", "1931-09-01T00:00:00", "1931-09-30T00:00:00",
      "1938-09-12T00:00:00", "2000-12-31T00:00:00"), Seq(4, 5, 9, 12)),
    ("day_of_year", Seq("1970-01-05T00:00:00", "1989-01-05T00:00:00",
      "1970-01-05T00:00:01", "1901-01-05T00:00:00", "1972-01-06T00:00:00",
      "1973-01-06T00:00:00", "1931-03-02T00:00:00", "1932-03-01T00:00:00",
      "1938-03-02T00:00:00", "2000-05-01T00:00:00"), Seq(5, 6, 61, 122)),
    ("day_of_month", Seq("1970-01-05T00:00:00", "1989-03-05T00:00:00",
      "1970-06-05T00:00:00", "1901-12-05T00:00:00", "1972-01-06T00:00:00",
      "1973-10-06T00:00:00", "1931-03-12T00:00:00", "1932-03-12T00:00:00",
      "1938-04-12T00:00:00", "2000-05-31T00:00:00"), Seq(5, 6, 12, 31)),
    ("day_of_week", Seq("2022-06-07T00:00:00", "2022-05-24T00:00:00",
      "2018-02-20T00:00:00", "2022-06-07T00:00:01", "2018-09-06T00:00:00",
      "2016-02-11T00:00:00", "2016-02-12T00:00:00", "2016-02-19T00:00:00",
      "2022-06-10T00:00:00", "2000-06-11T00:00:00"), Seq(1, 3, 4, 6)),
    ("hour_of_day", Seq("2022-06-07T03:12:14", "1970-01-01T03:16:00",
      "1970-01-01T03:50:00", "1970-01-01T03:59:00", "2018-09-06T05:12:12",
      "2016-02-11T05:11:00", "2016-02-12T12:15:17", "2016-02-19T12:34:12",
      "2022-06-10T12:00:00", "2000-06-11T18:22:12"), Seq(3, 5, 12, 18)))

  test("time periods: counts [4,2,3,1], means [4.5,1.5,14,null] per period kind") {
    for ((period, dates, keys) <- periodCases) {
      val out = MovingTransform
        .timePeriods(periodFixture(dates), period, Seq("x" -> "mean"))
        .orderBy(period)
      assertSeqAlmost(col1(out, "instance_count", period), d(4, 2, 3, 1))
      assertSeqAlmost(col1(out, "x_mean", period),
        Seq(Some(4.5), Some(1.5), Some(14.0), None))
      if (keys.nonEmpty)
        assertSeqAlmost(col1(out, period, period), d(keys: _*))
    }
  }
}
