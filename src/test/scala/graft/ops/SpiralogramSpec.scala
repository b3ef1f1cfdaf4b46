package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.functions._

/** Spiralogram cross-tab semantics (`owspiralogram.py:749-823`): cell
  * counts, zero-count cells dropped, equal-width bin labels, data-driven
  * nice-decimal auto-binning, and row selection by cell keys. */
class SpiralogramSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // 12 hourly points across 2 days, values 0..110
    (0 until 12).map { i =>
      (new java.sql.Timestamp(1704067200000L + i * 3600L * 4 * 1000), i * 10.0)
    }.toDF("ts", "v")
  }

  test("cross-tab: per-cell count + aggregate, empty cells absent") {
    val t = TimeseriesFrame(fixture, Some("ts"))
    val out = Spiralogram(t,
      Spiralogram.PeriodComponent("day_of_week"),
      Some(Spiralogram.Binned("v", 0.0, 120.0, 2)),
      Some("v" -> "max"))
    val rows = out.collect()
    assert(rows.map(_.getLong(2)).sum == 12) // counts partition the rows
    // every emitted cell is non-empty
    assert(rows.forall(_.getLong(2) > 0))
    // max agg present and consistent with bin upper bounds
    assert(rows.forall(r => r.getDouble(3) <= 110.0))
  }

  test("bin labels: '< a' / 'a - b' / '≥ b' and null passthrough") {
    val df = spark.createDataFrame(Seq(
      Tuple1(5.0), Tuple1(55.0), Tuple1(95.0))).toDF("x")
    val labels = df.select(
      Spiralogram.binKey(col("x"), 0.0, 100.0, 4).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(labels == Seq("< 25.0000", "50.0000 - 75.0000", "≥ 75.0000"), labels)
  }

  test("autoBinned picks a nice decimal width covering the span") {
    val t = TimeseriesFrame(fixture, Some("ts"))
    val b = Spiralogram.autoBinned(t, "v", targetBins = 6)
    // span 0..110, target 6 → raw 18.3 → width 20, lo 0, 6 bins to 120
    assert(b.lo == 0.0 && b.bins == 6 && b.hi == 120.0, b.toString)
    // every value falls inside [lo, hi]
    assert(b.lo <= 0.0 && b.hi >= 110.0)
  }

  test("timeBinKey: calendar bucket starts at every unit, nulls propagate") {
    val df = spark.createDataFrame(Seq(
      // Wed 2024-01-03 13:45:10 UTC, Sun 2024-02-18 02:00:00 UTC
      (1, new java.sql.Timestamp(1704289510000L)),
      (2, new java.sql.Timestamp(1708221600000L))))
      .toDF("id", "ts")
      .union(spark.sql("SELECT 3, CAST(NULL AS TIMESTAMP)"))
    def labels(unit: String, every: Int = 1): Seq[String] =
      df.orderBy("id").select(Spiralogram.timeBinKey(col("ts"), unit, every))
        .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(labels("hour") == Seq("2024-01-03 13:00", "2024-02-18 02:00", null))
    assert(labels("hour", 6) == Seq("2024-01-03 12:00", "2024-02-18 00:00", null))
    assert(labels("day") == Seq("2024-01-03", "2024-02-18", null))
    // Monday-start weeks: Wed 3rd → Mon 1st; Sun 18th → Mon 12th
    assert(labels("week") == Seq("2024-01-01", "2024-02-12", null))
    assert(labels("month") == Seq("2024-01", "2024-02", null))
    // quarter grid anchored at month index 0 (year 0): Jan–Mar bucket
    assert(labels("month", 3) == Seq("2024-01", "2024-01", null))
    assert(labels("year") == Seq("2024", "2024", null))
    assert(labels("year", 10) == Seq("2020", "2020", null))
    intercept[IllegalArgumentException](labels("week", 2))
    intercept[IllegalArgumentException](labels("fortnight"))
  }

  test("multi-unit hour/day bins assert the UTC session timezone precondition") {
    // epoch flooring anchors to UTC; a non-UTC session would mislabel
    // DST-shifted days via date_format — the precondition must be loud
    val tzConf = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzConf)
    try {
      spark.conf.set(tzConf, "America/New_York")
      intercept[IllegalArgumentException] {
        Spiralogram.timeBinKey(col("d"), "day", 7)
      }
      intercept[IllegalArgumentException] {
        Spiralogram.timeBinKey(col("d"), "hour", 6)
      }
    } finally spark.conf.set(tzConf, saved)
    // every=1 and month/year paths are date_trunc/index-based — no assert
    Spiralogram.timeBinKey(col("d"), "day", 1)
    Spiralogram.timeBinKey(col("d"), "month", 3)
  }

  test("autoTimeBinned walks the calendar ladder by span") {
    def tsfOf(spanSec: Long) = {
      import spark.implicits._
      TimeseriesFrame(Seq(
        new java.sql.Timestamp(1704067200000L),
        new java.sql.Timestamp(1704067200000L + spanSec * 1000L))
        .toDF("ts"), Some("ts"))
    }
    assert(Spiralogram.autoTimeBinned(tsfOf(3600L * 8), "ts").unit == "hour")
    assert(Spiralogram.autoTimeBinned(tsfOf(86400L * 8), "ts").unit == "day")
    assert(Spiralogram.autoTimeBinned(tsfOf(86400L * 60), "ts").unit == "week")
    assert(Spiralogram.autoTimeBinned(tsfOf(86400L * 300), "ts").unit == "month")
    assert(Spiralogram.autoTimeBinned(tsfOf(86400L * 3000), "ts").unit == "year")
    val multi = Spiralogram.autoTimeBinned(tsfOf(86400L * 365 * 50), "ts")
    assert(multi.unit == "year" && multi.every > 1, multi.toString)
    // degenerate: all-null time column → safe 1-day default
    val nulls = TimeseriesFrame(
      spark.sql("SELECT CAST(NULL AS TIMESTAMP) AS ts"), Some("ts"))
    assert(Spiralogram.autoTimeBinned(nulls, "ts") ==
      Spiralogram.TimeBinned("ts", "day", 1))
  }

  test("selectRows returns the union of raw rows of selected cells") {
    val t = TimeseriesFrame(fixture, Some("ts"))
    val all = Spiralogram(t,
      Spiralogram.PeriodComponent("hour_of_day"), None, None)
    val firstCell = all.orderBy("angular").limit(1)
      .select(col("angular")).collect().head.getAs[Number](0).intValue
    val selected = spark.createDataFrame(Seq(Tuple1(firstCell))).toDF("angular")
      .withColumn("radial", lit(null))
    val picked = Spiralogram.selectRows(t,
      Spiralogram.PeriodComponent("hour_of_day"), None, selected)
    assert(picked.count() > 0)
    val hours = picked.select(hour(col("ts"))).collect().map(_.getInt(0)).toSet
    assert(hours == Set(firstCell))
  }

  // ------- transcribed widget goldens: test_owspiralogram.py:409-557 -------
  // fixture (`:119-134`): 10 rows, a∈{0,1,2}, b∈{0..4}, c continuous,
  // d = day offsets 0..8 plus 365+9 (epoch days)
  private def widgetFixture = {
    import spark.implicits._
    val a = Seq(0, 0, 0, 0, 1, 1, 1, 1, 1, 2)
    val b = Seq(0, 0, 0, 2, 0, 1, 2, 3, 4, 2)
    val c = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 20.0)
    val days = Seq(0L, 1, 2, 3, 4, 5, 6, 7, 8, 365L + 9)
    (0 until 10).map(i =>
      (i.toLong, a(i), b(i), c(i),
        new java.sql.Timestamp(days(i) * 86400000L))).toDF("row", "a", "b", "c", "d")
  }

  test("widget golden: categorical grouping partitions rows by value (test_owspiralogram.py:417-424)") {
    val t = TimeseriesFrame(widgetFixture, Some("d"))
    val got = Spiralogram(t, Spiralogram.Categorical("b")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // blocks.indices {0:[0,1,2,4], 1:[5], 2:[3,6,9], 3:[7], 4:[8]}
    assert(got == Map(0 -> 4L, 1 -> 1L, 2 -> 3L, 3 -> 1L, 4 -> 1L), got.toString)
  }

  test("widget golden: width-2 binning, last edge closed (test_owspiralogram.py:426-444)") {
    val t = TimeseriesFrame(widgetFixture, Some("d"))
    val got = Spiralogram(t, Spiralogram.Binned("c", 0.0, 20.0, 10)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // c=1→bin0, {2,3}→bin1, {4,5}→bin2, {6,7}→bin3, {8,9}→bin4, 20→bin9
    // (closed last edge); bins 5..8 are empty → absent here (the widget
    // materializes them as empty index lists)
    assert(got == Map(
      "< 2.0000" -> 1L, "2.0000 - 4.0000" -> 2L, "4.0000 - 6.0000" -> 2L,
      "6.0000 - 8.0000" -> 2L, "8.0000 - 10.0000" -> 2L, "≥ 18.0000" -> 1L),
      got.toString)
  }

  test("widget golden: day-of-week grouping, Monday=0 (test_owspiralogram.py:446-456)") {
    val t = TimeseriesFrame(widgetFixture, Some("d"))
    val got = Spiralogram(t, Spiralogram.PeriodComponent("day_of_week")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // {0:[4], 1:[5], 2:[6], 3:[0,7], 4:[1,8], 5:[2], 6:[3,9]} — epoch day
    // 0 is a Thursday (=3), and day 374 lands on Sunday (=6) with row 3
    assert(got == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 2L, 4 -> 2L, 5 -> 1L,
      6 -> 2L), got.toString)
  }

  test("widget golden: 2-D day-of-week x binned-c cells (test_owspiralogram.py:458-473)") {
    val t = TimeseriesFrame(widgetFixture, Some("d"))
    val got = Spiralogram(t, Spiralogram.PeriodComponent("day_of_week"),
        Some(Spiralogram.Binned("c", 0.0, 20.0, 10))).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    // non-empty cells {(0,2),(1,3),(2,3),(3,0),(3,4),(4,1),(4,4),(5,1),
    // (6,2),(6,9)}, each holding exactly one row
    def lbl(bin: Int) = bin match {
      case 0 => "< 2.0000"
      case 9 => "≥ 18.0000"
      case k => f"${k * 2}%d.0000 - ${k * 2 + 2}%d.0000"
    }
    val want = Set((0, 2), (1, 3), (2, 3), (3, 0), (3, 4), (4, 1), (4, 4),
      (5, 1), (6, 2), (6, 9)).map { case (x, r) => (x, lbl(r), 1L) }
    assert(got == want, s"got $got")
  }

  test("widget golden: mean/var color aggregation values (test_owspiralogram.py:536-557)") {
    import spark.implicits._
    // the widget injects two blocks: rows 0-5 and rows 6-9; replicate with
    // an explicit group key and pin count / mean / POPULATION variance
    val df = widgetFixture.withColumn("g", when(col("row") < 6, 0).otherwise(1))
    val t = TimeseriesFrame(df, Some("d"))
    val mean = Spiralogram(t, Spiralogram.Categorical("g"),
        colorAgg = Some("c" -> "mean"))
      .orderBy("angular").collect()
    assert(mean.map(_.getLong(1)).toSeq == Seq(6L, 4L)) // counts [6, 4]
    assert(mean.map(_.getDouble(2)).toSeq == Seq(3.5, 11.0)) // np.mean
    val vr = Spiralogram(t, Spiralogram.Categorical("g"),
        colorAgg = Some("c" -> "var"))
      .orderBy("angular").collect()
    // np.var is POPULATION variance: var(1..6) = 35/12, var(7,8,9,20) = 27.5
    assert(math.abs(vr(0).getDouble(2) - 35.0 / 12) < 1e-9, vr(0).toString)
    assert(math.abs(vr(1).getDouble(2) - 27.5) < 1e-9, vr(1).toString)
  }
}
