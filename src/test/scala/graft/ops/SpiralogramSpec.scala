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
}
