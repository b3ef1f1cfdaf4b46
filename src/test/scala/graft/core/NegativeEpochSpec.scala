package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pre-1970 (negative epoch) handling — `tests/test_timeseries.py:39-103`
  * pins timestamp round-trips for pre-epoch dates; Spark timestamps are
  * signed, so the engine must stay correct below zero. */
class NegativeEpochSpec extends SparkSpec {

  test("fromSequence across the epoch boundary (monthly from 1949-01)") {
    val df = spark.createDataFrame((0 until 4).map(i => (i.toLong, 0.0)))
      .toDF("k", "x")
    val start = java.time.ZonedDateTime.of(1949, 1, 1, 0, 0, 0, 0,
      java.time.ZoneOffset.UTC).toEpochSecond.toDouble
    val got = TimeseriesFrame.fromSequence(df, Seq("k"), start, 1, "month").df
      .orderBy("k").select(date_format(col("t"), "yyyy-MM-dd"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("1949-01-01", "1949-02-01", "1949-03-01", "1949-04-01"))
  }

  test("TimeDelta inference on negative epochs") {
    val df = spark.createDataFrame(
      Seq((-86400.0 * 3, 1.0), (-86400.0 * 2, 2.0), (-86400.0, 3.0), (0.0, 4.0)))
      .toDF("t", "x")
    val td = TimeDelta.infer(df, "t")
    assert(td.isEquispaced && td.intervalSeconds.contains(86400.0))
  }

  test("time slice below zero epoch") {
    val df = spark.createDataFrame(
      (-10 to 10).map(i => (i * 100.0, i.toDouble))).toDF("t", "x")
    val out = graft.ops.TimeSlice(TimeseriesFrame(df, Some("t")), -550.0, 150.0)
    assert(out.count() == 7) // t in {-500..100}
  }
}
