package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Implied-sequence time synthesis goldens transcribed from
  * `widgets/tests/test_owtabletotimeseries.py:371-470`: start
  * 2022-11-03T11:13:45, four rows, numeric and calendar units. */
class FromSequenceSpec extends SparkSpec {

  private def epochUtc(y: Int, mo: Int, d: Int, h: Int = 0, mi: Int = 0,
      s: Int = 0): Double =
    java.time.ZonedDateTime.of(y, mo, d, h, mi, s, 0,
      java.time.ZoneOffset.UTC).toEpochSecond.toDouble

  private val start = epochUtc(2022, 11, 3, 11, 13, 45)
  private val base = (0 until 4).map(i => (i.toLong, i * 1.0))

  private def gen(stepCount: Int, unit: String): Seq[Double] = {
    val df = spark.createDataFrame(base).toDF("k", "x")
    TimeseriesFrame.fromSequence(df, Seq("k"), start, stepCount, unit).df
      .orderBy("k").select(col("t").cast("double"))
      .collect().map(_.getDouble(0)).toSeq
  }

  test("seconds/minutes/hours/days are fixed-length steps") {
    assert(gen(1, "second") == (0 until 4).map(start + _))
    assert(gen(8, "second") == (0 until 4).map(start + _ * 8))
    assert(gen(1, "minute") == (0 until 4).map(start + _ * 60))
    assert(gen(8, "minute") == (0 until 4).map(start + _ * 480))
    assert(gen(8, "hour") == (0 until 4).map(start + _ * 8 * 3600))
    assert(gen(8, "day") == (0 until 4).map(start + _ * 8 * 86400))
  }

  test("months step the calendar keeping time-of-day (:460-467)") {
    assert(gen(3, "month") == Seq(
      epochUtc(2022, 11, 3, 11, 13, 45), epochUtc(2023, 2, 3, 11, 13, 45),
      epochUtc(2023, 5, 3, 11, 13, 45), epochUtc(2023, 8, 3, 11, 13, 45)))
  }

  test("years and centuries step the calendar (:432-441)") {
    assert(gen(3, "year") == Seq(
      epochUtc(2022, 11, 3, 11, 13, 45), epochUtc(2025, 11, 3, 11, 13, 45),
      epochUtc(2028, 11, 3, 11, 13, 45), epochUtc(2031, 11, 3, 11, 13, 45)))
    assert(gen(1, "century") == Seq(
      epochUtc(2022, 11, 3, 11, 13, 45), epochUtc(2122, 11, 3, 11, 13, 45),
      epochUtc(2222, 11, 3, 11, 13, 45), epochUtc(2322, 11, 3, 11, 13, 45)))
  }

  test("month-end clamping: Jan 31 monthly steps clamp per-step from start") {
    val df = spark.createDataFrame(base).toDF("k", "x")
    val got = TimeseriesFrame.fromSequence(df, Seq("k"),
        epochUtc(2020, 1, 31), 1, "month").df
      .orderBy("k").select(col("t").cast("double"))
      .collect().map(_.getDouble(0)).toSeq
    // relativedelta semantics: each step from the START date, clamped to
    // the target month's end — so March recovers the 31st
    assert(got == Seq(epochUtc(2020, 1, 31), epochUtc(2020, 2, 29),
      epochUtc(2020, 3, 31), epochUtc(2020, 4, 30)))
  }
}
