package graft.core

import graft.SparkSpec

/** TimeDelta classification per `timeseries.py:17-91` and the spacing
  * variants of `widgets/tests/test_owtimeslice.py:22-63`. */
class TimeDeltaSpec extends SparkSpec {

  test("uniform numeric delta → equispaced seconds") {
    val td = TimeDelta.fromRawDeltas(Seq(10.0))
    assert(td.isEquispaced)
    assert(td.timeInterval.contains(Left(10.0)))
    assert(td.gcd.contains(10.0))
  }

  test("daily spacing") {
    val td = TimeDelta.fromRawDeltas(Seq(86400.0))
    assert(td.isEquispaced && td.intervalSeconds.contains(86400.0))
  }

  test("monthly spacing: 28..31-day deltas classify to one (1, month)") {
    val td = TimeDelta.fromRawDeltas(Seq(2419200.0, 2592000.0, 2678400.0))
    assert(td.isEquispaced)
    assert(td.timeInterval.contains(Right((1, "month"))))
  }

  test("yearly spacing: 365/366-day deltas classify to one (1, year)") {
    val td = TimeDelta.fromRawDeltas(Seq(31536000.0, 31622400.0))
    assert(td.isEquispaced)
    assert(td.timeInterval.contains(Right((1, "year"))))
  }

  test("mixed numeric deltas → not equispaced, gcd") {
    val td = TimeDelta.fromRawDeltas(Seq(10.0, 25.0))
    assert(!td.isEquispaced)
    assert(td.timeInterval.isEmpty)
    assert(td.gcd.contains(5.0))
  }

  test("mixed numeric and calendar → gcd of numerics and one day") {
    val td = TimeDelta.fromRawDeltas(Seq(43200.0, 2592000.0))
    assert(!td.isEquispaced)
    assert(td.gcd.contains(43200.0)) // gcd(43200, 86400)
  }

  test("empty → no delta (single-point series)") {
    val td = TimeDelta.fromRawDeltas(Nil)
    assert(!td.isEquispaced && td.timeInterval.isEmpty && td.gcd.isEmpty)
  }

  test("inference over a DataFrame (duplicates and unsorted input legal)") {
    val df = seriesDF(d(1, 2, 3, 4)).toDF("i", "x")
      .selectExpr("cast(i as double) * 10 as t", "x")
      .unionAll(spark.sql("select 20.0 as t, 9.0 as x")) // duplicate timestamp
    val td = TimeDelta.infer(df, "t")
    assert(td.isEquispaced && td.intervalSeconds.contains(10.0))
  }
}
