package graft.core

import graft.SparkSpec

/** TimeDelta classification per `timeseries.py:17-91` and the spacing
  * variants of `widgets/tests/test_owtimeslice.py:22-63`. */
class TimeDeltaSpec extends SparkSpec {

  test("uniform numeric delta → equispaced seconds") {
    val td = TimeDelta.fromRawDeltas(Seq(10.0))
    assert(td.isEquispaced)
    assert(td.timeInterval.contains(10.0))
    assert(td.gcd.contains(Left(10.0)))
  }

  test("daily spacing") {
    val td = TimeDelta.fromRawDeltas(Seq(86400.0))
    assert(td.isEquispaced && td.intervalSeconds.contains(86400.0))
  }

  test("monthly mixed-length deltas: classified to one (1, month) but NOT equispaced") {
    // reference `timeseries.py:44-47`: is_equispaced uses the RAW delta
    // count, so 28/30/31-day months are not equispaced
    val td = TimeDelta.fromRawDeltas(Seq(2419200.0, 2592000.0, 2678400.0))
    assert(!td.isEquispaced)
    assert(td.timeInterval.isEmpty)
    assert(td.deltas == Seq(Right((1, "month"))))
    assert(td.min.contains(Right((1, "month"))))
    // all-calendar gcd = min tuple (`timeseries.py:66-68`)
    assert(td.gcd.contains(Right((1, "month"))))
  }

  test("uniform 30-day months: equispaced with a NUMERIC time_interval") {
    val td = TimeDelta.fromRawDeltas(Seq(2592000.0))
    assert(td.isEquispaced)
    assert(td.timeInterval.contains(2592000.0))
    assert(td.deltas == Seq(Right((1, "month"))))
  }

  test("yearly spacing: 365/366-day deltas classify to one (1, year)") {
    val td = TimeDelta.fromRawDeltas(Seq(31536000.0, 31622400.0))
    assert(!td.isEquispaced)
    assert(td.min.contains(Right((1, "year"))))
    assert(td.gcd.contains(Right((1, "year"))))
  }

  test("mixed numeric deltas → not equispaced, gcd") {
    val td = TimeDelta.fromRawDeltas(Seq(10.0, 25.0))
    assert(!td.isEquispaced)
    assert(td.timeInterval.isEmpty)
    assert(td.gcd.contains(Left(5.0)))
    assert(td.min.contains(Left(10.0)))
  }

  test("mixed numeric and calendar → gcd of numerics and one day") {
    val td = TimeDelta.fromRawDeltas(Seq(43200.0, 2592000.0))
    assert(!td.isEquispaced)
    assert(td.gcd.contains(Left(43200.0))) // gcd(43200, 86400)
  }

  test("empty → no delta (single-point series)") {
    val td = TimeDelta.fromRawDeltas(Nil)
    assert(!td.isEquispaced && td.timeInterval.isEmpty && td.gcd.isEmpty && td.min.isEmpty)
  }

  test("inference over a DataFrame (duplicates and unsorted input legal)") {
    val df = seriesDF(d(1, 2, 3, 4)).toDF("i", "x")
      .selectExpr("cast(i as double) * 10 as t", "x")
      .unionAll(spark.sql("select 20.0 as t, 9.0 as x")) // duplicate timestamp
    val td = TimeDelta.infer(df, "t")
    assert(td.isEquispaced && td.intervalSeconds.contains(10.0))
  }

  test("global path plans NO single-partition WindowExec (VERDICT r6 task 4)") {
    val df = spark.range(0, 1000).selectExpr("cast(id as double) * 3 as t")
    val (deltas, release) = TimeDelta.deltaFrame(df, "t", Nil)
    try {
      val plan = deltas.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"global delta plan contains a window:\n$plan")
    } finally release()
    // the keyed path keeps a KEYED window (parallel by construction)
    val keyed = spark.range(0, 100)
      .selectExpr("id % 4 as k", "cast(id as double) as t")
    val td = TimeDelta.infer(keyed, "t", Seq("k"))
    assert(td.isEquispaced && td.intervalSeconds.contains(4.0))
  }

  test("a million distinct deltas: bounded driver state, exact min/gcd/equispaced") {
    // t_i = i(i+1)/2 → delta_i = i: one MILLION distinct deltas. The old
    // path collected them all after a global-window sort; the stats pass
    // keeps only the smallest 65 plus three scalars per partition.
    val n = 1000000L
    val df = spark.range(0, n + 1)
      .selectExpr("cast(id as double) * (cast(id as double) + 1) / 2 as t")
      .repartition(8)
    val td = TimeDelta.infer(df, "t")
    assert(!td.isEquispaced && td.timeInterval.isEmpty)
    assert(td.min.contains(Left(1.0)))
    assert(td.gcd.contains(Left(1.0))) // gcd(1..n) — exact, aggregated
    // deltas listing = the exact 64 smallest distinct deltas
    assert(td.deltas.size == 64)
    assert(td.deltas == (1 to 64).map(i => Left(i.toDouble)))
  }

  test("calendar deltas keep exact semantics through the capped stats pass") {
    // 70 distinct deltas (over the 64 cap): 43200s plus 69 distinct
    // multiples, with month-length deltas mixed in → overflow path with
    // calendar present: gcd = gcd(numerics, 86400)
    val halfDay = 43200.0
    val nums = (1 to 69).map(i => halfDay * (2 * i + 1)) // odd multiples
    val deltas = nums :+ 2592000.0 // a 30-day month delta
    val ts = deltas.scanLeft(0.0)(_ + _)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(ts.map(org.apache.spark.sql.Row(_)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.DoubleType))))
    val td = TimeDelta.infer(df, "t")
    assert(!td.isEquispaced)
    assert(td.min.contains(Left(halfDay * 3)))
    assert(td.gcd.contains(Left(43200.0))) // gcd(odd·43200 ∪ {86400})
  }

  test("backwards-compatible delta (legacy timeseries.py:74-91 shim)") {
    // exactly one distinct spacing → that float
    assert(TimeDelta.fromRawDeltas(Seq(3600.0, 3600.0))
      .backwardsCompatibleDelta.contains(Left(3600.0)))
    // all month-lengths (≤4 distinct) → (1, month)
    assert(TimeDelta.fromRawDeltas(Seq(2678400.0, 2592000.0, 2419200.0))
      .backwardsCompatibleDelta.contains(Right((1, "month"))))
    // all year-lengths → (1, year)
    assert(TimeDelta.fromRawDeltas(Seq(31536000.0, 31622400.0))
      .backwardsCompatibleDelta.contains(Right((1, "year"))))
    // exactly a day → (1, day), the tuple form (legacy behavior), not 86400.0
    assert(TimeDelta.fromRawDeltas(Seq(86400.0))
      .backwardsCompatibleDelta.contains(Right((1, "day"))))
    // mixed non-calendar spacings → None
    assert(TimeDelta.fromRawDeltas(Seq(3600.0, 7200.0))
      .backwardsCompatibleDelta.isEmpty)
    // month-lengths mixed with a plain number → None
    assert(TimeDelta.fromRawDeltas(Seq(2592000.0, 3600.0))
      .backwardsCompatibleDelta.isEmpty)
    // five distinct spacings, even all-calendar-adjacent → None (size gate)
    assert(TimeDelta.fromRawDeltas(
      Seq(2678400.0, 2592000.0, 2419200.0, 2505600.0, 60.0))
      .backwardsCompatibleDelta.isEmpty)
  }
}
