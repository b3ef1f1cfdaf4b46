package graft.ingest

import graft.SparkSpec
import graft.ops.TimeSlice

/** Finance/URL connector + TimeSlice playback semantics. */
class IngestSpec extends SparkSpec {

  test("OHLCV reader: Date time var, Close target role (datasources.py:51-84)") {
    val path = getClass.getResource("/ohlcv_sample.csv").getPath
    val tsf = Finance.readOhlcv(spark, path)
    assert(tsf.timeCol.contains("Date"))
    assert(tsf.df.count() == 5)
    assert(OrangeCsv.colsWithRole(tsf.df, "target") == Seq("Close"))
    val closes = tsf.df.orderBy("Date").select("Close").collect().map(_.getDouble(0))
    assert(closes.head == 125.07 && closes.last == 130.15)
  }

  test("Quandl URL format carries collapse/transform params (datasources.py:14-48)") {
    val y = Finance.yahooUrl("AAPL", 1577836800L, 1609459200L)
    assert(y.contains("AAPL") && y.contains("period1=1577836800") &&
      y.contains("period2=1609459200"), y)
    val u = Finance.quandlUrl("WIKI/AAPL", "k3y", "2020-01-01", "2020-12-31",
      collapse = "monthly", transform = "rdiff")
    assert(u.startsWith("https://www.quandl.com/api/v3/datasets/WIKI/AAPL/data.csv?"))
    for (p <- Seq("api_key=k3y", "start_date=2020-01-01", "end_date=2020-12-31",
        "collapse=monthly", "transform=rdiff", "order=asc"))
      assert(u.contains(p), s"missing $p in $u")
    // same reader path as OHLCV (role rewrite verified above)
    val tsf = Finance.readQuandl(spark,
      getClass.getResource("/ohlcv_sample.csv").getPath)
    assert(tsf.timeCol.contains("Date") && tsf.df.count() == 5)
  }

  test("Quandl collapse/transform matrix: period-end dating, last-obs keep, all five transforms") {
    import org.apache.spark.sql.functions._
    import graft.core.TimeseriesFrame
    // hand-checkable fixture: 5 observations across 3 months; 2023-02-05
    // IS a Sunday, so the weekly rule (period end = following Sunday,
    // Sunday maps to itself) gets its boundary case
    val df = spark.createDataFrame(Seq(
      ("2023-01-10", 1.0), ("2023-01-31", 2.0), ("2023-02-05", 3.0),
      ("2023-02-20", 4.0), ("2023-03-01", 5.0)))
      .toDF("d", "v")
      .select(to_timestamp(col("d")).as("Date"), col("v"))
    val tsf = TimeseriesFrame.fromColumn(df, "Date")
    def rows(out: TimeseriesFrame): Seq[(String, Double)] =
      out.df.orderBy("Date")
        .select(date_format(col("Date"), "yyyy-MM-dd"), col("v"))
        .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))
    // monthly: last observation per month, re-dated to month end
    val monthly = Finance.quandlCollapse(tsf, "monthly")
    assert(rows(monthly) == Seq("2023-01-31" -> 2.0, "2023-02-28" -> 4.0,
      "2023-03-31" -> 5.0), rows(monthly).toString)
    // weekly: Jan 31 (Tue) and Feb 5 (Sun) share the week ending Feb 5
    val weekly = Finance.quandlCollapse(tsf, "weekly")
    assert(rows(weekly) == Seq("2023-01-15" -> 1.0, "2023-02-05" -> 3.0,
      "2023-02-26" -> 4.0, "2023-03-05" -> 5.0), rows(weekly).toString)
    // quarterly/annual collapse to the single period the data spans
    assert(rows(Finance.quandlCollapse(tsf, "quarterly")) ==
      Seq("2023-03-31" -> 5.0))
    assert(rows(Finance.quandlCollapse(tsf, "annual")) ==
      Seq("2023-12-31" -> 5.0))
    // daily/none = identity
    assert(rows(Finance.quandlCollapse(tsf, "daily")) == rows(tsf))
    // transforms over the monthly values [2, 4, 5] (applied AFTER
    // collapse, like the service): diff/rdiff drop the first period
    def tvals(kind: String): Seq[Double] =
      rows(Finance.quandlTransform(monthly, kind)).map(_._2)
    assert(tvals("diff") == Seq(2.0, 1.0))
    assert(tvals("rdiff") == Seq(1.0, 0.25))
    assert(tvals("cumul") == Seq(2.0, 6.0, 11.0))
    assert(tvals("normalize") == Seq(100.0, 200.0, 250.0))
    assert(tvals("none") == Seq(2.0, 4.0, 5.0))
    intercept[IllegalArgumentException](Finance.quandlCollapse(tsf, "hourly"))
    intercept[IllegalArgumentException](
      Finance.quandlTransform(monthly, "pct").df.collect())
  }

  test("Quandl matrix: ALL collapse × transform combos ≡ driver-side reference") {
    import org.apache.spark.sql.functions._
    import graft.core.TimeseriesFrame
    import java.time.{DayOfWeek, LocalDate}
    import java.time.temporal.TemporalAdjusters
    // a denser fixture than the pointwise test: 8 observations across 3
    // quarters and a year boundary, incl. two obs in one week and a
    // Sunday (the weekly boundary case)
    val obs = Seq(
      ("2022-11-28", 10.0), ("2022-12-30", 20.0), ("2023-01-10", 1.0),
      ("2023-01-13", 1.5), ("2023-01-31", 2.0), ("2023-02-05", 3.0),
      ("2023-02-20", 4.0), ("2023-04-03", 5.0))
    val df = spark.createDataFrame(obs).toDF("d", "v")
      .select(to_timestamp(col("d")).as("Date"), col("v"))
    val tsf = TimeseriesFrame.fromColumn(df, "Date")
    // independent reference: plain-Scala collapse (group by period end,
    // keep the latest observation) + transform, per the published Quandl
    // API semantics — NOT a call back into the engine
    def periodEnd(kind: String, d: LocalDate): LocalDate = kind match {
      case "none" | "daily" => d
      case "weekly" => d.`with`(TemporalAdjusters.nextOrSame(DayOfWeek.SUNDAY))
      case "monthly" => d.`with`(TemporalAdjusters.lastDayOfMonth())
      case "quarterly" =>
        LocalDate.of(d.getYear, ((d.getMonthValue - 1) / 3) * 3 + 3, 1)
          .`with`(TemporalAdjusters.lastDayOfMonth())
      case "annual" => LocalDate.of(d.getYear, 12, 31)
    }
    def refCollapse(kind: String): Seq[(String, Double)] = obs
      .map { case (d, v) => (LocalDate.parse(d), v) }
      .groupBy { case (d, _) => periodEnd(kind, d) }
      .map { case (pe, grp) => (pe.toString, grp.maxBy(_._1.toEpochDay)._2) }
      .toSeq.sortBy(_._1)
    def refTransform(kind: String, vals: Seq[Double]): Seq[Double] = kind match {
      case "none" => vals
      case "diff" => vals.sliding(2).map(p => p(1) - p(0)).toSeq
      case "rdiff" => vals.sliding(2).map(p => p(1) / p(0) - 1).toSeq
      case "cumul" => vals.scanLeft(0.0)(_ + _).tail
      case "normalize" => vals.map(_ / vals.head * 100)
    }
    def engine(c: String, t: String): Seq[(String, Double)] =
      Finance.quandlTransform(Finance.quandlCollapse(tsf, c), t)
        .df.orderBy("Date")
        .select(date_format(col("Date"), "yyyy-MM-dd"), col("v"))
        .collect().toSeq.map(r => (r.getString(0), r.getDouble(1)))
    val collapses = Seq("none", "daily", "weekly", "monthly", "quarterly",
      "annual")
    val transforms = Seq("none", "diff", "rdiff", "cumul", "normalize")
    for (c <- collapses; t <- transforms) {
      val base = refCollapse(c)
      val dates = if (t == "diff" || t == "rdiff") base.map(_._1).drop(1)
                  else base.map(_._1)
      val expected = dates.zip(refTransform(t, base.map(_._2)))
      assert(engine(c, t) == expected,
        s"combo collapse=$c transform=$t: got ${engine(c, t)}, want $expected")
    }
  }

  test("TimeSlice playback windows advance and clamp (owtimeslice.py:343-378)") {
    val wins = TimeSlice.playback(0.0, 100.0, widthSec = 30.0, stepSec = 30.0).toSeq
    assert(wins == Seq((0.0, 30.0), (30.0, 60.0), (60.0, 90.0), (90.0, 100.0)))
    val overlapping = TimeSlice.playback(0.0, 50.0, 20.0, 10.0).toSeq
    assert(overlapping.head == (0.0, 20.0) && overlapping.size == 5)
  }

  test("TimeSlice edge datasets: day/month/year/numeric/dup/unsorted/constant (test_owtimeslice.py:22-63)") {
    // transcribed widget smoke goldens: each edge-case dataset must parse,
    // classify its step, and still yield a non-empty slice subset
    import graft.core.{TimeDelta, TimeseriesFrame}
    def csv(name: String, header: String, rows: Seq[String]): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"ts_$name")
      val f = dir.resolve(s"$name.csv")
      java.nio.file.Files.write(f,
        (header.split('\n').toSeq ++ rows).mkString("\n").getBytes)
      f.toString
    }
    def sliceAll(tsf: TimeseriesFrame): Long = {
      val mm = tsf.df.agg(
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.col(tsf.timeCol.get).cast("double")),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col(tsf.timeCol.get).cast("double"))).head()
      TimeSlice(tsf, mm.getDouble(0), mm.getDouble(1) + 1.0).count()
    }
    val hdr = "Month,Value\nt,c\n,class"
    // multipleonsamedt.csv — duplicate timestamps (GH-115)
    val dup = OrangeCsv.read(spark, csv("dup", hdr,
      Seq("1949-01,112", "1949-02,118", "1949-03,132", "1949-03,137", "1949-04,129")))
    assert(sliceAll(dup) == 5)
    // numericdt.csv — epoch-second numeric time column (GH-110)
    val num = OrangeCsv.read(spark, csv("num", "Second,Value\nt,c\n,class",
      Seq("1594938042,112", "1594938043,118", "1594938044,132", "1594938045,137")))
    assert(sliceAll(num) == 4)
    assert(TimeDelta.infer(num.df, num.timeCol.get).intervalSeconds.contains(1.0))
    // daydt.csv — day stepping
    val day = OrangeCsv.read(spark, csv("day", "Day,Value\nt,c\n,class",
      Seq("1949-01-01,112", "1949-01-02,118", "1949-01-03,132", "1949-01-04,137")))
    assert(sliceAll(day) == 4)
    assert(TimeDelta.infer(day.df, day.timeCol.get).intervalSeconds.contains(86400.0))
    // airpassengers (month stepping): mixed month lengths → calendar delta
    val mon = OrangeCsv.read(spark,
      getClass.getResource("/airpassengers.csv").getPath)
    assert(sliceAll(mon) > 0)
    assert(TimeDelta.infer(mon.df, mon.timeCol.get).min.contains(Right((1, "month"))))
    // yeardt.csv — year stepping
    val yr = OrangeCsv.read(spark, csv("yr", "Year,Value\nt,c\n,class",
      Seq("1949,112", "1950,118", "1951,132", "1952,137")))
    assert(sliceAll(yr) == 4)
    assert(TimeDelta.infer(yr.df, yr.timeCol.get).min.contains(Right((1, "year"))))
    // unsortedts.csv — out-of-order input slices identically
    val uns = OrangeCsv.read(spark, csv("uns", hdr,
      Seq("1949-01,112", "1949-04,129", "1949-02,118", "1949-05,121", "1949-03,137")))
    assert(sliceAll(uns) == 5)
    // notddt.csv — ALL timestamps equal: no timedelta, slicing still works
    val flat = OrangeCsv.read(spark, csv("flat", hdr,
      Seq("1949-01,112", "1949-01,118", "1949-01,132", "1949-01,129", "1949-01,121")))
    assert(sliceAll(flat) == 5)
    assert(TimeDelta.infer(flat.df, flat.timeCol.get).deltas.isEmpty)
  }

  test("OrangeCsv write → read round-trips values, roles, and time column") {
    val src = OrangeCsv.read(spark,
      getClass.getResource("/airpassengers.csv").getPath)
    val dir = java.nio.file.Files.createTempDirectory("orange_rt").toString
    OrangeCsv.write(src, dir)
    val back = OrangeCsv.read(spark, dir)
    assert(back.timeCol == src.timeCol)
    val tgt = "Air passengers"
    assert(OrangeCsv.colsWithRole(back.df, "target") ==
      OrangeCsv.colsWithRole(src.df, "target"))
    val a = src.df.orderBy(src.orderCols: _*).select(tgt)
      .collect().map(_.getDouble(0)).toSeq
    val b = back.df.orderBy(back.orderCols: _*).select(tgt)
      .collect().map(_.getDouble(0)).toSeq
    assert(a == b, s"${a.take(5)} vs ${b.take(5)}")
    // times survive (month-precision ISO in, full timestamps out)
    val ta = src.df.orderBy(src.orderCols: _*).select(src.timeCol.get)
      .collect().map(_.getTimestamp(0)).toSeq
    val tb = back.df.orderBy(back.orderCols: _*).select(back.timeCol.get)
      .collect().map(_.getTimestamp(0)).toSeq
    assert(ta == tb)
  }
}
