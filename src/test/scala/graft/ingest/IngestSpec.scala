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

  test("TimeSlice playback windows advance and clamp (owtimeslice.py:343-378)") {
    val wins = TimeSlice.playback(0.0, 100.0, widthSec = 30.0, stepSec = 30.0).toSeq
    assert(wins == Seq((0.0, 30.0), (30.0, 60.0), (60.0, 90.0), (90.0, 100.0)))
    val overlapping = TimeSlice.playback(0.0, 50.0, 20.0, 10.0).toSeq
    assert(overlapping.head == (0.0, 20.0) && overlapping.size == 5)
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
