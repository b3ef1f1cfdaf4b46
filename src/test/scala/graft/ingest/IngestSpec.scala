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

  test("TimeSlice playback windows advance and clamp (owtimeslice.py:343-378)") {
    val wins = TimeSlice.playback(0.0, 100.0, widthSec = 30.0, stepSec = 30.0).toSeq
    assert(wins == Seq((0.0, 30.0), (30.0, 60.0), (60.0, 90.0), (90.0, 100.0)))
    val overlapping = TimeSlice.playback(0.0, 50.0, 20.0, 10.0).toSeq
    assert(overlapping.head == (0.0, 20.0) && overlapping.size == 5)
  }
}
