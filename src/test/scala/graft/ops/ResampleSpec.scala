package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ResampleSpec extends SparkSpec {

  // two series: "a" has a 3-bucket gap mid-range, "b" is dense
  private def fixture = {
    import spark.implicits._
    val base = 1704067200L // 2024-01-01 00:00 UTC
    val rows =
      Seq(("a", 0L, 100L), ("a", 30L, 300L),          // bucket 0: mean 2.00
        ("a", 70L, 1000L),                            // bucket 1: mean 10.00
        ("a", 310L, 600L),                            // bucket 5: mean 6.00
        ("b", 5L, 200L), ("b", 65L, 400L), ("b", 125L, 600L))
        .map { case (k, off, cents) =>
          (k, new Timestamp((base + off) * 1000L), cents)
        }
    rows.toDF("k", "ts", "cents")
  }

  test("meanGrid: complete grid, exact measured means, linear gap fill") {
    val tsf = TimeseriesFrame(fixture, Some("ts"), Nil, Seq("k"))
    val out = Resample.meanGrid(tsf, "cents", everySeconds = 60)
      .select("k", "bucket_s", "value_mean", "n_events")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val b0 = 1704067200L
    // series a: buckets 0..5 all present (grid completeness)
    assert((0 to 5).forall(i => out.contains(("a", b0 + 60L * i))))
    assert(out(("a", b0)) == ((2.0, 2L)))
    assert(out(("a", b0 + 60)) == ((10.0, 1L)))
    assert(out(("a", b0 + 300)) == ((6.0, 1L)))
    // gap buckets 2..4: linear ramp 10 → 6 over 4 steps, flagged n=0
    assert(out(("a", b0 + 120)) == ((9.0, 0L)))
    assert(out(("a", b0 + 180)) == ((8.0, 0L)))
    assert(out(("a", b0 + 240)) == ((7.0, 0L)))
    // series b independent, dense, no fills
    assert((0 to 2).forall(i => out(("b", b0 + 60L * i))._2 == 1L))
    assert(out.keys.count(_._1 == "b") == 3)
  }

  test("meanGrid: empty input yields empty output, not an NPE in the guard") {
    val tsf = TimeseriesFrame(fixture.filter(col("k") === "nope"),
      Some("ts"), Nil, Seq("k"))
    val out = Resample.meanGrid(tsf, "cents", everySeconds = 60)
    assert(out.count() == 0)
    assert(out.columns.contains("value_mean") && out.columns.contains("n_events"))
  }
}
