package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    ("a", 0.5, 1L), ("a", 2.0, 2L), ("a", 9.9, 3L), ("a", 10.0, 4L),
    ("b", 2.0, 5L)).toDF("k", "t", "pid")
  private def intervals = Seq(
    ("a", 0.0, 10.0, "long"),   // spans many bins
    ("a", 1.5, 2.5, "short"),   // overlaps the long one
    ("b", 3.0, 4.0, "elsewhere")).toDF("k", "s", "e", "name")

  private def run(binWidth: Double) =
    RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      keys = Seq("k"), binWidth = binWidth)
      .select(col("pid"), col("name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSet

  test("containment, overlap multiplicity, half-open end, per key") {
    val got = run(1.0)
    assert(got == Set(
      1L -> "long",             // 0.5 in [0,10)
      2L -> "long", 2L -> "short", // 2.0 in both overlapping intervals
      3L -> "long"              // 9.9 in; 10.0 NOT (half-open); b: 2.0 ∉ [3,4)
    ), got.toString)
  }

  test("bin width does not change results (only the plan)") {
    assert(run(0.7) == run(1.0) && run(1.0) == run(25.0))
  }

  test("randomized differential vs brute nested-loop, bin-boundary heavy") {
    val rnd = new scala.util.Random(99)
    for (round <- 1 to 3) {
      // half-integer endpoints land EXACTLY on bin boundaries at width 0.5/1
      val ps = Seq.tabulate(80)(i =>
        ("k" + rnd.nextInt(2), rnd.nextInt(40).toDouble / 2, i.toLong))
      val ivs = Seq.tabulate(25) { i =>
        val s = rnd.nextInt(40).toDouble / 2
        ("k" + rnd.nextInt(2), s, s + rnd.nextInt(8).toDouble / 2, s"iv$i")
      }
      val want = (for {
        (pk, pt, pid) <- ps
        (ik, is, ie, name) <- ivs
        if pk == ik && pt >= is && pt < ie
      } yield pid -> name).toSet
      for (w <- Seq(0.5, 1.0, 3.0)) {
        val got = RangeJoin.pointInInterval(
            ps.toDF("k", "t", "pid"), ivs.toDF("k", "s", "e", "name"),
            "t", "s", "e", keys = Seq("k"), binWidth = w)
          .select(col("pid"), col("name")).collect()
          .map(r => r.getLong(0) -> r.getString(1)).toSet
        assert(got == want, s"round $round width $w: " +
          s"missing=${(want -- got).take(4)} extra=${(got -- want).take(4)}")
      }
    }
  }

  test("degenerate intervals (end <= start) match nothing") {
    val bad = Seq(("a", 5.0, 5.0, "empty"), ("a", 7.0, 6.0, "inverted"))
      .toDF("k", "s", "e", "name")
    assert(RangeJoin.pointInInterval(points, bad, "t", "s", "e",
      keys = Seq("k"), binWidth = 1.0).count() == 0)
  }
}
