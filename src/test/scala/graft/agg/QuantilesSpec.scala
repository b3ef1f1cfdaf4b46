package graft.agg

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {

  test("exact: type-7 linear interpolation against hand-computed goldens") {
    import spark.implicits._
    // sorted values 10,20,30,40: p50 = 25 (midpoint), p25 = 17.5,
    // p90 = 10 + 0.9*3 steps = 37, p0/p100 = extremes
    val df = Seq(40L, 10L, 30L, 20L).map(("g", _)).toDF("g", "v")
    val r = Quantiles.exact(df, Seq("g"), "v", Seq(0.0, 0.25, 0.5, 0.9, 1.0))
      .head()
    assert(r.getDouble(1) == 10.0)
    assert(r.getDouble(2) == 17.5)
    assert(r.getDouble(3) == 25.0)
    assert(math.abs(r.getDouble(4) - 37.0) < 1e-12)
    assert(r.getDouble(5) == 40.0)
  }

  test("column labels round rather than truncate binary-float p*100") {
    import spark.implicits._
    val df = Seq(("g", 1L), ("g", 2L)).toDF("g", "v")
    // 0.29*100 and 0.57*100 are 28.999…/56.999… in binary doubles —
    // truncation would label them p28/p56 (and a ps like (0.28, 0.29)
    // would then alias-collide). Third-decimal ps keep the digit suffix.
    val names = Quantiles.exact(df, Seq("g"), "v",
      Seq(0.29, 0.57, 0.125, 0.05, 1.0)).columns.toSeq
    assert(names == Seq("g", "p29", "p57", "p125", "p5", "p100"), names)
  }

  test("approx: rank error within sketch accuracy of exact, per group") {
    import spark.implicits._
    val df = (0 until 3).flatMap { g =>
      (1 to 2000).map(i => (s"g$g", ((i * 2654435761L + g) % 10000).toDouble))
    }.toDF("g", "v")
    val ps = Seq(0.1, 0.5, 0.95)
    def collectMap(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => x.getString(0) ->
        (1 until 4).map(x.getDouble).toVector).toMap
    val ex = collectMap(Quantiles.exact(df, Seq("g"), "v", ps))
    val ap = collectMap(Quantiles.approx(df, Seq("g"), "v", ps, accuracy = 1000))
    // rank error <= 1/accuracy → with n=2000, value at a rank within ±2
    // of the target; bound via the exact quantiles two ranks out
    val sortedByG = df.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (g <- ex.keys; (p, i) <- ps.zipWithIndex) {
      val vals = sortedByG(g)
      val target = (p * (vals.length - 1)).toInt
      val lo = vals(math.max(0, target - 4))
      val hi = vals(math.min(vals.length - 1, target + 4))
      assert(ap(g)(i) >= lo && ap(g)(i) <= hi,
        s"$g p$p approx ${ap(g)(i)} outside [$lo, $hi] (exact ${ex(g)(i)})")
    }
  }
}
