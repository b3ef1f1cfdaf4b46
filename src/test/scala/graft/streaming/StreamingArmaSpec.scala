package graft.streaming

import graft.SparkSpec
import graft.models.Arima
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Incremental per-key fixed-ARMA forecasting: folding the Kalman state
  * across micro-batches must reproduce a from-scratch batch fitFixed on
  * the accumulated prefix — per key, after EVERY batch. */
class StreamingArmaSpec extends SparkSpec {

  private val base = 1704067200000L
  private def value(key: Long, i: Int): Double =
    50.0 + key * 3 + math.sin(i * 0.7 + key) * 4 + (i % 5) * 0.3

  test("streamingArmaForecastFixed == batch fitFixed on each prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (phi, theta, mu) = (Array(0.6), Array(0.3), 50.0)
    val steps = 3
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val out = StreamingOps.streamingArmaForecastFixed(
      mem.toDF().toDF("key", "ts", "value"),
      "key", "ts", "value", phi, theta, mu, steps)
    val query = out.writeStream.format("memory")
      .queryName("arma_stream").outputMode("update").start()

    def batchOf(range: Range): Seq[(Long, Timestamp, Double)] =
      for (key <- 0L to 1L; i <- range)
        yield (key, new Timestamp(base + i * 60000L), value(key, i))

    // batch 1: rows 0..39; batch 2: rows 40..69 — state must carry over
    val prefixes = Seq(0 until 40, 40 until 70)
    var seen = 0
    for (pref <- prefixes) {
      mem.addData(batchOf(pref): _*)
      query.processAllAvailable()
      val upTo = pref.end
      val got = spark.sql(
        s"select * from arma_stream where n = $upTo").collect()
        .map(r => (r.getLong(0), r.getInt(2)) ->
          (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(got.size == 2 * steps, s"rows at n=$upTo: ${got.size}")
      seen += got.size
      for (key <- 0L to 1L) {
        val series = (0 until upTo).map(i => value(key, i)).toArray
        val (fo, lo, hi) = new Arima(1, 0, 1)
          .fitFixed(series, phi, theta, mu).predict(steps)
        (0 until steps).foreach { h =>
          val (gf, gl, gh) = got((key, h + 1))
          assert(math.abs(gf - fo(h)) < 1e-9,
            s"key $key n=$upTo step ${h + 1}: $gf vs ${fo(h)}")
          assert(math.abs(gl - lo(h)) < 1e-9, s"key $key ci_low step ${h + 1}")
          assert(math.abs(gh - hi(h)) < 1e-9, s"key $key ci_high step ${h + 1}")
        }
      }
    }
    query.stop()
    assert(seen == prefixes.size * 2 * steps)
  }

  test("property: any micro-batch split yields the same final forecasts") {
    // seeded-random batch boundaries: the state fold must make the final
    // emissions invariant to HOW the prefix was chopped into batches
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(77)
    val n = 60
    val (phi, theta, mu) = (Array(0.5), Array(-0.2), 51.0)
    val series = (0 until n).map(i => value(3, i)).toArray
    val (fo, lo, hi) = new Arima(1, 0, 1)
      .fitFixed(series, phi, theta, mu).predict(2)
    for (trial <- 0 until 3) {
      val cuts = (Seq(0, n) ++ Seq.fill(3)(1 + rnd.nextInt(n - 1)))
        .distinct.sorted
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val out = StreamingOps.streamingArmaForecastFixed(
        mem.toDF().toDF("key", "ts", "value"),
        "key", "ts", "value", phi, theta, mu, steps = 2)
      val name = s"arma_split_$trial"
      val query = out.writeStream.format("memory")
        .queryName(name).outputMode("update").start()
      cuts.sliding(2).foreach { case Seq(a, b) =>
        mem.addData((a until b).map(i =>
          (3L, new Timestamp(base + i * 60000L), value(3, i))): _*)
        query.processAllAvailable()
      }
      val got = spark.sql(s"select * from $name where n = $n order by step")
        .collect()
      query.stop()
      assert(got.length == 2, s"trial $trial (cuts $cuts)")
      (0 until 2).foreach { h =>
        assert(math.abs(got(h).getDouble(3) - fo(h)) < 1e-9,
          s"trial $trial step ${h + 1} forecast")
        assert(math.abs(got(h).getDouble(4) - lo(h)) < 1e-9)
        assert(math.abs(got(h).getDouble(5) - hi(h)) < 1e-9)
      }
    }
  }

  test("pure AR and pure MA edges match batch on one prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    for ((phi, theta) <- Seq(
        (Array(0.7, -0.2), Array.empty[Double]),
        (Array.empty[Double], Array(0.4)))) {
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val out = StreamingOps.streamingArmaForecastFixed(
        mem.toDF().toDF("key", "ts", "value"),
        "key", "ts", "value", phi, theta, mu = 48.0, steps = 2)
      val name = s"arma_edge_${phi.length}_${theta.length}"
      val query = out.writeStream.format("memory")
        .queryName(name).outputMode("update").start()
      mem.addData((0 until 30).map(i =>
        (7L, new Timestamp(base + i * 60000L), value(7, i))): _*)
      query.processAllAvailable()
      val got = spark.sql(s"select * from $name order by step").collect()
      query.stop()
      val series = (0 until 30).map(i => value(7, i)).toArray
      val (fo, _, hi) = new Arima(phi.length, 0, theta.length)
        .fitFixed(series, phi, theta, 48.0).predict(2)
      assert(got.length == 2)
      (0 until 2).foreach { h =>
        assert(math.abs(got(h).getDouble(3) - fo(h)) < 1e-9,
          s"p=${phi.length} q=${theta.length} step ${h + 1}")
        assert(math.abs(got(h).getDouble(5) - hi(h)) < 1e-9)
      }
    }
  }
}
