package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("a", 0.5, 100L), ("a", 1.0, 101L), ("a", 2.5, 102L),
    ("b", 1.5, 200L), ("b", 9.0, 201L)).toDF("k", "t", "id")
  private def right = Seq(
    ("a", 1.0, 10.0), ("a", 2.0, 20.0),
    ("b", 1.0, 30.0), ("b", 4.0, 40.0)).toDF("k", "rt", "v")

  private def collectV(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Double]] =
    df.collect().map(r => r.getAs[Long]("id") ->
      (if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getDouble(r.fieldIndex("v"))))).toMap

  test("backward as-of: latest right at or BEFORE, inclusive at equality, per key") {
    val out = AsOfJoin.backward(left, right, "t", "rt", Seq("v"), keys = Seq("k"))
    val got = collectV(out)
    assert(got(100L).isEmpty)            // 0.5: nothing at or before
    assert(got(101L).contains(10.0))     // 1.0: inclusive match
    assert(got(102L).contains(20.0))     // 2.5: latest of {1.0, 2.0}
    assert(got(200L).contains(30.0))     // key b independent
    assert(got(201L).contains(40.0))
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.backward(left, right, "t", "rt", Seq("v"),
      keys = Seq("k"), tolerance = Some(lit(1.0)))
    val got = collectV(out)
    assert(got(102L).contains(20.0))     // 2.5 - 2.0 = 0.5 ≤ 1
    assert(got(201L).isEmpty)            // 9.0 - 4.0 = 5 > 1 → stale
  }

  test("duplicate right timestamps: rightTie picks the last in tie order") {
    val r2 = Seq(("a", 1.0, 1.0, 7.0), ("a", 1.0, 2.0, 8.0))
      .toDF("k", "rt", "seq", "v")
    val out = AsOfJoin.backward(left, r2, "t", "rt", Seq("v"),
      keys = Seq("k"), rightTie = Some("seq"))
    assert(collectV(out)(101L).contains(8.0))
  }

  test("forward direction: earliest right at or after, inclusive") {
    val out = AsOfJoin.join(left, right, "t", "rt", Seq("v"),
      keys = Seq("k"), direction = "forward")
    val got = collectV(out)
    assert(got(100L).contains(10.0))     // 0.5 → 1.0
    assert(got(101L).contains(10.0))     // inclusive at equality
    assert(got(102L).isEmpty)            // 2.5: nothing after
    assert(got(200L).contains(40.0))     // 1.5 → 4.0
    assert(got(201L).isEmpty)
  }

  test("nearest direction: closer side wins, exact ties resolve backward") {
    val out = AsOfJoin.join(left, right, "t", "rt", Seq("v"),
      keys = Seq("k"), direction = "nearest")
    val got = collectV(out)
    assert(got(100L).contains(10.0))     // only forward exists
    assert(got(102L).contains(20.0))     // only backward exists
    assert(got(200L).contains(30.0))     // |1.5-1.0| = |1.5-4.0|? no: 0.5 < 2.5 → backward
    // exact tie: t=1.5 between rt=1.0 and rt=2.0 on key a
    val mid = Seq(("a", 1.5, 300L)).toDF("k", "t", "id")
    val tie = collectV(AsOfJoin.join(mid, right, "t", "rt", Seq("v"),
      keys = Seq("k"), direction = "nearest"))
    assert(tie(300L).contains(10.0))     // backward wins the tie
  }

  test("nearest with tolerance: both sides out of range → null") {
    val far = Seq(("b", 9.0, 400L)).toDF("k", "t", "id")
    val got = collectV(AsOfJoin.join(far, right, "t", "rt", Seq("v"),
      keys = Seq("k"), direction = "nearest", tolerance = Some(lit(1.0))))
    assert(got(400L).isEmpty)            // backward at 4.0 is 5 away; no forward
  }

  test("keyless (single-series) form matches the keyed result on one key") {
    val out = AsOfJoin.backward(
      left.filter(col("k") === "a").drop("k"),
      right.filter(col("k") === "a").drop("k"),
      "t", "rt", Seq("v"))
    val got = collectV(out)
    assert(got(100L).isEmpty && got(101L).contains(10.0) && got(102L).contains(20.0))
  }

  test("randomized differential: all three directions vs brute-force scan") {
    // the union+carry formulation vs a literal O(n·m) reference on random
    // fixtures with duplicate times, equal left/right times, sparse keys
    val rnd = new scala.util.Random(2024)
    for (round <- 1 to 3) {
      val keys = Seq("k1", "k2", "k3")
      val lRows = Seq.tabulate(60)(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(40).toDouble / 2, i.toLong))
      val rRows = Seq.tabulate(25)(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(40).toDouble / 2, i * 1.0))
      val l = lRows.toDF("k", "t", "id")
      val r = rRows.toDF("k", "rt", "v")

      def brute(dir: String): Map[Long, Option[Double]] = lRows.map {
        case (lk, lt, id) =>
          val cand = rRows.filter(_._1 == lk)
          val picked = dir match {
            case "backward" =>
              val c = cand.filter(_._2 <= lt)
              if (c.isEmpty) None
              // max time; among equal times the LARGEST v wins (carry
              // keeps the last in tie order = asc v here)
              else Some(c.maxBy(x => (x._2, x._3))._3)
            case "forward" =>
              val c = cand.filter(_._2 >= lt)
              if (c.isEmpty) None
              else {
                val minT = c.map(_._2).min
                Some(c.filter(_._2 == minT).maxBy(_._3)._3)
              }
            case "nearest" =>
              val b = cand.filter(_._2 <= lt)
              val f = cand.filter(_._2 >= lt)
              val bBest = if (b.isEmpty) None else Some(b.maxBy(x => (x._2, x._3)))
              val fBest = if (f.isEmpty) None
                else { val mt = f.map(_._2).min
                  Some(f.filter(_._2 == mt).maxBy(_._3)) }
              (bBest, fBest) match {
                case (None, None) => None
                case (Some(x), None) => Some(x._3)
                case (None, Some(y)) => Some(y._3)
                case (Some(x), Some(y)) =>
                  if (lt - x._2 <= y._2 - lt) Some(x._3) else Some(y._3)
              }
          }
          id -> picked
      }.toMap

      for (dir <- Seq("backward", "forward", "nearest")) {
        // rightTie pins duplicate-right-time winners (largest v), so the
        // brute's maxBy(v) is the contractual answer, not scan-order luck
        val got = collectV(AsOfJoin.join(l, r, "t", "rt", Seq("v"),
          keys = Seq("k"), rightTie = Some("v"), direction = dir))
        val want = brute(dir)
        assert(got == want,
          s"round $round dir $dir:\n" +
            got.toSeq.sortBy(_._1).zip(want.toSeq.sortBy(_._1))
              .filter(p => p._1 != p._2).take(5).mkString("\n"))
      }
    }
  }
}
