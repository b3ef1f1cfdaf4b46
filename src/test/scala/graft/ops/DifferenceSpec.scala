package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Goldens transcribed from the reference widget test
  * `orangecontrib/timeseries/widgets/tests/test_owdifference.py:69-369`
  * (fixture X = [[4,5,8],[1,-2,0],[3,NaN,2],[7,NaN,1]], columns a,b,c).
  */
class DifferenceSpec extends SparkSpec {

  private val a = Seq(Some(4.0), Some(1.0), Some(3.0), Some(7.0))
  private val b = Seq(Some(5.0), Some(-2.0), None, None)
  private val c = Seq(Some(8.0), Some(0.0), Some(2.0), Some(1.0))

  private def fixture: TimeseriesFrame = {
    val rows = (0 until 4).map { i =>
      Row(i.toLong, a(i).map(Double.box).orNull, b(i).map(Double.box).orNull,
        c(i).map(Double.box).orNull)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("i", LongType), StructField("a", DoubleType),
        StructField("b", DoubleType), StructField("c", DoubleType))))
    TimeseriesFrame(df, None, Seq("i"))
  }

  import Difference._

  private def run(op: Op, shift: Int, invert: Boolean, zero: Boolean)
      : (Seq[Option[Double]], Seq[Option[Double]], Seq[Option[Double]]) = {
    val t = fixture
    val out = Difference(t, Seq((op, "a"), (op, "b"), (op, "c")), shift, invert, zero)
    val n = columnName(op, "a", shift)
    (col1(out, columnName(op, "a", shift)), col1(out, columnName(op, "b", shift)),
      col1(out, columnName(op, "c", shift)))
  }

  test("first difference, shift 1 (:77-84)") {
    val (ra, rb, rc) = run(Delta, 1, invert = false, zero = false)
    assertSeqAlmost(ra, Seq(None, Some(-3), Some(2), Some(4)))
    assertSeqAlmost(rb, Seq(None, Some(-7), None, None))
    assertSeqAlmost(rc, Seq(None, Some(-8), Some(2), Some(-1)))
  }
  test("first difference, assume zero before (:86-93)") {
    val (ra, rb, rc) = run(Delta, 1, invert = false, zero = true)
    assertSeqAlmost(ra, Seq(Some(4), Some(-3), Some(2), Some(4)))
    assertSeqAlmost(rb, Seq(Some(5), Some(-7), None, None))
    assertSeqAlmost(rc, Seq(Some(8), Some(-8), Some(2), Some(-1)))
  }
  test("first difference inverted; assume-zero ignored (:95-112)") {
    for (zero <- Seq(false, true)) {
      val (ra, rb, rc) = run(Delta, 1, invert = true, zero = zero)
      assertSeqAlmost(ra, Seq(Some(3), Some(-2), Some(-4), None))
      assertSeqAlmost(rb, Seq(Some(7), None, None, None))
      assertSeqAlmost(rc, Seq(Some(8), Some(-2), Some(1), None))
    }
  }
  test("first difference shift 2 / shift 3 incl. zero-pad (:114-169)") {
    val (ra2, _, rc2) = run(Delta, 2, invert = false, zero = false)
    assertSeqAlmost(ra2, Seq(None, None, Some(-1), Some(6)))
    assertSeqAlmost(rc2, Seq(None, None, Some(-6), Some(1)))
    val (ra2z, rb2z, rc2z) = run(Delta, 2, invert = false, zero = true)
    assertSeqAlmost(ra2z, Seq(Some(4), Some(1), Some(-1), Some(6)))
    assertSeqAlmost(rb2z, Seq(Some(5), Some(-2), None, None))
    assertSeqAlmost(rc2z, Seq(Some(8), Some(0), Some(-6), Some(1)))
    val (ra3i, _, rc3i) = run(Delta, 3, invert = true, zero = false)
    assertSeqAlmost(ra3i, Seq(Some(-3), None, None, None))
    assertSeqAlmost(rc3i, Seq(Some(7), None, None, None))
  }
  test("second difference (:192-216)") {
    val (ra, rb, rc) = run(Delta2, 1, invert = false, zero = false)
    assertSeqAlmost(ra, Seq(None, None, Some(5), Some(2)))
    assertSeqAlmost(rb, Seq(None, None, None, None))
    assertSeqAlmost(rc, Seq(None, None, Some(10), Some(-3)))
    val (raz, _, rcz) = run(Delta2, 1, invert = false, zero = true)
    assertSeqAlmost(raz, Seq(Some(4), Some(-7), Some(5), Some(2)))
    assertSeqAlmost(rcz, Seq(Some(8), Some(-16), Some(10), Some(-3)))
    for (zero <- Seq(false, true)) {
      val (rai, _, rci) = run(Delta2, 1, invert = true, zero = zero)
      assertSeqAlmost(rai, Seq(Some(5), Some(2), None, None))
      assertSeqAlmost(rci, Seq(Some(10), Some(-3), None, None))
    }
  }
  test("quotient (:238-262); division by zero → null") {
    val (ra, rb, rc) = run(Quotient, 1, invert = false, zero = false)
    assertSeqAlmost(ra, Seq(None, Some(0.25), Some(3.0), Some(7 / 3.0)))
    assertSeqAlmost(rb, Seq(None, Some(-0.4), None, None))
    assertSeqAlmost(rc, Seq(None, Some(0.0), None, Some(0.5)))
    val (rai, rbi, rci) = run(Quotient, 1, invert = true, zero = false)
    assertSeqAlmost(rai, Seq(Some(4.0), Some(1 / 3.0), Some(3 / 7.0), None))
    assertSeqAlmost(rbi, Seq(Some(-2.5), None, None, None))
    assertSeqAlmost(rci, Seq(None, Some(0.0), Some(2.0), None))
  }
  test("percentage change = (quotient - 1) * 100 (owdifference.py:184-187)") {
    val (ra, _, _) = run(PercentChange, 1, invert = false, zero = false)
    assertSeqAlmost(ra, Seq(None, Some(-75.0), Some(200.0), Some((7 / 3.0 - 1) * 100)))
  }
}
