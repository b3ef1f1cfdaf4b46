package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame

/** Property gates for the reduced-HCT Clough–Tocher element (no scipy in
  * the sandbox, so the element's DEFINING properties are tested instead
  * of value-matching): vertex interpolation, exactness on quadratics
  * (with exact AND estimated gradients), C¹ continuity across both macro
  * and internal split edges, and the documented degree restriction
  * (cubics are NOT reproduced — the 'reduced' in reduced HCT, shared
  * with scipy's element). */
class CloughTocherSpec extends SparkSpec {

  private def lcgPts(seed: Long, n: Int, range: Int): Array[(Int, Int)] = {
    var s = seed
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % range).toInt }
    Iterator.continually((next(), next())).distinct.take(n).toArray
  }

  private def quad(x: Double, y: Double): Double =
    2 * x * x + x * y - 3 * y * y + 4 * x - y + 7
  private def quadGrad(x: Double, y: Double): (Double, Double) =
    (4 * x + y + 4, x - 6 * y - 1)

  test("interpolates the data points and reproduces quadratics (exact gradients)") {
    val pts = lcgPts(11L, 50, 30)
    val z = pts.map(p => quad(p._1, p._2))
    val g = pts.map(p => quadGrad(p._1, p._2))
    val tris = Delaunay.triangulate(pts)
    // vertices: exact interpolation
    pts.indices.foreach { i =>
      val v = CloughTocher.interpolate(pts, z, g, tris, pts(i))
      assert(v.isDefined && math.abs(v.get - z(i)) < 1e-9, s"vertex $i: $v")
    }
    // in-hull grid probes: quadratic reproduced
    var inside = 0
    for (x <- 0 until 30; y <- 0 until 30) {
      CloughTocher.interpolate(pts, z, g, tris, (x, y)).foreach { v =>
        inside += 1
        assert(math.abs(v - quad(x, y)) < 1e-8, s"($x,$y): $v vs ${quad(x, y)}")
      }
    }
    assert(inside > 200, s"only $inside in-hull probes")
  }

  test("estimated gradients are exact on quadratic data (LS quadratic fit)") {
    val pts = lcgPts(23L, 60, 25)
    val z = pts.map(p => quad(p._1, p._2))
    val tris = Delaunay.triangulate(pts)
    val g = CloughTocher.estimateGradients(pts, z, tris)
    pts.indices.foreach { i =>
      val (wx, wy) = quadGrad(pts(i)._1, pts(i)._2)
      assert(math.abs(g(i)._1 - wx) < 1e-6 && math.abs(g(i)._2 - wy) < 1e-6,
        s"vertex $i: ${g(i)} vs ($wx,$wy)")
    }
    // therefore the full pipeline (values only in, like the operator runs
    // it) also reproduces the quadratic
    val eval = CloughTocher.evaluator(pts, z, tris)
    for (x <- 2 until 23; y <- 2 until 23) {
      eval((x, y)).foreach { v =>
        assert(math.abs(v - quad(x, y)) < 1e-7, s"($x,$y): $v") }
    }
  }

  test("C1 across macro edges and internal split edges (±eps gradient probe)") {
    val pts = lcgPts(5L, 40, 30)
    // genuinely curved, non-quadratic data exercises every control point
    val z = pts.map(p => 0.02 * p._1 * p._1 * p._1 - 0.05 * p._2 * p._2 * p._1 +
      2.0 * p._1 - 0.7 * p._2 + 3.0)
    val tris = Delaunay.triangulate(pts)
    val g = CloughTocher.estimateGradients(pts, z, tris)
    def gradAt(x: Double, y: Double): Option[(Double, Double, Double)] =
      CloughTocher.interpolateWithGradient(pts, z, g, tris, (x, y))
    val eps = 1e-6
    def check(mx: Double, my: Double, nx: Double, ny: Double, what: String): Unit = {
      (gradAt(mx + eps * nx, my + eps * ny), gradAt(mx - eps * nx, my - eps * ny)) match {
        case (Some((v1, gx1, gy1)), Some((v2, gx2, gy2))) =>
          val scale = 1.0 + math.max(math.abs(gx1), math.abs(gy1))
          assert(math.abs(v1 - v2) < 1e-4 * scale, s"$what value jump: $v1 vs $v2")
          assert(math.abs(gx1 - gx2) < 1e-3 * scale &&
            math.abs(gy1 - gy2) < 1e-3 * scale,
            s"$what gradient jump: ($gx1,$gy1) vs ($gx2,$gy2)")
        case _ => // probe fell outside the hull (boundary edge) — skip
      }
    }
    // macro edges shared by two triangles: probe across the midpoint
    val byEdge = scala.collection.mutable.Map[(Int, Int), List[Int]]()
    tris.zipWithIndex.foreach { case ((a, b, c), t) =>
      Seq((a, b), (b, c), (c, a)).foreach { case (u, v) =>
        val k = if (u < v) (u, v) else (v, u)
        byEdge(k) = t :: byEdge.getOrElse(k, Nil)
      }
    }
    val shared = byEdge.filter(_._2.size == 2).keys.toSeq
    assert(shared.size > 20)
    shared.foreach { case (u, v) =>
      val (ux, uy) = (pts(u)._1.toDouble, pts(u)._2.toDouble)
      val (vx, vy) = (pts(v)._1.toDouble, pts(v)._2.toDouble)
      for (t <- Seq(0.33, 0.5, 0.71)) {
        val (mx, my) = (ux + t * (vx - ux), uy + t * (vy - uy))
        val len = math.hypot(vx - ux, vy - uy)
        check(mx, my, -(vy - uy) / len, (vx - ux) / len, s"macro edge ($u,$v)@$t")
      }
    }
    // internal split edges: vertex → barycenter of each macro triangle
    tris.take(30).foreach { case (a, b, c) =>
      val bx = (pts(a)._1 + pts(b)._1 + pts(c)._1) / 3.0
      val by = (pts(a)._2 + pts(b)._2 + pts(c)._2) / 3.0
      Seq(a, b, c).foreach { vtx =>
        val (px, py) = (pts(vtx)._1.toDouble, pts(vtx)._2.toDouble)
        for (t <- Seq(0.4, 0.8)) {
          val (mx, my) = (px + t * (bx - px), py + t * (by - py))
          val len = math.hypot(bx - px, by - py)
          check(mx, my, -(by - py) / len, (bx - px) / len,
            s"split edge $vtx->center of ($a,$b,$c)@$t")
        }
      }
    }
  }

  test("cubics are NOT reproduced (degree restriction of the reduced element)") {
    val pts = lcgPts(31L, 40, 20)
    def cubic(x: Double, y: Double): Double = x * x * x
    val z = pts.map(p => cubic(p._1, p._2))
    val g = pts.map(p => (3.0 * p._1 * p._1, 0.0)) // exact gradients
    val tris = Delaunay.triangulate(pts)
    var maxErr = 0.0
    for (x <- 0 until 20; y <- 0 until 20) {
      CloughTocher.interpolate(pts, z, g, tris, (x, y)).foreach { v =>
        maxErr = math.max(maxErr, math.abs(v - cubic(x, y))) }
    }
    assert(maxErr > 1e-3,
      s"reduced HCT unexpectedly reproduced a cubic (maxErr $maxErr)")
  }

  test("multivariateCubic: planar holes recovered; 'cubic' interp routing fills all") {
    import spark.implicits._
    val n = 12; val k = 4
    val holes = Set((3, 1), (5, 2), (7, 1), (8, 2), (4, 2))
    val rows = (0 until n).map { i =>
      val v = (0 until k).map { j =>
        if (holes((i, j))) Double.NaN else 2.0 * i - 3.0 * j + 7.0 }
      (i.toLong, v(0), v(1), v(2), v(3))
    }
    val df = rows.toDF("t", "c0", "c1", "c2", "c3")
    val out = Interpolate.multivariateCubic(
        TimeseriesFrame(df, Some("t")), Seq("c0", "c1", "c2", "c3"))
      .orderBy("t").collect()
    holes.foreach { case (i, j) =>
      val got = out(i).getDouble(1 + j)
      assert(math.abs(got - (2.0 * i - 3.0 * j + 7.0)) < 1e-8, s"($i,$j): $got")
    }
    // full routing: multivariate cubic pre-pass + univariate cubic pass
    // every column keeps >= 4 known values — the univariate cubic pass
    // needs 4 knots (not-a-knot), below that it documents "untouched"
    val df2 = Seq(
      (0L, Double.NaN, 3.0, 5.0, 2.0),
      (1L, 10.0, 4.0, Double.NaN, 3.0),
      (2L, 12.0, 5.0, 7.0, 4.0),
      (3L, 14.0, 6.0, 8.0, 5.0),
      (4L, 16.0, 7.0, 9.0, 6.0)
    ).toDF("t", "c0", "c1", "c2", "c3")
    val filled = TimeseriesFrame(df2, Some("t"))
      .withInterpolation("cubic", multivariate = true)
      .interp(Seq("c0", "c1", "c2", "c3")).orderBy("t").collect()
    filled.foreach { r => (1 to 4).foreach { j =>
      assert(!r.isNullAt(j) && !r.getDouble(j).isNaN, s"row $r col $j") } }
  }
}
