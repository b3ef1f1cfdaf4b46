package graft.ops

/** Delaunay triangulation over INTEGER points (Bowyer–Watson) with exact
  * arithmetic predicates — BigInt during triangulation (the super
  * vertices are astronomically far, see [[triangulate]]), Long for the
  * all-finite interpolation-time orientation tests — so
  * the heavily cocircular point sets this library feeds it (matrix cells
  * are an integer grid with holes, every unit square's corners are
  * cocircular) can never drive the incremental insertion into an
  * inconsistent state the way floating predicates famously do. Public
  * algorithm (Bowyer 1981 / Watson 1981); cocircular ties resolve to
  * "not inside" (strict incircle), which yields one of the valid
  * triangulations — barycentric interpolation is identical along either
  * diagonal of a cocircular quad, so the choice cannot change
  * interpolated values beyond tie positions ON the circle.
  *
  * Driver-side by design: the caller ([[Interpolate.multivariateLinear]])
  * is the documented whole-matrix pre-pass, same size bound as the
  * nearest-neighbor variant. O(n²) worst case; measured ~0.2s at 500
  * known cells, ~5s at 5k (the reference's GUI-table regime is ≤ a few
  * thousand rows — `functions.py:300-318` runs scipy griddata on the
  * same whole matrix).
  */
object Delaunay {

  /** CCW > 0, CW < 0, collinear = 0. Long-exact for |coords| ≤ 2³⁰. */
  def orient(ax: Long, ay: Long, bx: Long, by: Long, cx: Long, cy: Long): Long =
    (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** Exact incircle: for CCW triangle (a,b,c), > 0 iff p strictly inside
    * the circumcircle. BigInt — the 4×4 determinant reaches coord⁴. */
  def inCircle(ax: Long, ay: Long, bx: Long, by: Long, cx: Long, cy: Long,
      px: Long, py: Long): BigInt = {
    val (adx, ady) = (BigInt(ax - px), BigInt(ay - py))
    val (bdx, bdy) = (BigInt(bx - px), BigInt(by - py))
    val (cdx, cdy) = (BigInt(cx - px), BigInt(cy - py))
    val alift = adx * adx + ady * ady
    val blift = bdx * bdx + bdy * bdy
    val clift = cdx * cdx + cdy * cdy
    alift * (bdx * cdy - bdy * cdx) -
      blift * (adx * cdy - ady * cdx) +
      clift * (adx * bdy - ady * bdx)
  }

  /** Triangles as CCW index triples into `pts`; empty when fewer than 3
    * points or all collinear.
    *
    * The super-triangle is placed at distance 2¹²⁸ from the data — far
    * enough to be PROVABLY outside every circumcircle of every real
    * triple: integer points make the minimum non-collinear triangle area
    * 1/2, so the circumradius R = abc/(4·area) of any real triple with
    * |coords| ≤ 2³¹ is at most (2³³)³/2 < 2⁹⁸, while the super vertices
    * sit at ~2¹²⁸. A fixed small multiple of the data span (the naive
    * construction) has no such guarantee — near-collinear triples have
    * circumradii that exceed any span multiple, a super vertex lands
    * inside them, and Bowyer–Watson silently loses hull-adjacent
    * triangles. Predicates run in BigInt throughout triangulation (exact
    * at any magnitude); [[interpolate]] keeps the Long fast path since
    * real points stay 32-bit. */
  def triangulate(pts: Array[(Int, Int)]): Array[(Int, Int, Int)] = {
    val n = pts.length
    if (n < 3) return Array.empty
    // super-triangle enclosing everything (indices n, n+1, n+2)
    val xs = pts.map(_._1.toLong); val ys = pts.map(_._2.toLong)
    val (minX, maxX) = (xs.min, xs.max)
    val (minY, maxY) = (ys.min, ys.max)
    val far = BigInt(1) << 128 // > any real-triple circumradius (< 2^98)
    val sup = Array(
      (BigInt(minX) - far, BigInt(minY) - far),
      (BigInt(minX) + 3 * far, BigInt(minY) - far),
      (BigInt(minX) - far, BigInt(minY) + 3 * far))
    def px(i: Int): BigInt = if (i < n) BigInt(pts(i)._1) else sup(i - n)._1
    def py(i: Int): BigInt = if (i < n) BigInt(pts(i)._2) else sup(i - n)._2
    def orientB(ax: BigInt, ay: BigInt, bx: BigInt, by: BigInt,
        cx: BigInt, cy: BigInt): BigInt =
      (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    def inCircleB(ax: BigInt, ay: BigInt, bx: BigInt, by: BigInt,
        cx: BigInt, cy: BigInt, px0: BigInt, py0: BigInt): BigInt = {
      val (adx, ady) = (ax - px0, ay - py0)
      val (bdx, bdy) = (bx - px0, by - py0)
      val (cdx, cdy) = (cx - px0, cy - py0)
      (adx * adx + ady * ady) * (bdx * cdy - bdy * cdx) -
        (bdx * bdx + bdy * bdy) * (adx * cdy - ady * cdx) +
        (cdx * cdx + cdy * cdy) * (adx * bdy - ady * bdx)
    }

    def ccw(t: (Int, Int, Int)): (Int, Int, Int) = {
      val (a, b, c) = t
      if (orientB(px(a), py(a), px(b), py(b), px(c), py(c)).signum >= 0) t
      else (a, c, b)
    }
    var tris = scala.collection.mutable.Set[(Int, Int, Int)](
      ccw((n, n + 1, n + 2)))

    for (p <- 0 until n) {
      val bad = tris.filter { case (a, b, c) =>
        inCircleB(px(a), py(a), px(b), py(b), px(c), py(c), px(p), py(p)).signum > 0
      }
      if (bad.nonEmpty) {
        // polygon boundary = edges of the bad region appearing exactly once
        val edgeCount = scala.collection.mutable.Map[(Int, Int), Int]()
        def key(u: Int, v: Int) = if (u < v) (u, v) else (v, u)
        bad.foreach { case (a, b, c) =>
          Seq((a, b), (b, c), (c, a)).foreach { case (u, v) =>
            edgeCount(key(u, v)) = edgeCount.getOrElse(key(u, v), 0) + 1
          }
        }
        bad.foreach(tris -= _)
        edgeCount.filter(_._2 == 1).keys.foreach { case (u, v) =>
          val t = ccw((u, v, p))
          // skip degenerate (collinear) fill triangles
          val (a, b, c) = t
          if (orientB(px(a), py(a), px(b), py(b), px(c), py(c)).signum != 0)
            tris += t
        }
      }
    }
    tris.toArray
      .filter { case (a, b, c) => a < n && b < n && c < n }
      .map(ccw)
  }

  /** Uniform-grid point-location index over a triangulation: each grid
    * cell lists the triangles whose bounding box overlaps it, so a
    * containment query tests only the triangles registered at the query's
    * cell — O(1) expected per query on the near-uniform integer grids the
    * matrix fill produces, vs the O(#triangles) linear scan that made the
    * 'linear'/'cubic' fills O(#NaN-cells × #triangles). Exactness is
    * untouched: the grid only PRUNES candidates (a containing triangle's
    * bbox always covers the query cell), the callers' orientation tests
    * still decide containment. */
  final class TriLocator(pts: Array[(Int, Int)], tris: Array[(Int, Int, Int)]) {
    private val nT = tris.length
    private val g = math.max(1, math.sqrt(nT.toDouble).toInt)
    private var minX = Long.MaxValue; private var maxX = Long.MinValue
    private var minY = Long.MaxValue; private var maxY = Long.MinValue
    tris.foreach { case (a, b, c) =>
      Array(a, b, c).foreach { i =>
        val (x, y) = (pts(i)._1.toLong, pts(i)._2.toLong)
        if (x < minX) minX = x; if (x > maxX) maxX = x
        if (y < minY) minY = y; if (y > maxY) maxY = y
      }
    }
    private val spanX = math.max(1L, maxX - minX + 1)
    private val spanY = math.max(1L, maxY - minY + 1)
    private def ix(x: Long): Int =
      math.min(g - 1L, math.max(0L, (x - minX) * g / spanX)).toInt
    private def iy(y: Long): Int =
      math.min(g - 1L, math.max(0L, (y - minY) * g / spanY)).toInt
    private val buckets: Array[Array[Int]] = {
      val tmp = Array.fill(g * g)(new scala.collection.mutable.ArrayBuffer[Int])
      var t = 0
      while (t < nT) {
        val (a, b, c) = tris(t)
        val bx0 = math.min(pts(a)._1, math.min(pts(b)._1, pts(c)._1)).toLong
        val bx1 = math.max(pts(a)._1, math.max(pts(b)._1, pts(c)._1)).toLong
        val by0 = math.min(pts(a)._2, math.min(pts(b)._2, pts(c)._2)).toLong
        val by1 = math.max(pts(a)._2, math.max(pts(b)._2, pts(c)._2)).toLong
        for (cx <- ix(bx0) to ix(bx1); cy <- iy(by0) to iy(by1))
          tmp(cy * g + cx) += t
        t += 1
      }
      tmp.map(_.toArray)
    }
    /** Triangle indices whose bbox cell covers (qx, qy); empty outside
      * the triangulation's bounding box. */
    def candidates(qx: Double, qy: Double): Array[Int] =
      if (nT == 0 || qx < minX || qx > maxX || qy < minY || qy > maxY)
        Array.emptyIntArray
      else buckets(iy(math.floor(qy).toLong) * g + ix(math.floor(qx).toLong))
  }

  /** Containment + barycentric value of triangle `t` at (qx, qy), or
    * None. Exact Long orientation decides containment. */
  private def triValue(pts: Array[(Int, Int)], z: Array[Double],
      tris: Array[(Int, Int, Int)], t: Int, qx: Long, qy: Long): Option[Double] = {
    val (a, b, c) = tris(t)
    val (ax, ay) = (pts(a)._1.toLong, pts(a)._2.toLong)
    val (bx, by) = (pts(b)._1.toLong, pts(b)._2.toLong)
    val (cx, cy) = (pts(c)._1.toLong, pts(c)._2.toLong)
    val oa = orient(bx, by, cx, cy, qx, qy)
    val ob = orient(cx, cy, ax, ay, qx, qy)
    val oc = orient(ax, ay, bx, by, qx, qy)
    if (oa >= 0 && ob >= 0 && oc >= 0) {
      val area = orient(ax, ay, bx, by, cx, cy) // = oa + ob + oc > 0 (CCW)
      Some((oa.toDouble * z(a) + ob.toDouble * z(b) +
        oc.toDouble * z(c)) / area.toDouble)
    } else None
  }

  /** Barycentric-interpolate `query` against triangulated `pts` with
    * per-point values `z`: Some(value) when the query lies inside or on
    * the hull of some triangle, None outside (scipy griddata 'linear'
    * leaves those NaN). Linear scan — fine for one-off queries; many-query
    * fills should use [[interpolator]] (grid-indexed). */
  def interpolate(pts: Array[(Int, Int)], z: Array[Double],
      tris: Array[(Int, Int, Int)], query: (Int, Int)): Option[Double] = {
    val (qx, qy) = (query._1.toLong, query._2.toLong)
    var t = 0
    while (t < tris.length) {
      val v = triValue(pts, z, tris, t, qx, qy)
      if (v.isDefined) return v
      t += 1
    }
    None
  }

  /** Indexed form of [[interpolate]] for many-query fills: builds a
    * [[TriLocator]] once, then each query tests only its grid cell's
    * candidate triangles. Same results as [[interpolate]]. */
  def interpolator(pts: Array[(Int, Int)], z: Array[Double],
      tris: Array[(Int, Int, Int)]): ((Int, Int)) => Option[Double] = {
    val loc = new TriLocator(pts, tris)
    q => {
      val (qx, qy) = (q._1.toLong, q._2.toLong)
      val cand = loc.candidates(q._1.toDouble, q._2.toDouble)
      var i = 0
      var out: Option[Double] = None
      while (out.isEmpty && i < cand.length) {
        out = triValue(pts, z, tris, cand(i), qx, qy)
        i += 1
      }
      out
    }
  }
}
