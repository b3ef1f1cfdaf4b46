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
    * The super-triangle is placed at distance 8·span³+8 from the data —
    * far enough to be PROVABLY outside every circumcircle of every real
    * triple: integer points make the minimum non-collinear triangle area
    * 1/2, so the circumradius R = abc/(4·area) of any real triple is at
    * most (2·span)³/2 = 4·span³. A fixed SMALL multiple of the span (the
    * naive construction) has no such guarantee — near-collinear triples
    * have circumradii that exceed any span multiple, a super vertex lands
    * inside them, and Bowyer–Watson silently loses hull-adjacent
    * triangles. Deriving `far` from the data (instead of a universal
    * 2¹²⁸) keeps the super-vertex dets a few machine words.
    *
    * Predicate arithmetic is exact THROUGHOUT and tiered by magnitude:
    * all-real incircle tests run in plain Long when the coordinate span
    * is < 2¹⁴ (p-relative differences ≤ 2¹⁴ make each det term ≤ 2⁵⁸ and
    * the 3-term sum ≤ 2⁶⁰ — no overflow) and in exact int128
    * (`Math.multiplyHigh` + carry) up to span 2³⁰; super-vertex tests run
    * in int128 while 4·far stays under 2³⁰ (span ≤ 322) and in BigInt
    * beyond. The tiering matters: the integer grids here are PERVASIVELY
    * cocircular, so the dets are frequently exactly 0 and no floating
    * filter can shortcut them. Together with the flat allocation-free
    * triangle store below (the tuple-set form spent its time boxing),
    * the 1500-series q107/q108 gate measured 22 ms/series on the
    * all-BigInt form and ~0.3 ms on this one. [[interpolate]] keeps its
    * Long fast path since real points stay 32-bit. */
  def triangulate(pts: Array[(Int, Int)]): Array[(Int, Int, Int)] = {
    val n = pts.length
    if (n < 3) return Array.empty
    // super-triangle enclosing everything (indices n, n+1, n+2)
    var minX = Int.MaxValue; var maxX = Int.MinValue
    var minY = Int.MaxValue; var maxY = Int.MinValue
    pts.foreach { case (x, y) =>
      if (x < minX) minX = x; if (x > maxX) maxX = x
      if (y < minY) minY = y; if (y > maxY) maxY = y
    }
    val span = math.max(math.max(maxX.toLong - minX, maxY.toLong - minY), 1L)
    val farB = BigInt(span).pow(3) * 8 + 8 // > any real-triple circumradius
    val supB = Array(
      (BigInt(minX) - farB, BigInt(minY) - farB),
      (BigInt(minX) + 3 * farB, BigInt(minY) - farB),
      (BigInt(minX) - farB, BigInt(minY) + 3 * farB))
    def px(i: Int): BigInt = if (i < n) BigInt(pts(i)._1) else supB(i - n)._1
    def py(i: Int): BigInt = if (i < n) BigInt(pts(i)._2) else supB(i - n)._2
    // Long mirrors of the super coords, valid whenever far fits (span < 2^14)
    val farFitsLong = span < (1L << 14)
    val farL = if (farFitsLong) 8 * span * span * span + 8 else 0L
    val supX = Array(minX - farL, minX + 3 * farL, minX - farL)
    val supY = Array(minY - farL, minY - farL, minY + 3 * farL)
    @inline def lx(i: Int): Long = if (i < n) pts(i)._1.toLong else supX(i - n)
    @inline def ly(i: Int): Long = if (i < n) pts(i)._2.toLong else supY(i - n)
    val realLongOk = span < (1L << 14) // pure-Long all-real incircle
    val superI128Ok = span <= 322 // 4·far+span < 2^30: int128-exact with supers
    def orientB3(a: Int, b: Int, c: Int): Int =
      ((px(b) - px(a)) * (py(c) - py(a)) -
        (py(b) - py(a)) * (px(c) - px(a))).signum
    def inCircleB4(a: Int, b: Int, c: Int, p: Int): Int = {
      val (adx, ady) = (px(a) - px(p), py(a) - py(p))
      val (bdx, bdy) = (px(b) - px(p), py(b) - py(p))
      val (cdx, cdy) = (px(c) - px(p), py(c) - py(p))
      ((adx * adx + ady * ady) * (bdx * cdy - bdy * cdx) -
        (bdx * bdx + bdy * bdy) * (adx * cdy - ady * cdx) +
        (cdx * cdx + cdy * cdy) * (adx * bdy - ady * bdx)).signum
    }
    // sign of x1·y1 + x2·y2 + x3·y3 in exact signed int128: each factor
    // must fit 63 bits and each |product| ≤ 2^122 (callers guarantee via
    // the span tiers), so the 3-term sum stays well inside ±2^127
    def sign128of3(x1: Long, y1: Long, x2: Long, y2: Long, x3: Long, y3: Long): Int = {
      var hi = 0L; var lo = 0L
      var i = 0
      while (i < 3) {
        val x = if (i == 0) x1 else if (i == 1) x2 else x3
        val y = if (i == 0) y1 else if (i == 1) y2 else y3
        val pl = x * y
        val ph = Math.multiplyHigh(x, y)
        val nl = lo + pl
        hi += ph + (if (java.lang.Long.compareUnsigned(nl, lo) < 0) 1L else 0L)
        lo = nl
        i += 1
      }
      if (hi != 0) java.lang.Long.signum(hi) else if (lo == 0) 0 else 1
    }
    // exact incircle sign by index (assumes (a,b,c) CCW): Long tier for
    // all-real small-span quadruples, int128 tier while magnitudes allow,
    // BigInt otherwise
    def inCircleSign(a: Int, b: Int, c: Int, p: Int): Int = {
      val allReal = a < n && b < n && c < n && p < n
      if (allReal && realLongOk) {
        val (pxv, pyv) = pts(p)
        val adx = (pts(a)._1 - pxv).toLong; val ady = (pts(a)._2 - pyv).toLong
        val bdx = (pts(b)._1 - pxv).toLong; val bdy = (pts(b)._2 - pyv).toLong
        val cdx = (pts(c)._1 - pxv).toLong; val cdy = (pts(c)._2 - pyv).toLong
        val d = (adx * adx + ady * ady) * (bdx * cdy - bdy * cdx) -
          (bdx * bdx + bdy * bdy) * (adx * cdy - ady * cdx) +
          (cdx * cdx + cdy * cdy) * (adx * bdy - ady * bdx)
        java.lang.Long.signum(d)
      } else if ((allReal && span < (1L << 30)) || superI128Ok) {
        // all-real spans < 2^30 and super diffs ≤ 4·far+span < 2^30 both
        // keep lift/cross ≤ 2^61 — int128-exact
        val pxv = lx(p); val pyv = ly(p)
        val adx = lx(a) - pxv; val ady = ly(a) - pyv
        val bdx = lx(b) - pxv; val bdy = ly(b) - pyv
        val cdx = lx(c) - pxv; val cdy = ly(c) - pyv
        sign128of3(
          adx * adx + ady * ady, bdx * cdy - bdy * cdx,
          -(bdx * bdx + bdy * bdy), adx * cdy - ady * cdx,
          cdx * cdx + cdy * cdy, adx * bdy - ady * bdx)
      } else inCircleB4(a, b, c, p)
    }
    def orientSign(a: Int, b: Int, c: Int): Int =
      if (a < n && b < n && c < n) {
        if (span < (1L << 31))
          // real diffs ≤ span < 2^31: products < 2^62, difference < 2^63
          java.lang.Long.signum(orient(pts(a)._1.toLong, pts(a)._2.toLong,
            pts(b)._1.toLong, pts(b)._2.toLong, pts(c)._1.toLong, pts(c)._2.toLong))
        else
          // Int-coord spans up to 2^32-2: diffs fit 33 bits, int128-exact
          sign128of3(lx(b) - lx(a), ly(c) - ly(a),
            -(ly(b) - ly(a)), lx(c) - lx(a), 0L, 0L)
      } else if (farFitsLong)
        // super coords ≤ 4·far < 2^47: diffs ≤ 2^48, int128-exact
        sign128of3(lx(b) - lx(a), ly(c) - ly(a),
          -(ly(b) - ly(a)), lx(c) - lx(a), 0L, 0L)
      else orientB3(a, b, c)

    // flat triangle store: parallel int arrays + alive flags (the tuple-
    // Set form spent the whole run boxing); compacted when mostly dead
    var cap = math.max(64, 8 * n)
    var ta = new Array[Int](cap); var tb = new Array[Int](cap)
    var tc = new Array[Int](cap); var alive = new Array[Boolean](cap)
    // Conservative floating circumcircle prefilter (r15): the insert loop
    // below runs the EXACT incircle predicate against every live triangle
    // — O(n²) exact tests dominated the per-series griddata fills. For
    // all-real triangles in the small-span tier (coords < 2¹⁴, so squares
    // and the orient denominator are exact in double and the circumcenter
    // division is correct to ~1 ulp of its ≤ 4·span³ magnitude), the
    // circumcenter/radius² are precomputed once per triangle and a query
    // point is quick-classified by double distance: certainly-outside and
    // certainly-inside skip the exact test, anything within the relative
    // slack band falls THROUGH to it — the pervasively-cocircular exact
    // ties always land in the band, so the decided sign is identical to
    // the unfiltered run, triangle for triangle.
    val filterTier = realLongOk
    var ccx: Array[Double] = null; var ccy: Array[Double] = null
    var cr2: Array[Double] = null
    if (filterTier) {
      ccx = new Array[Double](cap); ccy = new Array[Double](cap)
      cr2 = new Array[Double](cap)
    }
    var nTri = 0; var nDead = 0
    def addTri(u: Int, v: Int, w: Int): Unit = {
      if (nTri == cap) {
        cap *= 2
        ta = java.util.Arrays.copyOf(ta, cap); tb = java.util.Arrays.copyOf(tb, cap)
        tc = java.util.Arrays.copyOf(tc, cap)
        alive = java.util.Arrays.copyOf(alive, cap)
        if (filterTier) {
          ccx = java.util.Arrays.copyOf(ccx, cap)
          ccy = java.util.Arrays.copyOf(ccy, cap)
          cr2 = java.util.Arrays.copyOf(cr2, cap)
        }
      }
      if (orientSign(u, v, w) >= 0) { ta(nTri) = u; tb(nTri) = v; tc(nTri) = w }
      else { ta(nTri) = u; tb(nTri) = w; tc(nTri) = v }
      alive(nTri) = true
      if (filterTier) {
        if (ta(nTri) < n && tb(nTri) < n && tc(nTri) < n) {
          // TRANSLATED to (minX, minY) before any float math (r16,
          // ADVICE r15): the d2-vs-cr2 comparison is translation-
          // invariant, and with span-relative coords every magnitude
          // here is < 2¹⁴ so the squares are exact in double and the
          // 1e-13-relative-center analysis below actually holds. On the
          // ABSOLUTE coords (up to ~2³¹) a small-span-but-far-offset
          // input hit catastrophic cancellation in the circumcenter and
          // the band could certify a WRONG sign.
          val ax = (pts(ta(nTri))._1 - minX).toDouble
          val ay = (pts(ta(nTri))._2 - minY).toDouble
          val bx = (pts(tb(nTri))._1 - minX).toDouble
          val by = (pts(tb(nTri))._2 - minY).toDouble
          val cx = (pts(tc(nTri))._1 - minX).toDouble
          val cy = (pts(tc(nTri))._2 - minY).toDouble
          val d = 2.0 * ((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
          val a2 = ax * ax + ay * ay
          val b2 = bx * bx + by * by
          val c2 = cx * cx + cy * cy
          val ux = (a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)) / d
          val uy = (a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)) / d
          ccx(nTri) = ux; ccy(nTri) = uy
          cr2(nTri) = (ax - ux) * (ax - ux) + (ay - uy) * (ay - uy)
        } else cr2(nTri) = -1.0 // super-vertex triangle: exact test only
      }
      nTri += 1
    }
    addTri(n, n + 1, n + 2)

    var badIdx = new Array[Int](64)
    var edgeKey = new Array[Long](256) // cavity boundary candidates
    var edgeCnt = new Array[Int](256)
    var p = 0
    while (p < n) {
      var nBad = 0
      var t = 0
      // same (minX, minY) translation as the per-triangle centers above
      val pxD = if (filterTier) (pts(p)._1 - minX).toDouble else 0.0
      val pyD = if (filterTier) (pts(p)._2 - minY).toDouble else 0.0
      while (t < nTri) {
        if (alive(t)) {
          var bad = false
          var decided = false
          if (filterTier && cr2(t) >= 0.0) {
            val dx = pxD - ccx(t); val dy = pyD - ccy(t)
            val d2 = dx * dx + dy * dy
            // relative slack 1e-7 of the magnitude scale: the center and
            // both squared distances are correct to ~1e-13 relative in
            // this tier, so a gap beyond the band certifies the sign;
            // inside the band the exact predicate decides (every exact
            // cocircular tie has gap 0 and lands here)
            val band = 1e-7 * (d2 + cr2(t))
            if (d2 > cr2(t) + band) { bad = false; decided = true }
            else if (d2 < cr2(t) - band) { bad = true; decided = true }
          }
          if (!decided) bad = inCircleSign(ta(t), tb(t), tc(t), p) > 0
          if (bad) {
            if (nBad == badIdx.length) badIdx = java.util.Arrays.copyOf(badIdx, nBad * 2)
            badIdx(nBad) = t; nBad += 1
          }
        }
        t += 1
      }
      if (nBad > 0) {
        // polygon boundary = edges of the bad region appearing exactly once
        var nE = 0
        var bi = 0
        while (bi < nBad) {
          val bt = badIdx(bi)
          alive(bt) = false; nDead += 1
          var e = 0
          while (e < 3) {
            val u = if (e == 0) ta(bt) else if (e == 1) tb(bt) else tc(bt)
            val v = if (e == 0) tb(bt) else if (e == 1) tc(bt) else ta(bt)
            val k = if (u < v) (u.toLong << 32) | v else (v.toLong << 32) | u
            var j = 0
            var found = false
            while (j < nE && !found) {
              if (edgeKey(j) == k) { edgeCnt(j) += 1; found = true }
              j += 1
            }
            if (!found) {
              if (nE == edgeKey.length) {
                edgeKey = java.util.Arrays.copyOf(edgeKey, nE * 2)
                edgeCnt = java.util.Arrays.copyOf(edgeCnt, nE * 2)
              }
              edgeKey(nE) = k; edgeCnt(nE) = 1; nE += 1
            }
            e += 1
          }
          bi += 1
        }
        var j = 0
        while (j < nE) {
          if (edgeCnt(j) == 1) {
            val u = (edgeKey(j) >>> 32).toInt
            val v = (edgeKey(j) & 0xffffffffL).toInt
            // skip degenerate (collinear) fill triangles
            if (orientSign(u, v, p) != 0) addTri(u, v, p)
          }
          j += 1
        }
        // compact when mostly tombstones so the per-insert scan stays ~live-size
        if (nDead > nTri / 2 && nTri > 128) {
          var w = 0
          var r = 0
          while (r < nTri) {
            if (alive(r)) {
              ta(w) = ta(r); tb(w) = tb(r); tc(w) = tc(r); alive(w) = true
              if (filterTier) { ccx(w) = ccx(r); ccy(w) = ccy(r); cr2(w) = cr2(r) }
              w += 1
            }
            r += 1
          }
          java.util.Arrays.fill(alive, w, nTri, false)
          nTri = w; nDead = 0
        }
      }
      p += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    var t = 0
    while (t < nTri) {
      if (alive(t) && ta(t) < n && tb(t) < n && tc(t) < n)
        out += ((ta(t), tb(t), tc(t)))
      t += 1
    }
    out.toArray
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
      // two-pass counting build into flat int arrays (one ArrayBuffer per
      // cell allocated g² buffers per locator — measured GC churn on the
      // per-series fills, which build one locator per series)
      val counts = new Array[Int](g * g)
      def cellsOf(t: Int)(f: Int => Unit): Unit = {
        val (a, b, c) = tris(t)
        val x0 = ix(math.min(pts(a)._1, math.min(pts(b)._1, pts(c)._1)).toLong)
        val x1 = ix(math.max(pts(a)._1, math.max(pts(b)._1, pts(c)._1)).toLong)
        val y0 = iy(math.min(pts(a)._2, math.min(pts(b)._2, pts(c)._2)).toLong)
        val y1 = iy(math.max(pts(a)._2, math.max(pts(b)._2, pts(c)._2)).toLong)
        var cy = y0
        while (cy <= y1) {
          var cx = x0
          while (cx <= x1) { f(cy * g + cx); cx += 1 }
          cy += 1
        }
      }
      var t = 0
      while (t < nT) { cellsOf(t)(counts(_) += 1); t += 1 }
      val out = new Array[Array[Int]](g * g)
      var i = 0
      while (i < g * g) { out(i) = new Array[Int](counts(i)); i += 1 }
      val fill = new Array[Int](g * g)
      t = 0
      while (t < nT) {
        cellsOf(t) { cell => out(cell)(fill(cell)) = t; fill(cell) += 1 }
        t += 1
      }
      out
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
