package graft.ops

/** Clough–Tocher C¹ cubic interpolation over a Delaunay triangulation —
  * the `method='cubic'` variant of the reference's multivariate griddata
  * pre-pass (`orangecontrib/timeseries/functions.py:300-318`, scipy
  * `CloughTocher2DInterpolator`). Public construction: the REDUCED
  * Hsieh–Clough–Tocher macro-element (Farin, "Triangular Bernstein–Bézier
  * patches", CAGD 1986; Ciarlet's reduced HCT element) — each Delaunay
  * triangle splits at its barycenter into three cubic Bernstein–Bézier
  * patches, constrained to interpolate vertex values and gradients, be C¹
  * across the internal split edges, and have a LINEARLY varying normal
  * derivative along each outer edge. The last condition is what makes the
  * element local: the normal derivative along a shared edge is then the
  * same linear function on both sides (it is pinned by the shared endpoint
  * gradients), so adjacent macro-triangles join C¹ without any global
  * solve. Reduced HCT reproduces polynomials up to degree 2 exactly
  * (the linear-normal-derivative reduction gives up cubic reproduction —
  * scipy's element has the same property); both properties are spec-gated.
  *
  * Vertex gradients are estimated by a local least-squares quadratic fit
  * over the 1-ring (widened to the 2-ring when small) — exact for
  * quadratic data, like scipy's global variational estimator, but local;
  * interpolated VALUES inside the hull can therefore differ from scipy's
  * for non-quadratic data (both are C¹ interpolants of the same data —
  * documented divergence, same class as the cocircular tie-break freedom).
  *
  * Driver-side by design, same size bound and caller as the 'nearest' /
  * 'linear' variants ([[Interpolate.multivariate]]).
  */
object CloughTocher {

  /** Per-vertex gradient by local least-squares quadratic fit centered at
    * the vertex and forced through it: rows `z(u)−z(v) ≈ a·dx + b·dy +
    * c·dx² + d·dx·dy + e·dy²`, gradient = (a, b). Exact for quadratic
    * data when the neighborhood determines the fit (full-rank design).
    * Falls back to a linear fit, then to a zero gradient, when the
    * neighborhood is too small or degenerate. */
  def estimateGradients(pts: Array[(Int, Int)], z: Array[Double],
      tris: Array[(Int, Int, Int)]): Array[(Double, Double)] = {
    val n = pts.length
    // CSR adjacency with a visit-stamp dedup instead of n boxed Int sets
    // (r15: the Set machinery was a top executor-profile frame in the
    // q108 fill). Ring CONTENT is the same set as before; row order
    // within a ring cannot move results — the design entries are exact
    // small-integer products in double, so the Gram sums are exact and
    // order-free, and the elimination below is unchanged.
    val m3 = tris.length * 3
    val deg = new Array[Int](n)
    var ti = 0
    while (ti < tris.length) {
      val t = tris(ti)
      deg(t._1) += 2; deg(t._2) += 2; deg(t._3) += 2
      ti += 1
    }
    val off = new Array[Int](n + 1)
    var i = 0
    while (i < n) { off(i + 1) = off(i) + deg(i); i += 1 }
    val adj = new Array[Int](2 * m3)
    val fill = java.util.Arrays.copyOf(off, n)
    ti = 0
    while (ti < tris.length) {
      val t = tris(ti)
      val (a, b, c) = (t._1, t._2, t._3)
      adj(fill(a)) = b; adj(fill(a) + 1) = c; fill(a) += 2
      adj(fill(b)) = a; adj(fill(b) + 1) = c; fill(b) += 2
      adj(fill(c)) = a; adj(fill(c) + 1) = b; fill(c) += 2
      ti += 1
    }
    // dedupe each vertex's list in place (stamp = current vertex pass)
    val stamp = new Array[Int](n)
    var cur = 0
    val degU = new Array[Int](n)
    i = 0
    while (i < n) {
      cur += 1
      var w = off(i)
      var r = off(i)
      val end = off(i) + deg(i)
      while (r < end) {
        val u = adj(r)
        if (stamp(u) != cur) { stamp(u) = cur; adj(w) = u; w += 1 }
        r += 1
      }
      degU(i) = w - off(i)
      i += 1
    }
    val ringBuf = new Array[Int](math.max(1, n))
    val out = new Array[(Double, Double)](n)
    var v = 0
    while (v < n) {
      cur += 1
      stamp(v) = cur // v itself is never a ring member
      var rs = 0
      var r = off(v)
      var end = off(v) + degU(v)
      while (r < end) {
        val u = adj(r)
        if (stamp(u) != cur) { stamp(u) = cur; ringBuf(rs) = u; rs += 1 }
        r += 1
      }
      if (rs < 6) {
        // widen to the 2-ring: neighbors of the ORIGINAL 1-ring members
        val base = rs
        var k = 0
        while (k < base) {
          val u = ringBuf(k)
          r = off(u)
          end = off(u) + degU(u)
          while (r < end) {
            val t2 = adj(r)
            if (stamp(t2) != cur) { stamp(t2) = cur; ringBuf(rs) = t2; rs += 1 }
            r += 1
          }
          k += 1
        }
      }
      val rows = new Array[(Array[Double], Double)](rs)
      var k = 0
      while (k < rs) {
        val u = ringBuf(k)
        val dx = (pts(u)._1 - pts(v)._1).toDouble
        val dy = (pts(u)._2 - pts(v)._2).toDouble
        rows(k) = (Array(dx, dy, dx * dx, dx * dy, dy * dy), z(u) - z(v))
        k += 1
      }
      out(v) = solveLS(rows, 5).orElse(
          solveLS(rows.map { case (rr, b) => (rr.take(2), b) }, 2))
        .map(s => (s(0), s(1))).getOrElse((0.0, 0.0))
      v += 1
    }
    out
  }

  /** Least squares via normal equations + Gaussian elimination with
    * partial pivoting; None when the system is (near-)singular. */
  private def solveLS(rows: Array[(Array[Double], Double)],
      k: Int): Option[Array[Double]] = {
    if (rows.length < k) return None
    val m = Array.ofDim[Double](k, k + 1)
    rows.foreach { case (r, b) =>
      var i = 0
      while (i < k) {
        var j = 0
        while (j < k) { m(i)(j) += r(i) * r(j); j += 1 }
        m(i)(k) += r(i) * b
        i += 1
      }
    }
    // scale-aware pivot floor: the Gram matrix entries grow like coord⁴
    // (while-loop form of the original Range code — same op order, same
    // first-max pivot choice; the Range closures were a profile hotspot)
    var gmax = 1e-300
    var gi = 0
    while (gi < k) {
      var gj = 0
      while (gj < k) {
        val a = math.abs(m(gi)(gj)); if (a > gmax) gmax = a
        gj += 1
      }
      gi += 1
    }
    val floor = 1e-9 * gmax
    var c = 0
    while (c < k) {
      var p = c
      var best = math.abs(m(c)(c))
      var r = c + 1
      while (r < k) {
        val a = math.abs(m(r)(c)); if (a > best) { best = a; p = r }
        r += 1
      }
      if (best < floor) return None
      val t = m(p); m(p) = m(c); m(c) = t
      r = 0
      while (r < k) {
        if (r != c) {
          val f = m(r)(c) / m(c)(c)
          var j = c
          while (j <= k) { m(r)(j) -= f * m(c)(j); j += 1 }
        }
        r += 1
      }
      c += 1
    }
    val sol = new Array[Double](k)
    var si = 0
    while (si < k) { sol(si) = m(si)(k) / m(si)(si); si += 1 }
    Some(sol)
  }

  /** The 10 Bernstein–Bézier control points of one micro-patch, index
    * order b300 b030 b003 b210 b201 b120 b021 b102 b012 b111 over micro
    * vertices (A, B, C). */
  private final case class Patch(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double, b: Array[Double]) {
    /** Value at micro-barycentric (u, v, w). */
    def value(u: Double, v: Double, w: Double): Double =
      b(0) * u * u * u + b(1) * v * v * v + b(2) * w * w * w +
        3 * (b(3) * u * u * v + b(4) * u * u * w + b(5) * u * v * v +
          b(6) * v * v * w + b(7) * u * w * w + b(8) * v * w * w) +
        6 * b(9) * u * v * w

    /** Cartesian gradient at micro-barycentric (u, v, w): directional
      * BB derivative along x and y unit vectors. */
    def gradient(u: Double, v: Double, w: Double): (Double, Double) = {
      val area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
      // barycentric direction of a cartesian unit vector
      def dir(dx: Double, dy: Double) = (
        ((cx - bx) * dy - (cy - by) * dx) / area2,
        ((ax - cx) * dy - (ay - cy) * dx) / area2,
        ((bx - ax) * dy - (by - ay) * dx) / area2)
      def d(nu: (Double, Double, Double)): Double = {
        val (n1, n2, n3) = nu
        // 3 * sum over |idx|=2 of (shifted control point blend) * B^2
        3 * ((n1 * b(0) + n2 * b(3) + n3 * b(4)) * u * u +
          (n1 * b(5) + n2 * b(1) + n3 * b(6)) * v * v +
          (n1 * b(7) + n2 * b(8) + n3 * b(2)) * w * w +
          2 * ((n1 * b(3) + n2 * b(5) + n3 * b(9)) * u * v +
            (n1 * b(4) + n2 * b(9) + n3 * b(7)) * u * w +
            (n1 * b(9) + n2 * b(6) + n3 * b(8)) * v * w))
      }
      (d(dir(1, 0)), d(dir(0, 1)))
    }
  }

  /** Control points for the three micro-patches of one macro triangle
    * (a, b, c are indices into pts/z/grads), in micro order
    * T_a=(P1,P2,Pc), T_b=(P2,P3,Pc), T_c=(P3,P1,Pc). */
  private def macroPatches(pts: Array[(Int, Int)], z: Array[Double],
      grads: Array[(Double, Double)], a: Int, b: Int, c: Int): Array[Patch] = {
    val p = Array(pts(a), pts(b), pts(c))
    val f = Array(z(a), z(b), z(c))
    val g = Array(grads(a), grads(b), grads(c))
    val cx = (p(0)._1 + p(1)._1 + p(2)._1) / 3.0
    val cy = (p(0)._2 + p(1)._2 + p(2)._2) / 3.0
    def dot(gi: (Double, Double), dx: Double, dy: Double) = gi._1 * dx + gi._2 * dy
    // r(i)(j) = control point adjacent to Pi along edge toward Pj
    def r(i: Int, j: Int) = f(i) + dot(g(i),
      (p(j)._1 - p(i)._1).toDouble, (p(j)._2 - p(i)._2).toDouble) / 3
    // q(i) = control point adjacent to Pi toward the barycenter
    val q = Array.tabulate(3)(i => f(i) + dot(g(i),
      cx - p(i)._1, cy - p(i)._2) / 3)

    // interior point w of the micro-patch on outer edge (i, j): linear
    // normal derivative along that edge (the reduced-HCT condensation)
    def wOf(i: Int, j: Int): Double = {
      val (x1, y1) = (p(i)._1.toDouble, p(i)._2.toDouble)
      val (x2, y2) = (p(j)._1.toDouble, p(j)._2.toDouble)
      // barycentric direction of the edge normal w.r.t. (Pi, Pj, Pc);
      // scale/sign of the normal cancels in the w ratio
      val (nx, ny) = (-(y2 - y1), x2 - x1)
      val area2 = (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
      val n1 = ((cx - x2) * ny - (cy - y2) * nx) / area2
      val n2 = ((x1 - cx) * ny - (y1 - cy) * nx) / area2
      val n3 = ((x2 - x1) * ny - (y2 - y1) * nx) / area2
      val c0 = n1 * f(i) + n2 * r(i, j) + n3 * q(i)
      val c2 = n1 * r(j, i) + n2 * f(j) + n3 * q(j)
      ((c0 + c2) / 2 - n1 * r(i, j) - n2 * r(j, i)) / n3
    }
    val wA = wOf(0, 1); val wB = wOf(1, 2); val wC = wOf(2, 0)
    // C¹ across the internal split edges (barycentric of the opposite
    // macro vertex w.r.t. a micro triangle is always (-1, -1, 3))
    val s12 = (wA + wB + q(1)) / 3
    val s23 = (wB + wC + q(2)) / 3
    val s31 = (wC + wA + q(0)) / 3
    val fc = (s12 + s23 + s31) / 3

    def patch(i: Int, j: Int, w: Double, sToC_i: Double, sToC_j: Double) =
      Patch(p(i)._1, p(i)._2, p(j)._1, p(j)._2, cx, cy,
        // b300 b030 b003 b210 b201 b120 b021 b102 b012 b111
        Array(f(i), f(j), fc, r(i, j), q(i), r(j, i), q(j), sToC_i, sToC_j, w))
    Array(patch(0, 1, wA, s31, s12),
      patch(1, 2, wB, s12, s23),
      patch(2, 0, wC, s23, s31))
  }

  /** Reusable interpolant over one triangulation: gradients estimated
    * once, per-triangle control nets computed lazily and cached — the
    * form [[Interpolate.multivariate]] drives over many NaN cells. */
  def evaluator(pts: Array[(Int, Int)], z: Array[Double],
      tris: Array[(Int, Int, Int)]): ((Int, Int)) => Option[Double] = {
    val grads = estimateGradients(pts, z, tris)
    val cache = new Array[Array[Patch]](tris.length)
    // grid-indexed point location: O(1) expected per query instead of the
    // O(#triangles) scan (which made the fill #NaN-cells × #triangles)
    val loc = new Delaunay.TriLocator(pts, tris)
    q =>
      locateAmong(pts, tris,
          loc.candidates(q._1.toDouble, q._2.toDouble),
          (q._1.toDouble, q._2.toDouble))
        .map { case (t, u, v, w) =>
          if (cache(t) == null) {
            val (a, b, c) = tris(t)
            cache(t) = macroPatches(pts, z, grads, a, b, c)
          }
          val (pi, mu, mv, mw) = microOf(u, v, w)
          cache(t)(pi).value(mu, mv, mw)
        }
  }

  /** Interpolate `query`: Some(value) inside/on the hull, None outside —
    * same contract as [[Delaunay.interpolate]]. */
  def interpolate(pts: Array[(Int, Int)], z: Array[Double],
      grads: Array[(Double, Double)], tris: Array[(Int, Int, Int)],
      query: (Int, Int)): Option[Double] =
    locate(pts, tris, query).map { case (t, u, v, w) =>
      val tri = tris(t)
      val patches = macroPatches(pts, z, grads, tri._1, tri._2, tri._3)
      val (pi, mu, mv, mw) = microOf(u, v, w)
      patches(pi).value(mu, mv, mw)
    }

  /** Value and cartesian gradient at `query` (spec surface for the C¹
    * property): evaluated from the located patch. */
  def interpolateWithGradient(pts: Array[(Int, Int)], z: Array[Double],
      grads: Array[(Double, Double)], tris: Array[(Int, Int, Int)],
      query: (Double, Double)): Option[(Double, Double, Double)] =
    locateD(pts, tris, query).map { case (t, u, v, w) =>
      val tri = tris(t)
      val patches = macroPatches(pts, z, grads, tri._1, tri._2, tri._3)
      val (pi, mu, mv, mw) = microOf(u, v, w)
      val pt = patches(pi)
      val (gx, gy) = pt.gradient(mu, mv, mw)
      (pt.value(mu, mv, mw), gx, gy)
    }

  /** Micro-patch index + micro barycentric from macro barycentric: the
    * micro triangle is the one opposite the SMALLEST macro coordinate
    * (T_a covers λ3 ≤ min(λ1, λ2), etc.). */
  private def microOf(l1: Double, l2: Double, l3: Double): (Int, Double, Double, Double) =
    if (l3 <= l1 && l3 <= l2) (0, l1 - l3, l2 - l3, 3 * l3)
    else if (l1 <= l2) (1, l2 - l1, l3 - l1, 3 * l1)
    else (2, l3 - l2, l1 - l2, 3 * l2)

  private def locate(pts: Array[(Int, Int)], tris: Array[(Int, Int, Int)],
      q: (Int, Int)): Option[(Int, Double, Double, Double)] =
    locateD(pts, tris, (q._1.toDouble, q._2.toDouble))

  /** One-off linear-scan location (public [[interpolate]] /
    * [[interpolateWithGradient]] spec surface); the many-query
    * [[evaluator]] path goes through the grid index instead. */
  private def locateD(pts: Array[(Int, Int)], tris: Array[(Int, Int, Int)],
      q: (Double, Double)): Option[(Int, Double, Double, Double)] =
    locateAmong(pts, tris, Array.range(0, tris.length), q)

  /** Containment test restricted to candidate triangle indices `cand`. */
  private def locateAmong(pts: Array[(Int, Int)], tris: Array[(Int, Int, Int)],
      cand: Array[Int], q: (Double, Double)): Option[(Int, Double, Double, Double)] = {
    val (qx, qy) = q
    var ci = 0
    while (ci < cand.length) {
      val t = cand(ci)
      val (a, b, c) = tris(t)
      val (ax, ay) = (pts(a)._1.toDouble, pts(a)._2.toDouble)
      val (bx, by) = (pts(b)._1.toDouble, pts(b)._2.toDouble)
      val (cx, cy) = (pts(c)._1.toDouble, pts(c)._2.toDouble)
      def orient(x1: Double, y1: Double, x2: Double, y2: Double): Double =
        (x2 - x1) * (qy - y1) - (y2 - y1) * (qx - x1)
      val oa = orient(bx, by, cx, cy)
      val ob = orient(cx, cy, ax, ay)
      val oc = orient(ax, ay, bx, by)
      if (oa >= 0 && ob >= 0 && oc >= 0) {
        val area = oa + ob + oc
        return Some((t, oa / area, ob / area, oc / area))
      }
      ci += 1
    }
    None
  }
}
