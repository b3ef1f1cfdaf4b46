package graft.ops

import graft.SparkSpec
import graft.core.TimeseriesFrame
import org.apache.spark.sql.functions._

/** Exact-predicate Delaunay and the multivariate 'linear' pre-pass.
  * Verification strategy (no scipy in the sandbox): (1) the DEFINITIONAL
  * Delaunay property — no input point strictly inside any triangle's
  * circumcircle, checked with the same exact BigInt predicate; (2) the
  * planar-exactness property — barycentric interpolation of z = ax+by+c
  * recovers the plane EXACTLY for every valid triangulation, so the
  * check is independent of which cocircular tie-break scipy would have
  * picked. */
class DelaunaySpec extends SparkSpec {

  private def lcgPts(seed: Long, n: Int, range: Int): Array[(Int, Int)] = {
    var s = seed
    def next(): Int = { s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % range).toInt }
    Iterator.continually((next(), next())).distinct.take(n).toArray
  }

  test("triangulate: definitional empty-circumcircle property (exact)") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val pts = lcgPts(seed, 40, 30)
      val tris = Delaunay.triangulate(pts)
      assert(tris.nonEmpty)
      tris.foreach { case (a, b, c) =>
        // CCW and non-degenerate
        val o = Delaunay.orient(pts(a)._1, pts(a)._2, pts(b)._1, pts(b)._2,
          pts(c)._1, pts(c)._2)
        assert(o > 0, s"triangle ($a,$b,$c) not CCW: $o")
        pts.indices.filterNot(Set(a, b, c)).foreach { p =>
          val ic = Delaunay.inCircle(pts(a)._1, pts(a)._2, pts(b)._1, pts(b)._2,
            pts(c)._1, pts(c)._2, pts(p)._1, pts(p)._2)
          assert(ic <= 0, s"point $p strictly inside circumcircle of ($a,$b,$c)")
        }
      }
    }
  }

  test("floating prefilter: exact property survives pervasively cocircular grids") {
    // the r15 circumcircle prefilter quick-classifies points by double
    // distance and must route every exact tie (gap 0) into the exact
    // predicate: a gappy integer GRID — every unit square cocircular,
    // the gate's matrix shape — is the adversarial input. The
    // definitional empty-circumcircle property over the result proves
    // the filtered insert loop marked exactly the right cavities.
    val pts = (for {
      i <- 0 until 18; j <- 0 until 4
      if (i * 7 + j * 3) % 5 != 2 // deterministic holes
    } yield (i, j)).toArray
    val tris = Delaunay.triangulate(pts)
    assert(tris.nonEmpty)
    tris.foreach { case (a, b, c) =>
      pts.indices.filterNot(Set(a, b, c)).foreach { p =>
        val ic = Delaunay.inCircle(pts(a)._1, pts(a)._2, pts(b)._1, pts(b)._2,
          pts(c)._1, pts(c)._2, pts(p)._1, pts(p)._2)
        assert(ic <= 0, s"point $p strictly inside circumcircle of ($a,$b,$c)")
      }
    }
    // and the hull is fully covered: every grid cell (hole or not) inside
    // the rectangle interpolates a planar field exactly
    val z = pts.map(p => 2.0 * p._1 - 3.0 * p._2 + 7.0)
    for (i <- 0 until 18; j <- 0 until 4) {
      val got = Delaunay.interpolate(pts, z, tris, (i, j))
      assert(got.isDefined, s"coverage hole at ($i,$j)")
      assert(math.abs(got.get - (2.0 * i - 3.0 * j + 7.0)) < 1e-9)
    }
  }

  test("floating prefilter: small span at a ~2^30 coordinate offset stays exact") {
    // the r16 fix for the r15 ADVICE finding: the prefilter's circumcenter
    // math must run on SPAN-RELATIVE coordinates. On absolute coords a
    // small-span-but-far-offset cloud (offset ~2^30, span < 2^14 so the
    // filterTier is ACTIVE) hits catastrophic cancellation in ax²+ay²
    // (~2^60 magnitudes) and the certification band can report a WRONG
    // incircle sign on thin triangles. Same definitional check as above,
    // on offset copies of the pseudorandom clouds plus a thin strip.
    val off = 1 << 30
    for (seed <- Seq(1L, 7L, 42L)) {
      val pts = lcgPts(seed, 40, 30).map { case (x, y) => (x + off, y + off) }
      val tris = Delaunay.triangulate(pts)
      assert(tris.nonEmpty)
      tris.foreach { case (a, b, c) =>
        pts.indices.filterNot(Set(a, b, c)).foreach { p =>
          val ic = Delaunay.inCircle(pts(a)._1, pts(a)._2, pts(b)._1, pts(b)._2,
            pts(c)._1, pts(c)._2, pts(p)._1, pts(p)._2)
          assert(ic <= 0, s"offset cloud seed=$seed: point $p strictly inside " +
            s"circumcircle of ($a,$b,$c)")
        }
      }
    }
    // thin triangles (the worst case for circumcenter cancellation):
    // a near-collinear strip with one apex, offset to 2^30
    val strip = ((0 to 8).map(i => (i * 1000 + off, (i % 2) + off)) :+
      (4000 + off, 500 + off)).toArray
    val tris = Delaunay.triangulate(strip)
    assert(tris.nonEmpty)
    tris.foreach { case (a, b, c) =>
      strip.indices.filterNot(Set(a, b, c)).foreach { p =>
        val ic = Delaunay.inCircle(strip(a)._1, strip(a)._2, strip(b)._1,
          strip(b)._2, strip(c)._1, strip(c)._2, strip(p)._1, strip(p)._2)
        assert(ic <= 0, s"offset strip: point $p strictly inside " +
          s"circumcircle of ($a,$b,$c)")
      }
    }
  }

  test("near-collinear triples: full hull coverage despite huge circumradii") {
    // three almost-collinear points whose circumradius (~d²/8h ≈ 2³⁹)
    // dwarfs any small multiple of the data span — the regression case
    // for a finite span-scaled super-triangle, where a super vertex
    // lands inside the circumcircle and hull triangles silently vanish.
    val flat = Array((0, 0), (1 << 20, 1), (2 << 20, 0))
    val t1 = Delaunay.triangulate(flat)
    assert(t1.length == 1, s"expected the single real triangle, got ${t1.toSeq}")

    // a strip of near-collinear points plus one apex: every in-hull grid
    // probe along the strip must interpolate (brute hull test = the three
    // orientation signs against each triangle, which interpolate() does;
    // coverage means SOME triangle contains each probe)
    val strip = (0 to 8).map(i => (i * 1000, (i % 2))).toArray :+ (4000, 500)
    val z = strip.map(p => 0.001 * p._1 + 0.002 * p._2 + 1.0)
    val tris = Delaunay.triangulate(strip)
    // probes strictly inside the hull: along the apex's median line
    for (x <- 500 to 7500 by 500) {
      val y = 2 + (x - 500) / 50 * (if (x <= 4000) 1 else 0) -
        (if (x > 4000) (x - 4000) / 50 else 0)
      val got = Delaunay.interpolate(strip, z, tris, (x, math.max(y, 2)))
      assert(got.isDefined, s"coverage hole at ($x, ${math.max(y, 2)})")
      val want = 0.001 * x + 0.002 * math.max(y, 2) + 1.0
      assert(math.abs(got.get - want) < 1e-9, s"($x): ${got.get} vs $want")
    }
  }

  test("full-Int-range spans: orientation stays exact (no Long overflow)") {
    // span ≈ 2^32 − 2: real-point diffs reach 33 bits, so the plain-Long
    // orient product overflows — the regression case for the all-real
    // orientSign tier (must route through int128, mirroring incircle)
    def lcg(seed: Long): Iterator[Int] = {
      var s = seed
      Iterator.continually {
        s = s * 6364136223846793005L + 1442695040888963407L
        (s >>> 32).toInt // full Int range
      }
    }
    for (seed <- Seq(3L, 11L)) {
      val ps = ((lcg(seed) zip lcg(seed + 99)).take(22).toArray ++
        Array((Int.MinValue + 1, Int.MinValue + 1),
          (Int.MaxValue - 1, Int.MaxValue - 2),
          (Int.MinValue + 2, Int.MaxValue - 1))).distinct // extreme span
      val tris = Delaunay.triangulate(ps)
      assert(tris.nonEmpty)
      def orientB(a: (Int, Int), b: (Int, Int), c: (Int, Int)): Int =
        ((BigInt(b._1) - a._1) * (BigInt(c._2) - a._2) -
          (BigInt(b._2) - a._2) * (BigInt(c._1) - a._1)).signum
      tris.foreach { case (a, b, c) =>
        assert(orientB(ps(a), ps(b), ps(c)) > 0,
          s"triangle ($a,$b,$c) not CCW at full-Int span")
        ps.indices.filterNot(Set(a, b, c)).foreach { p =>
          val ic = Delaunay.inCircle(ps(a)._1, ps(a)._2, ps(b)._1, ps(b)._2,
            ps(c)._1, ps(c)._2, ps(p)._1, ps(p)._2)
          assert(ic <= 0, s"point $p inside circumcircle of ($a,$b,$c)")
        }
      }
    }
  }

  test("triangulate: degenerate inputs — <3 points or collinear → empty") {
    assert(Delaunay.triangulate(Array((0, 0), (1, 1))).isEmpty)
    assert(Delaunay.triangulate(
      Array((0, 0), (1, 1), (2, 2), (5, 5))).isEmpty)
  }

  test("interpolate: planar exactness inside the hull, None outside") {
    val pts = lcgPts(3L, 60, 25)
    def plane(p: (Int, Int)): Double = 2.0 * p._1 - 3.0 * p._2 + 7.0
    val z = pts.map(plane)
    val tris = Delaunay.triangulate(pts)
    // every grid point inside the hull must recover the plane exactly
    var inside = 0
    for (x <- 0 until 25; y <- 0 until 25) {
      Delaunay.interpolate(pts, z, tris, (x, y)).foreach { v =>
        inside += 1
        assert(math.abs(v - plane((x, y))) < 1e-9, s"($x,$y): $v")
      }
    }
    assert(inside > 100, s"only $inside in-hull points")
    // far outside the bounding box → None
    assert(Delaunay.interpolate(pts, z, tris, (1000, 1000)).isEmpty)
  }

  test("multivariateLinear: in-hull NaN cells recover a planar matrix") {
    import spark.implicits._
    // matrix cell (i, j) holds 2i - 3j + 7; knock out interior cells
    val n = 12; val k = 4
    val holes = Set((3, 1), (5, 2), (7, 1), (8, 2), (4, 2))
    val rows = (0 until n).map { i =>
      val v = (0 until k).map { j =>
        if (holes((i, j))) Double.NaN else 2.0 * i - 3.0 * j + 7.0
      }
      (i.toLong, v(0), v(1), v(2), v(3))
    }
    val df = rows.toDF("t", "c0", "c1", "c2", "c3")
    val tsf = TimeseriesFrame(df, Some("t"))
    val out = Interpolate.multivariateLinear(tsf, Seq("c0", "c1", "c2", "c3"))
      .orderBy("t").collect()
    holes.foreach { case (i, j) =>
      val got = out(i).getDouble(1 + j)
      val want = 2.0 * i - 3.0 * j + 7.0
      assert(math.abs(got - want) < 1e-9, s"cell ($i,$j): $got vs $want")
    }
    // untouched cells unchanged
    assert(out(0).getDouble(1) == 7.0)
  }

  test("interp routing: multivariate linear pre-pass then univariate pass") {
    import spark.implicits._
    // corner cell (0,0) is OUTSIDE the known-cell hull when row 0 only
    // has columns 1..3 — the pre-pass leaves it NaN, univariate fills it
    val df = Seq(
      (0L, Double.NaN, 3.0, 5.0, 2.0),
      (1L, 10.0, 4.0, Double.NaN, 3.0),
      (2L, 12.0, 5.0, 7.0, 4.0),
      (3L, 14.0, 6.0, 8.0, 5.0)
    ).toDF("t", "c0", "c1", "c2", "c3")
    val tsf = TimeseriesFrame(df, Some("t"))
      .withInterpolation("linear", multivariate = true)
    val out = tsf.interp(Seq("c0", "c1", "c2", "c3")).orderBy("t").collect()
    // every NaN is gone after the combined pass
    out.foreach { r => (1 to 4).foreach { j =>
      assert(!r.isNullAt(j) && !r.getDouble(j).isNaN, s"row $r col $j") } }
  }
}
