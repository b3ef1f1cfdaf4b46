package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual image hashes (dHash/pHash) and the banded near-dup
  * candidate tier: hand-computed dhash bits, closed-form pHash corners
  * (flat image, DC dominance), re-encode invariance (the property the
  * tier exists for), perturbation locality vs unrelated separation, and
  * the end-to-end pair surface of [[Multimodal.imageNearDupCandidates]]. */
class ImageHashSpec extends SparkSpec {

  // dims > the 9×8 dhash grid so adjacent grid cells sample distinct
  // source pixels (the q132 fixture rule)
  private def pix(id: Long, w: Int, h: Int,
      f: (Long, Int) => Long = (v, _) => v): Array[Byte] =
    Array.tabulate[Byte](w * h * 3)(k =>
      (f((id + 13L * k + (id % 7 + 1) * k.toLong * k) % 256, k) % 256).toByte)

  private def img(id: Long, w: Int = 16, h: Int = 12): Array[Byte] =
    Multimodal.encodePpmP6(w, h, 255, pix(id, w, h))

  private def hashesOf(rows: Seq[Multimodal.MediaRow])
      : Map[Long, Multimodal.ImageHashRow] = {
    import spark.implicits._
    Multimodal.imageHashes(rows.toDF(), "id", "payload")
      .collect().map(r => r.id -> r).toMap
  }

  test("dhash bits match the hand formula (9×8 nearest grid, g(c) > g(c+1))") {
    val w = 16; val h = 12; val id = 7L
    val p = pix(id, w, h)
    def gray(sy: Int, sx: Int): Long =
      (0 until 3).map(c => p((sy * w + sx) * 3 + c) & 0xff).sum.toLong
    var expect = 0L
    for (r <- 0 until 8; c <- 0 until 8) {
      val sy = r * h / 8
      if (gray(sy, c * w / 9) > gray(sy, (c + 1) * w / 9))
        expect |= 1L << (r * 8 + c)
    }
    val got = hashesOf(Seq(Multimodal.MediaRow(id, img(id))))(id)
    assert(got.dhash == expect)
    assert(got.width == w && got.height == h)
  }

  test("pHash closed forms: flat image → only the DC bit; non-flat sets more") {
    val flatPix = Array.fill[Byte](16 * 12 * 3)(100.toByte)
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodePpmP6(16, 12, 255, flatPix)),
      Multimodal.MediaRow(2L, img(2L)))
    val m = hashesOf(rows)
    // flat: every AC coefficient is exactly 0, DC > 0; lower median of
    // {0×63, DC} is 0 → only bit 0 (u=v=0) exceeds it
    assert(m(1L).phash == 1L, s"flat pHash was ${m(1L).phash}")
    // flat dhash: all gradients 0, no strict > anywhere
    assert(m(1L).dhash == 0L)
    // a textured image must set a nontrivial bit pattern (more than DC,
    // fewer than all — median thresholding guarantees ≤ 32 bits above)
    val bits = java.lang.Long.bitCount(m(2L).phash)
    assert(bits > 1 && bits <= 32, s"pHash popcount $bits")
  }

  test("re-encode invariance: a '#'-comment header changes neither hash") {
    val id = 11L
    val p = pix(id, 16, 12)
    val rows = Seq(
      Multimodal.MediaRow(id, Multimodal.encodePpmP6(16, 12, 255, p)),
      Multimodal.MediaRow(id + 1000L,
        Multimodal.encodePpmP6Commented(16, 12, 255, p, "second writer")))
    val m = hashesOf(rows)
    assert(!java.util.Arrays.equals(
      rows.head.payload, rows(1).payload), "payloads must differ in bytes")
    assert(m(id).dhash == m(id + 1000L).dhash)
    assert(m(id).phash == m(id + 1000L).phash)
  }

  test("perturbation locality: small pixel edits land near, unrelated far") {
    val id = 23L
    val base = Multimodal.MediaRow(id, img(id))
    // q132's perturbation: +8 on every 7th pixel byte
    val pert = Multimodal.MediaRow(id + 1000L,
      Multimodal.encodePpmP6(16, 12, 255,
        pix(id, 16, 12, (v, k) => v + (if (k % 7 == 0) 8 else 0))))
    val other = Multimodal.MediaRow(900L, img(900L))
    val m = hashesOf(Seq(base, pert, other))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(id).dhash, m(id + 1000L).dhash) <= 10,
      s"perturbed dhash drifted ${ham(m(id).dhash, m(id + 1000L).dhash)}")
    assert(ham(m(id).phash, m(id + 1000L).phash) <= 10,
      s"perturbed phash drifted ${ham(m(id).phash, m(id + 1000L).phash)}")
    assert(ham(m(id).dhash, m(900L).dhash) > 10,
      s"unrelated dhash too close: ${ham(m(id).dhash, m(900L).dhash)}")
  }

  test("pHash cos table: every entry ≥1e-3 from a rounding boundary") {
    // the q133 oracle re-derives round(32768·cos(π(2k+1)j/64)) in
    // DuckDB's libm; cross-libm cos drift is ≤1e-8 absolute at this
    // scale, so a healthy distance from every .5 rounding boundary is
    // what makes the two engines' integer tables identical — the same
    // margin methodology as BoundaryMarginSpec (q81/q86 class)
    for (j <- 0 until 32; k <- 0 until 32) {
      val v = math.cos(math.Pi * (2 * k + 1) * j / 64.0) * 32768.0
      val frac = math.abs(v - math.floor(v) - 0.5)
      assert(frac > 1e-3, f"entry ($j,$k) = $v%.9f sits $frac%.2e from a boundary")
    }
  }

  test("non-PPM payloads produce no hash row (decode-filter contract)") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, img(1L)),
      Multimodal.MediaRow(2L, "not an image at all".getBytes("US-ASCII")),
      Multimodal.MediaRow(3L, Array[Byte]('P', '6')))
    val out = Multimodal.imageHashes(rows.toDF(), "id", "payload").collect()
    assert(out.map(_.id).toSeq == Seq(1L))
  }

  test("imageNearDupCandidates: re-encode pair at Hamming 0, by both hashes") {
    import spark.implicits._
    val id = 41L
    val p = pix(id, 16, 12)
    val corpus = Seq(
      Multimodal.MediaRow(id, Multimodal.encodePpmP6(16, 12, 255, p)),
      Multimodal.MediaRow(id + 1000L,
        Multimodal.encodePpmP6Commented(16, 12, 255, p, "mirror copy")),
      Multimodal.MediaRow(77L, img(77L)),
      Multimodal.MediaRow(113L, img(113L))).toDF()
    for (by <- Seq("dhash", "phash")) {
      val pairs = Multimodal.imageNearDupCandidates(
          corpus, "id", "payload", maxHamming = 3, by = by)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getAs[Number](2).longValue()))
      assert(pairs.contains((id, id + 1000L, 0L)),
        s"$by missed the exact re-encode pair: ${pairs.toSeq}")
    }
  }

  test("flat images drop out of the candidate tier (zero-sig flood rule)") {
    import spark.implicits._
    // two flat images are Hamming-0 'duplicates' of each other on dhash
    // (both 0) — exactly the degenerate bucket the tier must NOT pair
    val flat = Array.fill[Byte](16 * 12 * 3)(55.toByte)
    val corpus = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodePpmP6(16, 12, 255, flat)),
      Multimodal.MediaRow(2L, Multimodal.encodePpmP6(16, 12, 255, flat)),
      Multimodal.MediaRow(3L, img(3L))).toDF()
    val pairs = Multimodal.imageNearDupCandidates(
      corpus, "id", "payload", maxHamming = 10).collect()
    assert(pairs.isEmpty, pairs.mkString(","))
  }
}
