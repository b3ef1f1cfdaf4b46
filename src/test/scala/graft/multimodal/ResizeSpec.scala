package graft.multimodal

import graft.SparkSpec

/** Nearest-neighbor PPM resize: identity round-trip, strided downsample
  * pixel selection, and the malformed-payload filter contract. */
class ResizeSpec extends SparkSpec {

  private def planted(id: Long, w: Int, h: Int): Array[Byte] =
    Multimodal.encodePpmP6(w, h, 255,
      Array.tabulate[Byte](w * h * 3)(k => ((id + k.toLong * 13) % 256).toByte))

  test("identity resize re-encodes the exact source payload") {
    import spark.implicits._
    val src = planted(5L, 6, 4)
    val df = Seq(Multimodal.MediaRow(5L, src)).toDF()
    val out = Multimodal.resizePpmNearest(df, "id", "payload", 6, 4).head()
    assert(out.payload.toSeq == src.toSeq,
      "outW=w/outH=h must reproduce the canonical encoding byte-for-byte")
    assert(out.srcWidth == 6 && out.srcHeight == 4)
  }

  test("2x downsample selects the strided pixels and sums them") {
    import spark.implicits._
    val w = 4; val h = 4
    val df = Seq(Multimodal.MediaRow(9L, planted(9L, w, h))).toDF()
    val out = Multimodal.resizePpmNearest(df, "id", "payload", 2, 2).head()
    // out(y, x) = src(2y, 2x); channel sums over {(0,0),(0,2),(2,0),(2,2)}
    def v(k: Long) = (9L + k * 13) % 256
    def px(sy: Int, sx: Int, c: Int) = v(((sy * w + sx) * 3 + c).toLong)
    val srcs = Seq((0, 0), (0, 2), (2, 0), (2, 2))
    assert(out.rSum == srcs.map { case (y, x) => px(y, x, 0) }.sum)
    assert(out.gSum == srcs.map { case (y, x) => px(y, x, 1) }.sum)
    assert(out.bSum == srcs.map { case (y, x) => px(y, x, 2) }.sum)
    // the re-encoded payload decodes to the same sums
    val meta = Multimodal.decodePpmP6(out.payload).get
    assert(meta.width == 2 && meta.height == 2)
    assert(meta.pixelSum == out.rSum + out.gSum + out.bSum)
  }

  test("upscale repeats source pixels; malformed payloads drop") {
    import spark.implicits._
    val df = Seq(
      Multimodal.MediaRow(1L, planted(1L, 2, 2)),
      Multimodal.MediaRow(2L, "not an image".getBytes("US-ASCII"))).toDF()
    val rows = Multimodal.resizePpmNearest(df, "id", "payload", 4, 4).collect()
    assert(rows.length == 1 && rows.head.id == 1L, "non-PPM row filtered")
    val out = rows.head
    // each source pixel covers a 2x2 block → sums are 4x the source sums
    def v(k: Long) = (1L + k * 13) % 256
    val srcR = (0 until 4).map(p => v((p * 3).toLong)).sum
    assert(out.rSum == 4 * srcR)
  }
}
