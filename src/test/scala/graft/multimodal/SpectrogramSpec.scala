package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** STFT spectrogram pins: FFT ≡ direct DFT on an arbitrary deterministic
  * signal, a pure tone concentrates in its bin, stereo mono-mix equals
  * the equivalent mono signal, and the framing/edge contract. */
class SpectrogramSpec extends SparkSpec {

  private val win = 64
  private val hop = 32

  private def wavOf(samples: Array[Short], ch: Int = 1, rate: Int = 8000) =
    Multimodal.encodeWavPcm16(rate, ch, samples)

  private def spectro(payloads: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    Multimodal.audioSpectrogram(
      payloads.toDF("id", "payload"), "id", "payload", win, hop)
  }

  test("FFT spectrogram equals a direct DFT reference") {
    val n = 100
    val s = Array.tabulate[Short](n)(t => (((t * 7919 + 31) % 65536) - 32768).toShort)
    val rows = spectro(Seq((1L, wavOf(s))))
      .collect().map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    val x = s.map(_ / 32768.0)
    val nf = (n - win) / hop + 1
    assert(rows.keys.map(_._1).max == nf - 1)
    for (f <- 0 until nf; j <- 0 to win / 2) {
      val re = (0 until win).map(t => x(f * hop + t) * math.cos(2 * math.Pi * j * t / win)).sum
      val im = (0 until win).map(t => x(f * hop + t) * math.sin(2 * math.Pi * j * t / win)).sum
      val ref = math.sqrt(re * re + im * im)
      assert(math.abs(rows((f, j)) - ref) < 1e-9, s"f=$f j=$j")
    }
  }

  test("pure tone concentrates in its bin") {
    val s = Array.tabulate[Short](win)(t =>
      (math.sin(2 * math.Pi * 4 * t / win) * 16384).toShort)
    val rows = spectro(Seq((1L, wavOf(s))))
      .collect().map(r => r.getInt(2) -> r.getDouble(3)).toMap
    // |X[4]| ≈ (win/2)·amp = 32·0.5 = 16; all other bins near zero
    assert(math.abs(rows(4) - 16.0) < 0.1, s"bin4=${rows(4)}")
    (0 to win / 2).filter(_ != 4).foreach(j =>
      assert(rows(j) < 0.1, s"leak at bin $j: ${rows(j)}"))
  }

  test("stereo with L=R equals the mono signal") {
    val mono = Array.tabulate[Short](80)(t => (((t * 541 + 7) % 65536) - 32768).toShort)
    val stereo = Array.tabulate[Short](160)(k => mono(k / 2))
    val a = spectro(Seq((1L, wavOf(mono))))
      .orderBy("frame", "bin").collect().map(_.getDouble(3)).toSeq
    val b = spectro(Seq((2L, wavOf(stereo, ch = 2))))
      .orderBy("frame", "bin").collect().map(_.getDouble(3)).toSeq
    assert(a == b)
  }

  test("non-WAV and shorter-than-window payloads yield no rows") {
    val short = Array.tabulate[Short](win - 1)(_.toShort)
    val rows = spectro(Seq(
      (1L, "not a wav at all".getBytes("US-ASCII")),
      (2L, wavOf(short)),
      (3L, wavOf(Array.tabulate[Short](win)(_.toShort)))))
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(rows == Set(3L)) // exactly-one-window edge included
  }
}
