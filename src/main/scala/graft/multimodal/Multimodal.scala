package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract / resize / frame-sample run as
  * per-partition batch transforms (`mapPartitions` over a typed Dataset —
  * the JVM analogue of `mapInPandas` batch iteration: one iterator pull per
  * partition, bounded memory, partition-preserving).
  *
  * Header-parseable formats get REAL pure-JVM codecs: WAV (RIFF PCM,
  * 8/16-bit — chunk walk, fmt/data parse, per-sample stats) and PPM P6
  * (token header with comment support, raw RGB stats), both spec'd by
  * encode→decode round-trip and hash-gated against a closed-form oracle
  * (q79). Formats the sandbox genuinely cannot decode (JPEG/MP3/video
  * codecs) keep the DETERMINISTIC STUB `decodeBytes`: pseudo-metadata and
  * a 16-bin byte histogram from the payload bytes, so the Spark-side
  * contract (schema, batch iteration, partitioning, feature shapes) stays
  * real and testable; swapping in a codec only replaces the pure decode
  * function, as [[decodeMedia]]'s magic-byte dispatch shows.
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class ImageFeatures(
      id: Long, width: Int, height: Int, channels: Int,
      histogram: Array[Double])
  final case class FrameSample(id: Long, frameIndex: Int, features: Array[Double])

  /** STUB decode: pseudo width/height from a modular rolling hash of the
    * bytes (pure mod-2^31−1 arithmetic so any engine can replicate it for
    * differential testing), 16-bin byte-value histogram as the
    * "embedding". Deterministic. */
  def decodeBytes(payload: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    var h = 17L
    var i = 0
    while (i < payload.length) {
      h = (31 * h + (payload(i) & 0xff)) % 2147483647L
      i += 1
    }
    val width = 16 + (h % 625).toInt
    val height = 16 + ((h / 625) % 465).toInt
    val hist = new Array[Double](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1)
    val n = math.max(1, payload.length)
    (width, height, 3, hist.map(_ / n))
  }

  /** Decode a binary column into typed image features — one batch pass per
    * partition, no shuffle; schema is a flat struct + fixed-length feature
    * array (columnar-friendly at any scale). */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): Dataset[ImageFeatures] = {
    val ds = df.select(col(idCol).cast("long").as("id"),
      col(binCol).cast("binary").as("payload")).as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c, hist) = decodeBytes(r.payload)
        ImageFeatures(r.id, w, h, c, hist)
      }
    }(Encoders.product[ImageFeatures])
  }

  /** STUB video frame-sampling: treat the payload as `fps`-chunked frames;
    * emit one feature row per sampled frame (every `stride`-th chunk). The
    * explode happens partition-locally — output is narrow (id, frame,
    * features), never the raw payload. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 256, stride: Int = 4): Dataset[FrameSample] = {
    val ds = df.select(col(idCol).cast("long").as("id"),
      col(binCol).cast("binary").as("payload")).as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, idx) =>
            FrameSample(r.id, idx, decodeBytes(chunk)._4)
          }
      }
    }(Encoders.product[FrameSample])
  }

  /** Audio stub: duration estimate from byte length at a nominal bitrate —
    * a pure column expression (no decode needed for metadata-level ops). */
  def audioDurationSec(binCol: org.apache.spark.sql.Column,
      bytesPerSec: Int = 16000): org.apache.spark.sql.Column =
    octet_length(binCol).cast("double") / bytesPerSec

  // ---- real pure-JVM codecs (WAV RIFF/PCM, PPM P6) --------------------

  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
      frames: Long, sampleSum: Long)
  final case class PpmMeta(width: Int, height: Int, maxVal: Int, pixelSum: Long)

  /** Canonical 44-byte-header PCM16 WAV encoder (test/generator side of
    * the round-trip; little-endian throughout, interleaved samples). */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels >= 1 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort); bb.putInt(sampleRate)
    bb.putInt(sampleRate * channels * 2) // byte rate
    bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Binary PPM (P6) encoder: ASCII token header + raw RGB. */
  def encodePpmP6(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && maxVal > 0 && maxVal <= 255 &&
      pixels.length == width * height * 3)
    s"P6\n$width $height\n$maxVal\n".getBytes("US-ASCII") ++ pixels
  }

  /** Real WAV decoder: RIFF/WAVE chunk walk (odd-size padding honored,
    * unknown chunks skipped), `fmt ` must declare integer PCM (format 1)
    * at 8 or 16 bits; the `data` chunk is summed sample-by-sample (8-bit
    * is unsigned-offset-128 per the spec). None on any malformed input —
    * callers fall back to the stub tier. */
  def decodeWavPcm(bytes: Array[Byte]): Option[WavMeta] = {
    if (bytes.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def str4(off: Int) = new String(bytes, off, 4, "US-ASCII")
    if (str4(0) != "RIFF" || str4(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (format, ch, rate, bits)
    while (pos + 8 <= bytes.length) {
      val cid = str4(pos)
      val sz = bb.getInt(pos + 4)
      if (sz < 0 || pos + 8 + sz > bytes.length) return None
      if (cid == "fmt " && sz >= 16) {
        fmt = Some((bb.getShort(pos + 8) & 0xffff, bb.getShort(pos + 10) & 0xffff,
          bb.getInt(pos + 12), bb.getShort(pos + 22) & 0xffff))
      } else if (cid == "data") {
        fmt match {
          case Some((1, ch, rate, bits))
              if (bits == 8 || bits == 16) && ch >= 1 && rate > 0 =>
            val bytesPer = bits / 8
            val n = sz / bytesPer
            var sum = 0L
            var i = 0
            while (i < n) {
              val off = pos + 8 + i * bytesPer
              sum += (if (bits == 16) bb.getShort(off).toLong
                      else ((bytes(off) & 0xff) - 128).toLong)
              i += 1
            }
            return Some(WavMeta(rate, ch, bits, n.toLong / ch, sum))
          case _ => return None // data before fmt, or non-PCM
        }
      }
      pos += 8 + sz + (sz & 1) // chunks pad to even length
    }
    None
  }

  /** Decoded, channel-averaged, [-1, 1]-normalized WAV samples — the
    * input surface for audio feature extraction ([[audioSpectrogram]]).
    * Runs the SAME chunk walk as [[decodeWavPcm]] (format/bits/bounds
    * rules identical) but materializes the mono mix instead of the
    * checksum: x[t] = mean over channels of s/32768 (16-bit) or
    * (u−128)/128 (8-bit). None on any malformed input. */
  def decodeWavSamplesMono(bytes: Array[Byte]): Option[(WavMeta, Array[Double])] =
    decodeWavPcm(bytes).map { meta =>
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def str4(off: Int) = new String(bytes, off, 4, "US-ASCII")
      // re-locate the data chunk (decodeWavPcm validated the walk)
      var pos = 12
      var dataOff = -1
      while (dataOff < 0) {
        val sz = bb.getInt(pos + 4)
        if (str4(pos) == "data") dataOff = pos + 8
        else pos += 8 + sz + (sz & 1)
      }
      val ch = meta.channels
      val bytesPer = meta.bitsPerSample / 8
      val n = meta.frames.toInt
      val x = new Array[Double](n)
      var t = 0
      while (t < n) {
        var acc = 0.0
        var c = 0
        while (c < ch) {
          val off = dataOff + (t * ch + c) * bytesPer
          acc += (if (meta.bitsPerSample == 16) bb.getShort(off) / 32768.0
                  else ((bytes(off) & 0xff) - 128) / 128.0)
          c += 1
        }
        x(t) = acc / ch
        t += 1
      }
      (meta, x)
    }

  final case class SpectrogramRow(id: Long, frame: Int, bin: Int, mag: Double)

  /** STFT magnitude spectrogram over PCM WAV payloads — the audio
    * feature-extraction stage of a multimodal training pipeline (speech
    * data curation computes exactly this before any learned featurizer).
    * Rectangular window of `win` samples every `hop`; output one row per
    * (payload, frame, bin 0..win/2) with |X[bin]| of the channel-averaged
    * normalized signal. Scan-shaped: decode + FFT run per partition with
    * no shuffle ([[decodeMedia]]'s batch contract); the FFT is
    * O(win log win) per frame via JTransforms (the [[graft.spectral]]
    * scale path applied to audio). Non-WAV or shorter-than-window
    * payloads yield no rows. */
  def audioSpectrogram(df: DataFrame, idCol: String, binCol: String,
      win: Int = 64, hop: Int = 32): DataFrame = {
    require(win >= 2 && win % 2 == 0 && hop > 0, s"bad win=$win hop=$hop")
    val ds = df.select(col(idCol).cast("long").as("id"),
      col(binCol).cast("binary").as("payload")).as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWavSamplesMono(r.payload) match {
          case Some((_, x)) if x.length >= win =>
            val nf = (x.length - win) / hop + 1
            val fft = new org.jtransforms.fft.DoubleFFT_1D(win)
            (0 until nf).iterator.flatMap { f =>
              // realForwardFull: full complex spectrum in-place over
              // 2·win slots (buf[2j]=re, buf[2j+1]=im)
              val buf = new Array[Double](2 * win)
              var t = 0
              while (t < win) { buf(t) = x(f * hop + t); t += 1 }
              fft.realForwardFull(buf)
              (0 to win / 2).iterator.map { j =>
                SpectrogramRow(r.id, f, j,
                  math.sqrt(buf(2 * j) * buf(2 * j) + buf(2 * j + 1) * buf(2 * j + 1)))
              }
            }
          case _ => Iterator.empty
        }
      }
    }(Encoders.product[SpectrogramRow]).toDF()
  }

  /** PPM P6 header walk: whitespace-separated tokens with `#` comment
    * support, maxVal ≤ 255 (single-byte samples), exactly one whitespace
    * byte before the raw RGB block. Returns (width, height, maxVal,
    * dataOffset) with the full pixel block verified present. */
  private def ppmHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def nextToken(): String = {
      while (pos < bytes.length &&
          (Character.isWhitespace(bytes(pos)) || bytes(pos) == '#')) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val st = pos
      while (pos < bytes.length && !Character.isWhitespace(bytes(pos))) pos += 1
      new String(bytes, st, pos - st, "US-ASCII")
    }
    val (w, h, mv) =
      try { (nextToken().toInt, nextToken().toInt, nextToken().toInt) }
      catch { case _: NumberFormatException => return None }
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) return None
    pos += 1 // the single whitespace byte after maxVal
    val n = w.toLong * h * 3
    if (n > Int.MaxValue || pos + n > bytes.length) return None
    Some((w, h, mv, pos))
  }

  /** Real PPM P6 decoder (metadata + exact pixel-byte checksum). */
  def decodePpmP6(bytes: Array[Byte]): Option[PpmMeta] =
    ppmHeader(bytes).map { case (w, h, mv, pos) =>
      val n = w * h * 3
      var sum = 0L
      var i = 0
      while (i < n) { sum += bytes(pos + i) & 0xff; i += 1 }
      PpmMeta(w, h, mv, sum)
    }

  /** A resized image row: the re-encoded PPM payload plus the per-channel
    * pixel sums of the RESIZED image (the closed-form surface the q95
    * oracle replays). */
  final case class ResizedPpm(id: Long, srcWidth: Int, srcHeight: Int,
      outWidth: Int, outHeight: Int, payload: Array[Byte],
      rSum: Long, gSum: Long, bSum: Long)

  /** Nearest-neighbor image resize over PPM P6 payloads — the standard
    * strided sampling `src(y·h div outH, x·w div outW)` (pure integer
    * index arithmetic, so the whole transform replays in SQL on planted
    * closed-form images). Scan-shaped mapPartitions: decode → sample →
    * re-encode per row, no shuffle anywhere; non-PPM or malformed
    * payloads produce no row (the filter semantics of every decode tier).
    * Anti-aliased/bilinear kernels belong to the native-library stub tier
    * (JPEG/PNG boundary, README Known gaps). */
  def resizePpmNearest(df: DataFrame, idCol: String, binCol: String,
      outW: Int, outH: Int): Dataset[ResizedPpm] = {
    require(outW > 0 && outH > 0, s"bad output size ${outW}x$outH")
    // mirror the decoder's n > Int.MaxValue guard: a 50000×50000 request
    // would overflow outW*outH*3 into a NegativeArraySizeException
    require(outW.toLong * outH * 3 <= Int.MaxValue,
      s"output size ${outW}x$outH exceeds the byte-array limit")
    val ds = df.select(col(idCol).cast("long").as("id"),
      col(binCol).cast("binary").as("payload")).as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        ppmHeader(r.payload).map { case (w, h, mv, pos) =>
          val out = new Array[Byte](outW * outH * 3)
          var rs = 0L; var gs = 0L; var bs = 0L
          var y = 0
          while (y < outH) {
            val sy = (y.toLong * h / outH).toInt
            var x = 0
            while (x < outW) {
              val sx = (x.toLong * w / outW).toInt
              val src = pos + (sy * w + sx) * 3
              val dst = (y * outW + x) * 3
              val pr = r.payload(src) & 0xff
              val pg = r.payload(src + 1) & 0xff
              val pb = r.payload(src + 2) & 0xff
              out(dst) = pr.toByte; out(dst + 1) = pg.toByte; out(dst + 2) = pb.toByte
              rs += pr; gs += pg; bs += pb
              x += 1
            }
            y += 1
          }
          ResizedPpm(r.id, w, h, outW, outH, encodePpmP6(outW, outH, mv, out),
            rs, gs, bs)
        }
      }
    }(Encoders.product[ResizedPpm])
  }

  /** [[encodePpmP6]] with a `#` comment line in the header — a
    * VISUALLY-IDENTICAL RE-ENCODE of the same pixels (the P6 grammar
    * allows comments between header tokens; [[decodePpmP6]] and every
    * consumer here skip them), used to plant byte-different/
    * pixel-identical duplicates for the perceptual-hash tier. */
  def encodePpmP6Commented(width: Int, height: Int, maxVal: Int,
      pixels: Array[Byte], comment: String): Array[Byte] = {
    require(!comment.contains("\n"), "single-line comment")
    require(width > 0 && height > 0 && maxVal > 0 && maxVal <= 255 &&
      pixels.length == width * height * 3)
    s"P6\n# $comment\n$width $height\n$maxVal\n".getBytes("US-ASCII") ++ pixels
  }

  /** Per-image 64-bit perceptual hashes (`dhash`, `phash`) decoded from a
    * PPM payload column — the image analogue of the text near-dup
    * signatures (q19's simhash), feeding the same banded candidate tier
    * ([[imageNearDupCandidates]]). */
  final case class ImageHashRow(id: Long, width: Int, height: Int,
      dhash: Long, phash: Long)

  /** Integer DCT-II basis for [[imageHashes]]' pHash, scaled 2¹⁵:
    * `C(j,k) = round(cos(π·(2k+1)·j / 64) · 32768)`. A fixed-point table
    * keeps the whole transform in exact Long arithmetic (deterministic
    * across JVMs/engines — no libm/FMA variance on a hashed surface);
    * the uniform 2³⁰ scale cancels in the median threshold. */
  private val DctC: Array[Array[Long]] = Array.tabulate(32, 32) { (j, k) =>
    math.round(math.cos(math.Pi * (2 * k + 1) * j / 64.0) * 32768.0)
  }

  /** Decode → grayscale → two standard perceptual hashes, scan-shaped
    * (mapPartitions, no shuffle; non-PPM payloads produce no row — the
    * filter semantics of every decode tier). Grayscale is the exact
    * integer channel sum `r+g+b` (0..765) — no luma division, nothing to
    * round. Both hashes sample the source through the [[resizePpmNearest]]
    * index map `src(y·h div outH, x·w div outW)`, so every stage is pure
    * integer arithmetic a SQL oracle replays on planted closed-form
    * images:
    *  - `dhash` (difference hash, public algorithm): 9×8 grid; bit
    *    `r·8+c` = 1 iff `g(r,c) > g(r,c+1)` — 8 horizontal gradients per
    *    row.
    *  - `phash` (DCT hash, public pHash algorithm): 32×32 grid → 2-D
    *    integer DCT-II ([[DctC]]) → top-left 8×8 low-frequency block →
    *    bit `u·8+v` = 1 iff the coefficient exceeds the block's LOWER
    *    MEDIAN (sorted index 31 of the 64, DC included — ties toward 0
    *    bits, deterministic).
    * Re-encoding the same pixels (header comments, whitespace) cannot
    * change either hash; near-identical pixels land within small Hamming
    * distance. */
  def imageHashes(df: DataFrame, idCol: String, binCol: String)
      : Dataset[ImageHashRow] = {
    val ds = df.select(col(idCol).cast("long").as("id"),
      col(binCol).cast("binary").as("payload")).as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        ppmHeader(r.payload).map { case (w, h, _, pos) =>
          @inline def gray(sy: Int, sx: Int): Long = {
            val p = pos + (sy * w + sx) * 3
            ((r.payload(p) & 0xff) + (r.payload(p + 1) & 0xff) +
              (r.payload(p + 2) & 0xff)).toLong
          }
          var dh = 0L
          var row = 0
          while (row < 8) {
            val sy = (row.toLong * h / 8).toInt
            var c = 0
            while (c < 8) {
              if (gray(sy, (c.toLong * w / 9).toInt) >
                  gray(sy, ((c + 1).toLong * w / 9).toInt))
                dh |= 1L << (row * 8 + c)
              c += 1
            }
            row += 1
          }
          // pHash: g32 (32×32 sampled grays) → A = C·g32 → F = A·Cᵀ
          val g32 = Array.ofDim[Long](32, 32)
          var y = 0
          while (y < 32) {
            val sy = (y.toLong * h / 32).toInt
            var x = 0
            while (x < 32) {
              g32(y)(x) = gray(sy, (x.toLong * w / 32).toInt)
              x += 1
            }
            y += 1
          }
          val a = Array.ofDim[Long](8, 32) // only the 8 low u rows matter
          var u = 0
          while (u < 8) {
            var x = 0
            while (x < 32) {
              var s = 0L; var k = 0
              while (k < 32) { s += DctC(u)(k) * g32(k)(x); k += 1 }
              a(u)(x) = s
              x += 1
            }
            u += 1
          }
          val f = new Array[Long](64)
          u = 0
          while (u < 8) {
            var v = 0
            while (v < 8) {
              var s = 0L; var k = 0
              while (k < 32) { s += a(u)(k) * DctC(v)(k); k += 1 }
              f(u * 8 + v) = s
              v += 1
            }
            u += 1
          }
          val sorted = f.clone(); java.util.Arrays.sort(sorted)
          val med = sorted(31)
          var ph = 0L
          var i = 0
          while (i < 64) { if (f(i) > med) ph |= 1L << i; i += 1 }
          ImageHashRow(r.id, w, h, dh, ph)
        }
      }
    }(Encoders.product[ImageHashRow])
  }

  /** Image near-duplicate candidate PAIRS — the multimodal member of the
    * dedup family (a 100 TB multimodal pipeline dedups the images, not
    * just their captions): decode each payload to its perceptual hashes
    * ([[imageHashes]]) and run the SAME 4×16-bit banded candidate tier
    * text simhash uses ([[graft.dedup.Dedup.simhashCandidates]] —
    * pigeonhole-complete to Hamming `64/bandBits − 1`, bucket-local
    * quadratic only, bodies never shuffle; only (band, id, sig) triples
    * move). `by` picks the signature: `"dhash"` (gradient structure —
    * exact re-encodes and small pixel edits) or `"phash"` (DCT
    * low-frequency structure — more tolerant of local noise). Hash-0
    * signatures (uniform/flat images, all-equal gradients) are dropped by
    * the tier's standard flood rule — flat images are exact-dedup's job.
    * Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤ `maxHamming`. */
  def imageNearDupCandidates(df: DataFrame, idCol: String, binCol: String,
      maxHamming: Int = 10, bandBits: Int = 16,
      by: String = "dhash"): DataFrame = {
    require(by == "dhash" || by == "phash", s"by must be dhash|phash: $by")
    graft.dedup.Dedup.simhashCandidates(
      imageHashes(df, idCol, binCol).toDF(), "id", by,
      bandBits = bandBits, maxHamming = maxHamming)
  }

  /** Unified decoded-media features: real fields where the codec applies,
    * zero elsewhere; `contentSum` is the exact decoded-content checksum
    * (WAV signed-sample sum / PPM pixel-byte sum / stub byte sum) — the
    * closed-form surface the q79 oracle replays. */
  final case class MediaFeatures(id: Long, kind: String, width: Int,
      height: Int, channels: Int, sampleRate: Int, frames: Long,
      durationSec: Double, contentSum: Long)

  /** Magic-byte dispatch decode: RIFF/WAVE → real WAV parse, P6 → real
    * PPM parse, anything else (or a malformed header) → the deterministic
    * stub tier. Same mapPartitions batch shape as [[decodeImages]]. */
  def decodeMedia(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val ds = df.select(col(idCol).cast("long").as("id"),
      col(binCol).cast("binary").as("payload")).as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.map { r =>
        val b = r.payload
        val wav = if (b.length >= 12 && b(0) == 'R' && b(1) == 'I')
          decodeWavPcm(b) else None
        lazy val ppm = if (b.length >= 2 && b(0) == 'P' && b(1) == '6')
          decodePpmP6(b) else None
        wav match {
          case Some(m) => MediaFeatures(r.id, "wav", 0, 0, m.channels,
            m.sampleRate, m.frames, m.frames.toDouble / m.sampleRate, m.sampleSum)
          case None => ppm match {
            case Some(m) => MediaFeatures(r.id, "ppm", m.width, m.height, 3,
              0, m.width.toLong * m.height, 0.0, m.pixelSum)
            case None =>
              val (w, h, c, _) = decodeBytes(b)
              var sum = 0L; var i = 0
              while (i < b.length) { sum += b(i) & 0xff; i += 1 }
              MediaFeatures(r.id, "stub", w, h, c, 0, 0L, 0.0, sum)
          }
        }
      }
    }(Encoders.product[MediaFeatures])
  }
}
