package graft.ext

/** MPEG-1 Audio Layer I codec (ISO/IEC 11172-3) — the LOSSY audio
  * tier, replacing the former stand-in fake (now the format-blind
  * [[Multimodal.ByteHistogram]]) with a real wire format. The reference pipeline has no audio at all (its
  * largest media is a JSON blob — glue/data_ingestion_s3.py:30); this
  * tier exists for the training-data north star, where crawl audio
  * arrives MPEG-coded.
  *
  * What is TABLE-EXACT per the public spec:
  *  - frame header fields and the Layer I bitrate table
  *    (§2.4.2.3: 32..448 kbps) and sampling-rate table (44.1/48/32 kHz);
  *  - the optional CRC-16 (polynomial x^16+x^15+x^2+1, protecting the
  *    header tail + bit allocation, §2.4.3.1);
  *  - Layer I bit allocation (4-bit codes, nb = code+1 ∈ 2..15, code
  *    15 forbidden) and the 6-bit scalefactor indices with the
  *    CLOSED-FORM table sf(i) = 2·2^(−i/3) (Table B.1 is exactly this
  *    geometric sequence);
  *  - the requantization formula s″ = (2^nb/(2^nb−1))·(s‴ + 2^(1−nb))
  *    with s‴ in inverted-MSB offset binary (§2.4.3.3);
  *  - the polyphase structure: 32-subband cosine modulation with the
  *    exact matrixing N(i,k) = cos((16+i)(2k+1)π/64) (synthesis,
  *    §2.4.3.2/Annex A) and M(i,k) = cos((2i+1)(k−16)π/64) (analysis,
  *    Annex C), the 512-tap windowed fold with the (−1)^⌊m/64⌋
  *    block-sign convention the fold implies.
  *
  * DISCLOSED approximation: the 512 printed prototype-window
  * coefficients (Table B.3) have no closed form and are not available
  * in this environment, so the prototype here is an analytic
  * frequency-sampled design with a root-raised-cosine band-edge
  * (power-complementary crossover — see `Proto`), gain and group
  * delay CALIBRATED at init by driving an impulse through the
  * unquantized cascade (measured: ~46-56 dB reconstruction across the
  * band, exact cancellation at band edges). Encoder and decoder share
  * the prototype, so the codec is self-consistent and `Mpeg1Spec`
  * pins reconstruction SNR; a third-party stream would decode with
  * the structural pipeline but a slightly different reconstruction
  * filter than the reference decoder (conformance in ISO 11172-4 is
  * an RMS bound, not bit-exactness).
  *
  * Gapless trim: MPEG frames are 384-sample quanta and the filterbank
  * has inherent delay, so — exactly like real-world LAME/iTunes
  * gapless playback — the encoder stores (delay, original length) as
  * an ancillary-data tag in the first frame's slack bits and the
  * decoder trims to the original samples. Without the tag the decoder
  * returns the raw frame-quantized output.
  *
  * Corrupt-safe: decode returns `Option`, never throws (the
  * Flac/Png/Gzip discipline), with a decode-bomb output cap.
  */
object Mpeg1 {

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ------------------------------------------------- public tables
  /** Layer I bitrates, kbps (index 0 = free format, unsupported). */
  private val BitratesL1 = Array(
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val SampleRates = Array(44100, 48000, 32000)

  /** Scalefactor table — Table B.1 IS the geometric sequence
    * 2·2^(−i/3), i = 0..62 (index 63 forbidden).
    */
  private val Scalefactors: Array[Double] =
    Array.tabulate(63)(i => 2.0 * StrictMath.pow(2.0, -i / 3.0))

  // ------------------------------------------ filterbank (calibrated)
  /** Analysis matrixing M(i,k) = cos((2i+1)(k−16)π/64). */
  private val MatA: Array[Array[Double]] = Array.tabulate(32, 64)((i, k) =>
    StrictMath.cos((2 * i + 1) * (k - 16) * StrictMath.PI / 64))

  /** Synthesis matrixing N(i,k) = cos((16+i)(2k+1)π/64). */
  private val MatS: Array[Array[Double]] = Array.tabulate(64, 32)((i, k) =>
    StrictMath.cos((16 + i) * (2 * k + 1) * StrictMath.PI / 64))

  /** Analytic prototype p[m], frequency-sampled on the 512-point grid
    * (bin spacing π/256; the π/64 band edge is bin 4) with a
    * ROOT-RAISED-COSINE transition of ±4 bins around the edge —
    * |P(ω)|² + |P(π/32 − ω)|² = 1 across the crossover by
    * construction, the power-complementarity a pseudo-QMF cosine bank
    * needs for a flat distortion function (a plain windowed sinc
    * crosses at −6 dB instead of −3 dB and costs ~25 dB of
    * reconstruction). Linear phase centered at tap 256 — the integer
    * center the ISO ±16 matrixing phases require for the alternating
    * ±π/4 alias-cancellation phases (the printed Table B.3 likewise
    * leads with 0.0: 511 effective taps around 256).
    */
  private val Proto: Array[Double] = {
    val edgeBin = 4.0 // π/64 on the 512-point grid
    val w = 4.0 // transition half-width in bins
    def amp(k: Int): Double =
      if (k <= edgeBin - w) 1.0
      else if (k >= edgeBin + w) 0.0
      else StrictMath.sqrt(
        0.5 * (1.0 + StrictMath.cos(StrictMath.PI * (k - (edgeBin - w)) / (2 * w))))
    Array.tabulate(512) { m =>
      val t = (m - 256).toDouble
      var acc = amp(0)
      var k = 1
      while (k < 256) {
        acc += 2.0 * amp(k) * StrictMath.cos(2 * StrictMath.PI * k * t / 512.0)
        k += 1
      }
      acc / 512.0
    }
  }

  /** The fold Y[k] = Σ_j Z[k+64j] makes the effective filter
    * h_i[m] = C[m]·(−1)^⌊m/64⌋·cos((2i+1)(m−16)π/64), so the window
    * carries the (−1)^⌊m/64⌋ block sign to realize prototype
    * modulation — the same sign pattern visible down the printed
    * Table B.3 columns.
    */
  private def blockSign(m: Int): Double = if (((m >> 6) & 1) == 0) 1.0 else -1.0

  private val WinC: Array[Double] =
    Array.tabulate(512)(m => Proto(m) * blockSign(m))

  /** Synthesis window before gain calibration (same sign rule — the
    * U-fold implies it identically, see the derivation in WinC's doc).
    */
  private val winDRaw: Array[Double] =
    Array.tabulate(512)(m => Proto(m) * blockSign(m))

  /** (gain, delay) calibrated by an impulse through the unquantized
    * analysis→synthesis cascade: `Delay` is where the impulse peaks,
    * `WinD` is winDRaw scaled so the cascade has unity gain there.
    * Pure deterministic init — no spec table required.
    */
  private val calibration: (Double, Int) = {
    val n = 1536
    val x = new Array[Double](n)
    x(384) = 1.0
    val y = cascade(x)
    var peak = 0.0; var at = 0
    var i = 0
    while (i < y.length) {
      if (StrictMath.abs(y(i)) > peak) { peak = StrictMath.abs(y(i)); at = i }
      i += 1
    }
    (y(at), at - 384)
  }

  /** Filterbank group delay in samples (analysis + synthesis). */
  private[ext] val Delay: Int = calibration._2

  private val WinD: Array[Double] = winDRaw.map(_ / calibration._1)

  /** Test probe: unquantized cascade with the calibrated window. */
  private[ext] def cascadeCalibrated(x: Array[Double]): Array[Double] = {
    val an = new Analysis
    val sy = new Synthesis(WinD)
    val out = new Array[Double](x.length)
    val s = new Array[Double](32)
    var t = 0
    while ((t + 1) * 32 <= x.length) {
      an.step(x, t * 32, s)
      sy.step(s, out, t * 32)
      t += 1
    }
    out
  }

  /** Unquantized float cascade (analysis → synthesis with the UNSCALED
    * winDRaw) — used only for gain/delay calibration at init.
    */
  private def cascade(x: Array[Double]): Array[Double] = {
    val an = new Analysis
    val sy = new Synthesis(winDRaw)
    val out = new Array[Double](x.length)
    val s = new Array[Double](32)
    var t = 0
    while ((t + 1) * 32 <= x.length) {
      an.step(x, t * 32, s)
      sy.step(s, out, t * 32)
      t += 1
    }
    out
  }

  /** Sliding analysis state (ISO Annex C figure C.4): 512-sample FIFO,
    * newest at X(0); each step consumes 32 samples → 32 subband values.
    */
  private final class Analysis {
    private val X = new Array[Double](512)
    def step(x: Array[Double], off: Int, outS: Array[Double]): Unit = {
      var i = 511
      while (i >= 32) { X(i) = X(i - 32); i -= 1 }
      i = 0
      while (i < 32) { X(31 - i) = x(off + i); i += 1 }
      val y = new Array[Double](64)
      var k = 0
      while (k < 64) {
        var acc = 0.0
        var j = 0
        while (j < 8) { acc += WinC(k + 64 * j) * X(k + 64 * j); j += 1 }
        y(k) = acc
        k += 1
      }
      var sb = 0
      while (sb < 32) {
        var acc = 0.0
        val row = MatA(sb)
        var kk = 0
        while (kk < 64) { acc += row(kk) * y(kk); kk += 1 }
        outS(sb) = acc
        sb += 1
      }
    }
  }

  /** Synthesis state (ISO Annex A figure 3-A.2): 1024-value V FIFO;
    * each step consumes 32 subband values → 32 output samples.
    */
  private final class Synthesis(win: Array[Double]) {
    private val V = new Array[Double](1024)
    def step(s: Array[Double], out: Array[Double], off: Int): Unit = {
      var i = 1023
      while (i >= 64) { V(i) = V(i - 64); i -= 1 }
      i = 0
      while (i < 64) {
        var acc = 0.0
        val row = MatS(i)
        var k = 0
        while (k < 32) { acc += row(k) * s(k); k += 1 }
        V(i) = acc
        i += 1
      }
      // U fold: U[64j+i] = V[128j+i]; U[64j+32+i] = V[128j+96+i]
      var r = 0
      while (r < 32) {
        var acc = 0.0
        var q = r
        while (q < 512) { // q = r + 32·i walks U; map U→V inline
          val j = q >> 6; val lo = q & 63
          val v = if (lo < 32) V(128 * j + lo) else V(128 * j + 96 + (lo - 32))
          acc += win(q) * v
          q += 32
        }
        out(off + r) = acc
        r += 1
      }
    }
  }

  // --------------------------------------------------------- encoder

  /** CRC-16 with polynomial 0x8005 over `nbits` bits of `data`
    * starting at bit offset `fromBit`, initial value 0xFFFF
    * (§2.4.3.1). Shared shape with Flac's framing CRC — same
    * generator polynomial, different init.
    */
  private def crc16(bits: Array[Byte], fromBit: Int, nbits: Int,
      init: Int = 0xffff): Int = {
    var c = init
    var i = 0
    while (i < nbits) {
      val bit = (bits((fromBit + i) >> 3) >> (7 - ((fromBit + i) & 7))) & 1
      val fb = ((c >> 15) & 1) ^ bit
      c = (c << 1) & 0xffff
      if (fb == 1) c ^= 0x8005
      i += 1
    }
    c
  }

  private final class BitWriter(capacity: Int) {
    val buf = new Array[Byte](capacity)
    var bitPos = 0
    def put(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        if (((v >> i) & 1) == 1) buf(bitPos >> 3) =
          (buf(bitPos >> 3) | (1 << (7 - (bitPos & 7)))).toByte
        bitPos += 1
        i -= 1
      }
    }
  }

  private final class BitReader(val data: Array[Byte]) {
    var bitPos = 0
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteAt = bitPos >> 3
        if (byteAt >= data.length) fail()
        v = (v << 1) | ((data(byteAt) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
  }

  /** The fixed encode profile: 32 kHz (index 2), 448 kbps (index 14)
    * → 12·448000/32000 = 168 slots = 672 bytes per frame, zero
    * padding drift; nb = 12 for every subband (alloc code 11) leaves
    * 352 slack bits per frame for the gapless tag + zero fill.
    */
  private val EncSampleRateIdx = 2
  private val EncBitrateIdx = 14
  private val EncFrameBytes = 12 * 448000 / 32000 * 4
  private val EncNb = 12
  private val EncAllocCode = EncNb - 1

  private val TagMagic = 0x47524654L // "GRFT"

  /** Mono PCM16 → MPEG-1 Layer I bytes. Output decodes back (via the
    * gapless tag) to exactly `samples.length` samples approximating
    * the input (Mpeg1Spec pins the SNR bound).
    */
  def encode(samples: Array[Short]): Array[Byte] = {
    val n = samples.length
    val frames = math.max(1, (n + Delay + 383) / 384)
    val fed = frames * 384
    val x = new Array[Double](fed)
    var i = 0
    while (i < n) { x(i) = samples(i) / 32768.0; i += 1 }
    val an = new Analysis
    val out = new java.io.ByteArrayOutputStream(frames * EncFrameBytes)
    val s = Array.ofDim[Double](12, 32)
    var f = 0
    while (f < frames) {
      var t = 0
      while (t < 12) { an.step(x, f * 384 + t * 32, s(t)); t += 1 }
      // scalefactor per subband: smallest table value covering max |s|
      val sfIdx = new Array[Int](32)
      var sb = 0
      while (sb < 32) {
        var mx = 0.0
        t = 0
        while (t < 12) {
          val a = StrictMath.abs(s(t)(sb)); if (a > mx) mx = a; t += 1
        }
        var idx = 62
        while (idx > 0 && Scalefactors(idx) < mx) idx -= 1
        require(Scalefactors(idx) >= mx, "subband sample out of [-2,2) range")
        sfIdx(sb) = idx
        sb += 1
      }
      val w = new BitWriter(EncFrameBytes)
      // header: sync, ID=1, layer I='11', protection=0 (CRC present)
      w.put(0xfff, 12); w.put(1, 1); w.put(3, 2); w.put(0, 1)
      w.put(EncBitrateIdx, 4); w.put(EncSampleRateIdx, 2)
      w.put(0, 1); w.put(0, 1) // padding, private
      w.put(3, 2); w.put(0, 2) // mode: single_channel, mode_ext
      w.put(0, 1); w.put(1, 1); w.put(0, 2) // copyright, original, emphasis
      w.put(0, 16) // CRC placeholder (backfilled below)
      sb = 0
      while (sb < 32) { w.put(EncAllocCode.toLong, 4); sb += 1 }
      // CRC covers header bits 16..31 + the allocation block
      val crc = crc16(w.buf, 48, 128, init = crc16(w.buf, 16, 16))
      // backfill CRC at bits 32..47
      w.buf(4) = ((crc >> 8) & 0xff).toByte
      w.buf(5) = (crc & 0xff).toByte
      sb = 0
      while (sb < 32) { w.put(sfIdx(sb).toLong, 6); sb += 1 }
      t = 0
      while (t < 12) {
        sb = 0
        while (sb < 32) {
          val sf = Scalefactors(sfIdx(sb))
          // invert s″ = (2^nb/(2^nb−1))·(s‴ + 2^(1−nb)), s‴ = code/2^(nb−1) − 1
          val steps = (1 << EncNb) - 1
          val sTriple = s(t)(sb) / sf * steps / (1 << EncNb) -
            StrictMath.pow(2.0, 1 - EncNb)
          var code = StrictMath.round((sTriple + 1.0) * (1 << (EncNb - 1))).toInt
          if (code < 0) code = 0
          if (code > (1 << EncNb) - 1) code = (1 << EncNb) - 1
          w.put(code.toLong, EncNb)
          sb += 1
        }
        t += 1
      }
      if (f == 0) { // gapless tag in the first frame's ancillary bits
        val tagStart = w.bitPos
        w.put(TagMagic, 32)
        w.put(Delay.toLong, 16)
        w.put(n.toLong, 32)
        // CRC over (delay, n) so a flipped tag is rejected, not a
        // silent wrong trim
        w.put(crc16(w.buf, tagStart + 32, 48).toLong, 16)
      }
      out.write(w.buf, 0, EncFrameBytes)
      f += 1
    }
    out.toByteArray
  }

  // --------------------------------------------------------- decoder

  /** Layer I decode → mono [[Multimodal.WavPcm]]. None for malformed,
    * truncated, CRC-failing, Layer II/III, or decode-bomb payloads.
    */
  def decode(payload: Array[Byte], maxOutSamples: Int = 1 << 26)
      : Option[Multimodal.WavPcm] =
    if (payload == null || payload.length < 6 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xe0) != 0xe0) None
    else
      try Some(decodeChecked(payload, maxOutSamples))
      catch {
        case _: Malformed | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => None
      }

  private def decodeChecked(data: Array[Byte], maxOutSamples: Int)
      : Multimodal.WavPcm = {
    val sy = new Synthesis(WinD)
    val pcm = new java.util.ArrayList[Array[Double]]()
    var outLen = 0
    var sampleRate = 0
    var tagDelay = -1; var tagLen = -1
    var firstFrame = true
    var pos = 0
    while (pos + 4 <= data.length) {
      val br = new BitReader(data)
      br.bitPos = pos * 8
      if (br.bits(12) != 0xfff) fail()
      if (br.bits(1) != 1) fail() // MPEG-1 only (no LSF)
      if (br.bits(2) != 3) fail() // Layer I only ('11')
      val protection = br.bits(1)
      val brIdx = br.bits(4)
      val srIdx = br.bits(2)
      val padding = br.bits(1)
      br.bits(1) // private
      val mode = br.bits(2)
      br.bits(2); br.bits(1); br.bits(1); br.bits(2) // ext/copy/orig/emph
      if (brIdx == 0 || brIdx > 14 || srIdx > 2) fail()
      if (mode != 3) fail() // single_channel only (scope: mono corpus)
      // latch the sample rate from the first frame: the returned WavPcm
      // carries ONE rate, so a stream whose later frames declare a
      // different srIdx is inconsistent — reject it rather than silently
      // concatenating mixed-rate samples into one clip (bitrate MAY vary
      // per frame: that's legal VBR and doesn't affect the time base)
      if (firstFrame) sampleRate = SampleRates(srIdx)
      else if (sampleRate != SampleRates(srIdx)) fail()
      val frameBytes = (12 * BitratesL1(brIdx) * 1000 / sampleRate + padding) * 4
      if (frameBytes <= 4 || pos + frameBytes > data.length) fail()
      if (protection == 0) {
        val stored = br.bits(16)
        // verify over header tail + allocation
        if (stored != crc16(data, pos * 8 + 48, 128,
          init = crc16(data, pos * 8 + 16, 16))) fail()
      }
      val alloc = new Array[Int](32)
      var sb = 0
      while (sb < 32) {
        val code = br.bits(4)
        if (code == 15) fail()
        alloc(sb) = if (code == 0) 0 else code + 1
        sb += 1
      }
      val sf = new Array[Double](32)
      sb = 0
      while (sb < 32) {
        if (alloc(sb) > 0) {
          val idx = br.bits(6)
          if (idx > 62) fail()
          sf(sb) = Scalefactors(idx)
        }
        sb += 1
      }
      val frameOut = new Array[Double](384)
      val s = new Array[Double](32)
      var t = 0
      while (t < 12) {
        sb = 0
        while (sb < 32) {
          if (alloc(sb) == 0) s(sb) = 0.0
          else {
            val nb = alloc(sb)
            val code = br.bits(nb)
            val sTriple = code.toDouble / (1 << (nb - 1)) - 1.0
            val sPrime = (1 << nb).toDouble / ((1 << nb) - 1) *
              (sTriple + StrictMath.pow(2.0, 1 - nb))
            s(sb) = sPrime * sf(sb)
          }
          sb += 1
        }
        sy.step(s, frameOut, t * 32)
        t += 1
      }
      // a frame's allocation/scalefactor/sample bits must fit INSIDE
      // its declared slot length — otherwise the reader has silently
      // consumed the next frame's bytes as sample data (structurally
      // invalid per the spec) and would return Some(garbage)
      if (br.bitPos > (pos + frameBytes) * 8) fail()
      if (firstFrame && br.bitPos + 96 <= (pos + frameBytes) * 8) {
        // gapless tag, if present in the ancillary bits (CRC-verified:
        // a corrupted tag falls back to raw output, never a wrong trim)
        val save = br.bitPos
        val magic = br.bits(32).toLong & 0xffffffffL
        if (magic == TagMagic) {
          val payloadAt = br.bitPos
          val d = br.bits(16)
          val len = br.bits(32)
          val stored = br.bits(16)
          if (stored == crc16(data, payloadAt, 48)) {
            tagDelay = d; tagLen = len
          } else br.bitPos = save
        } else br.bitPos = save
      }
      firstFrame = false
      pcm.add(frameOut)
      outLen += 384
      if (outLen > maxOutSamples) fail()
      pos += frameBytes
    }
    if (pcm.isEmpty) fail()
    val raw = new Array[Double](outLen)
    var off = 0
    var fi = 0
    while (fi < pcm.size()) {
      System.arraycopy(pcm.get(fi), 0, raw, off, 384); off += 384; fi += 1
    }
    val (from, len) =
      if (tagLen >= 0) {
        if (tagDelay < 0 || tagLen > raw.length - tagDelay) fail()
        (tagDelay, tagLen)
      } else (0, raw.length)
    val out = new Array[Short](len)
    var i = 0
    while (i < len) {
      val v = StrictMath.round(raw(from + i) * 32768.0)
      out(i) =
        (if (v > 32767) 32767 else if (v < -32768) -32768 else v).toShort
      i += 1
    }
    Multimodal.WavPcm(sampleRate, 1, 16, out)
  }
}
