package graft.ext

import graft.ext.Multimodal.WavPcm

/** FLAC codec in pure JVM — the compressed-AUDIO leg of the codec
  * tier made REAL (the container ships no codec libraries; this is a
  * from-scratch implementation of the public xiph.org / RFC 9639
  * format). FLAC is LOSSLESS and integer-exact end to end, which is
  * exactly the discipline the rest of this repo's fixtures demand:
  * `decode(encode(samples)) == samples` bit-for-bit, no float in
  * sight, so every closed-form audio oracle survives the compressed
  * wire format unchanged.
  *
  * Decoder scope: STREAMINFO + skipped metadata blocks, fixed- and
  * variable-blocking frames, UTF-8-coded frame/sample numbers, CRC-8
  * header and CRC-16 frame verification, subframe types CONSTANT /
  * VERBATIM / FIXED(0–4) / LPC(1–32), rice residuals in both 4- and
  * 5-bit parameter forms with escape partitions, wasted-bits
  * shifting, and the three stereo decorrelations (left/side,
  * right/side, mid/side). 16-bit samples only (the [[WavPcm]]
  * contract) — other depths return `None`: rejections, not crashes,
  * the same corrupt-safe `Option` discipline as [[Jpeg]]/[[Png]].
  *
  * The ENCODER exists for fixtures (the q223/q232 pattern): mono or
  * independent-stereo 16-bit streams with selectable block size,
  * subframe strategy (verbatim / forced or auto fixed order 0–4,
  * constant detection) and rice partition order — enough surface to
  * exercise every mainstream decode path with bytes we control.
  */
object Flac {

  // ----------------------------------------------------- parse guard

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ------------------------------------------------------------ CRCs

  /** CRC-8, poly x⁸+x²+x+1 (0x07), MSB-first, init 0 — frame header. */
  private def crc8(data: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= data(i) & 0xff
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      i += 1
    }
    c
  }

  /** CRC-16, poly 0x8005, MSB-first, init 0 — whole frame. */
  private def crc16(data: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (data(i) & 0xff) << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      i += 1
    }
    c
  }

  // ------------------------------------------------------ bit reader

  /** MSB-first bit reader (FLAC packs big-endian at the bit level —
    * the mirror of PNG's LSB-first [[Png]] reader).
    */
  private final class BitReader(val data: Array[Byte], var bytePos: Int) {
    private var bitPos = 0 // bits consumed of data(bytePos), 0..7

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (bytePos >= data.length) fail()
        v = (v << 1) | ((data(bytePos) >> (7 - bitPos)) & 1)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }

    def bitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        if (bytePos >= data.length) fail()
        v = (v << 1) | ((data(bytePos) >> (7 - bitPos)) & 1)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }

    /** n-bit two's-complement signed read (n ≥ 1). */
    def signedBits(n: Int): Int = {
      if (n == 0) return 0
      val v = bits(n)
      if ((v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }

    /** Unary: count of 0 bits before the terminating 1. */
    def unary(): Int = {
      var q = 0
      while (bits(1) == 0) {
        q += 1
        if (q > (1 << 24)) fail() // corrupt-stream runaway guard
      }
      q
    }

    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def atByteBoundary: Boolean = bitPos == 0
  }

  // ------------------------------------------------- header geometry

  /** Block-size code table (frame header, 4 bits). Returns -8 / -16
    * for the "read 8/16 bits at end of header" forms, or the size.
    */
  private def blockSizeOf(code: Int): Int = code match {
    case 1 => 192
    case c if c >= 2 && c <= 5 => 576 << (c - 2)
    case 6 => -8
    case 7 => -16
    case c if c >= 8 => 256 << (c - 8)
    case _ => fail() // 0000 reserved
  }

  /** Sample-rate code table; -1 = from STREAMINFO, -8/-16/-160 = the
    * explicit end-of-header forms (kHz / Hz / 10·Hz).
    */
  private def sampleRateOf(code: Int): Int = code match {
    case 0 => -1
    case 1 => 88200
    case 2 => 176400
    case 3 => 192000
    case 4 => 8000
    case 5 => 16000
    case 6 => 22050
    case 7 => 24000
    case 8 => 32000
    case 9 => 44100
    case 10 => 48000
    case 11 => 96000
    case 12 => -8
    case 13 => -16
    case 14 => -160
    case _ => fail()
  }

  /** Sample-size code table; -1 = from STREAMINFO. */
  private def sampleSizeOf(code: Int): Int = code match {
    case 0 => -1
    case 1 => 8
    case 2 => 12
    case 4 => 16
    case 5 => 20
    case 6 => 24
    case 7 => 32
    case _ => fail() // 011 reserved
  }

  /** FLAC's UTF-8-style coded number (extended to 36 bits / 7 bytes). */
  private def readUtf8Number(br: BitReader): Long = {
    val b0 = br.bits(8)
    if ((b0 & 0x80) == 0) return b0.toLong
    var nBytes = 0
    var mask = 0x40
    while ((b0 & mask) != 0) { nBytes += 1; mask >>= 1 }
    if (nBytes < 1 || nBytes > 6) fail()
    var v = (b0 & (mask - 1)).toLong
    var i = 0
    while (i < nBytes) {
      val b = br.bits(8)
      if ((b & 0xc0) != 0x80) fail()
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  // ---------------------------------------------------------- decode

  /** Corrupt-safe decode to interleaved 16-bit PCM: `None` for
    * malformed, truncated, CRC-failing, or out-of-scope payloads.
    */
  def decode(payload: Array[Byte]): Option[WavPcm] =
    if (payload == null || payload.length < 8 ||
      payload(0) != 'f' || payload(1) != 'L' || payload(2) != 'a' || payload(3) != 'C') None
    else
      try Some(decodeChecked(payload))
      catch { case _: Malformed | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private def decodeChecked(data: Array[Byte]): WavPcm = {
    val br = new BitReader(data, 4)
    // ------------------------------------------------ metadata blocks
    var sampleRate = 0; var channels = 0; var bps = 0; var totalSamples = 0L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      last = br.bits(1) == 1
      val btype = br.bits(7)
      val blen = br.bits(24)
      if (btype == 0) {
        if (sawStreamInfo || blen != 34) fail()
        sawStreamInfo = true
        br.bits(16); br.bits(16) // min/max block size
        br.bits(24); br.bits(24) // min/max frame size
        sampleRate = br.bits(20)
        channels = br.bits(3) + 1
        bps = br.bits(5) + 1
        totalSamples = br.bitsLong(36)
        var i = 0
        while (i < 16) { br.bits(8); i += 1 } // MD5 (0 = unset; not verified)
      } else if (btype == 127) fail()
      else {
        if (br.bytePos + blen > data.length) fail()
        br.bytePos += blen // metadata is byte-aligned; skip
      }
    }
    if (!sawStreamInfo || sampleRate == 0 || channels < 1 || channels > 8) fail()
    if (bps != 16) fail() // scope: the WavPcm 16-bit contract
    // Decode-bomb guard (mirrors Gzip.maxOut / Png's plane cap): a tiny
    // payload of CONSTANT-subframe frames can otherwise expand to GiBs of
    // Int arrays before any overflow check fires. 36-bit totalSamples is
    // attacker-controlled; cap total interleaved output at 2^26 samples.
    val maxOutSamples = 1 << 26
    if (totalSamples * channels > maxOutSamples) fail()

    // ------------------------------------------------------- frames
    val out = new java.util.ArrayList[Array[Int]]() // per-frame interleaved
    var decoded = 0L
    var outLen = 0
    while ((totalSamples > 0 && decoded < totalSamples) ||
      (totalSamples == 0 && br.bytePos < data.length)) {
      if (!br.atByteBoundary) fail()
      val frameStart = br.bytePos
      // ---- header
      if (br.bits(14) != 0x3ffe) fail()
      if (br.bits(1) != 0) fail() // reserved
      br.bits(1) // blocking strategy (number semantics only)
      val bsCode = br.bits(4)
      val srCode = br.bits(4)
      val chanCode = br.bits(4)
      val sizeCode = br.bits(3)
      if (br.bits(1) != 0) fail() // reserved
      readUtf8Number(br)
      var blockSize = blockSizeOf(bsCode)
      if (blockSize == -8) blockSize = br.bits(8) + 1
      else if (blockSize == -16) blockSize = br.bits(16) + 1
      sampleRateOf(srCode) match {
        case -8 => br.bits(8)
        case -16 => br.bits(16)
        case -160 => br.bits(16)
        case _ => ()
      }
      val frameBps = sampleSizeOf(sizeCode) match {
        case -1 => bps
        case v => v
      }
      if (frameBps != bps) fail()
      if (!br.atByteBoundary) fail() // header is whole bytes by construction
      val crc8Stored = br.bits(8)
      if (crc8Stored != crc8(data, frameStart, br.bytePos - 1)) fail()

      // ---- channel geometry
      val (nch, mode) =
        if (chanCode <= 7) (chanCode + 1, 0)
        else if (chanCode == 8) (2, 1) // left/side
        else if (chanCode == 9) (2, 2) // right/side
        else if (chanCode == 10) (2, 3) // mid/side
        else fail()
      if (nch != channels) fail()

      // ---- subframes
      val chans = new Array[Array[Int]](nch)
      var c = 0
      while (c < nch) {
        val sfBps = bps + (mode match {
          case 1 if c == 1 => 1 // side channel carries one extra bit
          case 2 if c == 0 => 1
          case 3 if c == 1 => 1
          case _ => 0
        })
        chans(c) = decodeSubframe(br, blockSize, sfBps)
        c += 1
      }
      br.alignByte()
      val crc16Stored = br.bits(16)
      if (crc16Stored != crc16(data, frameStart, br.bytePos - 2)) fail()

      // ---- stereo reconstruction → interleaved frame samples
      val frame = new Array[Int](blockSize * nch)
      var i = 0
      while (i < blockSize) {
        mode match {
          case 0 =>
            var cc = 0
            while (cc < nch) { frame(i * nch + cc) = chans(cc)(i); cc += 1 }
          case 1 => // left/side: right = left - side
            frame(i * 2) = chans(0)(i)
            frame(i * 2 + 1) = chans(0)(i) - chans(1)(i)
          case 2 => // right/side: left = right + side
            frame(i * 2) = chans(1)(i) + chans(0)(i)
            frame(i * 2 + 1) = chans(1)(i)
          case 3 => // mid/side
            val s = chans(1)(i)
            val m2 = (chans(0)(i) << 1) | (s & 1)
            frame(i * 2) = (m2 + s) >> 1
            frame(i * 2 + 1) = (m2 - s) >> 1
        }
        i += 1
      }
      out.add(frame)
      outLen += frame.length
      if (outLen > maxOutSamples) fail() // streams w/ totalSamples=0 grow unbounded otherwise
      decoded += blockSize
    }
    if (totalSamples > 0 && decoded != totalSamples) fail()

    val samples = new Array[Short](outLen)
    var off = 0
    var fi = 0
    while (fi < out.size()) {
      val f = out.get(fi)
      var i = 0
      while (i < f.length) {
        val v = f(i)
        if (v < Short.MinValue || v > Short.MaxValue) fail()
        samples(off) = v.toShort
        off += 1; i += 1
      }
      fi += 1
    }
    WavPcm(sampleRate, channels, 16, samples)
  }

  /** One subframe → blockSize reconstructed samples. */
  private def decodeSubframe(br: BitReader, blockSize: Int, bps: Int): Array[Int] = {
    if (br.bits(1) != 0) fail() // padding bit
    val stype = br.bits(6)
    val wastedFlag = br.bits(1)
    val wasted = if (wastedFlag == 1) br.unary() + 1 else 0
    val eff = bps - wasted
    if (eff < 1 || eff > 32) fail()
    val out = new Array[Int](blockSize)
    if (stype == 0) { // CONSTANT
      val v = br.signedBits(eff)
      java.util.Arrays.fill(out, v)
    } else if (stype == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { out(i) = br.signedBits(eff); i += 1 }
    } else if ((stype & 0x38) == 0x08 && (stype & 0x07) <= 4) { // FIXED
      val order = stype & 0x07
      if (order > blockSize) fail()
      var i = 0
      while (i < order) { out(i) = br.signedBits(eff); i += 1 }
      decodeResidual(br, blockSize, order, out)
      restoreFixed(out, blockSize, order)
    } else if ((stype & 0x20) == 0x20) { // LPC
      val order = (stype & 0x1f) + 1
      if (order > blockSize) fail()
      var i = 0
      while (i < order) { out(i) = br.signedBits(eff); i += 1 }
      val precision = br.bits(4) + 1
      if (precision == 16) fail() // 1111 invalid
      val shift = br.signedBits(5)
      if (shift < 0) fail()
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = br.signedBits(precision); i += 1 }
      decodeResidual(br, blockSize, order, out)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) += (acc >> shift).toInt
        i += 1
      }
    } else fail() // reserved subframe types
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual partitions into out(order until blockSize). */
  private def decodeResidual(br: BitReader, blockSize: Int, order: Int, out: Array[Int]): Unit = {
    val method = br.bits(2)
    if (method > 1) fail()
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = br.bits(4)
    val parts = 1 << po
    if (blockSize % parts != 0) fail()
    val perPart = blockSize / parts
    if (perPart <= 0 || (parts == 1 && perPart < order)) fail()
    var idx = order
    var p = 0
    while (p < parts) {
      val cnt = if (p == 0) perPart - order else perPart
      if (cnt < 0) fail()
      val param = br.bits(paramBits)
      if (param == escape) {
        val nbits = br.bits(5)
        var i = 0
        while (i < cnt) { out(idx) = if (nbits == 0) 0 else br.signedBits(nbits); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = br.unary()
          val u = (q.toLong << param) | br.bits(param).toLong
          if (u > Int.MaxValue) fail()
          val v = ((u >> 1) ^ -(u & 1L)).toInt // zigzag
          out(idx) = v
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** In-place fixed-predictor restore (orders 0–4, the standard
    * polynomial predictors — residuals were `Δᵒ samples`).
    */
  private def restoreFixed(s: Array[Int], n: Int, order: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 => while (i < n) { s(i) += s(i - 1); i += 1 }
      case 2 => while (i < n) { s(i) += 2 * s(i - 1) - s(i - 2); i += 1 }
      case 3 => while (i < n) { s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3); i += 1 }
      case 4 => while (i < n) { s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4); i += 1 }
      case _ => fail()
    }
  }

  // ---------------------------------------------------------- encode

  /** Subframe strategy: verbatim everywhere. */
  val EncVerbatim: Int = -2

  /** Subframe strategy: per-subframe best fixed order 0–4 by absolute
    * residual sum (constant subframes detected first).
    */
  val EncFixedAuto: Int = -1

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1)
        cnt += 1
        if (cnt == 8) { out.write(buf & 0xff); buf = 0; cnt = 0 }
        i -= 1
      }
    }
    def writeLong(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((v >> i) & 1L).toInt
        cnt += 1
        if (cnt == 8) { out.write(buf & 0xff); buf = 0; cnt = 0 }
        i -= 1
      }
    }
    def alignByte(): Unit = if (cnt > 0) { buf <<= (8 - cnt); out.write(buf & 0xff); buf = 0; cnt = 0 }
  }

  private def writeUtf8Number(bw: BitWriter, v: Long): Unit = {
    require(v >= 0)
    if (v < 0x80) bw.write(v.toInt, 8)
    else {
      // count payload bits → lead-byte shape, standard UTF-8 extension
      var nBytes = 1
      while (nBytes <= 6 && v >= (1L << (6 * nBytes + (6 - nBytes)))) nBytes += 1
      // lead byte: nBytes+1 ones, a zero, then the top payload bits
      val leadOnes = nBytes + 1
      val payloadTop = 7 - leadOnes
      bw.write(((0xff << (8 - leadOnes)) & 0xff) | ((v >> (6 * nBytes)) & ((1 << payloadTop) - 1)).toInt, 8)
      var i = nBytes - 1
      while (i >= 0) {
        bw.write(0x80 | ((v >> (6 * i)) & 0x3f).toInt, 8)
        i -= 1
      }
    }
  }

  /** Encode interleaved 16-bit PCM as a FLAC stream. `strategy`:
    * [[EncVerbatim]], [[EncFixedAuto]], or a forced fixed order 0–4;
    * `partitionOrder` requests 2^po rice partitions per residual
    * (auto-clamped when the block geometry can't honor it).
    * Deterministic: same inputs → same bytes.
    */
  def encode(samples: Array[Short], sampleRate: Int, channels: Int = 1,
      blockSize: Int = 4096, strategy: Int = EncFixedAuto,
      partitionOrder: Int = 0): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "1..8 channels")
    require(samples.length % channels == 0, "interleave mismatch")
    require(sampleRate > 0 && sampleRate < (1 << 20), "bad sample rate")
    require(blockSize >= 16 && blockSize <= 65536, "block size 16..65536")
    require(strategy == EncVerbatim || strategy == EncFixedAuto ||
      (strategy >= 0 && strategy <= 4), "bad strategy")
    require(samples.length > 0, "empty stream")
    val nSamples = samples.length / channels

    val out = new java.io.ByteArrayOutputStream(samples.length + 256)
    // ------------------------------------------------- fLaC + STREAMINFO
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new java.io.ByteArrayOutputStream(38)
    val sbw = new BitWriter(si)
    sbw.write(1, 1) // last metadata block
    sbw.write(0, 7) // STREAMINFO
    sbw.write(34, 24)
    sbw.write(blockSize, 16); sbw.write(blockSize, 16)
    sbw.write(0, 24); sbw.write(0, 24) // frame sizes unknown
    sbw.write(sampleRate, 20)
    sbw.write(channels - 1, 3)
    sbw.write(15, 5) // bps - 1
    sbw.writeLong(nSamples.toLong, 36)
    var i = 0
    while (i < 16) { sbw.write(0, 8); i += 1 } // MD5 unset
    sbw.alignByte()
    val siBytes = si.toByteArray
    out.write(siBytes, 0, siBytes.length)

    // ------------------------------------------------------- frames
    var frameIdx = 0L
    var off = 0
    while (off < nSamples) {
      val bs = math.min(blockSize, nSamples - off)
      val fb = new java.io.ByteArrayOutputStream(bs * channels * 2 + 64)
      val bw = new BitWriter(fb)
      bw.write(0x3ffe, 14)
      bw.write(0, 1) // reserved
      bw.write(0, 1) // fixed blocking
      bw.write(7, 4) // block size: 16-bit at end of header
      bw.write(0, 4) // sample rate: from STREAMINFO
      bw.write(channels - 1, 4) // independent channels
      bw.write(4, 3) // 16-bit samples
      bw.write(0, 1) // reserved
      writeUtf8Number(bw, frameIdx)
      bw.write(bs - 1, 16)
      bw.alignByte()
      val headerBytes = fb.toByteArray
      fb.write(crc8(headerBytes, 0, headerBytes.length))

      var c = 0
      while (c < channels) {
        val chan = new Array[Int](bs)
        var k = 0
        while (k < bs) { chan(k) = samples((off + k) * channels + c); k += 1 }
        encodeSubframe(bw, chan, strategy, partitionOrder)
        c += 1
      }
      bw.alignByte()
      val frameBody = fb.toByteArray
      val c16 = crc16(frameBody, 0, frameBody.length)
      fb.write((c16 >> 8) & 0xff); fb.write(c16 & 0xff)
      val bytes = fb.toByteArray
      out.write(bytes, 0, bytes.length)
      off += bs
      frameIdx += 1
    }
    out.toByteArray
  }

  /** One 16-bit subframe: constant detection, then the requested
    * strategy (verbatim / fixed with brute-force rice params).
    */
  private def encodeSubframe(bw: BitWriter, chan: Array[Int], strategy: Int,
      partitionOrder: Int): Unit = {
    val bs = chan.length
    bw.write(0, 1) // padding
    if (strategy == EncVerbatim) { // pure verbatim — the path-coverage knob
      bw.write(1, 6) // VERBATIM
      bw.write(0, 1)
      var i = 0
      while (i < bs) { bw.write(chan(i) & 0xffff, 16); i += 1 }
      return
    }
    val allEqual = { var i = 1; var eq = true; while (i < bs && eq) { eq = chan(i) == chan(0); i += 1 }; eq }
    if (allEqual) {
      bw.write(0, 6) // CONSTANT
      bw.write(0, 1) // no wasted bits
      bw.write(chan(0) & 0xffff, 16)
      return
    }
    // fixed prediction: residuals for candidate orders, keep the best
    val maxOrder = math.min(if (strategy >= 0) strategy else 4, bs - 1)
    val minOrder = if (strategy >= 0) maxOrder else 0
    var bestOrder = minOrder
    var bestCost = Long.MaxValue
    var order = minOrder
    while (order <= maxOrder) {
      val res = fixedResiduals(chan, order)
      var cost = 0L
      var i = 0
      while (i < res.length) { cost += math.abs(res(i).toLong); i += 1 }
      if (cost < bestCost) { bestCost = cost; bestOrder = order }
      order += 1
    }
    val res = fixedResiduals(chan, bestOrder)
    bw.write(0x08 | bestOrder, 6) // FIXED | order
    bw.write(0, 1) // no wasted bits
    var i = 0
    while (i < bestOrder) { bw.write(chan(i) & 0xffff, 16); i += 1 }
    // residual: 4-bit rice params, partitions clamped to the geometry
    var po = partitionOrder
    while (po > 0 && (bs % (1 << po) != 0 || bs / (1 << po) <= bestOrder)) po -= 1
    bw.write(0, 2) // method: 4-bit rice
    bw.write(po, 4)
    val parts = 1 << po
    val perPart = bs / parts
    var idx = 0
    var p = 0
    while (p < parts) {
      val cnt = if (p == 0) perPart - bestOrder else perPart
      // brute-force the rice parameter (escape never needed: 16-bit
      // source keeps |residual| ≤ 2^20 and k ≤ 14 always terminates)
      var bestK = 0
      var bestBits = Long.MaxValue
      var k = 0
      while (k <= 14) {
        var b = 0L
        var j = 0
        while (j < cnt) {
          val u = zigzag(res(idx + j))
          b += (u >>> k) + 1 + k
          j += 1
        }
        if (b < bestBits) { bestBits = b; bestK = k }
        k += 1
      }
      bw.write(bestK, 4)
      var j = 0
      while (j < cnt) {
        val u = zigzag(res(idx + j))
        val q = (u >>> bestK).toInt
        var z = 0
        while (z < q) { bw.write(0, 1); z += 1 }
        bw.write(1, 1)
        if (bestK > 0) bw.writeLong(u & ((1L << bestK) - 1), bestK)
        j += 1
      }
      idx += cnt
      p += 1
    }
  }

  private def zigzag(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63)) & 0xffffffffL

  /** Residuals after the order-o polynomial predictor (length n−o). */
  private def fixedResiduals(s: Array[Int], order: Int): Array[Int] = {
    val n = s.length
    val res = new Array[Int](n - order)
    var i = order
    while (i < n) {
      res(i - order) = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case 4 => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      i += 1
    }
    res
  }
}
