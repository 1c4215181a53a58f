package graft.ext

/** MPEG-1 Video (ISO/IEC 11172-2) — from-scratch I-frame codec, pure
  * JVM byte/bit parsing, no codec library. Retires the last multimodal
  * stub: compressed video now rides the same real-wire discipline as
  * JPEG/PNG/FLAC/MPEG-1-audio ([[Jpeg]], [[Png]], [[Flac]], [[Mpeg1]]).
  *
  * SCOPE (disclosed): intra-coded pictures only. The encoder emits
  * I-picture-only streams (sequence header → GOP → I pictures → sequence
  * end) — the "all-keyframe" profile a frame-fingerprint pipeline wants
  * anyway, since every frame must be independently decodable for
  * sampling. The decoder rejects P/B pictures (predictive decode needs
  * motion compensation, out of from-scratch scope) with the contracted
  * `None`, never a crash. Within I-only scope the wire is the real
  * standard: 12-bit dims, default or downloaded intra quantizer matrix,
  * slice-per-row structure, Table B.1 macroblock addressing, B.2a
  * macroblock types, B.5a/B.5b DC size VLCs, the short-code subset of
  * the B.5 DCT coefficient table plus full ESCAPE coding, MPEG-1 intra
  * dequantization with oddification mismatch control, and 4:2:0 chroma.
  *
  * The encoder restricts itself to run/level codes in the 2-7 bit
  * B.5 subset and ESCAPE-codes everything else (always legal per the
  * spec, slightly less compact); the decoder additionally understands
  * the 8-bit `0010 0xxx` group. Longer B.5 codes (10-16 bit, which this
  * encoder never emits and no other encoder exists in this container to
  * emit) decode to the contracted `None` rather than risking a silent
  * mis-decode from a mistyped table row.
  *
  * Cited behaviors: start-code layer structure (ISO 11172-2 §2.4.2),
  * intra dct_recon with oddification (§2.4.4.2), DC predictor reset to
  * 1024 at slice start (§2.4.4.1), default intra quantizer matrix
  * (§2.4.3.2). The reference pipeline (kavyarana/
  * cryptocurrency-data-pipeline) has no video surface at all — this is
  * north-star scope for the 100 TB training-data engine.
  */
object Mpeg1Video {

  // ---------------------------------------------------------- tables

  /** Zig-zag scan order: zigzag index → raster index (§2.4.4.1). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Default intra quantizer matrix, raster order (§2.4.3.2). */
  private val DefaultIntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)

  /** dct_dc_size_luminance (Table B.5a): (code, bits) per size 0-8. */
  private val DcLumaCodes: Array[(Int, Int)] = Array(
    (0x4, 3), (0x0, 2), (0x1, 2), (0x5, 3), (0x6, 3),
    (0xe, 4), (0x1e, 5), (0x3e, 6), (0x7e, 7))

  /** dct_dc_size_chrominance (Table B.5b). */
  private val DcChromaCodes: Array[(Int, Int)] = Array(
    (0x0, 2), (0x1, 2), (0x2, 2), (0x6, 3), (0xe, 4),
    (0x1e, 5), (0x3e, 6), (0x7e, 7), (0xfe, 8))

  /** DCT coefficient codes the ENCODER uses (run, level) → (code w/o
    * sign, bits) — the unambiguous 2-7 bit core of Table B.5
    * (shared with H.261 TCOEFF); everything else escapes.
    */
  private val AcEncCodes: Map[(Int, Int), (Int, Int)] = Map(
    (0, 1) -> (0x3, 2), // '11' (dct_coeff_next form; intra blocks only here)
    (1, 1) -> (0x3, 3), // '011'
    (0, 2) -> (0x4, 4), // '0100'
    (2, 1) -> (0x5, 4), // '0101'
    (0, 3) -> (0x5, 5), // '00101'
    (3, 1) -> (0x7, 5), // '00111'
    (4, 1) -> (0x6, 5), // '00110'
    (1, 2) -> (0x6, 6), // '000110'
    (5, 1) -> (0x7, 6), // '000111'
    (6, 1) -> (0x5, 6), // '000101'
    (7, 1) -> (0x4, 6), // '000100'
    (0, 4) -> (0x6, 7), // '0000110'
    (2, 2) -> (0x4, 7), // '0000100'
    (8, 1) -> (0x7, 7), // '0000111'
    (9, 1) -> (0x5, 7)) // '0000101'

  /** Decoder-side additions: the 8-bit '0010 0xxx' B.5 group. */
  private val AcDec8Codes: Map[Int, (Int, Int)] = Map(
    0x26 -> (0, 5), 0x21 -> (0, 6), 0x25 -> (1, 3), 0x24 -> (3, 2),
    0x27 -> (10, 1), 0x23 -> (11, 1), 0x22 -> (12, 1), 0x20 -> (13, 1))

  /** Flat decode table over (len ≤ 8, code < 256) for every supported
    * non-escape AC code starting with a 0-bit: run·512 + level, or -1.
    * One array read per consumed bit in the hot coefficient loop.
    */
  private val AcDecTable: Array[Int] = {
    val t = Array.fill(9 * 256)(-1)
    AcEncCodes.foreach { case ((r, l), (c, n)) =>
      if (!(r == 0 && l == 1)) t(n * 256 + c) = r * 512 + l
    }
    AcDec8Codes.foreach { case (c, (r, l)) => t(8 * 256 + c) = r * 512 + l }
    t
  }

  // --------------------------------------------------- DCT machinery

  /** cos((2x+1)·u·π/16) (the [[Jpeg]] CosTable, restated — both codecs
    * use the same 8×8 type-II DCT basis per their specs).
    */
  private val Cos: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0); u += 1
      }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Forward 8×8 DCT of pel values (no level shift — MPEG intra codes
    * full-range pels; DC lands at 8·mean, max 2040).
    */
  private def fdct(in: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += in(y * 8 + x) * Cos(x * 8 + u); x += 1 }
        tmp(y * 8 + u) = s * (if (u == 0) InvSqrt2 else 1.0) * 0.5
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0; var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * Cos(yy * 8 + v); yy += 1 }
        out(v * 8 + u) = s * (if (v == 0) InvSqrt2 else 1.0) * 0.5
        u += 1
      }
      v += 1
    }
  }

  /** Inverse 8×8 DCT, natural-order coefficients → clamped pels. */
  private def idct(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) {
          s += (if (u == 0) InvSqrt2 else 1.0) * coef(v * 8 + u) * Cos(x * 8 + u)
          u += 1
        }
        tmp(v * 8 + x) = s * 0.5
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) {
          s += (if (vv == 0) InvSqrt2 else 1.0) * tmp(vv * 8 + x) * Cos(y * 8 + vv)
          vv += 1
        }
        val p = math.round(s * 0.5).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------ bit plumbing

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  private final class BitWriter {
    var buf = new Array[Byte](4096)
    var bitPos = 0
    private def ensure(bits: Int): Unit = {
      val need = (bitPos + bits + 7) >> 3
      if (need > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, need))
    }
    def put(v: Long, n: Int): Unit = {
      ensure(n)
      var i = n - 1
      while (i >= 0) {
        if (((v >> i) & 1L) == 1L)
          buf(bitPos >> 3) = (buf(bitPos >> 3) | (1 << (7 - (bitPos & 7)))).toByte
        bitPos += 1
        i -= 1
      }
    }
    def byteAlign(): Unit = if ((bitPos & 7) != 0) put(0L, 8 - (bitPos & 7))
    def startCode(code: Int): Unit = {
      byteAlign(); put(0x000001L, 24); put(code.toLong, 8)
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, (bitPos + 7) >> 3)
  }

  private final class BitReader(val data: Array[Byte], val endBit: Int) {
    var bitPos = 0
    def bits(n: Int): Int = {
      if (bitPos + n > endBit) fail()
      var v = 0; var i = 0
      while (i < n) {
        v = (v << 1) | ((data(bitPos >> 3) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1; i += 1
      }
      v
    }
    def remaining: Int = endBit - bitPos
    /** true while any 1-bit remains — macroblock data always starts
      * with a 1-carrying VLC, trailing byte-align padding is zeros.
      */
    def hasOneBit: Boolean = {
      var p = bitPos
      while (p < endBit) {
        if (((data(p >> 3) >> (7 - (p & 7))) & 1) != 0) return true
        p += 1
      }
      false
    }
  }

  // -------------------------------------------------------- encoder

  private def magnitude(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** JPEG-style one's-complement DC differential bits (§2.4.3.7's
    * dct_dc_differential coding — negative diffs invert).
    */
  private def putDcDiff(w: BitWriter, diff: Int, codes: Array[(Int, Int)]): Unit = {
    val size = magnitude(diff)
    if (size > 8) fail()
    val (c, n) = codes(size)
    w.put(c.toLong, n)
    if (size > 0) {
      val v = if (diff >= 0) diff else diff + (1 << size) - 1
      w.put(v.toLong, size)
    }
  }

  private def putAc(w: BitWriter, run: Int, level: Int): Unit = {
    val a = math.abs(level)
    AcEncCodes.get((run, a)) match {
      case Some((c, n)) =>
        w.put(c.toLong, n); w.put(if (level < 0) 1L else 0L, 1)
      case None =>
        if (run > 63 || a == 0 || a > 255) fail()
        w.put(0x1L, 6) // '000001' escape
        w.put(run.toLong, 6)
        if (a <= 127) w.put((level & 0xff).toLong, 8)
        else if (level > 0) { w.put(0L, 8); w.put(level.toLong, 8) }
        else { w.put(0x80L, 8); w.put((level + 256).toLong, 8) }
    }
  }

  /** Encode one 8×8 intra block: quantize the DCT, emit DC diff + AC
    * run/levels + EOB. Returns the new DC predictor (quantized DC).
    */
  private def encBlock(w: BitWriter, pels: Array[Int], qscale: Int,
      dcPred: Int, luma: Boolean, intraQ: Array[Int]): Int = {
    val f = new Array[Double](64)
    fdct(pels, f)
    val dc0 = math.max(0, math.min(255, math.round(f(0) / 8.0).toInt))
    putDcDiff(w, dc0 - dcPred, if (luma) DcLumaCodes else DcChromaCodes)
    var run = 0
    var zi = 1
    while (zi < 64) {
      val r = Zigzag(zi)
      // level inverts dct_recon = 2·level·q·W/16: level ≈ 8F/(q·W)
      var level = math.round(8.0 * f(r) / (qscale.toDouble * intraQ(r))).toInt
      if (level > 255) level = 255
      if (level < -255) level = -255
      if (level == 0) run += 1
      else { putAc(w, run, level); run = 0 }
      zi += 1
    }
    w.put(0x2L, 2) // EOB '10'
    dc0
  }

  /** Mono-plane 2×2 average subsample (chroma 4:2:0). */
  private def subsample(p: Array[Int], w: Int, h: Int): Array[Int] = {
    val ow = w / 2; val oh = h / 2
    val out = new Array[Int](ow * oh)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        out(y * ow + x) = (p(2 * y * w + 2 * x) + p(2 * y * w + 2 * x + 1) +
          p((2 * y + 1) * w + 2 * x) + p((2 * y + 1) * w + 2 * x + 1) + 2) / 4
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode top-down BGR frames as an I-picture-only MPEG-1 video
    * elementary stream. `qscale` 1-31; `mbQuantEvery` > 0 re-sends the
    * (same) quantizer_scale on every k-th macroblock via the
    * intra+quant macroblock type — a distinct wire exercising the B.2a
    * '01' decode path with identical reconstruction.
    */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]],
      qscale: Int = 3, mbQuantEvery: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 4095 && height <= 2800,
      "dims must fit 12-bit headers and the 0xAF slice-code ceiling")
    require(qscale >= 1 && qscale <= 31, "quantizer_scale is 5 bits, 1-31")
    require(frames.nonEmpty && frames.forall(_.length == width * height * 3),
      "frames must be w*h*3 BGR")
    val mbW = (width + 15) / 16; val mbH = (height + 15) / 16
    val pw = mbW * 16; val ph = mbH * 16
    val w = new BitWriter
    // sequence header
    w.startCode(0xb3)
    w.put(width.toLong, 12); w.put(height.toLong, 12)
    w.put(1L, 4) // pel_aspect_ratio: square
    w.put(3L, 4) // picture_rate: 25 fps
    w.put(0x3ffffL, 18); w.put(1L, 1) // bit_rate: variable + marker
    w.put(16L, 10); w.put(0L, 1) // vbv_buffer_size, constrained flag
    w.put(0L, 1); w.put(0L, 1) // no downloaded quant matrices
    // one GOP
    w.startCode(0xb8)
    w.put(0L, 25); w.put(1L, 1); w.put(0L, 1) // time_code, closed, !broken
    frames.zipWithIndex.foreach { case (bgr, fi) =>
      // color convert + edge-replicate pad to macroblock multiples
      val yP = new Array[Int](pw * ph)
      val cbF = new Array[Int](pw * ph)
      val crF = new Array[Int](pw * ph)
      var y = 0
      while (y < ph) {
        val sy = math.min(y, height - 1)
        var x = 0
        while (x < pw) {
          val sx = math.min(x, width - 1)
          val o = (sy * width + sx) * 3
          val b = bgr(o) & 0xff; val g = bgr(o + 1) & 0xff; val r = bgr(o + 2) & 0xff
          val i = y * pw + x
          yP(i) = ((299 * r + 587 * g + 114 * b) + 500) / 1000
          cbF(i) = math.max(0, math.min(255,
            math.round(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b).toInt))
          crF(i) = math.max(0, math.min(255,
            math.round(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b).toInt))
          x += 1
        }
        y += 1
      }
      val cbP = subsample(cbF, pw, ph)
      val crP = subsample(crF, pw, ph)
      // picture header (I)
      w.startCode(0x00)
      w.put((fi % 1024).toLong, 10); w.put(1L, 3); w.put(0xffffL, 16)
      w.put(0L, 1) // extra_bit_picture
      val block = new Array[Int](64)
      var row = 0
      while (row < mbH) {
        w.startCode(row + 1) // slice_vertical_position
        w.put(qscale.toLong, 5)
        w.put(0L, 1) // extra_bit_slice
        var dcY = 128; var dcCb = 128; var dcCr = 128
        var mx = 0
        while (mx < mbW) {
          w.put(1L, 1) // macroblock_address_increment = 1
          val sendQ = mbQuantEvery > 0 && mx % mbQuantEvery == 0
          if (sendQ) { w.put(1L, 2); w.put(qscale.toLong, 5) } // '01' + qscale
          else w.put(1L, 1) // '1' intra
          def grab(p: Array[Int], stride: Int, x0: Int, y0: Int): Unit = {
            var by = 0
            while (by < 8) {
              var bx = 0
              while (bx < 8) {
                block(by * 8 + bx) = p((y0 + by) * stride + x0 + bx); bx += 1
              }
              by += 1
            }
          }
          var blk = 0
          while (blk < 4) {
            grab(yP, pw, mx * 16 + (blk % 2) * 8, row * 16 + (blk / 2) * 8)
            dcY = encBlock(w, block, qscale, dcY, luma = true, DefaultIntraQ)
            blk += 1
          }
          grab(cbP, pw / 2, mx * 8, row * 8)
          dcCb = encBlock(w, block, qscale, dcCb, luma = false, DefaultIntraQ)
          grab(crP, pw / 2, mx * 8, row * 8)
          dcCr = encBlock(w, block, qscale, dcCr, luma = false, DefaultIntraQ)
          mx += 1
        }
        row += 1
      }
      ()
    }
    w.startCode(0xb7) // sequence_end_code
    w.toBytes
  }

  // -------------------------------------------------------- decoder

  /** Decode an MPEG-1 video elementary stream (I pictures only) to a
    * top-down BGR [[Multimodal.RawVideoClip]]. Malformed, truncated,
    * P/B-coded, unsupported-VLC, or decode-bomb payloads → None.
    * `maxOutBytes` caps total decoded BGR bytes (w·h·3·frames).
    */
  def decode(payload: Array[Byte], maxOutBytes: Long = 1L << 26)
      : Option[Multimodal.RawVideoClip] =
    if (payload == null || payload.length < 12) None
    else
      try decodeChecked(payload, maxOutBytes)
      catch {
        case _: Malformed | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => None
      }

  /** Byte offsets of every 0x000001 start-code prefix. */
  private def startCodes(data: Array[Byte]): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int]
    var i = 0
    while (i + 3 < data.length) {
      if (data(i) == 0 && data(i + 1) == 0 && data(i + 2) == 1) {
        out += i; i += 3
      } else i += 1
    }
    out.toArray
  }

  private def decodeDcDiff(br: BitReader, luma: Boolean): Int = {
    // walk the prefix code bit by bit against the (code,bits) table
    val codes = if (luma) DcLumaCodes else DcChromaCodes
    var code = 0; var len = 0
    while (len < 9) {
      code = (code << 1) | br.bits(1); len += 1
      var s = 0
      while (s < codes.length) {
        if (codes(s)._2 == len && codes(s)._1 == code) {
          val size = s
          if (size == 0) return 0
          val v = br.bits(size)
          return if (v < (1 << (size - 1))) v - (1 << size) + 1 else v
        }
        s += 1
      }
    }
    fail()
  }

  /** Decode one AC (run, level) pair, packed allocation-free as
    * `run << 16 | (level & 0xffff)` (level sign-extends from 16 bits),
    * or [[AcEob]] for the '10' end-of-block code.
    */
  private def decodeAc(br: BitReader): Int = {
    // '1x': EOB '10' or run0/level±1 '11s'
    if (br.bits(1) == 1) {
      if (br.bits(1) == 0) return AcEob
      return if (br.bits(1) == 1) pack(0, -1) else pack(0, 1)
    }
    var code = 0 // content bits so far (leading '0' consumed above)
    var len = 1
    while (len < 8) {
      code = (code << 1) | br.bits(1); len += 1
      if (len == 6 && code == 0x1) { // ESCAPE '000001'
        val run = br.bits(6)
        val b1 = br.bits(8)
        val level =
          if (b1 == 0) { val v = br.bits(8); if (v < 128) fail(); v }
          else if (b1 == 0x80) { val v = br.bits(8); if (v == 0 || v > 128) fail(); v - 256 }
          else if (b1 < 128) b1
          else b1 - 256
        if (level == 0) fail()
        return pack(run, level)
      }
      val hit = AcDecTable(len * 256 + code)
      if (hit >= 0) {
        val r = hit >> 9; val l = hit & 511
        return if (br.bits(1) == 1) pack(r, -l) else pack(r, l)
      }
    }
    fail() // longer B.5 codes: out of disclosed scope
  }
  private val AcEob = Int.MinValue
  private def pack(run: Int, level: Int): Int = (run << 16) | (level & 0xffff)

  private def oddify(f0: Int): Int =
    if (f0 == 0) 0
    else {
      var f = f0
      if ((f & 1) == 0) f = if (f > 0) f - 1 else f + 1
      if (f > 2047) 2047 else if (f < -2048) -2048 else f
    }

  private def decodeChecked(data: Array[Byte], maxOutBytes: Long)
      : Option[Multimodal.RawVideoClip] = {
    val codes = startCodes(data)
    if (codes.isEmpty) return None
    var width = 0; var height = 0
    var mbW = 0; var mbH = 0; var pw = 0; var ph = 0
    val intraQ = DefaultIntraQ.clone()
    var yP: Array[Int] = null; var cbP: Array[Int] = null; var crP: Array[Int] = null
    var inPicture = false
    var outBytes = 0L
    val frames = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    val block = new Array[Int](64)
    val pels = new Array[Int](64)

    def commitFrame(): Unit = {
      if (!inPicture) return
      val bgr = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = yP(y * pw + x)
          val cb = cbP((y / 2) * (pw / 2) + x / 2) - 128
          val cr = crP((y / 2) * (pw / 2) + x / 2) - 128
          def cl(v: Double): Byte = {
            val i = math.round(v).toInt
            (if (i < 0) 0 else if (i > 255) 255 else i).toByte
          }
          val o = (y * width + x) * 3
          bgr(o) = cl(yy + 1.772 * cb)
          bgr(o + 1) = cl(yy - 0.344136 * cb - 0.714136 * cr)
          bgr(o + 2) = cl(yy + 1.402 * cr)
          x += 1
        }
        y += 1
      }
      frames += bgr
      inPicture = false
    }

    var ci = 0
    while (ci < codes.length) {
      val unitStart = codes(ci) + 3
      if (unitStart >= data.length) fail()
      val code = data(unitStart) & 0xff
      val unitEnd = if (ci + 1 < codes.length) codes(ci + 1) else data.length
      val br = new BitReader(data, unitEnd * 8)
      br.bitPos = (unitStart + 1) * 8
      code match {
        case 0xb3 => // sequence header
          val w0 = br.bits(12); val h0 = br.bits(12)
          if (w0 == 0 || h0 == 0 || w0 > 4095 || h0 > 4095) fail()
          if (width == 0) { width = w0; height = h0 }
          else if (width != w0 || height != h0) fail() // dims must not change
          if (width.toLong * height > (1L << 22)) fail() // decode-bomb cap
          br.bits(4); br.bits(4) // aspect, rate
          br.bits(18); if (br.bits(1) != 1) fail() // bit_rate + marker
          br.bits(10); br.bits(1) // vbv, constrained
          if (br.bits(1) == 1) { // load_intra_quantizer_matrix
            var i = 0
            while (i < 64) { intraQ(Zigzag(i)) = br.bits(8); i += 1 }
            if (intraQ.exists(_ == 0)) fail()
          }
          if (br.bits(1) == 1) { // load_non_intra (unused in I-only; skip)
            var i = 0
            while (i < 64) { br.bits(8); i += 1 }
          }
          mbW = (width + 15) / 16; mbH = (height + 15) / 16
          pw = mbW * 16; ph = mbH * 16
          if (yP == null) {
            yP = new Array[Int](pw * ph)
            cbP = new Array[Int]((pw / 2) * (ph / 2))
            crP = new Array[Int]((pw / 2) * (ph / 2))
          }
        case 0xb8 => // GOP header: fixed fields, nothing to keep
          commitFrame()
          br.bits(25); br.bits(1); br.bits(1)
        case 0x00 => // picture header
          commitFrame()
          if (width == 0) fail() // no sequence header yet
          br.bits(10) // temporal_reference
          val ptype = br.bits(3)
          if (ptype != 1) fail() // I pictures only (disclosed scope)
          br.bits(16) // vbv_delay
          while (br.bits(1) == 1) br.bits(8) // extra_information_picture
          outBytes += width.toLong * height * 3
          if (outBytes > maxOutBytes) fail()
          inPicture = true
        case s if s >= 0x01 && s <= 0xaf => // slice
          if (!inPicture) fail()
          val sliceRow = s - 1 // first MB row this slice addresses
          var qscale = br.bits(5)
          if (qscale == 0) fail()
          while (br.bits(1) == 1) br.bits(8) // extra_information_slice
          var mbAddr = sliceRow * mbW - 1
          var dcY = 128; var dcCb = 128; var dcCr = 128
          while (br.hasOneBit) {
            // macroblock_address_increment (stuffing + escape aware)
            var incr = 0
            var reading = true
            while (reading) {
              // Table B.1 prefix walk
              var c = 0; var len = 0
              var matched = -1
              while (matched < 0) {
                c = (c << 1) | br.bits(1); len += 1
                matched = addrIncrValue(c, len)
                if (matched < 0 && len >= 11) fail()
              }
              matched match {
                case AddrStuffing => () // consume and keep reading
                case AddrEscape => incr += 33
                case v => incr += v; reading = false
              }
            }
            mbAddr += incr
            if (incr != 1 && mbAddr != sliceRow * mbW + incr - 1)
              fail() // I pictures: no skipped macroblocks mid-slice
            if (mbAddr < 0 || mbAddr >= mbW * mbH) fail()
            if (incr > 1) { dcY = 128; dcCb = 128; dcCr = 128 }
            // macroblock_type (Table B.2a)
            if (br.bits(1) == 0) {
              if (br.bits(1) != 1) fail()
              qscale = br.bits(5)
              if (qscale == 0) fail()
            }
            val my = (mbAddr / mbW) * 16; val mx = (mbAddr % mbW) * 16
            var blk = 0
            while (blk < 6) {
              java.util.Arrays.fill(block, 0)
              val luma = blk < 4
              val diff = decodeDcDiff(br, luma)
              val pred = if (luma) dcY else if (blk == 4) dcCb else dcCr
              val dc = pred + diff
              if (dc < 0 || dc > 255) fail()
              if (luma) dcY = dc else if (blk == 4) dcCb = dc else dcCr = dc
              block(0) = dc * 8
              var zi = 0
              var eob = false
              while (!eob) {
                val packed = decodeAc(br)
                if (packed == AcEob) eob = true
                else {
                  val run = packed >>> 16
                  val level = (packed << 16) >> 16 // sign-extend low 16
                  zi += run + 1
                  if (zi > 63) fail()
                  block(Zigzag(zi)) = oddify(2 * level * qscale * intraQ(Zigzag(zi)) / 16)
                }
              }
              idct(block, pels)
              if (luma) {
                val x0 = mx + (blk % 2) * 8; val y0 = my + (blk / 2) * 8
                var by = 0
                while (by < 8) {
                  var bx = 0
                  while (bx < 8) {
                    yP((y0 + by) * pw + x0 + bx) = pels(by * 8 + bx); bx += 1
                  }
                  by += 1
                }
              } else {
                val p = if (blk == 4) cbP else crP
                val x0 = (mbAddr % mbW) * 8; val y0 = (mbAddr / mbW) * 8
                var by = 0
                while (by < 8) {
                  var bx = 0
                  while (bx < 8) {
                    p((y0 + by) * (pw / 2) + x0 + bx) = pels(by * 8 + bx); bx += 1
                  }
                  by += 1
                }
              }
              blk += 1
            }
          }
        case 0xb7 => // sequence end
          commitFrame()
        case 0xb2 | 0xb5 => // user data / extension: skip to next unit
          ()
        case _ => fail()
      }
      ci += 1
    }
    commitFrame()
    if (frames.isEmpty) None
    else Some(Multimodal.RawVideoClip(width, height, frames.toIndexedSeq))
  }

  private val AddrStuffing = -101
  private val AddrEscape = -102

  /** Table B.1 macroblock_address_increment: value for (code, len), or
    * -1 when no entry matches yet (keep reading bits).
    */
  private def addrIncrValue(code: Int, len: Int): Int = (len, code) match {
    case (1, 1) => 1
    case (3, 3) => 2
    case (3, 2) => 3
    case (4, 3) => 4
    case (4, 2) => 5
    case (5, 3) => 6
    case (5, 2) => 7
    case (7, 7) => 8
    case (7, 6) => 9
    case (8, 11) => 10
    case (8, 10) => 11
    case (8, 9) => 12
    case (8, 8) => 13
    case (8, 7) => 14
    case (8, 6) => 15
    case (10, 23) => 16
    case (10, 22) => 17
    case (10, 21) => 18
    case (10, 20) => 19
    case (10, 19) => 20
    case (10, 18) => 21
    case (11, 35) => 22
    case (11, 34) => 23
    case (11, 33) => 24
    case (11, 32) => 25
    case (11, 31) => 26
    case (11, 30) => 27
    case (11, 29) => 28
    case (11, 28) => 29
    case (11, 27) => 30
    case (11, 26) => 31
    case (11, 25) => 32
    case (11, 24) => 33
    case (11, 15) => AddrStuffing // '0000 0001 111'
    case (11, 8) => AddrEscape // '0000 0001 000'
    case _ => -1
  }
}
