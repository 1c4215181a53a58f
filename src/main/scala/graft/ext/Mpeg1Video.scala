package graft.ext

/** MPEG-1 Video (ISO/IEC 11172-2) — from-scratch I+P codec, pure
  * JVM byte/bit parsing, no codec library. Retires the last multimodal
  * stub: compressed video now rides the same real-wire discipline as
  * JPEG/PNG/FLAC/MPEG-1-audio ([[Jpeg]], [[Png]], [[Flac]], [[Mpeg1]]).
  *
  * SCOPE (disclosed): intra (I) and forward-predicted (P) pictures.
  * `encode(gopSize = 0)` emits the all-keyframe profile (every frame
  * independently decodable — what a frame-sampling pipeline wants);
  * `gopSize = n` emits I at every n-th frame and P in between, with
  * full-pel motion search (optional half-pel refinement), skipped
  * macroblocks, motion-only (pred-m), coded-residual (pred-mc/pred-c)
  * and intra-fallback macroblock types. The decoder reconstructs both
  * picture types: Table B.2b P macroblock types, Table B.4 motion
  * vector VLCs with the §2.4.4.3 wraparound/differential rules,
  * half-pel interpolation, truncating chroma vector halving, skipped-
  * macroblock copy, non-intra dequantization `((2·L + sgn L)·q·W)/16`
  * with oddification, and dct_coeff_first handling. B and D pictures
  * (bidirectional decode needs a future reference) stay out of scope
  * and decode to the contracted `None`, never a crash. The rest of the
  * wire is the real standard: 12-bit dims, default or downloaded
  * quantizer matrices, slice-per-row structure, Table B.1 macroblock
  * addressing, B.5a/B.5b DC size VLCs, the short-code subset of the
  * B.5 DCT coefficient table plus full ESCAPE coding, MPEG-1 intra
  * dequantization with oddification mismatch control, and 4:2:0 chroma.
  *
  * Subset discipline (shared with the B.5 handling): the encoder
  * restricts itself to run/level codes in the 2-7 bit B.5 subset and
  * ESCAPE-codes everything else (always legal per the spec, slightly
  * less compact); the decoder additionally understands the 8-bit
  * `0010 0xxx` group. Longer B.5 codes — which this encoder never
  * emits and no other encoder exists in this container to emit —
  * decode to the contracted `None` rather than risking a silent
  * mis-decode from a mistyped table row. The same discipline governs
  * Table B.3 coded_block_patterns: encoder and decoder share the 29
  * short-code (3-7 bit) entries; a macroblock whose natural pattern
  * has no short code is encoded as an intra macroblock instead
  * (bit-exact semantics, marginally more bits), and the decoder
  * rejects the 8-9 bit tail codes it can never receive here.
  *
  * Cited behaviors: start-code layer structure (ISO 11172-2 §2.4.2),
  * intra dct_recon with oddification (§2.4.4.2), non-intra dct_recon
  * (§2.4.4.3), motion vector reconstruction wraparound (§2.4.4.3),
  * DC predictor reset to 1024 at slice start and after non-intra
  * macroblocks (§2.4.4.1), default quantizer matrices (§2.4.3.2).
  * The reference pipeline (kavyarana/cryptocurrency-data-pipeline)
  * has no video surface at all — this is north-star scope for the
  * 100 TB training-data engine.
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

  /** Default non-intra quantizer matrix: flat 16 (§2.4.3.2). */
  private val DefaultNonIntraQ: Array[Int] = Array.fill(64)(16)

  /** coded_block_pattern (Table B.3, shared with H.261 Table 9) —
    * the 29-entry short-code (3-7 bit) core both sides agree on:
    * cbp → (code, bits). Patterns outside this set are never emitted
    * (the encoder falls back to an intra macroblock) and the decoder
    * rejects the 8-9 bit tail rather than risking a mistyped row —
    * the B.5 subset discipline applied to B.3.
    */
  private val CbpEncCodes: Map[Int, (Int, Int)] = Map(
    60 -> (0x7, 3),
    4 -> (0xd, 4), 8 -> (0xc, 4), 16 -> (0xb, 4), 32 -> (0xa, 4),
    12 -> (0x13, 5), 48 -> (0x12, 5), 20 -> (0x11, 5), 40 -> (0x10, 5),
    28 -> (0xf, 5), 44 -> (0xe, 5), 52 -> (0xd, 5), 56 -> (0xc, 5),
    1 -> (0xb, 5), 61 -> (0xa, 5), 2 -> (0x9, 5), 62 -> (0x8, 5),
    24 -> (0xf, 6), 36 -> (0xe, 6), 3 -> (0xd, 6), 63 -> (0xc, 6),
    5 -> (0x17, 7), 9 -> (0x16, 7), 17 -> (0x15, 7), 33 -> (0x14, 7),
    6 -> (0x13, 7), 10 -> (0x12, 7), 18 -> (0x11, 7), 34 -> (0x10, 7))

  /** Flat B.3 decode table over (len ≤ 7, code < 128): cbp or -1. */
  private val CbpDecTable: Array[Int] = {
    val t = Array.fill(8 * 128)(-1)
    CbpEncCodes.foreach { case (cbp, (c, n)) => t(n * 128 + c) = cbp }
    t
  }

  /** Table B.1 encode side: value 1-33 → (code, bits), inverted from
    * [[addrIncrValue]] so encoder and decoder share one source table.
    */
  private val B1EncCodes: Array[(Int, Int)] = {
    val a = new Array[(Int, Int)](34)
    var len = 1
    while (len <= 11) {
      var code = 0
      while (code < (1 << len)) {
        val v = addrIncrValue(code, len)
        if (v >= 1 && v <= 33 && a(v) == null) a(v) = (code, len)
        code += 1
      }
      len += 1
    }
    a
  }

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
  private def idct(coef: Array[Int], out: Array[Int]): Unit =
    idctInto(coef, out, clamp = true)

  /** Inverse 8×8 DCT; `clamp = false` keeps signed values (non-intra
    * RESIDUALS add to the prediction before the final 0-255 clamp).
    */
  private def idctInto(coef: Array[Int], out: Array[Int], clamp: Boolean): Unit = {
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
        out(y * 8 + x) =
          if (!clamp) p else if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // -------------------------------------------- motion compensation

  /** Forward prediction of a `bw`×`bh` block at (x0, y0) from `ref`
    * with a HALF-PEL vector (vxh, vyh), §2.4.4.2 interpolation
    * (integer average rounded away from zero: `(a+b+1)>>1`,
    * `(a+b+c+d+2)>>2`). Returns false when any sample falls outside
    * the `stride`×`rows` plane — illegal wire, never emitted here.
    * Shared by encoder (closed-loop recon) and decoder, so both
    * reconstruct bit-identically.
    */
  private def mcBlock(ref: Array[Int], stride: Int, rows: Int,
      x0: Int, y0: Int, bw: Int, bh: Int, vxh: Int, vyh: Int,
      out: Array[Int]): Boolean = {
    val bx0 = x0 * 2 + vxh; val by0 = y0 * 2 + vyh
    val fx = bx0 & 1; val fy = by0 & 1
    val ix0 = bx0 >> 1; val iy0 = by0 >> 1
    if (ix0 < 0 || iy0 < 0 || ix0 + bw - 1 + fx >= stride ||
        iy0 + bh - 1 + fy >= rows) return false
    var y = 0
    while (y < bh) {
      val r0 = (iy0 + y) * stride + ix0
      val r1 = r0 + fy * stride
      var x = 0
      while (x < bw) {
        val v =
          if (fx == 0 && fy == 0) ref(r0 + x)
          else if (fy == 0) (ref(r0 + x) + ref(r0 + x + 1) + 1) >> 1
          else if (fx == 0) (ref(r0 + x) + ref(r1 + x) + 1) >> 1
          else (ref(r0 + x) + ref(r0 + x + 1) +
            ref(r1 + x) + ref(r1 + x + 1) + 2) >> 2
        out(y * bw + x) = v
        x += 1
      }
      y += 1
    }
    true
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

  /** Emit one (run, level) coefficient code. `first = true` uses the
    * dct_coeff_first form, where run 0 / level ±1 is '1s' instead of
    * '11s' (Table B.5c note 2) — all other codes are shared.
    */
  private def putAc(w: BitWriter, run: Int, level: Int,
      first: Boolean = false): Unit = {
    val a = math.abs(level)
    if (first && run == 0 && a == 1) {
      w.put(1L, 1); w.put(if (level < 0) 1L else 0L, 1)
      return
    }
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
    * When `recon` is non-null it receives the decoder-identical
    * reconstruction (dequant + IDCT) — the closed encoding loop P
    * pictures predict from, so encoder and decoder never drift.
    */
  private def encBlock(w: BitWriter, pels: Array[Int], qscale: Int,
      dcPred: Int, luma: Boolean, intraQ: Array[Int],
      recon: Array[Int] = null): Int = {
    val f = new Array[Double](64)
    fdct(pels, f)
    val dc0 = math.max(0, math.min(255, math.round(f(0) / 8.0).toInt))
    putDcDiff(w, dc0 - dcPred, if (luma) DcLumaCodes else DcChromaCodes)
    val deq = if (recon == null) null else new Array[Int](64)
    if (deq != null) deq(0) = dc0 * 8
    var run = 0
    var zi = 1
    while (zi < 64) {
      val r = Zigzag(zi)
      // level inverts dct_recon = 2·level·q·W/16: level ≈ 8F/(q·W)
      var level = math.round(8.0 * f(r) / (qscale.toDouble * intraQ(r))).toInt
      if (level > 255) level = 255
      if (level < -255) level = -255
      if (level == 0) run += 1
      else {
        putAc(w, run, level); run = 0
        if (deq != null) deq(r) = oddify(2 * level * qscale * intraQ(r) / 16)
      }
      zi += 1
    }
    w.put(0x2L, 2) // EOB '10'
    if (recon != null) idct(deq, recon)
    dc0
  }

  /** Quantize one 8×8 non-intra RESIDUAL block (§2.4.4.3 inverse:
    * nearest level for recon `(2L + sgn L)·q·W/16`). Returns zigzag-
    * order levels, all-zero when nothing survives the dead zone.
    */
  private def quantNonIntra(res: Array[Int], qscale: Int,
      nonIntraQ: Array[Int]): Array[Int] = {
    val f = new Array[Double](64)
    fdct(res, f)
    val lv = new Array[Int](64)
    var zi = 0
    while (zi < 64) {
      val r = Zigzag(zi)
      val scaled = 16.0 * math.abs(f(r)) / (qscale.toDouble * nonIntraQ(r))
      var a = math.max(0L, math.round((scaled - 1.0) / 2.0)).toInt
      if (a > 255) a = 255
      lv(zi) = if (f(r) < 0) -a else a
      zi += 1
    }
    lv
  }

  /** Emit one coded non-intra block (zigzag levels with ≥1 nonzero):
    * dct_coeff_first + nexts + EOB, and write the decoder-identical
    * dequantized RESIDUAL reconstruction into `recon`.
    */
  private def encResidualBlock(w: BitWriter, lv: Array[Int], qscale: Int,
      nonIntraQ: Array[Int], recon: Array[Int]): Unit = {
    val deq = new Array[Int](64)
    var first = true
    var run = 0
    var zi = 0
    while (zi < 64) {
      val level = lv(zi)
      if (level == 0) run += 1
      else {
        putAc(w, run, level, first)
        val r = Zigzag(zi)
        val sgn = if (level > 0) 1 else -1
        deq(r) = oddify((2 * level + sgn) * qscale * nonIntraQ(r) / 16)
        first = false
        run = 0
      }
      zi += 1
    }
    w.put(0x2L, 2) // EOB
    idctInto(deq, recon, clamp = false)
  }

  // ------------------------------------------------- motion plumbing

  /** Emit a Table B.1 VLC for `value` ≥ 1 (escape-extends above 33). */
  private def putB1(w: BitWriter, value: Int): Unit = {
    var v = value
    while (v > 33) { w.put(0x8L, 11); v -= 33 } // escape '0000 0001 000'
    val (c, n) = B1EncCodes(v)
    w.put(c.toLong, n)
  }

  /** Emit one motion component as a differential vs `prev` with the
    * §2.4.4.3 wraparound (forward_f_code = 1 → range [-16, 15]).
    * Table B.4 is Table B.1 re-keyed: code(0) = '1', code(+m) =
    * B1(2m+1), code(−m) = B1(2m) — verified against the published
    * table for every value (±1 → '010'/'011' … ±16 →
    * '0000 0011 000'/'0000 0011 001').
    */
  private def putMotion(w: BitWriter, target: Int, prev: Int): Unit = {
    var d = target - prev
    if (d > 16) d -= 32 else if (d < -16) d += 32
    if (d == 0) w.put(1L, 1)
    else putB1(w, if (d > 0) 2 * d + 1 else -2 * d)
  }

  /** One Table B.1 prefix walk → value 1-33, [[AddrStuffing]], or
    * [[AddrEscape]] (fails past 11 bits). Shared by macroblock
    * addressing and (re-keyed) motion decode.
    */
  private def readB1(br: BitReader): Int = {
    var c = 0; var len = 0
    while (len < 11) {
      c = (c << 1) | br.bits(1); len += 1
      val m = addrIncrValue(c, len)
      if (m != -1) return m
    }
    fail()
  }

  /** Decode + reconstruct one forward motion component (§2.4.4.3:
    * differential with modular wraparound into [-16f, 16f-1]).
    */
  private def reconMotion(br: BitReader, prev: Int, fFwd: Int,
      rSize: Int): Int = {
    val v = readB1(br)
    if (v == AddrStuffing || v == AddrEscape) fail() // not in Table B.4
    val m = if (v == 1) 0 else if ((v & 1) == 1) (v - 1) / 2 else -(v / 2)
    val r = if (rSize > 0 && m != 0) br.bits(rSize) else 0
    val compl = if (m == 0) 0 else fFwd - 1 - r
    var little = m * fFwd
    var big = 0
    if (little != 0) {
      if (little > 0) { little -= compl; big = little - 32 * fFwd }
      else { little += compl; big = little + 32 * fFwd }
    }
    val mx = 16 * fFwd - 1; val mn = -16 * fFwd
    val nv = prev + little
    val out = if (nv <= mx && nv >= mn) nv else prev + big
    if (out > mx || out < mn) fail()
    out
  }

  /** coded_block_pattern decode — the 3-7 bit B.3 core only (see the
    * table comment for the subset discipline).
    */
  private def readCbp(br: BitReader): Int = {
    var c = 0; var len = 0
    while (len < 7) {
      c = (c << 1) | br.bits(1); len += 1
      val v = CbpDecTable(len * 128 + c)
      if (v >= 0) return v
    }
    fail()
  }

  /** 16×16 SAD of source luma vs the half-pel prediction at
    * (vxh, vyh); Int.MaxValue when the window leaves the plane;
    * early-exits once the running sum passes `bound`.
    */
  private def sadLuma(src: Array[Int], ref: Array[Int], pw: Int, ph: Int,
      x0: Int, y0: Int, vxh: Int, vyh: Int, bound: Int,
      scratch: Array[Int]): Int = {
    if (!mcBlock(ref, pw, ph, x0, y0, 16, 16, vxh, vyh, scratch))
      return Int.MaxValue
    var sad = 0
    var y = 0
    while (y < 16) {
      val r = (y0 + y) * pw + x0
      var x = 0
      while (x < 16) {
        sad += math.abs(src(r + x) - scratch(y * 16 + x))
        x += 1
      }
      if (sad > bound) return Int.MaxValue
      y += 1
    }
    sad
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

  /** Encode top-down BGR frames as an MPEG-1 video elementary stream.
    * `qscale` 1-31; `mbQuantEvery` > 0 re-sends the (same)
    * quantizer_scale on every k-th intra macroblock via the B.2a '01'
    * type — a distinct wire with identical reconstruction.
    * `gopSize = 0` (default) emits the all-keyframe profile;
    * `gopSize = n` emits an I picture every n-th frame and forward-
    * predicted P pictures between them: per macroblock a full-pel
    * motion search over ±`searchRange` (plus a half-pel refinement
    * when `halfPel`) against the closed-loop reconstruction picks
    * skip / pred-m / pred-c / pred-mc, falling back to an intra
    * macroblock when the residual is large or its coded_block_pattern
    * has no short B.3 code (see the table comment).
    * `bFrames = k` (requires `gopSize > 0`) additionally codes k
    * bidirectionally-predicted B pictures between consecutive anchors
    * (anchor cadence `k+1`; the final frame is always an anchor so no
    * B dangles): per macroblock the encoder searches BOTH anchors,
    * picks forward / backward / interpolated / intra, and emits in
    * canonical transmission order (each anchor before the B pictures
    * it closes) with display-order temporal references.
    */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]],
      qscale: Int = 3, mbQuantEvery: Int = 0, gopSize: Int = 0,
      searchRange: Int = 3, halfPel: Boolean = false,
      bFrames: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 4095 && height <= 2800,
      "dims must fit 12-bit headers and the 0xAF slice-code ceiling")
    require(qscale >= 1 && qscale <= 31, "quantizer_scale is 5 bits, 1-31")
    require(frames.nonEmpty && frames.forall(_.length == width * height * 3),
      "frames must be w*h*3 BGR")
    require(searchRange >= 0 && searchRange <= 7,
      "±7 full-pel keeps every differential inside the f_code=1 range")
    require(bFrames >= 0 && (bFrames == 0 || gopSize > 0),
      "B pictures need a predictive anchor cadence (gopSize > 0)")
    val mbW = (width + 15) / 16; val mbH = (height + 15) / 16
    val pw = mbW * 16; val ph = mbH * 16
    val cw = pw / 2; val chh = ph / 2
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
    // closed-loop reconstruction planes: ref = previous ANCHOR recon
    // (the forward reference), cur = the anchor being encoded (and the
    // backward reference while its B group is coded). B pictures are
    // referenced by nothing, so their recon is never materialized.
    val track = gopSize > 0
    var refY: Array[Int] = if (track) new Array[Int](pw * ph) else null
    var refCb: Array[Int] = if (track) new Array[Int](cw * chh) else null
    var refCr: Array[Int] = if (track) new Array[Int](cw * chh) else null
    var curY: Array[Int] = if (track) new Array[Int](pw * ph) else null
    var curCb: Array[Int] = if (track) new Array[Int](cw * chh) else null
    var curCr: Array[Int] = if (track) new Array[Int](cw * chh) else null
    val block = new Array[Int](64)
    val rec = new Array[Int](64)
    val pred = new Array[Int](64)
    val pred2 = new Array[Int](64)
    val scratch16 = new Array[Int](256)

    def grab(src: Array[Int], stride: Int, x0: Int, y0: Int): Unit = {
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          block(by * 8 + bx) = src((y0 + by) * stride + x0 + bx); bx += 1
        }
        by += 1
      }
    }
    def put8(dst: Array[Int], stride: Int, x0: Int, y0: Int,
        src: Array[Int]): Unit = {
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          dst((y0 + by) * stride + x0 + bx) = src(by * 8 + bx); bx += 1
        }
        by += 1
      }
    }
    def copyRect(src: Array[Int], dst: Array[Int], stride: Int,
        x0: Int, y0: Int, bw: Int, bh: Int): Unit = {
      var by = 0
      while (by < bh) {
        System.arraycopy(src, (y0 + by) * stride + x0,
          dst, (y0 + by) * stride + x0, bw)
        by += 1
      }
    }

    /** BGR frame → padded (Y, Cb, Cr) planes (4:2:0). */
    def toPlanes(bgr: Array[Byte]): (Array[Int], Array[Int], Array[Int]) = {
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
      (yP, subsample(cbF, pw, ph), subsample(crF, pw, ph))
    }

    def writePictureHeader(displayIdx: Int, ptype: Int): Unit = {
      w.startCode(0x00)
      w.put((displayIdx % 1024).toLong, 10)
      w.put(ptype.toLong, 3)
      w.put(0xffffL, 16)
      if (ptype >= 2) { w.put(0L, 1); w.put(1L, 3) } // fwd: full_pel=0, f=1
      if (ptype == 3) { w.put(0L, 1); w.put(1L, 3) } // bwd: full_pel=0, f=1
      w.put(0L, 1) // extra_bit_picture
    }

    /** Full-pel (optionally half-pel-refined) luma search against one
      * reference plane; returns (vxh, vyh, sad) in half-pel units.
      */
    def search(srcY: Array[Int], refPlane: Array[Int], x0: Int,
        y0: Int): (Int, Int, Int) = {
      var bestVx = 0; var bestVy = 0
      var bestSad =
        sadLuma(srcY, refPlane, pw, ph, x0, y0, 0, 0, Int.MaxValue, scratch16)
      if (bestSad > 0 && searchRange > 0) {
        var dy = -searchRange
        while (dy <= searchRange && bestSad > 0) {
          var dx = -searchRange
          while (dx <= searchRange && bestSad > 0) {
            if (dx != 0 || dy != 0) {
              val s = sadLuma(srcY, refPlane, pw, ph, x0, y0,
                dx * 2, dy * 2, bestSad, scratch16)
              if (s < bestSad) { bestSad = s; bestVx = dx * 2; bestVy = dy * 2 }
            }
            dx += 1
          }
          dy += 1
        }
        if (halfPel && bestSad > 0) {
          val cx = bestVx; val cy = bestVy
          var k = 0
          while (k < 8) {
            val hx = cx + HalfPelDx(k); val hy = cy + HalfPelDy(k)
            val s = sadLuma(srcY, refPlane, pw, ph, x0, y0, hx, hy,
              bestSad, scratch16)
            if (s < bestSad) { bestSad = s; bestVx = hx; bestVy = hy }
            k += 1
          }
        }
      }
      (bestVx, bestVy, bestSad)
    }

    /** Prediction of one 8x8 block (blk 0-5 of the macroblock at
      * mx,row) into `out`: forward from (fy,fcb,fcr) and/or backward
      * from (by_,bcb,bcr), interpolated when both.
      */
    def predictBlock(blk: Int, mx: Int, row: Int,
        useF: Boolean, fvx: Int, fvy: Int,
        fy: Array[Int], fcb: Array[Int], fcr: Array[Int],
        useB: Boolean, bvx: Int, bvy: Int,
        by_ : Array[Int], bcb: Array[Int], bcr: Array[Int],
        out: Array[Int]): Unit = {
      val luma = blk < 4
      val (stride, rows, bx, byy) =
        if (luma) (pw, ph, mx * 16 + (blk % 2) * 8, row * 16 + (blk / 2) * 8)
        else (cw, chh, mx * 8, row * 8)
      val fp = if (luma) fy else if (blk == 4) fcb else fcr
      val bp = if (luma) by_ else if (blk == 4) bcb else bcr
      if (useF)
        mcBlock(fp, stride, rows, bx, byy, 8, 8,
          if (luma) fvx else fvx / 2, if (luma) fvy else fvy / 2, out)
      if (useB) {
        val into = if (useF) pred2 else out
        mcBlock(bp, stride, rows, bx, byy, 8, 8,
          if (luma) bvx else bvx / 2, if (luma) bvy else bvy / 2, into)
        if (useF) {
          var i = 0
          while (i < 64) { out(i) = (out(i) + pred2(i) + 1) >> 1; i += 1 }
        }
      }
    }

    /** Quantize the 6 residual blocks of one macroblock against the
      * given prediction; fills `levels`, returns the cbp mask.
      */
    def residualCbp(mx: Int, row: Int, srcY: Array[Int], srcCb: Array[Int],
        srcCr: Array[Int],
        useF: Boolean, fvx: Int, fvy: Int,
        fy: Array[Int], fcb: Array[Int], fcr: Array[Int],
        useB: Boolean, bvx: Int, bvy: Int,
        by_ : Array[Int], bcb: Array[Int], bcr: Array[Int],
        levels: Array[Array[Int]]): Int = {
      var cbp = 0
      var blk = 0
      while (blk < 6) {
        predictBlock(blk, mx, row, useF, fvx, fvy, fy, fcb, fcr,
          useB, bvx, bvy, by_, bcb, bcr, pred)
        if (blk < 4)
          grab(srcY, pw, mx * 16 + (blk % 2) * 8, row * 16 + (blk / 2) * 8)
        else grab(if (blk == 4) srcCb else srcCr, cw, mx * 8, row * 8)
        var i = 0
        while (i < 64) { block(i) -= pred(i); i += 1 }
        val lv = quantNonIntra(block, qscale, DefaultNonIntraQ)
        levels(blk) = lv
        var any = false
        i = 0
        while (i < 64 && !any) { any = lv(i) != 0; i += 1 }
        if (any) cbp |= 32 >> blk
        blk += 1
      }
      cbp
    }

    /** Emit one intra macroblock body (blocks only — the caller wrote
      * address + type), updating dcs and (if `reconInto`) cur planes.
      */
    def intraMb(mx: Int, row: Int, dcs: Array[Int],
        srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int],
        reconInto: Boolean): Unit = {
      var blk = 0
      while (blk < 4) {
        val bx = mx * 16 + (blk % 2) * 8; val by = row * 16 + (blk / 2) * 8
        grab(srcY, pw, bx, by)
        dcs(0) = encBlock(w, block, qscale, dcs(0), luma = true,
          DefaultIntraQ, if (reconInto) rec else null)
        if (reconInto) put8(curY, pw, bx, by, rec)
        blk += 1
      }
      grab(srcCb, cw, mx * 8, row * 8)
      dcs(1) = encBlock(w, block, qscale, dcs(1), luma = false,
        DefaultIntraQ, if (reconInto) rec else null)
      if (reconInto) put8(curCb, cw, mx * 8, row * 8, rec)
      grab(srcCr, cw, mx * 8, row * 8)
      dcs(2) = encBlock(w, block, qscale, dcs(2), luma = false,
        DefaultIntraQ, if (reconInto) rec else null)
      if (reconInto) put8(curCr, cw, mx * 8, row * 8, rec)
    }

    /** Encode one I picture (slices of intra macroblocks). */
    def encodeI(srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      var row = 0
      while (row < mbH) {
        w.startCode(row + 1) // slice_vertical_position
        w.put(qscale.toLong, 5)
        w.put(0L, 1) // extra_bit_slice
        val dcs = Array(128, 128, 128)
        var mx = 0
        while (mx < mbW) {
          w.put(1L, 1) // macroblock_address_increment = 1
          val sendQ = mbQuantEvery > 0 && mx % mbQuantEvery == 0
          if (sendQ) { w.put(1L, 2); w.put(qscale.toLong, 5) } // '01' + qscale
          else w.put(1L, 1) // '1' intra
          intraMb(mx, row, dcs, srcY, srcCb, srcCr, reconInto = track)
          mx += 1
        }
        row += 1
      }
    }

    /** Encode one P picture predicting from the ref (last anchor)
      * planes; reconstruction goes to cur.
      */
    def encodeP(srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      val levels = new Array[Array[Int]](6)
      var row = 0
      while (row < mbH) {
        w.startCode(row + 1)
        w.put(qscale.toLong, 5)
        w.put(0L, 1)
        val dcs = Array(128, 128, 128)
        var pmx = 0; var pmy = 0
        var pending = 0
        var mx = 0
        while (mx < mbW) {
          val x0 = mx * 16; val y0 = row * 16
          val (bestVx, bestVy, bestSad) = search(srcY, refY, x0, y0)
          val useIntra0 = bestSad > 24 * 256 // scene-change heuristic
          var cbp = 0
          if (!useIntra0)
            cbp = residualCbp(mx, row, srcY, srcCb, srcCr,
              useF = true, bestVx, bestVy, refY, refCb, refCr,
              useB = false, 0, 0, null, null, null, levels)
          val interOk =
            !useIntra0 && (cbp == 0 || CbpEncCodes.contains(cbp))
          if (interOk && cbp == 0 && bestVx == 0 && bestVy == 0 &&
              mx != 0 && mx != mbW - 1) {
            // skipped macroblock: recon = co-located ref copy
            pending += 1
            copyRect(refY, curY, pw, x0, y0, 16, 16)
            copyRect(refCb, curCb, cw, mx * 8, row * 8, 8, 8)
            copyRect(refCr, curCr, cw, mx * 8, row * 8, 8, 8)
            dcs(0) = 128; dcs(1) = 128; dcs(2) = 128
            pmx = 0; pmy = 0
          } else if (!interOk) {
            // intra macroblock inside the P picture
            putB1(w, pending + 1); pending = 0
            w.put(0x3L, 5) // B.2b '00011' intra
            intraMb(mx, row, dcs, srcY, srcCb, srcCr, reconInto = true)
            pmx = 0; pmy = 0
          } else {
            putB1(w, pending + 1); pending = 0
            if (cbp == 0) {
              w.put(1L, 3) // '001' pred-m (motion only)
              putMotion(w, bestVx, pmx); putMotion(w, bestVy, pmy)
              pmx = bestVx; pmy = bestVy
            } else if (bestVx == 0 && bestVy == 0) {
              w.put(1L, 2) // '01' pred-c (no motion, coded pattern)
              pmx = 0; pmy = 0
            } else {
              w.put(1L, 1) // '1' pred-mc
              putMotion(w, bestVx, pmx); putMotion(w, bestVy, pmy)
              pmx = bestVx; pmy = bestVy
            }
            if (cbp != 0) {
              val (c, n) = CbpEncCodes(cbp)
              w.put(c.toLong, n)
            }
            // reconstruction: prediction (+ residual on coded blocks)
            var blk = 0
            while (blk < 6) {
              predictBlock(blk, mx, row, useF = true, bestVx, bestVy,
                refY, refCb, refCr, useB = false, 0, 0, null, null, null,
                pred)
              if ((cbp & (32 >> blk)) != 0) {
                encResidualBlock(w, levels(blk), qscale, DefaultNonIntraQ, rec)
                var i = 0
                while (i < 64) {
                  val v = pred(i) + rec(i)
                  pred(i) = if (v < 0) 0 else if (v > 255) 255 else v
                  i += 1
                }
              }
              if (blk < 4)
                put8(curY, pw, x0 + (blk % 2) * 8, y0 + (blk / 2) * 8, pred)
              else
                put8(if (blk == 4) curCb else curCr, cw, mx * 8, row * 8, pred)
              blk += 1
            }
            dcs(0) = 128; dcs(1) = 128; dcs(2) = 128
          }
          mx += 1
        }
        row += 1
      }
    }

    /** Encode one B picture between the ref (forward) and cur
      * (backward) anchor reconstructions. No recon is materialized —
      * nothing ever predicts from a B picture.
      */
    def encodeB(srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int]): Unit = {
      val levels = new Array[Array[Int]](6)
      var row = 0
      while (row < mbH) {
        w.startCode(row + 1)
        w.put(qscale.toLong, 5)
        w.put(0L, 1)
        val dcs = Array(128, 128, 128)
        var pfx = 0; var pfy = 0; var pbx = 0; var pby = 0
        var lastMf = false; var lastMb = false
        var lastValid = false // no skip at slice start / after intra
        var pending = 0
        var mx = 0
        while (mx < mbW) {
          val x0 = mx * 16; val y0 = row * 16
          // skip hypothesis: previous macroblock's directions with the
          // current (unchanged) predictors, zero residual (§2.4.4.4)
          var skipped = false
          if (lastValid && mx != 0 && mx != mbW - 1) {
            val c0 = residualCbp(mx, row, srcY, srcCb, srcCr,
              lastMf, pfx, pfy, refY, refCb, refCr,
              lastMb, pbx, pby, curY, curCb, curCr, levels)
            if (c0 == 0) {
              pending += 1
              dcs(0) = 128; dcs(1) = 128; dcs(2) = 128
              skipped = true
            }
          }
          if (!skipped) {
            val (fvx, fvy, sadF) = search(srcY, refY, x0, y0)
            val (bvx, bvy, sadB) = search(srcY, curY, x0, y0)
            // interpolated SAD at the two winners
            var sadI = 0
            var blk = 0
            while (blk < 4 && sadI < Int.MaxValue) {
              predictBlock(blk, mx, row, useF = true, fvx, fvy,
                refY, refCb, refCr, useB = true, bvx, bvy,
                curY, curCb, curCr, pred)
              grab(srcY, pw, x0 + (blk % 2) * 8, y0 + (blk / 2) * 8)
              var i = 0
              while (i < 64) { sadI += math.abs(block(i) - pred(i)); i += 1 }
              blk += 1
            }
            // mode choice: least SAD; ties prefer interp (cheapest code)
            val useF = sadI <= sadF && sadI <= sadB || sadF <= sadB
            val useB = sadI <= sadF && sadI <= sadB || sadF > sadB
            val bestSad = math.min(sadI, math.min(sadF, sadB))
            var cbp = 0
            val useIntra0 = bestSad > 24 * 256
            if (!useIntra0)
              cbp = residualCbp(mx, row, srcY, srcCb, srcCr,
                useF, fvx, fvy, refY, refCb, refCr,
                useB, bvx, bvy, curY, curCb, curCr, levels)
            if (useIntra0 || !(cbp == 0 || CbpEncCodes.contains(cbp))) {
              putB1(w, pending + 1); pending = 0
              w.put(0x3L, 5) // B.2c '00011' intra
              intraMb(mx, row, dcs, srcY, srcCb, srcCr, reconInto = false)
              pfx = 0; pfy = 0; pbx = 0; pby = 0
              lastValid = false
            } else {
              putB1(w, pending + 1); pending = 0
              // macroblock_type (Table B.2c)
              if (useF && useB) w.put(if (cbp != 0) 0x3L else 0x2L, 2)
              else if (useB) w.put(if (cbp != 0) 0x3L else 0x2L, 3)
              else w.put(if (cbp != 0) 0x3L else 0x2L, 4)
              if (useF) {
                putMotion(w, fvx, pfx); putMotion(w, fvy, pfy)
                pfx = fvx; pfy = fvy
              }
              if (useB) {
                putMotion(w, bvx, pbx); putMotion(w, bvy, pby)
                pbx = bvx; pby = bvy
              }
              if (cbp != 0) {
                val (c, n) = CbpEncCodes(cbp)
                w.put(c.toLong, n)
                var blk = 0
                while (blk < 6) {
                  if ((cbp & (32 >> blk)) != 0)
                    encResidualBlock(w, levels(blk), qscale,
                      DefaultNonIntraQ, rec)
                  blk += 1
                }
              }
              dcs(0) = 128; dcs(1) = 128; dcs(2) = 128
              lastMf = useF; lastMb = useB
              lastValid = true
            }
          }
          mx += 1
        }
        row += 1
      }
    }

    def swapCurRef(): Unit = {
      var t = refY; refY = curY; curY = t
      t = refCb; refCb = curCb; curCb = t
      t = refCr; refCr = curCr; curCr = t
    }

    if (bFrames == 0) {
      frames.zipWithIndex.foreach { case (bgr, fi) =>
        val (yS, cbS, crS) = toPlanes(bgr)
        val isI = !track || fi % gopSize == 0
        writePictureHeader(fi, if (isI) 1 else 2)
        if (isI) encodeI(yS, cbS, crS) else encodeP(yS, cbS, crS)
        if (track) swapCurRef()
      }
    } else {
      // anchors every bFrames+1 display positions (plus a forced final
      // anchor); transmission order = anchor, then the B group before it
      val n = frames.length
      val step = bFrames + 1
      val anchors = (0 until n by step).toBuffer
      if (anchors.last != n - 1) anchors += n - 1
      var prev = -1
      anchors.foreach { pos =>
        val isI = pos == 0 || pos % gopSize == 0
        val (yS, cbS, crS) = toPlanes(frames(pos))
        writePictureHeader(pos, if (isI) 1 else 2)
        if (isI) encodeI(yS, cbS, crS) else encodeP(yS, cbS, crS)
        var b = prev + 1
        while (b < pos) {
          val (yB, cbB, crB) = toPlanes(frames(b))
          writePictureHeader(b, 3)
          encodeB(yB, cbB, crB)
          b += 1
        }
        swapCurRef()
        prev = pos
      }
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
    * or [[AcEob]] for the '10' end-of-block code. `first = true` reads
    * the dct_coeff_first form ('1s' = run 0 / level ±1; EOB cannot be
    * first), otherwise dct_coeff_next.
    */
  private def decodeAc(br: BitReader, first: Boolean = false): Int = {
    // '1x': EOB '10' or run0/level±1 '11s' ('1s' when first)
    if (br.bits(1) == 1) {
      if (first)
        return if (br.bits(1) == 1) pack(0, -1) else pack(0, 1)
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

  /** §2.4.4.2/§2.4.4.3 reconstruction tail: apply oddification FIRST
    * (mismatch control — even values move one step toward zero), then
    * saturate to [-2048, 2047], matching the spec pseudocode order
    * (`if even: dct_recon -= Sign(dct_recon)` precedes the clamp).
    * The order matters at the lower bound: a large-magnitude negative
    * coefficient oddifies (still far below range) and then saturates
    * to -2048 — an EVEN final value, as reference decoders produce.
    */
  private[ext] def oddify(f0: Int): Int =
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
    val nonIntraQ = DefaultNonIntraQ.clone()
    // cur = the picture being decoded; bwd = most recent anchor (the
    // P forward / B backward reference); fwd = the anchor before it
    // (the B forward reference). Anchors rotate cur→bwd→fwd by
    // pointer swap at the next picture header. Legal wire writes all
    // macroblocks of every picture (§2.4.1: slices cover the picture
    // with no gaps), and `covered` VERIFIES it per picture — a
    // structurally valid hostile stream whose slices leave gaps would
    // otherwise commit stale pels from the recycled anchor buffer as
    // if they were this picture's content.
    var yP: Array[Int] = null; var cbP: Array[Int] = null; var crP: Array[Int] = null
    var bwdY: Array[Int] = null; var bwdCb: Array[Int] = null; var bwdCr: Array[Int] = null
    var fwdY: Array[Int] = null; var fwdCb: Array[Int] = null; var fwdCr: Array[Int] = null
    var inPicture = false
    var picType = 0 // 1 = I, 2 = P, 3 = B
    var fullPel = false
    var fFwd = 1; var rSize = 0 // forward_f, forward_r_size
    var fullPelB = false
    var fBwd = 1; var rSizeB = 0 // backward_f, backward_r_size
    var anchorsSeen = 0
    var outBytes = 0L
    // display-order reorder: anchors are emitted when the NEXT anchor
    // commits (B pictures, transmitted after their future anchor but
    // displayed before it, emit immediately)
    var pendingAnchor: Array[Byte] = null
    var covered: java.util.BitSet = null // per-picture macroblock coverage
    val frames = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    val block = new Array[Int](64)
    val pels = new Array[Int](64)
    val pred = new Array[Int](64)
    val pred2 = new Array[Int](64)

    def commitFrame(): Unit = {
      if (!inPicture) return
      // slice-coverage gate: every macroblock must have been written
      // by a coded or skipped macroblock of THIS picture
      if (covered.cardinality() != mbW * mbH) fail()
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
      if (picType == 3) frames += bgr // B: display order = decode order
      else {
        // anchors display AFTER any B pictures that follow them on the
        // wire: hold this one, emit the previously held anchor
        if (pendingAnchor != null) frames += pendingAnchor
        pendingAnchor = bgr
        anchorsSeen += 1
        // rotate references: this anchor becomes the backward
        // reference, the previous one the forward reference
        var t = fwdY; fwdY = bwdY; bwdY = yP; yP = t
        t = fwdCb; fwdCb = bwdCb; bwdCb = cbP; cbP = t
        t = fwdCr; fwdCr = bwdCr; bwdCr = crP; crP = t
      }
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
          if (br.bits(1) == 1) { // load_non_intra_quantizer_matrix
            var i = 0
            while (i < 64) { nonIntraQ(Zigzag(i)) = br.bits(8); i += 1 }
            if (nonIntraQ.exists(_ == 0)) fail()
          }
          mbW = (width + 15) / 16; mbH = (height + 15) / 16
          pw = mbW * 16; ph = mbH * 16
          if (yP == null) {
            yP = new Array[Int](pw * ph)
            cbP = new Array[Int]((pw / 2) * (ph / 2))
            crP = new Array[Int]((pw / 2) * (ph / 2))
            bwdY = new Array[Int](pw * ph)
            bwdCb = new Array[Int]((pw / 2) * (ph / 2))
            bwdCr = new Array[Int]((pw / 2) * (ph / 2))
            fwdY = new Array[Int](pw * ph)
            fwdCb = new Array[Int]((pw / 2) * (ph / 2))
            fwdCr = new Array[Int]((pw / 2) * (ph / 2))
            covered = new java.util.BitSet(mbW * mbH)
          }
        case 0xb8 => // GOP header: fixed fields, nothing to keep
          commitFrame()
          br.bits(25); br.bits(1); br.bits(1)
        case 0x00 => // picture header
          commitFrame()
          if (width == 0) fail() // no sequence header yet
          br.bits(10) // temporal_reference (canonical transmission
          // order assumed: anchors precede the B pictures they bound)
          val ptype = br.bits(3)
          if (ptype < 1 || ptype > 3) fail() // I/P/B; D out of scope
          if (ptype == 2 && anchorsSeen < 1) fail() // P needs an anchor
          if (ptype == 3 && anchorsSeen < 2) fail() // B needs both
          br.bits(16) // vbv_delay
          if (ptype >= 2) {
            fullPel = br.bits(1) == 1
            val fc = br.bits(3) // forward_f_code 1-7
            if (fc == 0) fail()
            fFwd = 1 << (fc - 1); rSize = fc - 1
          }
          if (ptype == 3) {
            fullPelB = br.bits(1) == 1
            val fc = br.bits(3) // backward_f_code 1-7
            if (fc == 0) fail()
            fBwd = 1 << (fc - 1); rSizeB = fc - 1
          }
          while (br.bits(1) == 1) br.bits(8) // extra_information_picture
          outBytes += width.toLong * height * 3
          if (outBytes > maxOutBytes) fail()
          picType = ptype
          covered.clear()
          inPicture = true
        case s if s >= 0x01 && s <= 0xaf => // slice
          if (!inPicture) fail()
          val sliceRow = s - 1 // first MB row this slice addresses
          var qscale = br.bits(5)
          if (qscale == 0) fail()
          while (br.bits(1) == 1) br.bits(8) // extra_information_slice
          var mbAddr = sliceRow * mbW - 1
          var dcY = 128; var dcCb = 128; var dcCr = 128
          var pmx = 0; var pmy = 0 // forward motion predictors
          var pbx = 0; var pby = 0 // backward motion predictors (B)
          // previous macroblock's prediction directions — B skipped
          // macroblocks repeat them (with the current predictors)
          var lastMf = true; var lastMb = false
          val cw = pw / 2

          /** Write an 8×8 block into a plane at (x0, y0). */
          def put8(dst: Array[Int], stride: Int, x0: Int, y0: Int,
              src: Array[Int]): Unit = {
            var by = 0
            while (by < 8) {
              var bx = 0
              while (bx < 8) {
                dst((y0 + by) * stride + x0 + bx) = src(by * 8 + bx); bx += 1
              }
              by += 1
            }
          }

          /** Skipped P macroblock: co-located copy from the last
            * anchor (motion vector 0, no residual).
            */
          def copySkipped(addr: Int): Unit = {
            covered.set(addr)
            val x0 = (addr % mbW) * 16; val y0 = (addr / mbW) * 16
            var by = 0
            while (by < 16) {
              System.arraycopy(bwdY, (y0 + by) * pw + x0,
                yP, (y0 + by) * pw + x0, 16)
              by += 1
            }
            val cx = (addr % mbW) * 8; val cy = (addr / mbW) * 8
            by = 0
            while (by < 8) {
              System.arraycopy(bwdCb, (cy + by) * cw + cx,
                cbP, (cy + by) * cw + cx, 8)
              System.arraycopy(bwdCr, (cy + by) * cw + cx,
                crP, (cy + by) * cw + cx, 8)
              by += 1
            }
          }

          /** The 6-block intra macroblock body (both picture types). */
          def decodeIntraBlocks(): Unit = {
            covered.set(mbAddr)
            val my = (mbAddr / mbW) * 16; val mx = (mbAddr % mbW) * 16
            var blk = 0
            while (blk < 6) {
              java.util.Arrays.fill(block, 0)
              val luma = blk < 4
              val diff = decodeDcDiff(br, luma)
              val dcPred = if (luma) dcY else if (blk == 4) dcCb else dcCr
              val dc = dcPred + diff
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
              if (luma)
                put8(yP, pw, mx + (blk % 2) * 8, my + (blk / 2) * 8, pels)
              else
                put8(if (blk == 4) cbP else crP, cw,
                  (mbAddr % mbW) * 8, (mbAddr / mbW) * 8, pels)
              blk += 1
            }
          }

          /** One coded non-intra residual block added onto `pred`. */
          def decodeResidualOnto(): Unit = {
            java.util.Arrays.fill(block, 0)
            var zi = -1
            var first = true
            var eob = false
            while (!eob) {
              val packed = decodeAc(br, first)
              if (packed == AcEob) eob = true
              else {
                val run = packed >>> 16
                val level = (packed << 16) >> 16
                zi += run + 1
                if (zi > 63) fail()
                val r = Zigzag(zi)
                val sgn = if (level > 0) 1 else -1
                block(r) = oddify((2 * level + sgn) * qscale * nonIntraQ(r) / 16)
                first = false
              }
            }
            idctInto(block, pels, clamp = false)
            var i = 0
            while (i < 64) {
              val v = pred(i) + pels(i)
              pred(i) = if (v < 0) 0 else if (v > 255) 255 else v
              i += 1
            }
          }

          /** Motion-compensated macroblock: forward and/or backward
            * prediction (B averages the two per §2.4.4.4, rounded
            * away from zero), plus the coded residual blocks. Vectors
            * are HALF-PEL (already full_pel-doubled); `cbp = 0` means
            * prediction only.
            */
          def predictMb(useF: Boolean, useB: Boolean, fvx: Int, fvy: Int,
              bvx: Int, bvy: Int, cbp: Int): Unit = {
            covered.set(mbAddr)
            val my = (mbAddr / mbW) * 16; val mx0 = (mbAddr % mbW) * 16
            val cfx = fvx / 2; val cfy = fvy / 2 // chroma: truncate toward 0
            val cbx = bvx / 2; val cby = bvy / 2
            var blk = 0
            while (blk < 6) {
              val luma = blk < 4
              val (refF, refB, stride, rows, bx, by) =
                if (luma)
                  (fwdY, bwdY, pw, ph,
                    mx0 + (blk % 2) * 8, my + (blk / 2) * 8)
                else
                  (if (blk == 4) fwdCb else fwdCr,
                    if (blk == 4) bwdCb else bwdCr, cw, ph / 2,
                    (mbAddr % mbW) * 8, (mbAddr / mbW) * 8)
              // P pictures predict forward from the LAST anchor, which
              // sits in the backward slot of the rotation
              val fPlane = if (picType == 2) refB else refF
              if (useF) {
                if (!mcBlock(fPlane, stride, rows, bx, by, 8, 8,
                  if (luma) fvx else cfx, if (luma) fvy else cfy, pred))
                  fail()
              }
              if (useB) {
                val into = if (useF) pred2 else pred
                if (!mcBlock(refB, stride, rows, bx, by, 8, 8,
                  if (luma) bvx else cbx, if (luma) bvy else cby, into))
                  fail()
                if (useF) { // interpolate, §2.4.4.4 // rounding
                  var i = 0
                  while (i < 64) {
                    pred(i) = (pred(i) + pred2(i) + 1) >> 1; i += 1
                  }
                }
              }
              if (!useF && !useB) fail()
              if ((cbp & (32 >> blk)) != 0) decodeResidualOnto()
              put8(if (luma) yP else if (blk == 4) cbP else crP,
                stride, bx, by, pred)
              blk += 1
            }
            dcY = 128; dcCb = 128; dcCr = 128 // reset after non-intra
          }

          while (br.hasOneBit) {
            // macroblock_address_increment (stuffing + escape aware)
            var incr = 0
            var reading = true
            while (reading) {
              readB1(br) match {
                case AddrStuffing => () // consume and keep reading
                case AddrEscape => incr += 33
                case v => incr += v; reading = false
              }
            }
            if (picType == 1) {
              mbAddr += incr
              if (incr != 1 && mbAddr != sliceRow * mbW + incr - 1)
                fail() // I pictures: no skipped macroblocks mid-slice
              if (mbAddr < 0 || mbAddr >= mbW * mbH) fail()
              if (incr > 1) { dcY = 128; dcCb = 128; dcCr = 128 }
            } else if (picType == 2) {
              // P pictures: in-between macroblocks are skipped copies
              var k = 1
              while (k < incr) {
                mbAddr += 1
                if (mbAddr < 0 || mbAddr >= mbW * mbH) fail()
                copySkipped(mbAddr)
                k += 1
              }
              mbAddr += 1
              if (mbAddr < 0 || mbAddr >= mbW * mbH) fail()
              if (incr > 1) {
                dcY = 128; dcCb = 128; dcCr = 128 // reset after skips
                pmx = 0; pmy = 0
              }
            } else {
              // B pictures: skipped macroblocks repeat the PREVIOUS
              // macroblock's prediction (same directions, predictor
              // vectors unchanged, no residual) — §2.4.4.4
              var k = 1
              while (k < incr) {
                mbAddr += 1
                if (mbAddr < 0 || mbAddr >= mbW * mbH) fail()
                val sf = lastMf || !lastMb // corrupt-wire fallback: fwd
                predictMb(sf, lastMb,
                  if (fullPel) pmx << 1 else pmx,
                  if (fullPel) pmy << 1 else pmy,
                  if (fullPelB) pbx << 1 else pbx,
                  if (fullPelB) pby << 1 else pby, 0)
                k += 1
              }
              mbAddr += 1
              if (mbAddr < 0 || mbAddr >= mbW * mbH) fail()
              if (incr > 1) { dcY = 128; dcCb = 128; dcCr = 128 }
            }
            // macroblock_type
            var mbIntra = true
            var mf = false
            var mb = false
            var pattern = false
            if (picType == 1) { // Table B.2a
              if (br.bits(1) == 0) {
                if (br.bits(1) != 1) fail()
                qscale = br.bits(5)
                if (qscale == 0) fail()
              }
            } else if (picType == 2) { // Table B.2b
              var quantF = false
              if (br.bits(1) == 1) { mf = true; pattern = true; mbIntra = false }
              else if (br.bits(1) == 1) { pattern = true; mbIntra = false }
              else if (br.bits(1) == 1) { mf = true; mbIntra = false }
              else if (br.bits(1) == 1) {
                if (br.bits(1) == 1) () // '00011' intra
                else { quantF = true; mf = true; pattern = true; mbIntra = false }
              }
              else if (br.bits(1) == 1) { quantF = true; pattern = true; mbIntra = false }
              else if (br.bits(1) == 1) { quantF = true } // '000001' intra-q
              else fail()
              if (quantF) {
                qscale = br.bits(5)
                if (qscale == 0) fail()
              }
            } else { // Table B.2c
              var quantF = false
              if (br.bits(1) == 1) { // '1x': interpolated
                mf = true; mb = true; mbIntra = false
                pattern = br.bits(1) == 1
              } else if (br.bits(1) == 1) { // '01x': backward
                mb = true; mbIntra = false
                pattern = br.bits(1) == 1
              } else if (br.bits(1) == 1) { // '001x': forward
                mf = true; mbIntra = false
                pattern = br.bits(1) == 1
              } else if (br.bits(1) == 1) { // '0001x'
                if (br.bits(1) == 1) () // '00011' intra
                else { // '00010' interp + quant + pattern
                  quantF = true; mf = true; mb = true; pattern = true
                  mbIntra = false
                }
              } else if (br.bits(1) == 1) { // '00001x'
                if (br.bits(1) == 1) { // '000011' fwd + quant + pattern
                  quantF = true; mf = true; pattern = true; mbIntra = false
                } else { // '000010' bwd + quant + pattern
                  quantF = true; mb = true; pattern = true; mbIntra = false
                }
              } else if (br.bits(1) == 1) { quantF = true } // '000001' intra-q
              else fail()
              if (quantF) {
                qscale = br.bits(5)
                if (qscale == 0) fail()
              }
            }
            // motion vectors (differential, §2.4.4.3): forward then
            // backward; unused directions leave their predictors
            // untouched in B pictures, reset them in P
            if (mf) {
              pmx = reconMotion(br, pmx, fFwd, rSize)
              pmy = reconMotion(br, pmy, fFwd, rSize)
            } else if (picType == 2 && !mbIntra) { pmx = 0; pmy = 0 }
            if (mb) {
              pbx = reconMotion(br, pbx, fBwd, rSizeB)
              pby = reconMotion(br, pby, fBwd, rSizeB)
            }
            if (picType == 1 || mbIntra) {
              if (picType != 1) { // intra resets every motion predictor
                pmx = 0; pmy = 0; pbx = 0; pby = 0
                lastMf = true; lastMb = false
              }
              decodeIntraBlocks()
            } else {
              val cbp = if (pattern) readCbp(br) else 0
              predictMb(mf || picType == 2, mb,
                if (fullPel) pmx << 1 else pmx,
                if (fullPel) pmy << 1 else pmy,
                if (fullPelB) pbx << 1 else pbx,
                if (fullPelB) pby << 1 else pby, cbp)
              lastMf = mf; lastMb = mb
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
    if (pendingAnchor != null) frames += pendingAnchor // flush the held anchor
    if (frames.isEmpty) None
    else Some(Multimodal.RawVideoClip(width, height, frames.toIndexedSeq))
  }

  private val AddrStuffing = -101
  private val AddrEscape = -102

  /** Half-pel refinement neighborhood (8 neighbors around the best
    * full-pel candidate).
    */
  private val HalfPelDx = Array(-1, 0, 1, -1, 1, -1, 0, 1)
  private val HalfPelDy = Array(-1, -1, -1, 0, 0, 1, 1, 1)

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
