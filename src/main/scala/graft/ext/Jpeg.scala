package graft.ext

import graft.ext.Multimodal.BmpImage

/** Baseline-sequential JPEG (JFIF) codec in pure JVM — the last
  * compressed-codec tier made REAL (the container ships no codec
  * libraries, so this is a from-scratch ITU-T T.81 baseline
  * implementation: marker walk, Huffman entropy decode with byte
  * stuffing and restart markers, dequantization, 8×8 inverse DCT,
  * chroma upsampling, YCbCr→RGB). Same discipline as the
  * [[Multimodal.Wav]]/[[Multimodal.Bmp]]/[[Multimodal.RawVideo]]
  * parsers: corrupt/truncated/unsupported payloads decode to `None`
  * (never an executor crash), output is a [[BmpImage]]-shaped
  * top-down BGR plane so the whole image toolchain (dHash, resize,
  * features, the banded near-dup machinery) applies unchanged.
  *
  * Scope: baseline DCT (SOF0), 8-bit samples, 1 component
  * (grayscale) or 3 components (YCbCr) with sampling factors 1 or 2
  * (covers 4:4:4, 4:2:2, 4:2:0), restart intervals, multi-table
  * DQT/DHT segments. Progressive (SOF2), arithmetic coding, 12-bit,
  * and hierarchical modes return `None` — they are rejections, not
  * crashes.
  *
  * Determinism: the IDCT/FDCT run in IEEE-754 doubles (bit-stable on
  * the JVM — no FMA contraction in scalar Java arithmetic) and the
  * color transforms in integer fixed point, so encode and decode are
  * bit-reproducible across executors and rounds — the property every
  * oracle-checked fixture in this repo leans on.
  *
  * The ENCODER exists for fixtures and tests (synthetic corpora with
  * a replayable recipe, the q140/q202 pattern): Annex K quantization
  * tables scaled by the libjpeg quality formula, Annex K Huffman
  * tables, optional 4:2:0 subsampling and restart intervals — enough
  * surface to exercise every decoder path with bytes we control.
  */
object Jpeg {

  // ------------------------------------------------------- constants

  /** Zigzag index order: zigzag position → natural (row-major) index. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance quantization table (natural order). */
  private val StdLumaQuant: Array[Int] = {
    val zz = Array(
      16, 11, 10, 16, 24, 40, 51, 61,
      12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56,
      14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77,
      24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101,
      72, 92, 95, 98, 112, 100, 103, 99)
    zz // Annex K lists row-major natural order already
  }

  /** Annex K chrominance quantization table (natural order). */
  private val StdChromaQuant: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K typical Huffman tables: (bits per code length 1..16, values)
  private val StdDcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val StdDcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val StdDcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val StdDcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val StdAcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val StdAcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)
  private val StdAcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val StdAcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** cos((2x+1)·u·π/16) table shared by FDCT and IDCT. */
  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  // ----------------------------------------------------- parse guard

  /** Internal control-flow for malformed input: every checked read
    * throws this, [[decode]] catches it once → None. Stackless (it
    * carries no diagnostic payload a caller could see anyway).
    */
  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // -------------------------------------------------- huffman tables

  /** Canonical Huffman table in the mincode/maxcode/valptr form the
    * spec's F.2.2.3 DECODE procedure uses.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k; minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        } else maxCode(l) = -1
        code <<= 1
        l += 1
      }
      if (k != vals.length) fail()
    }
  }

  // ------------------------------------------------------ bit reader

  /** Entropy-segment bit reader: 0xFF00 byte stuffing unstuffed, any
    * other marker inside coded data is malformed (restart markers
    * are consumed byte-aligned by the MCU loop, never seen here).
    */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    def readBit(): Int = {
      if (bitCnt == 0) {
        if (pos >= data.length) fail()
        var b = data(pos) & 0xff; pos += 1
        if (b == 0xff) {
          if (pos >= data.length) fail()
          if ((data(pos) & 0xff) == 0x00) pos += 1
          else fail()
        }
        bitBuf = b; bitCnt = 8
      }
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align (drop partial bits) — restart-marker boundary. */
    def align(): Unit = bitCnt = 0
    def decodeHuff(t: HuffTable): Int = {
      var code = 0; var l = 1
      while (l <= 16) {
        code = (code << 1) | readBit()
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l))
        l += 1
      }
      fail()
    }
  }

  /** EXTEND (spec F.2.2.1): map magnitude bits to a signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  // ------------------------------------------------------------ IDCT

  /** 2-D 8×8 inverse DCT (separable, doubles), block in natural
    * order; output = round + level-shift + clamp into `out`.
    */
  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows: frequency u → spatial x
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val cu = if (u == 0) InvSqrt2 else 1.0
          s += cu * coef(v * 8 + u) * CosTable(x * 8 + u)
          u += 1
        }
        tmp(v * 8 + x) = s * 0.5
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) { // cols: frequency v → spatial y
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          val cv = if (vv == 0) InvSqrt2 else 1.0
          s += cv * tmp(vv * 8 + x) * CosTable(y * 8 + vv)
          vv += 1
        }
        val p = math.round(s * 0.5).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  // ---------------------------------------------------------- decode

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var dcTable: Int, var acTable: Int, var plane: Array[Int],
      var planeW: Int, var planeH: Int)

  /** Decode a baseline JFIF payload to a top-down BGR [[BmpImage]].
    * Corrupt, truncated, or unsupported (progressive/12-bit/4+
    * components/sampling >2) payloads → None.
    */
  def decode(payload: Array[Byte]): Option[BmpImage] =
    try decodeChecked(payload)
    catch { case _: Malformed | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private def decodeChecked(data: Array[Byte]): Option[BmpImage] = {
    if (data == null || data.length < 4) return None
    if ((data(0) & 0xff) != 0xff || (data(1) & 0xff) != 0xd8) return None
    var pos = 2
    def u8(): Int = { if (pos >= data.length) fail(); val b = data(pos) & 0xff; pos += 1; b }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }

    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var sofSeen = false

    while (true) {
      var m = u8()
      if (m != 0xff) fail()
      do { m = u8() } while (m == 0xff) // fill bytes are legal
      m match {
        case 0xd9 => return None // EOI before SOS
        case 0xc0 | 0xc1 => // baseline / extended-sequential Huffman
          val len = u16(); val end = pos + len - 2
          val prec = u8()
          if (prec != 8) fail()
          height = u16(); width = u16()
          // Same decode-bomb caps as Png: 65535x65535 SOF dims would make
          // width*height*3 (and the upsampled plane sizes) overflow Int or
          // allocate multi-GiB buffers from a tiny payload.
          if (width <= 0 || height <= 0 || width > (1 << 20) || height > (1 << 20) ||
            width.toLong * height > (1L << 26)) fail()
          val nc = u8()
          if (nc != 1 && nc != 3) fail()
          comps = Array.tabulate(nc) { _ =>
            val id = u8(); val hv = u8(); val tq = u8()
            val h = (hv >> 4) & 0xf; val v = hv & 0xf
            if (h < 1 || h > 2 || v < 1 || v > 2 || tq > 3) fail()
            Component(id, h, v, tq, 0, 0, null, 0, 0)
          }
          if (pos != end) fail()
          sofSeen = true
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return None // progressive / arithmetic / lossless: unsupported
        case 0xdb => // DQT (possibly several tables per segment)
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val pq = u8()
            val prec = (pq >> 4) & 0xf; val id = pq & 0xf
            if (id > 3 || prec > 1) fail()
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(Zigzag(i)) = if (prec == 0) u8() else u16()
              i += 1
            }
            quant(id) = t
          }
          if (pos != end) fail()
        case 0xc4 => // DHT (possibly several tables per segment)
          val len = u16(); val end = pos + len - 2
          while (pos < end) {
            val tc = u8()
            val cls = (tc >> 4) & 0xf; val id = tc & 0xf
            if (cls > 1 || id > 3) fail()
            val bits = new Array[Int](17)
            var total = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(); total += bits(l); l += 1 }
            if (total > 256 || pos + total > end) fail()
            val vals = new Array[Int](total)
            var i = 0
            while (i < total) { vals(i) = u8(); i += 1 }
            val table = new HuffTable(bits, vals)
            if (cls == 0) dcTables(id) = table else acTables(id) = table
          }
          if (pos != end) fail()
        case 0xdd => // DRI
          val len = u16(); if (len != 4) fail()
          restartInterval = u16()
        case 0xda => // SOS — decode the scan and finish
          if (!sofSeen) fail()
          val len = u16(); val end = pos + len - 2
          val ns = u8()
          if (ns != comps.length) fail() // single interleaved scan only
          var i = 0
          while (i < ns) {
            val cs = u8(); val tt = u8()
            val c = comps.find(_.id == cs).getOrElse(fail())
            c.dcTable = (tt >> 4) & 0xf; c.acTable = tt & 0xf
            if (c.dcTable > 3 || c.acTable > 3) fail()
            i += 1
          }
          u8(); u8(); u8() // Ss/Se/Ah-Al — fixed for baseline
          if (pos != end) fail()
          return Some(decodeScan(data, pos, comps, width, height,
            quant, dcTables, acTables, restartInterval))
        case x if x >= 0xe0 && x <= 0xef => // APPn
          val len = u16(); if (len < 2) fail(); pos += len - 2
          if (pos > data.length) fail()
        case 0xfe => // COM
          val len = u16(); if (len < 2) fail(); pos += len - 2
          if (pos > data.length) fail()
        case _ => fail()
      }
    }
    None // unreachable
  }

  private def decodeScan(
      data: Array[Byte], scanStart: Int, comps: Array[Component],
      width: Int, height: Int,
      quant: Array[Array[Int]], dcTables: Array[HuffTable],
      acTables: Array[HuffTable], restartInterval: Int): BmpImage = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * c.h * 8
      c.planeH = mcusY * c.v * 8
      c.plane = new Array[Int](c.planeW * c.planeH)
      if (quant(c.tq) == null) fail()
      if (dcTables(c.dcTable) == null || acTables(c.acTable) == null) fail()
    }
    val br = new BitReader(data, scanStart)
    val dcPred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val pix = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-aligned RSTn between restart intervals; DC predictors
        // reset. A 1-padded final entropy byte can itself be a
        // stuffed 0xFF00 — skip stuffing pairs before the marker.
        br.align()
        while (br.pos + 1 < data.length &&
            (data(br.pos) & 0xff) == 0xff && (data(br.pos + 1) & 0xff) == 0x00)
          br.pos += 2
        if (br.pos + 1 >= data.length) fail()
        if ((data(br.pos) & 0xff) != 0xff) fail()
        val rst = data(br.pos + 1) & 0xff
        if (rst < 0xd0 || rst > 0xd7) fail()
        br.pos += 2
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        val dcT = dcTables(c.dcTable); val acT = acTables(c.acTable)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            val s = br.decodeHuff(dcT)
            if (s > 11) fail()
            dcPred(ci) += extend(br.receive(s), s)
            coef(0) = dcPred(ci) * q(0)
            var k = 1
            while (k < 64) {
              val rs = br.decodeHuff(acT)
              val r = (rs >> 4) & 0xf; val sz = rs & 0xf
              if (sz == 0) {
                if (r == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += r
                if (k > 63) fail()
                coef(Zigzag(k)) = extend(br.receive(sz), sz) * q(Zigzag(k))
                k += 1
              }
            }
            idctBlock(coef, pix)
            // place the block into the component plane
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              val rowOff = (py0 + yy) * c.planeW + px0
              while (xx < 8) {
                c.plane(rowOff + xx) = pix(yy * 8 + xx)
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // upsample + color-convert into top-down BGR
    val bgr = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        val rowOff = y * width * 3
        while (x < width) {
          val g = c.plane(y * c.planeW + x).toByte
          val o = rowOff + x * 3
          bgr(o) = g; bgr(o + 1) = g; bgr(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < height) {
        var x = 0
        val rowOff = y * width * 3
        while (x < width) {
          val lum = cy.plane((y * cy.v / vMax) * cy.planeW + (x * cy.h / hMax))
          val pb = cb.plane((y * cb.v / vMax) * cb.planeW + (x * cb.h / hMax)) - 128
          val pr = cr.plane((y * cr.v / vMax) * cr.planeW + (x * cr.h / hMax)) - 128
          // ITU-R BT.601 inverse, 16-bit fixed point (deterministic)
          val r = lum + ((91881 * pr + 32768) >> 16)
          val g = lum - ((22554 * pb + 46802 * pr + 32768) >> 16)
          val b = lum + ((116130 * pb + 32768) >> 16)
          val o = rowOff + x * 3
          bgr(o) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
          bgr(o + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          bgr(o + 2) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          x += 1
        }
        y += 1
      }
    }
    BmpImage(width, height, bgr)
  }

  // ---------------------------------------------------------- encode

  /** libjpeg quality scaling of a base quantization table. */
  private def scaleQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      if (s < 1) 1 else if (s > 255) 255 else s
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0; private var cnt = 0
    def write(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        buf = (buf << 1) | ((bits >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (spec F.1.2.3). */
    def flush(): Unit = if (cnt > 0) { val n = 8 - cnt; write((1 << n) - 1, n) }
  }

  /** Encoder-side Huffman code table: value → (code, length). */
  private def buildEncTable(bits: Array[Int], vals: Array[Int]): Array[Int] = {
    // packed as (len << 16) | code, indexed by symbol value
    val enc = new Array[Int](256)
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        enc(vals(k)) = (l << 16) | code
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    enc
  }

  private def magnitude(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Forward 8×8 DCT (separable, doubles) of a level-shifted block. */
  private def fdctBlock(in: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: spatial x → frequency u
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) { s += in(y * 8 + x) * CosTable(x * 8 + u); x += 1 }
        val cu = if (u == 0) InvSqrt2 else 1.0
        tmp(y * 8 + u) = s * cu * 0.5
        u += 1
      }
      y += 1
    }
    var v = 0
    while (v < 8) { // cols: spatial y → frequency v
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) { s += tmp(yy * 8 + u) * CosTable(yy * 8 + v); yy += 1 }
        val cv = if (v == 0) InvSqrt2 else 1.0
        out(v * 8 + u) = s * cv * 0.5
        u += 1
      }
      v += 1
    }
  }

  /** Encode a top-down BGR image as baseline JFIF. `subsample420`
    * selects 4:2:0 chroma (2×2 averaged), `subsample422` 4:2:2
    * (horizontal pairs averaged — the asymmetric h=2,v=1 sampling
    * path), default 4:4:4; `restartInterval` > 0 emits DRI + RSTn
    * markers every that many MCUs; `grayscale` drops the chroma
    * components entirely (1-comp scan — the decoder's grayscale
    * path). Deterministic: same pixels + params → same bytes.
    */
  def encode(img: BmpImage, quality: Int = 90,
      subsample420: Boolean = false, restartInterval: Int = 0,
      grayscale: Boolean = false, subsample422: Boolean = false): Array[Byte] = {
    require(!(grayscale && (subsample420 || subsample422)),
      "grayscale has no chroma to subsample")
    require(!(subsample420 && subsample422), "pick one chroma subsampling")
    require(img.width > 0 && img.height > 0, "need positive dims")
    require(img.bgr.length == img.width * img.height * 3, "bgr must be w*h*3")
    val w = img.width; val h = img.height
    val lq = scaleQuant(StdLumaQuant, quality)
    val cq = scaleQuant(StdChromaQuant, quality)

    // RGB → YCbCr planes (BT.601, 16-bit fixed point, deterministic)
    val yP = new Array[Int](w * h)
    val cbP = new Array[Int](w * h)
    val crP = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val b = img.bgr(i * 3) & 0xff
      val g = img.bgr(i * 3 + 1) & 0xff
      val r = img.bgr(i * 3 + 2) & 0xff
      yP(i) = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
      cbP(i) = 128 + ((-11056 * r - 21712 * g + 32768 * b + 32768) >> 16)
      crP(i) = 128 + ((32768 * r - 27440 * g - 5328 * b + 32768) >> 16)
      i += 1
    }
    def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v >> 8); w8(v) }
    // SOI + JFIF APP0
    w16(0xffd8)
    w16(0xffe0); w16(16)
    out.write(Array[Byte]('J', 'F', 'I', 'F', 0))
    w8(1); w8(1); w8(0); w16(1); w16(1); w8(0); w8(0)
    // DQT (8-bit precision; chroma table only when chroma exists)
    if (grayscale) {
      w16(0xffdb); w16(2 + 65)
      w8(0x00); var z = 0; while (z < 64) { w8(lq(Zigzag(z))); z += 1 }
    } else {
      w16(0xffdb); w16(2 + 2 * 65)
      w8(0x00); var z = 0; while (z < 64) { w8(lq(Zigzag(z))); z += 1 }
      w8(0x01); z = 0; while (z < 64) { w8(cq(Zigzag(z))); z += 1 }
    }
    // SOF0
    val nComp = if (grayscale) 1 else 3
    val lumaHV =
      if (grayscale) 0x11
      else if (subsample420) 0x22
      else if (subsample422) 0x21
      else 0x11
    w16(0xffc0); w16(8 + 3 * nComp); w8(8); w16(h); w16(w); w8(nComp)
    w8(1); w8(lumaHV); w8(0) // Y
    if (!grayscale) {
      w8(2); w8(0x11); w8(1) // Cb
      w8(3); w8(0x11); w8(1) // Cr
    }
    // DHT (standard tables)
    def emitDht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      w16(0xffc4); w16(2 + 1 + 16 + vals.length)
      w8((cls << 4) | id)
      var l = 1; while (l <= 16) { w8(bits(l)); l += 1 }
      vals.foreach(w8)
    }
    emitDht(0, 0, StdDcLumaBits, StdDcLumaVals)
    emitDht(1, 0, StdAcLumaBits, StdAcLumaVals)
    if (!grayscale) {
      emitDht(0, 1, StdDcChromaBits, StdDcChromaVals)
      emitDht(1, 1, StdAcChromaBits, StdAcChromaVals)
    }
    if (restartInterval > 0) { w16(0xffdd); w16(4); w16(restartInterval) }
    // SOS
    w16(0xffda); w16(6 + 2 * nComp); w8(nComp)
    w8(1); w8(0x00)
    if (!grayscale) { w8(2); w8(0x11); w8(3); w8(0x11) }
    w8(0); w8(63); w8(0)

    val bw = new BitWriter(out)
    val dcLuma = buildEncTable(StdDcLumaBits, StdDcLumaVals)
    val acLuma = buildEncTable(StdAcLumaBits, StdAcLumaVals)
    val dcChroma = buildEncTable(StdDcChromaBits, StdDcChromaVals)
    val acChroma = buildEncTable(StdAcChromaBits, StdAcChromaVals)
    def writeCode(enc: Array[Int], sym: Int): Unit = {
      val e = enc(sym); bw.write(e & 0xffff, e >>> 16)
    }
    val block = new Array[Int](64)
    val freq = new Array[Double](64)
    val dcPred = new Array[Int](3)

    /** Sample an 8×8 block (edge-replicated) from a plane at
      * component resolution, level-shifted by −128.
      */
    def sampleBlock(plane: Array[Int], pw: Int, ph: Int, x0: Int, y0: Int): Unit = {
      var yy = 0
      while (yy < 8) {
        val sy = math.min(y0 + yy, ph - 1)
        var xx = 0
        while (xx < 8) {
          val sx = math.min(x0 + xx, pw - 1)
          block(yy * 8 + xx) = plane(sy * pw + sx) - 128
          xx += 1
        }
        yy += 1
      }
    }
    def encodeBlock(q: Array[Int], ci: Int, dcT: Array[Int], acT: Array[Int]): Unit = {
      fdctBlock(block, freq)
      val qc = new Array[Int](64)
      var k = 0
      while (k < 64) {
        val n = Zigzag(k)
        qc(k) = math.round(freq(n) / q(n)).toInt
        k += 1
      }
      val diff = qc(0) - dcPred(ci); dcPred(ci) = qc(0)
      val s = magnitude(diff)
      writeCode(dcT, s)
      if (s > 0) bw.write(if (diff < 0) diff - 1 else diff, s)
      var last = 63
      while (last > 0 && qc(last) == 0) last -= 1
      var run = 0
      k = 1
      while (k <= last) {
        if (qc(k) == 0) run += 1
        else {
          while (run > 15) { writeCode(acT, 0xf0); run -= 16 }
          val sz = magnitude(qc(k))
          writeCode(acT, (run << 4) | sz)
          bw.write(if (qc(k) < 0) qc(k) - 1 else qc(k), sz)
          run = 0
        }
        k += 1
      }
      if (last < 63) writeCode(acT, 0x00) // EOB
    }

    if (!subsample420 && !subsample422) {
      // grayscale / 4:4:4 — MCU = one 8×8 block per component
      val mcusX = (w + 7) / 8; val mcusY = (h + 7) / 8
      var mcu = 0; var rst = 0
      while (mcu < mcusX * mcusY) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush(); w16(0xffd0 + (rst & 7)); rst += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        val x0 = (mcu % mcusX) * 8; val y0 = (mcu / mcusX) * 8
        sampleBlock(yP, w, h, x0, y0); encodeBlock(lq, 0, dcLuma, acLuma)
        if (!grayscale) {
          sampleBlock(cbP, w, h, x0, y0); encodeBlock(cq, 1, dcChroma, acChroma)
          sampleBlock(crP, w, h, x0, y0); encodeBlock(cq, 2, dcChroma, acChroma)
        }
        mcu += 1
      }
    } else if (subsample422) {
      // 4:2:2 — MCU = 2 side-by-side luma blocks + one block per
      // chroma at half HORIZONTAL resolution (pairs averaged,
      // round-half-up); the asymmetric h=2,v=1 decode path
      val cw = (w + 1) / 2
      val cbH = new Array[Int](cw * h); val crH = new Array[Int](cw * h)
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < cw) {
          var sCb = 0; var sCr = 0; var n = 0
          var dx = 0
          while (dx < 2) {
            val sx = xx * 2 + dx
            if (sx < w) { sCb += cbP(yy * w + sx); sCr += crP(yy * w + sx); n += 1 }
            dx += 1
          }
          cbH(yy * cw + xx) = clamp255((sCb + n / 2) / n)
          crH(yy * cw + xx) = clamp255((sCr + n / 2) / n)
          xx += 1
        }
        yy += 1
      }
      val mcusX = (w + 15) / 16; val mcusY = (h + 7) / 8
      var mcu = 0; var rst = 0
      while (mcu < mcusX * mcusY) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush(); w16(0xffd0 + (rst & 7)); rst += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        var bx = 0
        while (bx < 2) {
          sampleBlock(yP, w, h, mx * 16 + bx * 8, my * 8)
          encodeBlock(lq, 0, dcLuma, acLuma)
          bx += 1
        }
        sampleBlock(cbH, cw, h, mx * 8, my * 8)
        encodeBlock(cq, 1, dcChroma, acChroma)
        sampleBlock(crH, cw, h, mx * 8, my * 8)
        encodeBlock(cq, 2, dcChroma, acChroma)
        mcu += 1
      }
    } else {
      // 4:2:0 — MCU = 2×2 luma blocks + one block per chroma at
      // half resolution (2×2 average, round-half-up)
      val cw = (w + 1) / 2; val ch = (h + 1) / 2
      val cbH = new Array[Int](cw * ch); val crH = new Array[Int](cw * ch)
      var yy = 0
      while (yy < ch) {
        var xx = 0
        while (xx < cw) {
          var sCb = 0; var sCr = 0; var n = 0
          var dy = 0
          while (dy < 2) {
            var dx = 0
            while (dx < 2) {
              val sy = yy * 2 + dy; val sx = xx * 2 + dx
              if (sy < h && sx < w) {
                sCb += cbP(sy * w + sx); sCr += crP(sy * w + sx); n += 1
              }
              dx += 1
            }
            dy += 1
          }
          cbH(yy * cw + xx) = clamp255((sCb + n / 2) / n)
          crH(yy * cw + xx) = clamp255((sCr + n / 2) / n)
          xx += 1
        }
        yy += 1
      }
      val mcusX = (w + 15) / 16; val mcusY = (h + 15) / 16
      var mcu = 0; var rst = 0
      while (mcu < mcusX * mcusY) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush(); w16(0xffd0 + (rst & 7)); rst += 1
          java.util.Arrays.fill(dcPred, 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            sampleBlock(yP, w, h, mx * 16 + bx * 8, my * 16 + by * 8)
            encodeBlock(lq, 0, dcLuma, acLuma)
            bx += 1
          }
          by += 1
        }
        sampleBlock(cbH, cw, ch, mx * 8, my * 8)
        encodeBlock(cq, 1, dcChroma, acChroma)
        sampleBlock(crH, cw, ch, mx * 8, my * 8)
        encodeBlock(cq, 2, dcChroma, acChroma)
        mcu += 1
      }
    }
    bw.flush()
    w16(0xffd9) // EOI
    out.toByteArray
  }
}
