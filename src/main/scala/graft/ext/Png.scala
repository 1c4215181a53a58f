package graft.ext

import graft.ext.Multimodal.BmpImage

/** PNG codec in pure JVM, including a from-scratch DEFLATE engine —
  * the lossless-image leg of the compressed-codec tier made REAL
  * (the container ships no codec or zip libraries; `java.util.zip`
  * exists on the JVM but the point of this tier is byte-level
  * ownership of the format, same as [[Jpeg]]). Implements RFC 2083
  * (PNG), RFC 1950 (zlib) and RFC 1951 (DEFLATE) from the public
  * specs: chunk walk with CRC-32 verification, IHDR/PLTE/IDAT/IEND,
  * zlib unwrap with Adler-32 verification, all three DEFLATE block
  * types (stored / fixed-Huffman / dynamic-Huffman), and the five
  * scanline filters (None/Sub/Up/Average/Paeth).
  *
  * Same discipline as [[Jpeg]]/[[Multimodal.Wav]]/[[Multimodal.Bmp]]:
  * corrupt, truncated, or out-of-scope payloads decode to `None`
  * (never an executor crash), and output is the shared top-down BGR
  * [[BmpImage]] plane so the whole image toolchain (dHash, resize,
  * features, the guarded banded near-dup machinery) applies
  * unchanged. PNG is LOSSLESS, so `decode(encode(img)) == img`
  * bit-exactly — the strongest roundtrip contract in the tier.
  *
  * Scope: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
  * 4 (gray+alpha) and 6 (RGBA) — alpha is dropped on decode (the
  * dedup fingerprints operate on opaque renderings). Bit depths
  * 1/2/4/16 and Adam7 interlacing return `None`: rejections, not
  * crashes, mirroring [[Jpeg]]'s progressive/arithmetic rejection.
  *
  * The ENCODER exists for fixtures and tests (the q223 pattern:
  * synthetic corpora with a replayable recipe): selectable color
  * type, per-row filter strategy (fixed 0–4 or min-sum-of-abs
  * adaptive), and all three DEFLATE block encodings — stored, greedy
  * hash-chain LZ77 + fixed Huffman, and dynamic Huffman with
  * package-merge length-limited code construction (Larmore–Hirschberg
  * 1990) and the RFC 1951 code-length-code RLE — enough surface to
  * exercise every decoder path with bytes we control.
  */
object Png {

  // ----------------------------------------------------- parse guard

  /** Internal control-flow for malformed input: every checked read
    * throws this, [[decode]] catches it once → None. Stackless.
    */
  private[ext] final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ============================================================ CRC32

  /** CRC-32 (reflected 0xEDB88320, init/xorout 0xFFFFFFFF) — the PNG
    * chunk checksum. Table-driven, one table per JVM.
    */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n; var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c; n += 1
    }
    t
  }

  private def crc32(data: Array[Byte], off: Int, len: Int, init: Int): Int = {
    var c = init
    var i = off
    val end = off + len
    while (i < end) {
      c = CrcTable((c ^ data(i)) & 0xff) ^ (c >>> 8)
      i += 1
    }
    c
  }

  /** Standard whole-value CRC-32 over a byte range (init/xorout
    * 0xFFFFFFFF) — shared with [[Gzip]], which uses the same
    * polynomial for member and header checksums.
    */
  private[ext] def crc32Std(data: Array[Byte], off: Int, len: Int): Int =
    ~crc32(data, off, len, 0xffffffff)

  /** Adler-32 (RFC 1950) — the zlib payload checksum. */
  private def adler32(data: Array[Byte], off: Int, len: Int): Int = {
    var a = 1; var b = 0
    var i = off
    val end = off + len
    while (i < end) {
      // mod every 5552 bytes keeps both sums inside Int range
      val chunkEnd = math.min(end, i + 5552)
      while (i < chunkEnd) {
        a += data(i) & 0xff; b += a
        i += 1
      }
      a %= 65521; b %= 65521
    }
    (b << 16) | a
  }

  // ================================================== DEFLATE decode

  /** LSB-first bit reader (RFC 1951 §3.1.1: data elements are packed
    * starting at the least-significant bit of each byte).
    */
  private final class InfBits(data: Array[Byte], var pos: Int, end: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    def bits(n: Int): Int = {
      while (bitCnt < n) {
        if (pos >= end) fail()
        bitBuf |= (data(pos) & 0xff) << bitCnt
        pos += 1; bitCnt += 8
      }
      val v = bitBuf & ((1 << n) - 1)
      bitBuf >>>= n; bitCnt -= n
      v
    }
    /** Drop partial bits — stored-block boundary is byte-aligned. */
    def alignByte(): Unit = { bitBuf = 0; bitCnt = 0 }
    def bytePos: Int = pos // only valid when byte-aligned
    def seek(p: Int): Unit = { pos = p; bitBuf = 0; bitCnt = 0 }
  }

  /** Canonical Huffman decoder over code LENGTHS (the only thing
    * RFC 1951 transmits) in count/symbol form; codes are read one
    * bit at a time MSB-of-code-first. Rejects oversubscribed length
    * sets at build; undefined codes fail at decode.
    */
  private final class InfHuff(lengths: Array[Int], from: Int, n: Int) {
    val count = new Array[Int](16)
    locally {
      var i = 0
      while (i < n) { val l = lengths(from + i); if (l < 0 || l > 15) fail(); count(l) += 1; i += 1 }
      // Kraft check: oversubscribed → malformed (incomplete is legal
      // for the degenerate one-distance-code case, RFC 1951 §3.2.7)
      var left = 1; var l = 1
      while (l <= 15) { left <<= 1; left -= count(l); if (left < 0) fail(); l += 1 }
    }
    val symbols: Array[Int] = {
      val offs = new Array[Int](16)
      var l = 1
      while (l < 15) { offs(l + 1) = offs(l) + count(l); l += 1 }
      val syms = new Array[Int](n - count(0))
      var i = 0
      while (i < n) {
        val len = lengths(from + i)
        if (len != 0) { syms(offs(len)) = i; offs(len) += 1 }
        i += 1
      }
      syms
    }
    def decode(br: InfBits): Int = {
      var code = 0; var first = 0; var index = 0; var len = 1
      while (len <= 15) {
        code |= br.bits(1)
        val cnt = count(len)
        if (code - cnt < first) return symbols(index + (code - first))
        index += cnt; first += cnt
        first <<= 1; code <<= 1
        len += 1
      }
      fail()
    }
  }

  /** Length-code geometry (RFC 1951 §3.2.5): symbol 257+i → base/extra. */
  private val LenBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  private val DistBase = Array(
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289,
    16385, 24577)
  private val DistExtra = Array(
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)

  /** Order in which code-length-code lengths are transmitted (§3.2.7). */
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

  /** Fixed-Huffman litlen code lengths (§3.2.6). */
  private val FixedLitLens: Array[Int] = {
    val l = new Array[Int](288)
    var i = 0
    while (i < 288) {
      l(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    l
  }
  private val FixedDistLens: Array[Int] = Array.fill(30)(5)

  /** Raw-DEFLATE inflate: decompress `data[off, end)` into a buffer
    * capped at `maxOut` bytes (zip-bomb guard — PNG callers know the
    * exact plane size; gzip callers pass a cap and the buffer grows
    * on demand). Returns (bytes, bytesConsumed). Malformed/
    * truncated/over-cap streams throw [[Malformed]].
    */
  private[ext] def inflate(data: Array[Byte], off: Int, end: Int, maxOut: Int): (Array[Byte], Int) = {
    val br = new InfBits(data, off, end)
    var out = new Array[Byte](math.min(maxOut, math.max(64 * 1024, end - off)))
    var outPos = 0
    def ensure(n: Int): Unit = {
      if (n > maxOut) fail()
      if (n > out.length)
        out = java.util.Arrays.copyOf(out,
          math.min(maxOut, math.max(n, out.length * 2)))
    }
    var last = false
    while (!last) {
      last = br.bits(1) == 1
      br.bits(2) match {
        case 0 => // stored
          br.alignByte()
          val p = br.bytePos
          if (p + 4 > end) fail()
          val len = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8)
          val nlen = (data(p + 2) & 0xff) | ((data(p + 3) & 0xff) << 8)
          if ((len ^ 0xffff) != nlen) fail()
          if (p + 4 + len > end) fail()
          ensure(outPos + len)
          System.arraycopy(data, p + 4, out, outPos, len)
          outPos += len
          br.seek(p + 4 + len)
        case bt if bt == 1 || bt == 2 =>
          val (lit, dist) =
            if (bt == 1)
              (new InfHuff(FixedLitLens, 0, 288), new InfHuff(FixedDistLens, 0, 30))
            else {
              val hlit = br.bits(5) + 257
              val hdist = br.bits(5) + 1
              val hclen = br.bits(4) + 4
              if (hlit > 286 || hdist > 30) fail()
              val clLens = new Array[Int](19)
              var i = 0
              while (i < hclen) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
              val clHuff = new InfHuff(clLens, 0, 19)
              val lens = new Array[Int](hlit + hdist)
              var k = 0
              while (k < hlit + hdist) {
                val sym = clHuff.decode(br)
                if (sym < 16) { lens(k) = sym; k += 1 }
                else {
                  var rep = 0; var v = 0
                  if (sym == 16) {
                    if (k == 0) fail()
                    v = lens(k - 1); rep = 3 + br.bits(2)
                  } else if (sym == 17) rep = 3 + br.bits(3)
                  else rep = 11 + br.bits(7)
                  if (k + rep > hlit + hdist) fail()
                  var j = 0
                  while (j < rep) { lens(k) = v; k += 1; j += 1 }
                }
              }
              if (lens(256) == 0) fail() // end-of-block code must exist
              (new InfHuff(lens, 0, hlit), new InfHuff(lens, hlit, hdist))
            }
          var done = false
          while (!done) {
            val sym = lit.decode(br)
            if (sym < 256) {
              ensure(outPos + 1)
              out(outPos) = sym.toByte; outPos += 1
            } else if (sym == 256) done = true
            else {
              if (sym > 285) fail()
              val li = sym - 257
              val len = LenBase(li) + br.bits(LenExtra(li))
              val ds = dist.decode(br)
              if (ds > 29) fail()
              val d = DistBase(ds) + br.bits(DistExtra(ds))
              if (d > outPos) fail()
              ensure(outPos + len)
              var j = 0
              while (j < len) { out(outPos) = out(outPos - d); outPos += 1; j += 1 }
            }
          }
        case _ => fail() // BTYPE 3 is reserved
      }
    }
    br.alignByte()
    (if (outPos == out.length) out else java.util.Arrays.copyOf(out, outPos), br.bytePos - off)
  }

  /** zlib unwrap (RFC 1950): header check, raw inflate, Adler-32
    * verify. `exactOut` is the byte count the caller expects — PNG
    * knows its plane geometry, so anything else is malformed.
    */
  private[ext] def zlibDecompress(data: Array[Byte], off: Int, end: Int, exactOut: Int): Array[Byte] = {
    if (end - off < 6) fail()
    val cmf = data(off) & 0xff
    val flg = data(off + 1) & 0xff
    if ((cmf & 0x0f) != 8) fail()       // method must be DEFLATE
    if ((cmf >> 4) > 7) fail()          // window > 32K
    if ((cmf * 256 + flg) % 31 != 0) fail()
    if ((flg & 0x20) != 0) fail()       // preset dictionary: out of scope
    val (out, used) = inflate(data, off + 2, end - 4, exactOut)
    if (out.length != exactOut) fail()
    val cksumPos = off + 2 + used
    if (cksumPos + 4 > end) fail()
    val stored = ((data(cksumPos) & 0xff) << 24) | ((data(cksumPos + 1) & 0xff) << 16) |
      ((data(cksumPos + 2) & 0xff) << 8) | (data(cksumPos + 3) & 0xff)
    if (stored != adler32(out, 0, out.length)) fail()
    out
  }

  // ====================================================== PNG decode

  private val Signature = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Channels per pixel for each supported color type at depth 8. */
  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // gray
    case 2 => 3 // RGB
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case _ => fail()
  }

  /** Corrupt-safe decode: `None` for malformed, truncated, checksum-
    * failing, or out-of-scope (non-8-bit, interlaced) payloads.
    */
  def decode(payload: Array[Byte]): Option[BmpImage] =
    if (payload == null || payload.length < 8 ||
      !(0 until 8).forall(i => payload(i) == Signature(i))) None
    else
      try Some(decodeChecked(payload))
      catch { case _: Malformed | _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None }

  private def decodeChecked(data: Array[Byte]): BmpImage = {
    var pos = 8
    var width = 0; var height = 0; var colorType = -1
    var sawIhdr = false; var sawIend = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    def u32(p: Int): Int = {
      if (p + 4 > data.length) fail()
      ((data(p) & 0xff) << 24) | ((data(p + 1) & 0xff) << 16) |
        ((data(p + 2) & 0xff) << 8) | (data(p + 3) & 0xff)
    }
    while (!sawIend) {
      val len = u32(pos)
      if (len < 0 || pos + 12L + len > data.length) fail()
      val typePos = pos + 4
      val dataPos = pos + 8
      // CRC covers type + data
      val crcStored = u32(dataPos + len)
      if (crcStored != ~crc32(data, typePos, 4 + len, 0xffffffff)) fail()
      val ctype = new String(data, typePos, 4, java.nio.charset.StandardCharsets.US_ASCII)
      ctype match {
        case "IHDR" =>
          if (sawIhdr || len != 13) fail()
          sawIhdr = true
          width = u32(dataPos); height = u32(dataPos + 4)
          // sanity caps: positive dims, plane fits comfortably in an Int
          if (width <= 0 || height <= 0 || width > (1 << 20) || height > (1 << 20) ||
            width.toLong * height > (1L << 26)) fail()
          val bitDepth = data(dataPos + 8) & 0xff
          colorType = data(dataPos + 9) & 0xff
          val compression = data(dataPos + 10) & 0xff
          val filterMethod = data(dataPos + 11) & 0xff
          val interlace = data(dataPos + 12) & 0xff
          channelsOf(colorType) // validates the type
          // scope rejections (not crashes): depth 8 only, no Adam7
          if (bitDepth != 8 || compression != 0 || filterMethod != 0 || interlace != 0) fail()
        case "PLTE" =>
          if (!sawIhdr || len % 3 != 0 || len > 256 * 3 || len == 0) fail()
          palette = java.util.Arrays.copyOfRange(data, dataPos, dataPos + len)
        case "IDAT" =>
          if (!sawIhdr) fail()
          idat.write(data, dataPos, len)
        case "IEND" =>
          if (len != 0) fail()
          sawIend = true
        case _ =>
          // bit 5 of the first type byte: 0 = critical. An unknown
          // critical chunk means we cannot render the image (spec
          // §5.4); unknown ancillary chunks are skipped.
          if ((data(typePos) & 0x20) == 0) fail()
      }
      pos = dataPos + len + 4
    }
    if (!sawIhdr) fail()
    if (colorType == 3 && palette == null) fail()
    val ch = channelsOf(colorType)
    val stride = width * ch
    val zbytes = idat.toByteArray
    val raw = zlibDecompress(zbytes, 0, zbytes.length, (stride + 1) * height)

    // ------------------------- unfilter (RFC 2083 §6.3), in place
    val bpp = ch // bytes per pixel at depth 8
    var y = 0
    while (y < height) {
      val rowOff = y * (stride + 1)
      val filter = raw(rowOff) & 0xff
      val prevOff = rowOff - (stride + 1)
      filter match {
        case 0 => ()
        case 1 => // Sub
          var i = bpp
          while (i < stride) {
            raw(rowOff + 1 + i) = (raw(rowOff + 1 + i) + raw(rowOff + 1 + i - bpp)).toByte
            i += 1
          }
        case 2 => // Up
          if (y > 0) {
            var i = 0
            while (i < stride) {
              raw(rowOff + 1 + i) = (raw(rowOff + 1 + i) + raw(prevOff + 1 + i)).toByte
              i += 1
            }
          }
        case 3 => // Average
          var i = 0
          while (i < stride) {
            val left = if (i >= bpp) raw(rowOff + 1 + i - bpp) & 0xff else 0
            val up = if (y > 0) raw(prevOff + 1 + i) & 0xff else 0
            raw(rowOff + 1 + i) = (raw(rowOff + 1 + i) + ((left + up) >> 1)).toByte
            i += 1
          }
        case 4 => // Paeth
          var i = 0
          while (i < stride) {
            val a = if (i >= bpp) raw(rowOff + 1 + i - bpp) & 0xff else 0
            val b = if (y > 0) raw(prevOff + 1 + i) & 0xff else 0
            val c = if (y > 0 && i >= bpp) raw(prevOff + 1 + i - bpp) & 0xff else 0
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            raw(rowOff + 1 + i) = (raw(rowOff + 1 + i) + pred).toByte
            i += 1
          }
        case _ => fail()
      }
      y += 1
    }

    // ------------------------------ to top-down BGR (alpha dropped)
    val bgr = new Array[Byte](width * height * 3)
    y = 0
    while (y < height) {
      val rowOff = y * (stride + 1) + 1
      var x = 0
      while (x < width) {
        val o = (y * width + x) * 3
        colorType match {
          case 0 =>
            val v = raw(rowOff + x)
            bgr(o) = v; bgr(o + 1) = v; bgr(o + 2) = v
          case 2 =>
            val p = rowOff + x * 3
            bgr(o) = raw(p + 2); bgr(o + 1) = raw(p + 1); bgr(o + 2) = raw(p)
          case 3 =>
            val idx = raw(rowOff + x) & 0xff
            if (idx * 3 + 2 >= palette.length) fail()
            bgr(o) = palette(idx * 3 + 2); bgr(o + 1) = palette(idx * 3 + 1)
            bgr(o + 2) = palette(idx * 3)
          case 4 =>
            val v = raw(rowOff + x * 2)
            bgr(o) = v; bgr(o + 1) = v; bgr(o + 2) = v
          case 6 =>
            val p = rowOff + x * 4
            bgr(o) = raw(p + 2); bgr(o + 1) = raw(p + 1); bgr(o + 2) = raw(p)
        }
        x += 1
      }
      y += 1
    }
    BmpImage(width, height, bgr)
  }

  // ================================================== DEFLATE encode

  /** LSB-first bit writer (the encode mirror of [[InfBits]]). */
  private final class DefBits(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    /** Write `n` bits of `v`, LSB first (extra fields, headers). */
    def write(v: Int, n: Int): Unit = {
      buf |= (v & ((1 << n) - 1)) << cnt
      cnt += n
      while (cnt >= 8) { out.write(buf & 0xff); buf >>>= 8; cnt -= 8 }
    }
    /** Write a canonical Huffman code: bit-reversed (codes go on the
      * wire MSB-of-code-first, §3.1.1).
      */
    def writeCode(code: Int, len: Int): Unit = {
      var c = 0; var i = 0
      while (i < len) { c = (c << 1) | ((code >> i) & 1); i += 1 }
      write(c, len)
    }
    def alignByte(): Unit = { if (cnt > 0) { out.write(buf & 0xff) }; buf = 0; cnt = 0 }
    def flush(): Unit = alignByte()
  }

  /** Canonical codes (MSB-form ints) from code lengths (§3.2.2). */
  private def canonicalCodes(lens: Array[Int]): Array[Int] = {
    val maxLen = lens.foldLeft(0)(math.max)
    val blCount = new Array[Int](maxLen + 1)
    lens.foreach(l => if (l > 0) blCount(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) { code = (code + blCount(l - 1)) << 1; nextCode(l) = code; l += 1 }
    lens.map { len =>
      if (len == 0) 0
      else { val c = nextCode(len); nextCode(len) += 1; c }
    }
  }

  /** Length-limited Huffman code lengths via PACKAGE-MERGE (Larmore &
    * Hirschberg 1990): provably optimal under the limit, no zlib-style
    * overflow patch-up. n ≤ 286 and limit ≤ 15, so the quadratic bag
    * bookkeeping is microscopic.
    */
  private[ext] def packageMergeLengths(freq: Array[Int], limit: Int): Array[Int] = {
    val lens = new Array[Int](freq.length)
    val active = freq.indices.filter(freq(_) > 0)
    if (active.isEmpty) return lens
    if (active.length == 1) { lens(active.head) = 1; return lens }
    if (active.length > (1 << limit)) fail() // cannot satisfy the limit
    // a "package" = (total weight, multiset of leaf symbols inside)
    val leaves: Vector[(Long, List[Int])] =
      active.sortBy(s => (freq(s).toLong, s)).map(s => (freq(s).toLong, s :: Nil)).toVector
    var merged = leaves
    var level = 1
    while (level < limit) {
      val paired = merged.grouped(2).collect {
        case Seq((wa, sa), (wb, sb)) => (wa + wb, sa ::: sb)
      }.toVector
      merged = (leaves ++ paired).sortBy(_._1)
      level += 1
    }
    merged.take(2 * active.length - 2).foreach { case (_, syms) =>
      syms.foreach(s => lens(s) += 1)
    }
    lens
  }

  /** Greedy hash-chain LZ77 tokenizer (window 32 KiB, match 3–258).
    * Tokens: literal byte `0..255`, or `0x4000_0000 | (len << 16) |
    * dist`. Not zlib-optimal (no lazy matching) — the decoder doesn't
    * care, and fixtures only need real back-references on the wire.
    */
  private def lz77(data: Array[Byte]): Array[Int] = {
    val n = data.length
    val tokens = new java.util.ArrayList[Integer](n / 2 + 16)
    val HashBits = 15
    val head = new Array[Int](1 << HashBits); java.util.Arrays.fill(head, -1)
    val prev = new Array[Int](n)
    val MaxChain = 64
    def hash(i: Int): Int =
      (((data(i) & 0xff) << 10) ^ ((data(i + 1) & 0xff) << 5) ^ (data(i + 2) & 0xff)) & ((1 << HashBits) - 1)
    def insert(i: Int): Unit =
      if (i + 2 < n) { val h = hash(i); prev(i) = head(h); head(h) = i }
    var i = 0
    while (i < n) {
      var bestLen = 0; var bestDist = 0
      if (i + 2 < n) {
        var cand = head(hash(i))
        var chain = 0
        val maxLen = math.min(258, n - i)
        while (cand >= 0 && chain < MaxChain && i - cand <= 32768) {
          var l = 0
          while (l < maxLen && data(cand + l) == data(i + l)) l += 1
          if (l > bestLen) { bestLen = l; bestDist = i - cand }
          cand = prev(cand); chain += 1
        }
      }
      if (bestLen >= 3) {
        tokens.add(0x40000000 | (bestLen << 16) | bestDist)
        val stop = i + bestLen
        while (i < stop) { insert(i); i += 1 }
      } else {
        tokens.add(data(i) & 0xff)
        insert(i); i += 1
      }
    }
    val arr = new Array[Int](tokens.size)
    var k = 0
    while (k < arr.length) { arr(k) = tokens.get(k); k += 1 }
    arr
  }

  /** Length value 3..258 → litlen symbol offset 0..28 (symbol 257+o).
    * 258 maps to the dedicated zero-extra-bits symbol 285 (§3.2.5:
    * symbol 284 covers only 227–257).
    */
  private def lenSymbol(len: Int): Int =
    if (len == 258) 28
    else { var s = 27; while (LenBase(s) > len) s -= 1; s }

  /** Distance value → symbol 0..29. */
  private def distSymbol(d: Int): Int = {
    var s = 29
    while (s > 0 && DistBase(s) > d) s -= 1
    s
  }

  /** Emit one token stream through litlen/dist code tables. */
  private def writeTokens(bw: DefBits, tokens: Array[Int],
      litCodes: Array[Int], litLens: Array[Int],
      distCodes: Array[Int], distLens: Array[Int]): Unit = {
    var k = 0
    while (k < tokens.length) {
      val t = tokens(k)
      if ((t & 0x40000000) == 0) bw.writeCode(litCodes(t), litLens(t))
      else {
        val len = (t >> 16) & 0x3fff
        val dist = t & 0xffff
        val ls = lenSymbol(len)
        bw.writeCode(litCodes(257 + ls), litLens(257 + ls))
        bw.write(len - LenBase(ls), LenExtra(ls))
        val ds = distSymbol(dist)
        bw.writeCode(distCodes(ds), distLens(ds))
        bw.write(dist - DistBase(ds), DistExtra(ds))
      }
      k += 1
    }
    bw.writeCode(litCodes(256), litLens(256)) // end of block
  }

  /** Raw DEFLATE compress. `mode`: 0 = stored, 1 = fixed Huffman,
    * 2 = dynamic Huffman. One final block (stored mode splits at the
    * 65535-byte stored-block cap).
    */
  private[ext] def deflate(data: Array[Byte], mode: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val bw = new DefBits(out)
    mode match {
      case 0 =>
        var off = 0
        do {
          val len = math.min(65535, data.length - off)
          val last = off + len == data.length
          bw.write(if (last) 1 else 0, 1)
          bw.write(0, 2)
          bw.alignByte()
          out.write(len & 0xff); out.write(len >> 8)
          out.write(~len & 0xff); out.write((~len >> 8) & 0xff)
          out.write(data, off, len)
          off += len
        } while (off < data.length)
      case 1 =>
        val tokens = lz77(data)
        bw.write(1, 1); bw.write(1, 2)
        val litCodes = canonicalCodes(FixedLitLens)
        val distCodes = canonicalCodes(FixedDistLens)
        writeTokens(bw, tokens, litCodes, FixedLitLens, distCodes, FixedDistLens)
        bw.flush()
      case 2 =>
        val tokens = lz77(data)
        // symbol frequencies (end-of-block included)
        val litFreq = new Array[Int](286)
        val distFreq = new Array[Int](30)
        litFreq(256) = 1
        tokens.foreach { t =>
          if ((t & 0x40000000) == 0) litFreq(t) += 1
          else {
            litFreq(257 + lenSymbol((t >> 16) & 0x3fff)) += 1
            distFreq(distSymbol(t & 0xffff)) += 1
          }
        }
        val litLens = packageMergeLengths(litFreq, 15)
        val distLens = packageMergeLengths(distFreq, 15)
        // §3.2.7: at least one distance code must be present
        if (distLens.forall(_ == 0)) distLens(0) = 1
        val hlit = math.max(257, 286 - litLens.reverse.takeWhile(_ == 0).length)
        val hdist = math.max(1, 30 - distLens.reverse.takeWhile(_ == 0).length)
        // RLE the concatenated length vector through the cl alphabet
        val allLens = litLens.take(hlit) ++ distLens.take(hdist)
        val clTokens = new java.util.ArrayList[(Int, Int)]() // (symbol, extraVal)
        var k = 0
        while (k < allLens.length) {
          val v = allLens(k)
          var run = 1
          while (k + run < allLens.length && allLens(k + run) == v) run += 1
          if (v == 0) {
            var left = run
            while (left >= 11) { val r = math.min(138, left); clTokens.add((18, r - 11)); left -= r }
            if (left >= 3) { clTokens.add((17, left - 3)); left = 0 }
            while (left > 0) { clTokens.add((0, 0)); left -= 1 }
          } else {
            clTokens.add((v, 0))
            var left = run - 1
            while (left >= 3) { val r = math.min(6, left); clTokens.add((16, r - 3)); left -= r }
            while (left > 0) { clTokens.add((v, 0)); left -= 1 }
          }
          k += run
        }
        val clFreq = new Array[Int](19)
        clTokens.forEach(t => clFreq(t._1) += 1)
        val clLens = packageMergeLengths(clFreq, 7)
        val hclen = math.max(4, 19 - ClOrder.reverse.takeWhile(clLens(_) == 0).length)
        bw.write(1, 1); bw.write(2, 2)
        bw.write(hlit - 257, 5); bw.write(hdist - 1, 5); bw.write(hclen - 4, 4)
        var ci = 0
        while (ci < hclen) { bw.write(clLens(ClOrder(ci)), 3); ci += 1 }
        val clCodes = canonicalCodes(clLens)
        clTokens.forEach { t =>
          val s = t._1; val extra = t._2
          bw.writeCode(clCodes(s), clLens(s))
          if (s == 16) bw.write(extra, 2)
          else if (s == 17) bw.write(extra, 3)
          else if (s == 18) bw.write(extra, 7)
        }
        val litCodes = canonicalCodes(litLens)
        val distCodes = canonicalCodes(distLens)
        writeTokens(bw, tokens, litCodes, litLens, distCodes, distLens)
        bw.flush()
      case _ => fail()
    }
    out.toByteArray
  }

  /** zlib wrap: 2-byte header (32K window, DEFLATE), body, Adler-32. */
  private[ext] def zlibCompress(data: Array[Byte], mode: Int): Array[Byte] = {
    val body = deflate(data, mode)
    val out = new java.io.ByteArrayOutputStream(body.length + 6)
    val cmf = 0x78 // CINFO=7 (32K), CM=8
    // FLG: FLEVEL=0, FDICT=0, FCHECK makes (cmf*256+flg) % 31 == 0
    val flg = (31 - (cmf * 256) % 31) % 31
    out.write(cmf); out.write(flg)
    out.write(body, 0, body.length)
    val ad = adler32(data, 0, data.length)
    out.write((ad >>> 24) & 0xff); out.write((ad >>> 16) & 0xff)
    out.write((ad >>> 8) & 0xff); out.write(ad & 0xff)
    out.toByteArray
  }

  // ====================================================== PNG encode

  /** Per-row filter strategies the encoder accepts. */
  val FilterAdaptive: Int = -1

  /** Deflate block modes (mirrors [[deflate]]). */
  val DeflateStored = 0
  val DeflateFixed = 1
  val DeflateDynamic = 2

  /** Apply filter `f` to row `y` of the plane, writing the filtered
    * bytes (without the leading filter byte) into `dst`.
    */
  private def filterRow(plane: Array[Byte], stride: Int, bpp: Int, y: Int, f: Int,
      dst: Array[Byte], dstOff: Int): Unit = {
    val rowOff = y * stride
    val prevOff = rowOff - stride
    var i = 0
    while (i < stride) {
      val cur = plane(rowOff + i) & 0xff
      val left = if (i >= bpp) plane(rowOff + i - bpp) & 0xff else 0
      val up = if (y > 0) plane(prevOff + i) & 0xff else 0
      val ul = if (y > 0 && i >= bpp) plane(prevOff + i - bpp) & 0xff else 0
      val v = f match {
        case 0 => cur
        case 1 => cur - left
        case 2 => cur - up
        case 3 => cur - ((left + up) >> 1)
        case 4 =>
          val p = left + up - ul
          val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
          val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          cur - pred
      }
      dst(dstOff + i) = v.toByte
      i += 1
    }
  }

  /** Textual metadata (tEXt chunks) of a PNG, without a pixel
    * decode: chunk walk with per-chunk CRC-32 verification,
    * collecting `(keyword, value)` pairs (Latin-1, the spec's tEXt
    * encoding). `None` for malformed payloads — same corrupt-safe
    * contract as [[decode]]; an image with no tEXt yields `Some(Nil)`.
    * The metadata side-channel a multimodal pipeline uses for
    * caption/source/provenance tracking.
    */
  def textChunks(payload: Array[Byte]): Option[Seq[(String, String)]] =
    if (payload == null || payload.length < 8 ||
      !(0 until 8).forall(i => payload(i) == Signature(i))) None
    else
      try {
        val out = Seq.newBuilder[(String, String)]
        var pos = 8
        var sawIend = false
        def u32(p: Int): Int = {
          if (p + 4 > payload.length) fail()
          ((payload(p) & 0xff) << 24) | ((payload(p + 1) & 0xff) << 16) |
            ((payload(p + 2) & 0xff) << 8) | (payload(p + 3) & 0xff)
        }
        while (!sawIend) {
          val len = u32(pos)
          if (len < 0 || pos + 12L + len > payload.length) fail()
          val typePos = pos + 4
          val dataPos = pos + 8
          if (u32(dataPos + len) != ~crc32(payload, typePos, 4 + len, 0xffffffff)) fail()
          val ctype = new String(payload, typePos, 4, java.nio.charset.StandardCharsets.US_ASCII)
          if (ctype == "tEXt") {
            var z = dataPos
            while (z < dataPos + len && payload(z) != 0) z += 1
            if (z >= dataPos + len) fail() // no keyword terminator
            out += ((new String(payload, dataPos, z - dataPos,
              java.nio.charset.StandardCharsets.ISO_8859_1),
              new String(payload, z + 1, dataPos + len - z - 1,
                java.nio.charset.StandardCharsets.ISO_8859_1)))
          } else if (ctype == "IEND") sawIend = true
          pos = dataPos + len + 4
        }
        Some(out.result())
      } catch { case _: Malformed | _: ArrayIndexOutOfBoundsException => None }

  /** Encode a [[BmpImage]] as a PNG. `colorType` ∈ {0 gray (requires
    * b=g=r everywhere), 2 RGB, 3 palette (requires ≤256 distinct
    * colors), 6 RGBA (alpha = 255)}; `filter` is a fixed type 0–4 or
    * [[FilterAdaptive]] (min sum-of-abs heuristic per row); `deflateMode`
    * picks the block encoding; `textMeta` plants tEXt chunks.
    * Deterministic: same inputs → same bytes.
    */
  def encode(img: BmpImage, colorType: Int = 2, filter: Int = FilterAdaptive,
      deflateMode: Int = DeflateDynamic,
      textMeta: Seq[(String, String)] = Nil): Array[Byte] = {
    val w = img.width; val h = img.height
    require(w > 0 && h > 0 && img.bgr.length == w * h * 3, "bad image geometry")
    require(Set(0, 2, 3, 6).contains(colorType), s"unsupported encode color type $colorType")
    require(filter == FilterAdaptive || (filter >= 0 && filter <= 4), s"bad filter $filter")

    // ------------------------------------ plane in wire pixel order
    var palette: Array[Byte] = null
    val ch = channelsOf(colorType)
    val plane = new Array[Byte](w * h * ch)
    colorType match {
      case 0 =>
        var p = 0
        while (p < w * h) {
          val b = img.bgr(p * 3); val g = img.bgr(p * 3 + 1); val r = img.bgr(p * 3 + 2)
          require(b == g && g == r, "grayscale encode requires b=g=r")
          plane(p) = b
          p += 1
        }
      case 2 =>
        var p = 0
        while (p < w * h) {
          plane(p * 3) = img.bgr(p * 3 + 2)     // R
          plane(p * 3 + 1) = img.bgr(p * 3 + 1) // G
          plane(p * 3 + 2) = img.bgr(p * 3)     // B
          p += 1
        }
      case 3 =>
        val index = new java.util.LinkedHashMap[Int, Int]()
        var p = 0
        while (p < w * h) {
          val key = ((img.bgr(p * 3 + 2) & 0xff) << 16) |
            ((img.bgr(p * 3 + 1) & 0xff) << 8) | (img.bgr(p * 3) & 0xff)
          var idx = index.getOrDefault(key, -1)
          if (idx < 0) {
            idx = index.size()
            require(idx < 256, "palette encode requires <=256 distinct colors")
            index.put(key, idx)
          }
          plane(p) = idx.toByte
          p += 1
        }
        palette = new Array[Byte](index.size() * 3)
        val it = index.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val rgb: Int = e.getKey; val idx: Int = e.getValue
          palette(idx * 3) = ((rgb >> 16) & 0xff).toByte
          palette(idx * 3 + 1) = ((rgb >> 8) & 0xff).toByte
          palette(idx * 3 + 2) = (rgb & 0xff).toByte
        }
      case 6 =>
        var p = 0
        while (p < w * h) {
          plane(p * 4) = img.bgr(p * 3 + 2)
          plane(p * 4 + 1) = img.bgr(p * 3 + 1)
          plane(p * 4 + 2) = img.bgr(p * 3)
          plane(p * 4 + 3) = 0xff.toByte
          p += 1
        }
    }

    // --------------------------------------- filter into raw stream
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    val scratch = new Array[Byte](stride)
    var y = 0
    while (y < h) {
      val chosen =
        if (filter != FilterAdaptive) filter
        else {
          var best = 0; var bestCost = Long.MaxValue
          var f = 0
          while (f <= 4) {
            filterRow(plane, stride, ch, y, f, scratch, 0)
            var cost = 0L; var i = 0
            while (i < stride) { cost += math.abs(scratch(i).toInt); i += 1 }
            if (cost < bestCost) { bestCost = cost; best = f }
            f += 1
          }
          best
        }
      raw(y * (stride + 1)) = chosen.toByte
      filterRow(plane, stride, ch, y, chosen, raw, y * (stride + 1) + 1)
      y += 1
    }

    // ------------------------------------------------ chunk assembly
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 256)
    out.write(Signature, 0, 8)
    def writeChunk(ctype: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val buf = new Array[Byte](4 + len)
      System.arraycopy(tb, 0, buf, 0, 4)
      System.arraycopy(body, 0, buf, 4, len)
      out.write(buf, 0, buf.length)
      val crc = ~crc32(buf, 0, buf.length, 0xffffffff)
      out.write((crc >>> 24) & 0xff); out.write((crc >>> 16) & 0xff)
      out.write((crc >>> 8) & 0xff); out.write(crc & 0xff)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xff).toByte; ihdr(1) = ((w >>> 16) & 0xff).toByte
    ihdr(2) = ((w >>> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >>> 24) & 0xff).toByte; ihdr(5) = ((h >>> 16) & 0xff).toByte
    ihdr(6) = ((h >>> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = colorType.toByte
    // compression 0, filter 0, interlace 0 already zero
    writeChunk("IHDR", ihdr)
    textMeta.foreach { case (k, v) =>
      require(k.nonEmpty && k.length <= 79 && !k.contains('\u0000') &&
        k == k.trim && !v.contains('\u0000'), "bad tEXt keyword/value")
      writeChunk("tEXt",
        k.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++
          Array(0.toByte) ++
          v.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    }
    if (palette != null) writeChunk("PLTE", palette)
    writeChunk("IDAT", zlibCompress(raw, deflateMode))
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
