package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal.BmpImage

/** PNG codec + from-scratch DEFLATE coverage. PNG is lossless, so the
  * core contract is BIT-EXACT roundtrip across every color type ×
  * filter strategy × deflate block mode, plus corrupt-safety (the
  * `None`-not-crash discipline), an independent hand-assembled
  * fixture (bytes built without the encoder, so encoder and decoder
  * can't share a bug), and inflate unit coverage of all three block
  * types including back-reference and RLE paths.
  */
class PngSpec extends AnyFunSuite {

  /** Deterministic pseudo-random image (LCG — no Random). */
  private def noise(w: Int, h: Int, seed: Int): BmpImage = {
    val bgr = new Array[Byte](w * h * 3)
    var s = seed * 2654435761L + 1
    var i = 0
    while (i < bgr.length) {
      s = s * 6364136223846793005L + 1442695040888963407L
      bgr(i) = (s >>> 40).toByte
      i += 1
    }
    BmpImage(w, h, bgr)
  }

  /** Few-color strip image — palette-encodable, highly compressible. */
  private def strips(w: Int, h: Int): BmpImage = {
    val bgr = new Array[Byte](w * h * 3)
    val cols = Array(Array(40, 80, 200), Array(200, 40, 80), Array(80, 200, 40))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = cols((x / 4) % 3)
        val o = (y * w + x) * 3
        bgr(o) = c(0).toByte; bgr(o + 1) = c(1).toByte; bgr(o + 2) = c(2).toByte
        x += 1
      }
      y += 1
    }
    BmpImage(w, h, bgr)
  }

  private def gray(w: Int, h: Int): BmpImage = {
    val bgr = new Array[Byte](w * h * 3)
    var p = 0
    while (p < w * h) {
      val v = ((p * 7) % 251).toByte
      bgr(p * 3) = v; bgr(p * 3 + 1) = v; bgr(p * 3 + 2) = v
      p += 1
    }
    BmpImage(w, h, bgr)
  }

  private def assertSame(a: BmpImage, b: BmpImage): Unit = {
    assert(a.width == b.width && a.height == b.height)
    assert(java.util.Arrays.equals(a.bgr, b.bgr))
  }

  // ------------------------------------------------------- roundtrip

  test("RGB roundtrips bit-exactly across filters and deflate modes") {
    val img = noise(37, 23, 5) // odd dims exercise edge columns
    for (filter <- Seq(Png.FilterAdaptive, 0, 1, 2, 3, 4);
         mode <- Seq(Png.DeflateStored, Png.DeflateFixed, Png.DeflateDynamic)) {
      val bytes = Png.encode(img, colorType = 2, filter = filter, deflateMode = mode)
      assertSame(img, Png.decode(bytes).getOrElse(fail(s"decode failed f=$filter m=$mode")))
    }
  }

  test("grayscale / palette / RGBA roundtrip bit-exactly") {
    assertSame(gray(31, 17),
      Png.decode(Png.encode(gray(31, 17), colorType = 0)).get)
    assertSame(strips(44, 24),
      Png.decode(Png.encode(strips(44, 24), colorType = 3)).get)
    assertSame(noise(16, 16, 9),
      Png.decode(Png.encode(noise(16, 16, 9), colorType = 6)).get)
  }

  test("1x1 and single-row/column geometries roundtrip") {
    for (img <- Seq(noise(1, 1, 1), noise(64, 1, 2), noise(1, 64, 3)))
      assertSame(img, Png.decode(Png.encode(img)).get)
  }

  test("encode is deterministic") {
    val img = noise(20, 20, 7)
    assert(java.util.Arrays.equals(Png.encode(img), Png.encode(img)))
  }

  test("highly repetitive content compresses (real LZ77 on the wire)") {
    val img = strips(128, 64)
    val dyn = Png.encode(img, colorType = 2, filter = 0, deflateMode = Png.DeflateDynamic)
    val stored = Png.encode(img, colorType = 2, filter = 0, deflateMode = Png.DeflateStored)
    assert(dyn.length < stored.length / 10,
      s"dynamic ${dyn.length} vs stored ${stored.length}: back-references not working")
    assertSame(img, Png.decode(dyn).get)
  }

  test("encoder contract violations are rejected") {
    intercept[IllegalArgumentException] {
      Png.encode(noise(20, 20, 1), colorType = 0) // not gray
    }
    intercept[IllegalArgumentException] {
      Png.encode(noise(20, 20, 2), colorType = 3) // >256 colors
    }
  }

  // --------------------------------------------- independent fixture

  /** A 2×2 RGB PNG assembled BYTE BY BYTE (stored deflate block,
    * filter 0 rows) — no encoder involved, so this pins the decoder
    * against the spec rather than against our own writer.
    * Pixels (RGB): (255,0,0) (0,255,0) / (0,0,255) (255,255,255).
    */
  test("hand-assembled fixture decodes to the spec'd pixels") {
    val raw = Array[Int](
      0, 255, 0, 0, 0, 255, 0, // row 0: filter 0, red, green
      0, 0, 0, 255, 255, 255, 255) // row 1: filter 0, blue, white
      .map(_.toByte)
    // zlib: 78 01, stored final block (len 14), adler32
    def adler(d: Array[Byte]): Int = {
      var a = 1; var b = 0
      d.foreach { x => a = (a + (x & 0xff)) % 65521; b = (b + a) % 65521 }
      (b << 16) | a
    }
    val zl = new java.io.ByteArrayOutputStream()
    zl.write(0x78); zl.write(0x01)
    zl.write(0x01) // BFINAL=1, BTYPE=00
    zl.write(14); zl.write(0); zl.write(0xff ^ 14); zl.write(0xff)
    zl.write(raw, 0, raw.length)
    val ad = adler(raw)
    zl.write((ad >>> 24) & 0xff); zl.write((ad >>> 16) & 0xff)
    zl.write((ad >>> 8) & 0xff); zl.write(ad & 0xff)
    val idat = zl.toByteArray

    val crcTable = Array.tabulate(256) { n =>
      var c = n
      for (_ <- 0 until 8) c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
      c
    }
    def crc(d: Array[Byte]): Int = {
      var c = 0xffffffff
      d.foreach(x => c = crcTable((c ^ x) & 0xff) ^ (c >>> 8))
      ~c
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(t: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write(len >>> 24); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      val buf = t.getBytes("US-ASCII") ++ body
      out.write(buf, 0, buf.length)
      val c = crc(buf)
      out.write((c >>> 24) & 0xff); out.write((c >>> 16) & 0xff)
      out.write((c >>> 8) & 0xff); out.write(c & 0xff)
    }
    chunk("IHDR", Array[Int](0, 0, 0, 2, 0, 0, 0, 2, 8, 2, 0, 0, 0).map(_.toByte))
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)

    val img = Png.decode(out.toByteArray).get
    assert(img.width == 2 && img.height == 2)
    // BmpImage is BGR
    assert((img.bgr(0) & 0xff, img.bgr(1) & 0xff, img.bgr(2) & 0xff) == ((0, 0, 255)))
    assert((img.bgr(3) & 0xff, img.bgr(4) & 0xff, img.bgr(5) & 0xff) == ((0, 255, 0)))
    assert((img.bgr(6) & 0xff, img.bgr(7) & 0xff, img.bgr(8) & 0xff) == ((255, 0, 0)))
    assert((img.bgr(9) & 0xff, img.bgr(10) & 0xff, img.bgr(11) & 0xff) == ((255, 255, 255)))
  }

  /** Color type 4 (gray+alpha) is decode-only — the encoder never
    * emits it. Hand-assemble one (stored blocks, filter 0) and pin
    * the alpha-dropping reconstruction.
    */
  test("hand-assembled gray+alpha (type 4) decodes, alpha dropped") {
    // 2×1, pairs (gray, alpha): (100, 255), (200, 0)
    val raw = Array[Int](0, 100, 255, 200, 0).map(_.toByte)
    def adler(d: Array[Byte]): Int = {
      var a = 1; var b = 0
      d.foreach { x => a = (a + (x & 0xff)) % 65521; b = (b + a) % 65521 }
      (b << 16) | a
    }
    val zl = new java.io.ByteArrayOutputStream()
    zl.write(0x78); zl.write(0x01); zl.write(0x01)
    zl.write(5); zl.write(0); zl.write(0xff ^ 5); zl.write(0xff)
    zl.write(raw, 0, raw.length)
    val ad = adler(raw)
    zl.write((ad >>> 24) & 0xff); zl.write((ad >>> 16) & 0xff)
    zl.write((ad >>> 8) & 0xff); zl.write(ad & 0xff)
    val crcTable = Array.tabulate(256) { n =>
      var c = n
      for (_ <- 0 until 8) c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
      c
    }
    def crc(d: Array[Byte]): Int = {
      var c = 0xffffffff
      d.foreach(x => c = crcTable((c ^ x) & 0xff) ^ (c >>> 8))
      ~c
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(t: String, body: Array[Byte]): Unit = {
      val len = body.length
      out.write(len >>> 24); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      val buf = t.getBytes("US-ASCII") ++ body
      out.write(buf, 0, buf.length)
      val c = crc(buf)
      out.write((c >>> 24) & 0xff); out.write((c >>> 16) & 0xff)
      out.write((c >>> 8) & 0xff); out.write(c & 0xff)
    }
    chunk("IHDR", Array[Int](0, 0, 0, 2, 0, 0, 0, 1, 8, 4, 0, 0, 0).map(_.toByte))
    chunk("IDAT", zl.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val img = Png.decode(out.toByteArray).get
    assert(img.width == 2 && img.height == 1)
    assert(img.bgr.toSeq.map(_ & 0xff) == Seq(100, 100, 100, 200, 200, 200))
  }

  // ---------------------------------------------------- corrupt-safe

  test("corrupt payloads decode to None, never crash") {
    val good = Png.encode(noise(24, 18, 11))
    assert(Png.decode(good).isDefined)
    // truncation at every prefix length
    var n = 0
    while (n < good.length) {
      assert(Png.decode(java.util.Arrays.copyOf(good, n)).isEmpty, s"truncated at $n")
      n += 1
    }
    // single-byte corruption at every position: either still decodes
    // to the SAME pixels (corruption in slack bits) or returns None —
    // never throws, never returns wrong pixels silently unless the
    // flip misses every checksum (CRC makes that impossible here)
    val orig = Png.decode(good).get
    var i = 0
    while (i < good.length) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x41).toByte
      Png.decode(bad) match {
        case None => ()
        case Some(img) => assertSame(orig, img) // only if checksums still pass
      }
      i += 1
    }
    assert(Png.decode(null).isEmpty)
    assert(Png.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("out-of-scope features are rejections, not crashes") {
    // craft: valid signature but 16-bit depth / interlaced headers
    val base = Png.encode(gray(8, 8), colorType = 0)
    // IHDR body starts at offset 8 (sig) + 8 (len+type) = 16; depth at +8, interlace at +12
    def withIhdrByte(off: Int, v: Byte): Array[Byte] = {
      val b = base.clone()
      b(16 + off) = v
      // recompute IHDR CRC (type at 12, body 13 bytes)
      val crcTable = Array.tabulate(256) { n =>
        var c = n
        for (_ <- 0 until 8) c = if ((c & 1) != 0) 0xedb88320 ^ (c >>> 1) else c >>> 1
        c
      }
      var c = 0xffffffff
      (12 until 12 + 4 + 13).foreach(i => c = crcTable((c ^ b(i)) & 0xff) ^ (c >>> 8))
      val cc = ~c
      b(29) = ((cc >>> 24) & 0xff).toByte; b(30) = ((cc >>> 16) & 0xff).toByte
      b(31) = ((cc >>> 8) & 0xff).toByte; b(32) = (cc & 0xff).toByte
      b
    }
    assert(Png.decode(withIhdrByte(8, 16)).isEmpty) // 16-bit depth
    assert(Png.decode(withIhdrByte(12, 1)).isEmpty) // Adam7
    assert(Png.decode(withIhdrByte(9, 7)).isEmpty) // bogus color type
  }

  // ------------------------------------------------- inflate internals

  test("inflate roundtrips random + repetitive data in all modes") {
    var s = 99L
    val rand = Array.tabulate(5000) { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 40).toByte
    }
    val rep = Array.tabulate(5000)(i => ((i / 7) % 5).toByte)
    val empty = Array.emptyByteArray
    for (data <- Seq(rand, rep, empty); mode <- Seq(0, 1, 2)) {
      val comp = Png.deflate(data, mode)
      val (out, used) = Png.inflate(comp, 0, comp.length, data.length)
      assert(used == comp.length)
      assert(java.util.Arrays.equals(out, data), s"mode $mode len ${data.length}")
    }
  }

  test("zlib verifies its Adler-32") {
    val data = Array.tabulate(100)(_.toByte)
    val z = Png.zlibCompress(data, 2)
    assert(java.util.Arrays.equals(Png.zlibDecompress(z, 0, z.length, 100), data))
    val bad = z.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    intercept[RuntimeException](Png.zlibDecompress(bad, 0, bad.length, 100))
  }

  test("package-merge lengths satisfy Kraft and the limit") {
    val freq = Array(100, 50, 20, 10, 5, 2, 1, 1, 1, 1, 0, 0, 900)
    for (limit <- Seq(4, 7, 15)) {
      val lens = Png.packageMergeLengths(freq, limit)
      assert(lens.zipWithIndex.forall { case (l, i) => (freq(i) == 0) == (l == 0) })
      assert(lens.forall(_ <= limit))
      val kraft = lens.filter(_ > 0).map(l => 1.0 / (1L << l)).sum
      assert(kraft <= 1.0 + 1e-12)
    }
    // singleton and empty
    assert(Png.packageMergeLengths(Array(0, 5, 0), 15).toSeq == Seq(0, 1, 0))
    assert(Png.packageMergeLengths(Array(0, 0), 15).forall(_ == 0))
  }

  test("tEXt metadata roundtrips and reads without pixel decode") {
    val img = noise(10, 10, 3)
    val meta = Seq(("Title", "a b c"), ("Source", "http://x.test/1"), ("K", ""))
    val bytes = Png.encode(img, textMeta = meta)
    assert(Png.textChunks(bytes).get == meta)
    assertSame(img, Png.decode(bytes).get) // pixels unaffected
    // no metadata → Some(Nil); corrupt chunk CRC → None
    assert(Png.textChunks(Png.encode(img)).get.isEmpty)
    val bad = bytes.clone()
    // flip a byte inside the first tEXt chunk body (after IHDR: 8+25=33)
    bad(38) = (bad(38) ^ 0x11).toByte
    assert(Png.textChunks(bad).isEmpty)
    assert(Png.textChunks(null).isEmpty)
    intercept[IllegalArgumentException] {
      Png.encode(img, textMeta = Seq(("bad\u0000key", "v")))
    }
  }

  // --------------------------------------- pipeline property (dHash)

  test("dHash is invariant under PNG roundtrip (lossless)") {
    val img = noise(44, 24, 13)
    val direct = Multimodal.Bmp.dhash60(img)
    for (ct <- Seq(0, 2, 3, 6)) {
      val enc =
        if (ct == 0) gray(44, 24) else if (ct == 3) strips(44, 24) else img
      val h0 = Multimodal.Bmp.dhash60(enc)
      val h1 = Multimodal.Bmp.dhash60(Png.decode(Png.encode(enc, colorType = ct)).get)
      assert(h0 == h1, s"colorType $ct")
    }
    assert(direct == Multimodal.Bmp.dhash60(Png.decode(Png.encode(img)).get))
  }
}
