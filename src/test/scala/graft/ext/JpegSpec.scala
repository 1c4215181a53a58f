package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal.{Bmp, BmpImage}

/** Baseline JPEG codec coverage: roundtrip error bounds per mode
  * (grayscale / 4:4:4 / 4:2:0 / restart markers), corrupt-safety,
  * determinism, and the property the near-dup pipeline leans on —
  * dHash survives a JPEG re-encode.
  */
class JpegSpec extends AnyFunSuite {

  /** Smooth test image: per-channel CLAMPED integer ramps — no
    * wrap-around sawtooth edges (a modulo gradient has knife-edge
    * discontinuities that JPEG legitimately rings on, which would
    * make error bounds meaningless). Smooth content is what JPEG
    * quantization preserves best, so bounds stay meaningful and
    * tight.
    */
  private def gradient(w: Int, h: Int, seed: Int): BmpImage = {
    val bgr = new Array[Byte](w * h * 3)
    def ramp(v: Int): Byte =
      (if (v < 0) 0 else if (v > 235) 235 else v).toByte
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        bgr(o) = ramp(x * 3 + y + seed * 11)
        bgr(o + 1) = ramp(235 - x * 2 - y * 2 - seed * 7)
        bgr(o + 2) = ramp(x * 2 + y * 3 + seed * 17)
        x += 1
      }
      y += 1
    }
    BmpImage(w, h, bgr)
  }

  test("constant image roundtrips near-exactly in every mode") {
    val bgr = Array.fill(20 * 12 * 3)(0.toByte)
    var i = 0
    while (i < bgr.length) {
      bgr(i) = 60; bgr(i + 1) = 100; bgr(i + 2) = 128.toByte
      i += 3
    }
    val img = BmpImage(20, 12, bgr)
    assert(maxAbsErr(img, Jpeg.decode(Jpeg.encode(img, 90)).get) <= 2)
    assert(maxAbsErr(img,
      Jpeg.decode(Jpeg.encode(img, 90, subsample420 = true)).get) <= 2)
  }

  private def maxAbsErr(a: BmpImage, b: BmpImage): Int = {
    assert(a.width == b.width && a.height == b.height)
    var m = 0
    var i = 0
    while (i < a.bgr.length) {
      val d = math.abs((a.bgr(i) & 0xff) - (b.bgr(i) & 0xff))
      if (d > m) m = d
      i += 1
    }
    m
  }

  test("4:4:4 roundtrip: decode inverts encode within quantization error") {
    val img = gradient(40, 24, 1)
    val jpg = Jpeg.encode(img, quality = 95)
    val dec = Jpeg.decode(jpg).get
    assert(dec.width == 40 && dec.height == 24)
    assert(maxAbsErr(img, dec) <= 16, s"err=${maxAbsErr(img, dec)}")
  }

  test("non-multiple-of-8 dims roundtrip (edge replication)") {
    val img = gradient(21, 13, 2)
    val dec = Jpeg.decode(Jpeg.encode(img, quality = 95)).get
    assert(dec.width == 21 && dec.height == 13)
    assert(maxAbsErr(img, dec) <= 20, s"err=${maxAbsErr(img, dec)}")
  }

  test("grayscale roundtrip: 1-component scan decodes with r==g==b") {
    val img = gradient(32, 16, 3)
    // grayscale encode keeps only luma — compare against the luma of
    // the source, reconstructed into an r==g==b image
    val jpg = Jpeg.encode(img, quality = 95, grayscale = true)
    val dec = Jpeg.decode(jpg).get
    assert(dec.width == 32 && dec.height == 16)
    var i = 0
    while (i < dec.bgr.length) {
      assert(dec.bgr(i) == dec.bgr(i / 3 * 3), "grayscale must have b==g==r")
      i += 1
    }
    // luma of source vs decoded gray value
    var maxErr = 0
    var p = 0
    while (p < 32 * 16) {
      val b = img.bgr(p * 3) & 0xff
      val g = img.bgr(p * 3 + 1) & 0xff
      val r = img.bgr(p * 3 + 2) & 0xff
      val y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
      maxErr = math.max(maxErr, math.abs(y - (dec.bgr(p * 3) & 0xff)))
      p += 1
    }
    assert(maxErr <= 12, s"luma err=$maxErr")
  }

  test("4:2:0 roundtrip: subsampled chroma stays within a loose bound, luma tight") {
    val img = gradient(48, 32, 4)
    val dec = Jpeg.decode(Jpeg.encode(img, quality = 95, subsample420 = true)).get
    assert(dec.width == 48 && dec.height == 32)
    // luma is full resolution — compare Y planes tightly
    var maxLumaErr = 0
    var p = 0
    while (p < 48 * 32) {
      def luma(im: BmpImage): Int = {
        val b = im.bgr(p * 3) & 0xff
        val g = im.bgr(p * 3 + 1) & 0xff
        val r = im.bgr(p * 3 + 2) & 0xff
        (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
      }
      maxLumaErr = math.max(maxLumaErr, math.abs(luma(img) - luma(dec)))
      p += 1
    }
    assert(maxLumaErr <= 16, s"luma err=$maxLumaErr")
    // chroma halved then replicated — per-pixel bound is looser but bounded
    assert(maxAbsErr(img, dec) <= 48, s"err=${maxAbsErr(img, dec)}")
  }

  test("4:2:2 roundtrip: asymmetric h=2,v=1 sampling decodes within bounds") {
    val img = gradient(44, 24, 9)
    val dec = Jpeg.decode(Jpeg.encode(img, quality = 95, subsample422 = true)).get
    assert(dec.width == 44 && dec.height == 24)
    assert(maxAbsErr(img, dec) <= 48, s"err=${maxAbsErr(img, dec)}")
    // odd width exercises the half-plane edge replication
    val odd = gradient(21, 16, 10)
    val dec2 = Jpeg.decode(Jpeg.encode(odd, quality = 95, subsample422 = true)).get
    assert(dec2.width == 21 && dec2.height == 16)
    assert(maxAbsErr(odd, dec2) <= 48, s"err=${maxAbsErr(odd, dec2)}")
  }

  test("restart markers: DRI stream contains RSTn and decodes identically") {
    val img = gradient(64, 40, 5)
    val plain = Jpeg.encode(img, quality = 90)
    val dri = Jpeg.encode(img, quality = 90, restartInterval = 3)
    assert(dri.length > plain.length) // markers cost bytes
    // the RST path must reproduce the exact same decode (same
    // coefficients, only the entropy segmentation differs)
    val a = Jpeg.decode(plain).get
    val b = Jpeg.decode(dri).get
    assert(a.bgr.toSeq == b.bgr.toSeq)
    // and RST markers are really in there
    val hasRst = dri.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst)
  }

  test("encode is deterministic: same pixels + params → same bytes") {
    val img = gradient(24, 24, 6)
    assert(Jpeg.encode(img, 85).toSeq == Jpeg.encode(img, 85).toSeq)
    assert(Jpeg.encode(img, 85, subsample420 = true).toSeq ==
      Jpeg.encode(img, 85, subsample420 = true).toSeq)
  }

  test("corrupt payloads decode to None, never throw") {
    val good = Jpeg.encode(gradient(16, 16, 7), 90)
    assert(Jpeg.decode(null).isEmpty)
    assert(Jpeg.decode(Array[Byte]()).isEmpty)
    assert(Jpeg.decode("not a jpeg".getBytes).isEmpty)
    assert(Jpeg.decode(good.take(2)).isEmpty)            // SOI only
    assert(Jpeg.decode(good.take(20)).isEmpty)           // mid-APP0
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty) // mid-entropy
    assert(Jpeg.decode(good.dropRight(10)).isEmpty)      // truncated tail
    val badMagic = good.clone(); badMagic(1) = 0x00
    assert(Jpeg.decode(badMagic).isEmpty)
    // flip random-ish bytes across the stream — decode must never
    // throw (None or a successfully-decoded different image are both
    // acceptable; crashes are not)
    (0 until good.length by 7).foreach { i =>
      val mut = good.clone(); mut(i) = (mut(i) ^ 0x55).toByte
      Jpeg.decode(mut) // must not throw
    }
  }

  test("decode-bomb SOF dims are rejected, not allocated") {
    // rewrite the SOF0 height/width fields to 46341x46341 (whose
    // w*h*3 overflows Int → negative allocation without the cap) and
    // to 65535x65535 (multi-GiB planes from a tiny payload); both
    // must decode to None, never throw or allocate
    val good = Jpeg.encode(gradient(16, 16, 7), 90)
    val idx = good.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    assert(idx >= 0)
    // SOF0 payload: len(2) prec(1) height(2) width(2) — dims at idx+5
    for (dim <- Seq(46341, 65535)) {
      val bomb = good.clone()
      bomb(idx + 5) = ((dim >> 8) & 0xff).toByte; bomb(idx + 6) = (dim & 0xff).toByte
      bomb(idx + 7) = ((dim >> 8) & 0xff).toByte; bomb(idx + 8) = (dim & 0xff).toByte
      assert(Jpeg.decode(bomb).isEmpty, s"dim=$dim")
    }
  }

  test("progressive (SOF2) is rejected as unsupported, not crashed") {
    val good = Jpeg.encode(gradient(16, 16, 8), 90)
    // rewrite the SOF0 marker (FF C0) to SOF2 (FF C2)
    val idx = good.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc0)
    assert(idx >= 0)
    val prog = good.clone(); prog(idx + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty)
  }

  test("dHash survives a JPEG re-encode (the near-dup invariant)") {
    // dHash is only stable through a lossy codec when the gradient
    // structure dominates codec noise — a near-tie gradient (Δluma ≈
    // quantization error) legitimately flips bits and no codec could
    // preserve it. Fixture: 6 horizontal bands (one per dHash grid
    // row, samples centered 4 rows from band edges so ringing never
    // lands on a sampled pixel), each band a strong ±10/px luma ramp
    // whose direction comes from the seed's bits — 2^6 distinct
    // fingerprints, every adjacent-sample Δluma = 40 ≫ JPEG error.
    (0 until 8).foreach { seed =>
      val w = 44; val h = 48
      val bgr = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val band = math.min(5, (y + 4) / 8)
        val up = ((seed >> band) & 1) == 1
        var x = 0
        while (x < w) {
          val v = if (up) 20 + 10 * x / 2 else 235 - 10 * x / 2
          val c = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          val o = (y * w + x) * 3
          bgr(o) = c; bgr(o + 1) = c; bgr(o + 2) = c
          x += 1
        }
        y += 1
      }
      val img = BmpImage(w, h, bgr)
      val fp0 = Bmp.dhash60(img)
      val fp444 = Bmp.dhash60(Jpeg.decode(Jpeg.encode(img, 90)).get)
      val fp420 = Bmp.dhash60(
        Jpeg.decode(Jpeg.encode(img, 90, subsample420 = true)).get)
      val fp422 = Bmp.dhash60(
        Jpeg.decode(Jpeg.encode(img, 90, subsample422 = true)).get)
      assert(java.lang.Long.bitCount(fp0 ^ fp444) <= 3,
        s"seed=$seed 444 drift=${java.lang.Long.bitCount(fp0 ^ fp444)}")
      assert(java.lang.Long.bitCount(fp0 ^ fp420) <= 3,
        s"seed=$seed 420 drift=${java.lang.Long.bitCount(fp0 ^ fp420)}")
      assert(java.lang.Long.bitCount(fp0 ^ fp422) <= 3,
        s"seed=$seed 422 drift=${java.lang.Long.bitCount(fp0 ^ fp422)}")
    }
  }
}
