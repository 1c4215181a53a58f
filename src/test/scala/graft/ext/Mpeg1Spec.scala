package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Layer I codec: roundtrip fidelity, gapless trim, bitstream
  * structure, corrupt safety, and the fingerprint-invariance margin
  * the q246 census depends on.
  */
class Mpeg1Spec extends AnyFunSuite {

  private def snrDb(x: Array[Short], y: Array[Short]): Double = {
    require(x.length == y.length)
    var errSq = 0.0; var sigSq = 0.0
    var j = 0
    while (j < x.length) {
      val e = (y(j) - x(j)).toDouble
      errSq += e * e; sigSq += x(j).toDouble * x(j)
      j += 1
    }
    10 * math.log10(sigSq / math.max(errSq, 1e-12))
  }

  test("sine roundtrip: exact length, high SNR") {
    val n = 2000
    val x = Array.tabulate(n)(j =>
      (2000 * StrictMath.sin(2 * StrictMath.PI * j / 50.0)).toInt.toShort)
    val dec = Mpeg1.decode(Mpeg1.encode(x)).getOrElse(fail("decode failed"))
    assert(dec.channels == 1 && dec.bitsPerSample == 16)
    assert(dec.samples.length == n) // gapless tag trims to the original
    val snr = snrDb(x, dec.samples)
    assert(snr > 45.0, s"SNR $snr dB")
  }

  test("broadband roundtrip: pseudorandom content survives") {
    val n = 1111 // not a multiple of 384
    val x = Array.tabulate(n)(j =>
      ((j.toLong * 104729 + 7919) % 4096 - 2048).toShort)
    val dec = Mpeg1.decode(Mpeg1.encode(x)).getOrElse(fail("decode failed"))
    assert(dec.samples.length == n)
    val snr = snrDb(x, dec.samples)
    assert(snr > 30.0, s"SNR $snr dB") // broadband is the codec's worst case
  }

  test("frame structure: sync, exact frame size, multi-frame") {
    val x = Array.fill[Short](900)(1000)
    val enc = Mpeg1.encode(x)
    val frameBytes = 12 * 448000 / 32000 * 4
    assert(enc.length % frameBytes == 0)
    assert(enc.length / frameBytes >= (900 + 384) / 384)
    var off = 0
    while (off < enc.length) { // every frame leads with a valid sync+header
      assert((enc(off) & 0xff) == 0xff && (enc(off + 1) & 0xf8) == 0xf8, s"at $off")
      off += frameBytes
    }
  }

  test("fingerprint invariance on the q246 staircase recipe") {
    // the census contract: energyHash60(decoded) == energyHash60(source)
    // for the margin-designed fixture, across bases and variants
    for (base <- 0L until 40L; variant <- 0 until 4) {
      val n = (200 + base % 50).toInt
      val x = Array.tabulate(n) { j =>
        val f = (j.toLong * 61 / n).toInt
        val boost = if (variant > 0 && f == 56 + variant) 800 else 0
        (400 * (1 + ((base * 7 + 3 * f) % 4)).toInt + boost).toShort
      }
      val dec = Mpeg1.decode(Mpeg1.encode(x))
        .getOrElse(fail(s"decode failed base=$base v=$variant"))
      assert(dec.samples.length == n)
      assert(Multimodal.Wav.energyHash60(dec.samples) ==
        Multimodal.Wav.energyHash60(x), s"fingerprint flip base=$base v=$variant")
    }
  }

  test("corrupt payloads decode to None, never crash") {
    val x = Array.tabulate(500)(j => ((j * 37) % 2000 - 1000).toShort)
    val good = Mpeg1.encode(x)
    assert(Mpeg1.decode(good).isDefined)
    assert(Mpeg1.decode(null).isEmpty)
    assert(Mpeg1.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Mpeg1.decode("RIFFxxxx".getBytes("US-ASCII")).isEmpty)
    var n = 4
    while (n < good.length) {
      assert(Mpeg1.decode(java.util.Arrays.copyOf(good, n)).isEmpty,
        s"truncated at $n")
      n += 97
    }
    // bit flips: None (CRC/section guards) or a successful decode —
    // never a throw; flips that survive either keep the tag-trimmed
    // length or (tag CRC rejected the flip) fall back to the raw
    // frame-quantized length — NEVER a silently wrong trim
    val rawLen = good.length / (12 * 448000 / 32000 * 4) * 384
    var i = 0
    while (i < good.length) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x20).toByte
      Mpeg1.decode(bad).foreach(d =>
        assert(d.samples.length == x.length || d.samples.length == rawLen,
          s"flip at $i gave length ${d.samples.length}"))
      i += 13
    }
  }

  test("decode-bomb cap: frame flood cannot over-allocate") {
    val one = Mpeg1.encode(Array.fill[Short](100)(500))
    val frameBytes = 12 * 448000 / 32000 * 4
    // strip to the first frame (no tag trim beyond it) and flood copies
    val frame = java.util.Arrays.copyOf(one, frameBytes)
    val out = new java.io.ByteArrayOutputStream()
    (0 until 100).foreach(_ => out.write(frame, 0, frame.length))
    // 100 frames = 38400 samples, fine under the default cap; with a
    // tiny cap the decoder must refuse rather than allocate
    assert(Mpeg1.decode(out.toByteArray, maxOutSamples = 1000).isEmpty)
  }

  test("frame data overflowing the declared slot length is rejected") {
    // protection=1 (no CRC to defeat), 32 kbps @ 48 kHz → 32-byte
    // frames, but one subband allocated nb=15 needs 346 bits > 256 —
    // a decoder without the per-frame bound silently consumes the
    // NEXT frame's bytes as sample data and returns Some(garbage)
    def wbits(bits: Seq[(Long, Int)]): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      var buf = 0L; var cnt = 0
      bits.foreach { case (v, w) =>
        var i = w - 1
        while (i >= 0) {
          buf = (buf << 1) | ((v >> i) & 1); cnt += 1
          if (cnt == 8) { bb.write(buf.toInt & 0xff); buf = 0; cnt = 0 }
          i -= 1
        }
      }
      if (cnt > 0) bb.write(((buf << (8 - cnt)).toInt) & 0xff)
      bb.toByteArray
    }
    val header = Seq((0xfffL, 12), (1L, 1), (3L, 2), (1L, 1), // protection=1
      (1L, 4), (1L, 2), (0L, 1), (0L, 1), // 32 kbps, 48 kHz
      (3L, 2), (0L, 2), (0L, 1), (1L, 1), (0L, 2)) // mono
    val alloc = Seq((14L, 4)) ++ Seq.fill(31)((0L, 4)) // sb0: nb=15
    val sf = Seq((0L, 6))
    val samples = Seq.fill(12)((0x1234L, 15))
    val frame = wbits(header ++ alloc ++ sf ++ samples)
    // pad well past the declared 32-byte frame so the reader has bytes
    // to (wrongly) consume
    val payload = frame ++ new Array[Byte](64)
    assert(Mpeg1.decode(payload).isEmpty)
  }

  test("padded 44.1 kHz frames walk correctly (decoder-only path)") {
    // the fixed encode profile (32 kHz / 448 kbps) never emits padding;
    // hand-build two silent frames at 44.1 kHz with padding=1 —
    // frameBytes = (12*32000/44100 + 1)*4 = 36 — so the walk must find
    // frame 2 exactly 36 bytes in (mis-handling the padding bit lands
    // mid-frame and fails the sync)
    def wbits(bits: Seq[(Long, Int)]): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      var buf = 0L; var cnt = 0
      bits.foreach { case (v, w) =>
        var i = w - 1
        while (i >= 0) {
          buf = (buf << 1) | ((v >> i) & 1); cnt += 1
          if (cnt == 8) { bb.write(buf.toInt & 0xff); buf = 0; cnt = 0 }
          i -= 1
        }
      }
      if (cnt > 0) bb.write(((buf << (8 - cnt)).toInt) & 0xff)
      bb.toByteArray
    }
    val header = Seq((0xfffL, 12), (1L, 1), (3L, 2), (1L, 1), // protection=1
      (1L, 4), (0L, 2), (1L, 1), (0L, 1), // 32 kbps, 44.1 kHz, padding=1
      (3L, 2), (0L, 2), (0L, 1), (1L, 1), (0L, 2)) // mono
    val alloc = Seq.fill(32)((0L, 4)) // silent: no scalefactors, no samples
    val body = wbits(header ++ alloc) // 20 bytes used of 36
    val frame = java.util.Arrays.copyOf(body, 36)
    val two = frame ++ frame
    val dec = Mpeg1.decode(two).getOrElse(fail("padded frames must decode"))
    assert(dec.sampleRate == 44100)
    assert(dec.samples.length == 2 * 384) // no gapless tag → raw output
    assert(dec.samples.forall(_ == 0))
    // a byte of junk between the frames breaks the walk → None
    val gapped = frame ++ Array(0x55.toByte) ++ frame
    assert(Mpeg1.decode(gapped).isEmpty)
  }

  test("mixed sample rates across frames are rejected, not concatenated") {
    // a WavPcm return carries ONE sampleRate, so a stream whose frames
    // disagree has no faithful decode — the walk must latch the first
    // frame's rate and fail on a later mismatch instead of silently
    // gluing 44.1 kHz and 48 kHz samples into one clip
    def wbits(bits: Seq[(Long, Int)]): Array[Byte] = {
      val bb = new java.io.ByteArrayOutputStream()
      var buf = 0L; var cnt = 0
      bits.foreach { case (v, w) =>
        var i = w - 1
        while (i >= 0) {
          buf = (buf << 1) | ((v >> i) & 1); cnt += 1
          if (cnt == 8) { bb.write(buf.toInt & 0xff); buf = 0; cnt = 0 }
          i -= 1
        }
      }
      if (cnt > 0) bb.write(((buf << (8 - cnt)).toInt) & 0xff)
      bb.toByteArray
    }
    def silentFrame(srIdx: Long, padding: Long, frameBytes: Int): Array[Byte] = {
      val header = Seq((0xfffL, 12), (1L, 1), (3L, 2), (1L, 1), // protection=1
        (1L, 4), (srIdx, 2), (padding, 1), (0L, 1), // 32 kbps
        (3L, 2), (0L, 2), (0L, 1), (1L, 1), (0L, 2)) // mono
      val alloc = Seq.fill(32)((0L, 4))
      java.util.Arrays.copyOf(wbits(header ++ alloc), frameBytes)
    }
    val f441 = silentFrame(srIdx = 0, padding = 1, 36) // (12*32000/44100+1)*4
    val f480 = silentFrame(srIdx = 1, padding = 0, 32) // (12*32000/48000)*4
    // sanity: each rate decodes alone, and same-rate pairs concatenate
    assert(Mpeg1.decode(f441 ++ f441).exists(_.sampleRate == 44100))
    assert(Mpeg1.decode(f480 ++ f480).exists(_.sampleRate == 48000))
    // mixed-rate stream → None in both orders
    assert(Mpeg1.decode(f441 ++ f480).isEmpty)
    assert(Mpeg1.decode(f480 ++ f441).isEmpty)
  }

  test("Layer III and stereo are rejections, not crashes") {
    val good = Mpeg1.encode(Array.fill[Short](100)(500))
    // layer bits live in byte 1 (bits 1-2): '11'=I, '10'=II, '01'=III.
    // A Layer I frame re-labeled as II is still None: its bitrate
    // index (448 kbps) is a stereo-only Layer II combination
    val l2 = good.clone(); l2(1) = ((l2(1) & 0xf9) | 0x04).toByte
    assert(Mpeg1.decode(l2).isEmpty)
    val l3 = good.clone(); l3(1) = ((l3(1) & 0xf9) | 0x02).toByte
    assert(Mpeg1.decode(l3).isEmpty)
    // mode bits: byte 3 bits 0-1; '00' = stereo
    val st = good.clone(); st(3) = (st(3) & 0x3f).toByte
    assert(Mpeg1.decode(st).isEmpty)
  }

  // --------------------------------------------------------- Layer II

  test("Layer II sine roundtrip: exact length, high SNR (B.2b profile)") {
    val n = 3000
    val x = Array.tabulate(n)(j =>
      (2000 * StrictMath.sin(2 * StrictMath.PI * j / 50.0)).toInt.toShort)
    val enc = Mpeg1.encodeLayer2(x)
    val dec = Mpeg1.decode(enc).getOrElse(fail("decode failed"))
    assert(dec.sampleRate == 32000 && dec.channels == 1)
    assert(dec.samples.length == n) // gapless tag trims to the original
    val snr = snrDb(x, dec.samples)
    assert(snr > 40.0, s"SNR $snr dB")
  }

  test("Layer II frame structure: 864-byte frames, sync per frame") {
    val x = Array.fill[Short](2500)(1000)
    val enc = Mpeg1.encodeLayer2(x) // 144*192000/32000 = 864, no drift
    assert(enc.length % 864 == 0, s"${enc.length}")
    assert(enc.length / 864 >= (2500 + 1152) / 1152)
    var off = 0
    while (off < enc.length) {
      assert((enc(off) & 0xff) == 0xff && (enc(off + 1) & 0xff) == 0xfc,
        s"at $off") // 1111 1100: sync tail + ID=1 + layer '10' + protection=0
      off += 864
    }
  }

  test("Layer II table profiles roundtrip: B.2a (48k/64), B.2d (32k/48), B.2c (44.1k/32)") {
    val n = 2800
    val x = Array.tabulate(n)(j =>
      (1500 * StrictMath.sin(2 * StrictMath.PI * j / 80.0)).toInt.toShort)
    for ((srIdx, brIdx, minSnr) <- Seq((1, 4, 30.0), (2, 2, 25.0), (0, 1, 20.0))) {
      val dec = Mpeg1.decode(Mpeg1.encodeLayer2(x, srIdx, brIdx))
        .getOrElse(fail(s"decode failed for srIdx=$srIdx brIdx=$brIdx"))
      assert(dec.samples.length == n, s"srIdx=$srIdx brIdx=$brIdx")
      val snr = snrDb(x, dec.samples)
      assert(snr > minSnr, s"srIdx=$srIdx brIdx=$brIdx SNR $snr dB")
    }
  }

  test("Layer II 44.1 kHz padding accumulator: frame sizes drift by one slot") {
    val x = Array.fill[Short](44100 / 4)(800) // ~10 frames at 44.1k
    val enc = Mpeg1.encodeLayer2(x, srIdx = 0, brIdx = 1) // 32 kbps
    // walk frames off the header padding bit; sizes must be 104/105
    var off = 0
    var sizes = List.empty[Int]
    while (off + 4 <= enc.length) {
      assert((enc(off) & 0xff) == 0xff, s"sync at $off")
      val padding = (enc(off + 2) >> 1) & 1
      val fb = 144 * 32000 / 44100 + padding
      sizes ::= fb
      off += fb
    }
    assert(off == enc.length, "frame walk must consume the stream exactly")
    assert(sizes.contains(104) && sizes.contains(105),
      s"44.1 kHz at 32 kbps must alternate padded frames: $sizes")
    assert(Mpeg1.decode(enc).isDefined)
  }

  test("Layer II scfsi patterns: static content compresses scalefactors, dynamic does not") {
    // constant amplitude → all three parts share one scalefactor
    // (scfsi 2); a mid-clip amplitude jump forces distinct parts.
    // Both must roundtrip exactly through the SAME decoder.
    val flat = Array.fill[Short](1152)(900)
    val dec1 = Mpeg1.decode(Mpeg1.encodeLayer2(flat)).getOrElse(fail("flat"))
    assert(dec1.samples.length == 1152)
    val jump = Array.tabulate[Short](1152)(j => if (j < 400) 300 else 2400)
    val dec2 = Mpeg1.decode(Mpeg1.encodeLayer2(jump)).getOrElse(fail("jump"))
    assert(dec2.samples.length == 1152)
    // static clip's frames must be smaller or equal in USED bits —
    // proxy: its scfsi compression means the flat stream's first
    // frame has at least as many trailing zero bytes
    def trailingZeros(b: Array[Byte]): Int = {
      var i = 863; var n = 0
      while (i >= 0 && b(i) == 0) { n += 1; i -= 1 }
      n
    }
    val fFlat = Mpeg1.encodeLayer2(flat).take(864).toArray
    val fJump = Mpeg1.encodeLayer2(jump).take(864).toArray
    assert(trailingZeros(fFlat) >= trailingZeros(fJump))
  }

  test("Layer II corrupt payloads decode to None, never crash") {
    val x = Array.tabulate[Short](2000)(j => (1200 * StrictMath.sin(j / 9.0)).toShort)
    val good = Mpeg1.encodeLayer2(x)
    assert(Mpeg1.decode(good).isDefined)
    // CRC protects allocation + scfsi: flip an allocation bit
    val badAlloc = good.clone(); badAlloc(7) = (badAlloc(7) ^ 0x10).toByte
    assert(Mpeg1.decode(badAlloc).isEmpty)
    // flip the stored CRC itself
    val badCrc = good.clone(); badCrc(4) = (badCrc(4) ^ 0x01).toByte
    assert(Mpeg1.decode(badCrc).isEmpty)
    // truncation mid-frame
    assert(Mpeg1.decode(good.take(good.length - 10)).isEmpty)
    // layer mixing: a Layer I stream followed by a Layer II stream
    val l1 = Mpeg1.encode(Array.fill[Short](100)(500))
    assert(Mpeg1.decode(l1 ++ good).isEmpty)
    assert(Mpeg1.decode(good ++ l1).isEmpty)
  }

  test("Layer II fingerprint invariance on the q246 staircase recipe") {
    for (base <- 0L until 20L; variant <- 0 until 4) {
      val n = (200 + base % 50).toInt
      val samples = Array.tabulate(n) { j =>
        val f = (j.toLong * 61 / n).toInt
        val boost = if (variant > 0 && f == 56 + variant) 800 else 0
        (400 * (1 + ((base * 7 + 3 * f) % 4)).toInt + boost).toShort
      }
      val dec = Mpeg1.decode(Mpeg1.encodeLayer2(samples))
        .getOrElse(fail(s"decode failed base=$base variant=$variant"))
      assert(dec.samples.length == n)
      val src = Multimodal.Wav.energyHash60(samples)
      val got = Multimodal.Wav.energyHash60(dec.samples)
      assert(got == src, s"base=$base variant=$variant")
    }
  }
}
