package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** FLAC codec coverage: bit-exact lossless roundtrip across subframe
  * strategies × block sizes × partition orders × channel counts,
  * multi-frame streams, constant detection, corrupt-safety (the
  * `None`-not-crash discipline incl. CRC-8/CRC-16 verification), a
  * hand-built mid/side frame (decoder-only path the encoder doesn't
  * emit), and the pipeline property — the energy fingerprint is
  * invariant under the compressed wire format.
  */
class FlacSpec extends AnyFunSuite {

  /** Deterministic pseudo-random PCM (LCG — no Random). */
  private def noise(n: Int, seed: Int, amp: Int = 2048): Array[Short] = {
    var s = seed * 2654435761L + 99
    Array.tabulate(n) { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 40) % amp).toShort
    }
  }

  /** Smooth ramp+wave signal — fixed predictors bite hard here. */
  private def smooth(n: Int): Array[Short] =
    Array.tabulate(n)(i => (((i * 13) % 2000) - 1000 + i / 3).toShort)

  private def assertSame(a: Array[Short], b: Array[Short]): Unit =
    assert(java.util.Arrays.equals(a, b))

  // ------------------------------------------------------- roundtrip

  test("mono roundtrips bit-exactly across strategies and block sizes") {
    for (src <- Seq(noise(1000, 3), smooth(1000));
         strategy <- Seq(Flac.EncVerbatim, Flac.EncFixedAuto, 0, 1, 2, 3, 4);
         bs <- Seq(64, 256, 4096)) {
      val enc = Flac.encode(src, 8000, blockSize = bs, strategy = strategy)
      val dec = Flac.decode(enc).getOrElse(fail(s"decode failed s=$strategy bs=$bs"))
      assert(dec.sampleRate == 8000 && dec.channels == 1 && dec.bitsPerSample == 16)
      assertSame(src, dec.samples)
    }
  }

  test("rice partition orders roundtrip (multi-partition residuals)") {
    val src = smooth(512)
    for (po <- Seq(0, 1, 2, 3)) {
      val enc = Flac.encode(src, 44100, blockSize = 256, strategy = Flac.EncFixedAuto,
        partitionOrder = po)
      assertSame(src, Flac.decode(enc).get.samples)
    }
  }

  test("stereo independent channels roundtrip interleaved") {
    val src = noise(2 * 700, 7) // interleaved L R
    val enc = Flac.encode(src, 48000, channels = 2, blockSize = 256)
    val dec = Flac.decode(enc).get
    assert(dec.channels == 2)
    assertSame(src, dec.samples)
  }

  test("odd lengths produce a short last frame that roundtrips") {
    for (n <- Seq(17, 63, 64, 65, 200, 257)) {
      val src = noise(n, n)
      assertSame(src, Flac.decode(Flac.encode(src, 8000, blockSize = 64)).get.samples)
    }
  }

  test("constant stretches use CONSTANT subframes and roundtrip") {
    val src = Array.fill(300)(123.toShort)
    val enc = Flac.encode(src, 8000, blockSize = 64)
    assertSame(src, Flac.decode(enc).get.samples)
    // constant encode is much smaller than verbatim
    val verb = Flac.encode(src, 8000, blockSize = 64, strategy = Flac.EncVerbatim)
    assert(enc.length < verb.length / 4)
  }

  test("full-scale samples (Short.Min/Max) survive") {
    val src = Array.tabulate(100)(i =>
      if (i % 2 == 0) Short.MinValue else Short.MaxValue)
    assertSame(src, Flac.decode(Flac.encode(src, 8000, blockSize = 64)).get.samples)
  }

  test("encode is deterministic and compresses smooth content") {
    val src = smooth(4000)
    val a = Flac.encode(src, 8000)
    assert(java.util.Arrays.equals(a, Flac.encode(src, 8000)))
    assert(a.length < src.length * 2 * 3 / 4, s"no compression: ${a.length} vs ${src.length * 2}")
  }

  // --------------------------------------------- hand-built mid/side

  /** Build a single mid/side frame by hand (verbatim subframes, side
    * at 17 bits) — the decoder-only stereo path our encoder never
    * emits, pinned against the spec's reconstruction rule.
    */
  test("hand-built mid/side frame reconstructs L/R exactly") {
    val left = Array[Int](100, -200, 32767, -32768, 0, 5, -1, 77,
      1000, -1000, 250, 3, 17, -17, 9, -9)
    val right = Array[Int](-50, 199, -32768, 32767, 1, -5, 1, -77,
      999, -999, -250, -3, -17, 17, -9, 9)
    val n = left.length
    val out = new java.io.ByteArrayOutputStream()
    // fLaC + STREAMINFO: rate 8000, 2ch, 16-bit, n samples
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
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    out.write(wbits(Seq((1L, 1), (0L, 7), (34L, 24),
      (16L, 16), (16L, 16), (0L, 24), (0L, 24),
      (8000L, 20), (1L, 3), (15L, 5), (n.toLong, 36)) ++
      Seq.fill(16)((0L, 8))), 0, 38)
    // frame: sync, fixed blocking, bs=16-bit form, sr=streaminfo,
    // chan=1010 (mid/side), size=16-bit, frame 0, bs-1
    val header = wbits(Seq((0x3ffeL, 14), (0L, 1), (0L, 1), (7L, 4), (0L, 4),
      (10L, 4), (4L, 3), (0L, 1), (0L, 8), ((n - 1).toLong, 16)))
    // subframes: mid = (l+r)>>1 at 16 bits, side = l-r at 17 bits
    val mid = Array.tabulate(n)(i => (left(i) + right(i)) >> 1)
    val side = Array.tabulate(n)(i => left(i) - right(i))
    val sfBits = Seq.newBuilder[(Long, Int)]
    sfBits += ((0L, 1)); sfBits += ((1L, 6)); sfBits += ((0L, 1)) // verbatim mid
    mid.foreach(v => sfBits += (((v & 0xffffL), 16)))
    sfBits += ((0L, 1)); sfBits += ((1L, 6)); sfBits += ((0L, 1)) // verbatim side
    side.foreach(v => sfBits += (((v.toLong & 0x1ffffL), 17)))
    val body = wbits(sfBits.result())
    // assemble with CRCs (reuse the object's own CRC via reflection-free
    // local impls — spec constants, not implementation sharing)
    def crc8(d: Array[Byte]): Int = {
      var c = 0
      d.foreach { b =>
        c ^= b & 0xff
        for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
      }
      c
    }
    def crc16(d: Array[Byte]): Int = {
      var c = 0
      d.foreach { b =>
        c ^= (b & 0xff) << 8
        for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff
      }
      c
    }
    val withCrc8 = header :+ crc8(header).toByte
    val frame = withCrc8 ++ body
    val c16 = crc16(frame)
    out.write(frame, 0, frame.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)

    val dec = Flac.decode(out.toByteArray).getOrElse(fail("mid/side decode failed"))
    assert(dec.channels == 2)
    val got = dec.samples
    for (i <- 0 until n) {
      assert(got(i * 2) == left(i).toShort, s"L[$i]")
      assert(got(i * 2 + 1) == right(i).toShort, s"R[$i]")
    }
  }

  /** Hand-build a mono frame exercising three decoder-only paths the
    * encoder never emits: an LPC subframe (order 2, quantized
    * coefficients + shift), a WASTED-BITS shift, and a rice ESCAPE
    * partition (raw fixed-width residuals). Expected samples derived
    * by hand from the spec's reconstruction rules.
    */
  test("hand-built LPC + wasted-bits + escape-partition frame decodes") {
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
    def crc8(d: Array[Byte]): Int = {
      var c = 0
      d.foreach { b =>
        c ^= b & 0xff
        for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
      }
      c
    }
    def crc16(d: Array[Byte]): Int = {
      var c = 0
      d.foreach { b =>
        c ^= (b & 0xff) << 8
        for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff
      }
      c
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    out.write(wbits(Seq((1L, 1), (0L, 7), (34L, 24),
      (16L, 16), (16L, 16), (0L, 24), (0L, 24),
      (8000L, 20), (0L, 3), (15L, 5), (6L, 36)) ++
      Seq.fill(16)((0L, 8))), 0, 38)
    val header = wbits(Seq((0x3ffeL, 14), (0L, 1), (0L, 1), (7L, 4), (0L, 4),
      (0L, 4), (4L, 3), (0L, 1), (0L, 8), (5L, 16)))
    // subframe: LPC order 2 (type 100001), wasted=1 (flag 1, unary "1"),
    // warmup 3,5 at 15 bits; precision 4 (code 3), shift 1,
    // coefs 1,1; residual: 4-bit rice, po=0, ESCAPE (1111) nbits=4,
    // residuals -2, 1, 5, -6.
    // shifted-domain: s'2=-2+(5+3>>1)=2; s'3=1+(2+5>>1)=4;
    // s'4=5+(4+2>>1)=8; s'5=-6+(8+4>>1)=0 → samples <<1:
    // 6, 10, 4, 8, 16, 0
    val body = wbits(Seq(
      (0L, 1), (33L, 6), (1L, 1), (1L, 1),
      (3L, 15), (5L, 15),
      (3L, 4), (1L, 5),
      (1L, 4), (1L, 4),
      (0L, 2), (0L, 4), (15L, 4), (4L, 5),
      (0xeL, 4), (0x1L, 4), (0x5L, 4), (0xaL, 4)))
    val withCrc8 = header :+ crc8(header).toByte
    val frame = withCrc8 ++ body
    val c16 = crc16(frame)
    out.write(frame, 0, frame.length)
    out.write((c16 >> 8) & 0xff); out.write(c16 & 0xff)

    val dec = Flac.decode(out.toByteArray).getOrElse(fail("LPC frame decode failed"))
    assert(dec.samples.toSeq == Seq[Short](6, 10, 4, 8, 16, 0))
  }

  // ---------------------------------------------------- corrupt-safe

  test("corrupt payloads decode to None, never crash") {
    val good = Flac.encode(noise(400, 21), 8000, blockSize = 128)
    assert(Flac.decode(good).isDefined)
    var n = 0
    while (n < good.length) {
      assert(Flac.decode(java.util.Arrays.copyOf(good, n)).isEmpty, s"truncated at $n")
      n += 1
    }
    val orig = Flac.decode(good).get
    var i = 0
    while (i < good.length) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x45).toByte
      Flac.decode(bad) match {
        case None => ()
        case Some(d) => // only acceptable if every checksum still passed
          assert(java.util.Arrays.equals(d.samples, orig.samples), s"silent corruption at byte $i")
      }
      i += 1
    }
    assert(Flac.decode(null).isEmpty)
    assert(Flac.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(Flac.decode("fLaCxxxx".getBytes("US-ASCII")).isEmpty)
  }

  test("decode-bomb: tiny payload of CONSTANT frames is rejected at the output cap") {
    // totalSamples=0 (unknown) lets the frame loop run while bytes
    // remain; each ~14-byte CONSTANT frame expands to 65536 samples,
    // so a ~16 KB payload would otherwise decode to >2^26 samples of
    // Int arrays. The cap must fail it to None, never OOM.
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
    def crc8(d: Array[Byte]): Int = {
      var c = 0
      d.foreach { b =>
        c ^= b & 0xff
        for (_ <- 0 until 8) c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff
      }
      c
    }
    def crc16(d: Array[Byte]): Int = {
      var c = 0
      d.foreach { b =>
        c ^= (b & 0xff) << 8
        for (_ <- 0 until 8) c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff
      }
      c
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    // STREAMINFO: rate 8000, mono, 16-bit, totalSamples=0 (unknown)
    out.write(wbits(Seq((1L, 1), (0L, 7), (34L, 24),
      (16L, 16), (16L, 16), (0L, 24), (0L, 24),
      (8000L, 20), (0L, 3), (15L, 5), (0L, 36)) ++
      Seq.fill(16)((0L, 8))), 0, 38)
    // one mono CONSTANT frame of blockSize 65536 (bs code 7: 16-bit
    // field = 65535); frame number 0 for every copy — the decoder
    // parses but doesn't sequence-check it, so the frame bytes repeat
    val header = wbits(Seq((0x3ffeL, 14), (0L, 1), (0L, 1), (7L, 4), (0L, 4),
      (0L, 4), (4L, 3), (0L, 1), (0L, 8), (65535L, 16)))
    val body = wbits(Seq((0L, 1), (0L, 6), (0L, 1), (1234L, 16)))
    val withCrc8 = header :+ crc8(header).toByte
    val frame = withCrc8 ++ body
    val c16 = crc16(frame)
    val oneFrame = frame ++ Array(((c16 >> 8) & 0xff).toByte, (c16 & 0xff).toByte)
    // sanity: a few frames decode fine (the format is valid)
    (1 to 3).foreach(_ => out.write(oneFrame, 0, oneFrame.length))
    val small = Flac.decode(out.toByteArray)
    assert(small.isDefined && small.get.samples.length == 3 * 65536)
    // 1100 frames → 72M samples > 2^26 cap → None, bounded allocation
    (4 to 1100).foreach(_ => out.write(oneFrame, 0, oneFrame.length))
    assert(Flac.decode(out.toByteArray).isEmpty)
    // declared-totalSamples bomb: 36-bit totalSamples of 2^30 trips the
    // cap before any frame allocation
    val hdr = new java.io.ByteArrayOutputStream()
    hdr.write("fLaC".getBytes("US-ASCII"), 0, 4)
    hdr.write(wbits(Seq((1L, 1), (0L, 7), (34L, 24),
      (16L, 16), (16L, 16), (0L, 24), (0L, 24),
      (8000L, 20), (0L, 3), (15L, 5), (1L << 30, 36)) ++
      Seq.fill(16)((0L, 8))), 0, 38)
    hdr.write(oneFrame, 0, oneFrame.length)
    assert(Flac.decode(hdr.toByteArray).isEmpty)
  }

  test("non-16-bit streams are rejections, not crashes") {
    // patch STREAMINFO bps bits (byte 20 bits: rate[20] ch[3] bps[5])
    val good = Flac.encode(noise(100, 5), 8000, blockSize = 64)
    // STREAMINFO: starts at byte 8; bps-1 is bits 51..55 of the block
    // body → body byte 12 carries [rate₃ ch₃ bps₂] ... simpler: flip
    // through decode — patch via re-encode is impossible, so locate:
    // body offset 8+4=12; bps-1 low 4 bits live in byte 12+13=25's
    // high nibble? Assemble instead: change and expect None OR pass —
    // we only require no crash and no silent wrong answer.
    val orig = Flac.decode(good).get
    var i = 8
    while (i < 8 + 38) { // metadata region byte sweep
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x10).toByte
      Flac.decode(bad) match {
        case None => ()
        case Some(d) =>
          // header flips that survive must not corrupt SAMPLES silently
          // (rate/count metadata may legitimately differ)
          assert(d.samples.length != orig.samples.length ||
            java.util.Arrays.equals(d.samples, orig.samples) ||
            d.sampleRate != orig.sampleRate)
      }
      i += 1
    }
  }

  // ------------------------------------------- pipeline invariance

  test("energy fingerprint is invariant under the FLAC wire format") {
    val src = noise(2000, 31)
    val direct = Multimodal.Wav.energyHash60(src)
    for (strategy <- Seq(Flac.EncVerbatim, Flac.EncFixedAuto)) {
      val dec = Flac.decode(Flac.encode(src, 8000, strategy = strategy)).get
      assert(Multimodal.Wav.energyHash60(dec.samples) == direct)
    }
  }
}
