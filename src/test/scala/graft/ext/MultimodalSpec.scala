package graft.ext

import graft.SparkSpec
import graft.ext.Multimodal.{Bmp, BmpImage, Wav}

/** Real-decoder coverage: WAV RIFF chunk walk + PCM16, BMP padded
  * bottom-up rows + nearest-neighbor resize, corrupt-safety, and the
  * Spark decode paths dropping malformed payloads.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- WAV

  test("wav: encode → decode roundtrip recovers samples and format") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = Wav.encodePcm16(samples, 16000)
    val dec = Wav.decode(wav).get
    assert(dec.sampleRate == 16000 && dec.channels == 1 && dec.bitsPerSample == 16)
    assert(dec.samples.toSeq == samples.toSeq)
  }

  test("wav: parser chunk-walks — canonical 44-byte file (no LIST) also decodes") {
    // strip the LIST chunk the encoder inserts: rebuild the canonical
    // layout by hand from the encoded pieces
    val samples = Array[Short](5, -5, 9)
    val full = Wav.encodePcm16(samples, 8000)
    val fmtStart = 12
    val fmtLen = 8 + 16
    val dataStart = full.length - (8 + samples.length * 2)
    val canonical = new Array[Byte](44 + samples.length * 2)
    System.arraycopy(full, 0, canonical, 0, 12)              // RIFF/WAVE
    System.arraycopy(full, fmtStart, canonical, 12, fmtLen)  // fmt
    System.arraycopy(full, dataStart, canonical, 36, 8 + samples.length * 2)
    // patch RIFF size for the shorter file
    val riffLen = canonical.length - 8
    canonical(4) = (riffLen & 0xff).toByte
    canonical(5) = ((riffLen >> 8) & 0xff).toByte
    canonical(6) = ((riffLen >> 16) & 0xff).toByte
    canonical(7) = ((riffLen >> 24) & 0xff).toByte
    val dec = Wav.decode(canonical).get
    assert(dec.samples.toSeq == samples.toSeq && dec.sampleRate == 8000)
  }

  test("wav: corrupt payloads decode to None, never throw") {
    val good = Wav.encodePcm16(Array[Short](1, 2, 3), 8000)
    assert(Wav.decode(null).isEmpty)
    assert(Wav.decode(Array[Byte]()).isEmpty)
    assert(Wav.decode("not a riff file at all".getBytes).isEmpty)
    assert(Wav.decode(good.take(20)).isEmpty)                 // truncated mid-fmt
    assert(Wav.decode(good.dropRight(1)).isEmpty)             // truncated data
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Wav.decode(badMagic).isEmpty)
    val notPcm = good.clone(); notPcm(20) = 3                 // codec != 1
    assert(Wav.decode(notPcm).isEmpty)
  }

  test("wav: features are integer-exact (hand-computed)") {
    // samples: 3, -1, 0, -2 → crossings at 3→-1 (neg flips), -1→0
    // (0 counts as non-negative), 0→-2
    val w = Multimodal.WavPcm(8000, 1, 16, Array[Short](3, -1, 0, -2))
    val f = Wav.features(7L, w)
    assert(f.n_samples == 4)
    assert(f.duration_us == 4L * 1000000L / 8000L)            // 500 µs
    assert(f.peak == 3)
    assert(f.sum_sq == 9L + 1 + 0 + 4)
    assert(f.zero_crossings == 3)
  }

  test("wav: zero-sample clip roundtrips; features are all-zero") {
    val dec = Wav.decode(Wav.encodePcm16(Array.empty[Short], 8000)).get
    assert(dec.samples.isEmpty && dec.sampleRate == 8000)
    val f = Wav.features(1L, dec)
    assert(f.n_samples == 0 && f.duration_us == 0 && f.peak == 0 &&
      f.sum_sq == 0 && f.zero_crossings == 0)
  }

  // ------------------------------------------------------------- BMP

  test("bmp: roundtrip across the full padding sweep (widths 4..8)") {
    for (w <- 4 to 8; h <- 3 to 6) {
      val bgr = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
      val dec = Bmp.decode24(Bmp.encode24(w, h, bgr)).get
      assert(dec.width == w && dec.height == h, s"dims for w=$w h=$h")
      assert(dec.bgr.toSeq == bgr.toSeq, s"pixels for w=$w h=$h")
    }
  }

  test("bmp: degenerate dims roundtrip — 1×1 and 3×1 (stride > row bytes)") {
    val one = Bmp.decode24(Bmp.encode24(1, 1, Array[Byte](9, 8, 7))).get
    assert(one.width == 1 && one.height == 1 && one.bgr.toSeq == Seq[Byte](9, 8, 7))
    val row = Bmp.decode24(Bmp.encode24(3, 1, Array.tabulate[Byte](9)(_.toByte))).get
    assert(row.bgr.toSeq == (0 until 9).map(_.toByte))
    val half = Bmp.resizeNearest(one, 2) // factor > dims: still 1×1
    assert(half.width == 1 && half.height == 1)
  }

  test("bmp: file stores rows bottom-up — first encoded row is the image's last") {
    // 1 wide × 2 high: top pixel (1,2,3), bottom pixel (4,5,6)
    val img = Bmp.encode24(1, 2, Array[Byte](1, 2, 3, 4, 5, 6))
    // pixel data starts at offset 54; file's FIRST row must be the
    // BOTTOM image row (4,5,6)
    assert(img(54) == 4 && img(55) == 5 && img(56) == 6)
    val dec = Bmp.decode24(img).get
    assert(dec.bgr.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))      // back to top-down
  }

  test("bmp: corrupt payloads decode to None, never throw") {
    val good = Bmp.encode24(5, 3, Array.fill[Byte](45)(1))
    assert(Bmp.decode24(null).isEmpty)
    assert(Bmp.decode24(good.take(53)).isEmpty)               // truncated header
    assert(Bmp.decode24(good.dropRight(1)).isEmpty)           // truncated pixels
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Bmp.decode24(badMagic).isEmpty)
    val bpp8 = good.clone(); bpp8(28) = 8                     // unsupported depth
    assert(Bmp.decode24(bpp8).isEmpty)
    val rle = good.clone(); rle(30) = 1                       // compressed
    assert(Bmp.decode24(rle).isEmpty)
  }

  test("bmp: nearest-neighbor resize keeps the (y·f, x·f) grid, ceil dims") {
    // 5×3 image whose gray value encodes (y, x): v = 10*y + x
    val bgr = new Array[Byte](5 * 3 * 3)
    for (y <- 0 until 3; x <- 0 until 5; c <- 0 until 3)
      bgr((y * 5 + x) * 3 + c) = (10 * y + x).toByte
    val half = Bmp.resizeNearest(BmpImage(5, 3, bgr), 2)
    assert(half.width == 3 && half.height == 2)               // ceil(5/2), ceil(3/2)
    val got = for (y <- 0 until 2; x <- 0 until 3) yield half.bgr((y * 3 + x) * 3).toInt
    assert(got == Seq(0, 2, 4, 20, 22, 24))                   // source (2y, 2x)
    val same = Bmp.resizeNearest(BmpImage(5, 3, bgr), 1)
    assert(same.bgr.toSeq == bgr.toSeq)                       // factor 1 = identity
  }

  test("bmp: features hand-computed, including the half-scale sum") {
    // 2×2, channel values chosen distinct per channel
    val bgr = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    val f = Bmp.features(3L, BmpImage(2, 2, bgr))
    assert(f.sum_b == 1 + 4 + 7 + 10)
    assert(f.sum_g == 2 + 5 + 8 + 11)
    assert(f.sum_r == 3 + 6 + 9 + 12)
    assert(f.half_w == 1 && f.half_h == 1)
    assert(f.half_sum == 1 + 2 + 3)                           // only pixel (0,0) kept
  }

  // ------------------------------------------------- Spark decode path

  test("spark: wavFeatures/bmpFeatures decode real payloads and drop corrupt ones") {
    val wavGood = Wav.encodePcm16(Array[Short](100, -200, 300), 8000)
    val bmpGood = Bmp.encode24(4, 3, Array.tabulate[Byte](36)(i => i.toByte))
    val media = Seq(
      Multimodal.MediaRecord(1L, wavGood, "audio/wav"),
      Multimodal.MediaRecord(2L, "garbage".getBytes, "audio/wav"),
      Multimodal.MediaRecord(3L, bmpGood, "image/bmp"),
      Multimodal.MediaRecord(4L, bmpGood.take(40), "image/bmp")).toDF()

    val wavOut = Multimodal.wavFeatures(spark, media.filter($"mime" === "audio/wav"), 2).collect()
    assert(wavOut.map(_.media_id).toSeq == Seq(1L))           // corrupt row dropped
    assert(wavOut.head.peak == 300 && wavOut.head.n_samples == 3)

    val bmpOut = Multimodal.bmpFeatures(spark, media.filter($"mime" === "image/bmp"), 2).collect()
    assert(bmpOut.map(_.media_id).toSeq == Seq(3L))
    assert(bmpOut.head.width == 4 && bmpOut.head.height == 3)
  }

  // ------------------------------------------------------------ dHash

  /** 11×6 gray image (b=g=r=v so luma = v): even rows strictly
    * increasing left→right, odd rows strictly decreasing.
    */
  private def gradientImage(bias: Int): BmpImage = {
    val bgr = new Array[Byte](11 * 6 * 3)
    for (y <- 0 until 6; x <- 0 until 11) {
      val v = (bias + (if (y % 2 == 0) x else 10 - x)).toByte
      val o = (y * 11 + x) * 3
      bgr(o) = v; bgr(o + 1) = v; bgr(o + 2) = v
    }
    BmpImage(11, 6, bgr)
  }

  test("dhash60: hand-computed on the identity grid — rising rows set all 10 bits") {
    // 11-wide, 6-tall → sampling is the identity; even rows rise
    // (all 10 gradient bits set), odd rows fall (none set)
    val expected = (0x3FFL << 0) | (0x3FFL << 20) | (0x3FFL << 40)
    assert(Bmp.dhash60(gradientImage(bias = 0)) == expected)
  }

  test("dhash60: invariant to global brightness shift") {
    assert(Bmp.dhash60(gradientImage(0)) == Bmp.dhash60(gradientImage(57)))
  }

  test("dhash60: uses the 299/587/114 integer luma, strict-< ties clear the bit") {
    // pixel A pure blue (gray = 114·255/1000 = 29), pixel B pure red
    // with r=97 (gray = 299·97/1000 = 29): equal luma from different
    // bytes → the comparison bit must be 0 (strict <)
    val bgr = new Array[Byte](11 * 6 * 3)
    for (y <- 0 until 6; x <- 0 until 11) {
      val o = (y * 11 + x) * 3
      if (x % 2 == 0) { bgr(o) = 255.toByte; bgr(o + 1) = 0; bgr(o + 2) = 0 }
      else { bgr(o) = 0; bgr(o + 1) = 0; bgr(o + 2) = 97.toByte }
    }
    assert(Bmp.dhash60(BmpImage(11, 6, bgr)) == 0L)
  }

  test("dhash60: nearest-neighbor sampling keeps the (⌊gy·h/6⌋, ⌊gx·w/11⌋) grid") {
    // 22×12: sampled pixels sit at even coords; poison every
    // unsampled pixel — the hash must equal the 11×6 reference's
    val ref = gradientImage(0)
    val bgr = new Array[Byte](22 * 12 * 3)
    for (y <- 0 until 12; x <- 0 until 22) {
      val o = (y * 22 + x) * 3
      val v = if (y % 2 == 0 && x % 2 == 0)
        ref.bgr(((y / 2) * 11 + x / 2) * 3)
      else 200.toByte
      bgr(o) = v; bgr(o + 1) = v; bgr(o + 2) = v
    }
    assert(Bmp.dhash60(BmpImage(22, 12, bgr)) == Bmp.dhash60(ref))
  }

  test("rawvideo: roundtrip, corrupt-safety, and stride sampling with per-frame dhash") {
    import org.apache.spark.sql.functions.col
    val frames = (0 until 5).map(f =>
      Array.tabulate[Byte](11 * 6 * 3)(i => ((i + f * 3) % 64).toByte))
    val clip = Multimodal.RawVideo.encode(11, 6, frames)
    val dec = Multimodal.RawVideo.decode(clip).get
    assert(dec.width == 11 && dec.height == 6 && dec.frames.length == 5)
    assert(dec.frames(3).toSeq == frames(3).toSeq)
    // corrupt: bad magic, truncated frame data
    assert(Multimodal.RawVideo.decode("garbage".getBytes).isEmpty)
    assert(Multimodal.RawVideo.decode(clip.take(clip.length - 7)).isEmpty)
    // stride-2 sampling keeps frames 0,2,4 and hashes each
    val media = Seq(Multimodal.MediaRecord(5L, clip, "video/raw"),
      Multimodal.MediaRecord(6L, clip.take(20), "video/raw")).toDF()
    val rows = Multimodal.videoFrameHashes(spark, media, stride = 2, partitions = 2)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.media_id).toSet == Set(5L)) // corrupt clip dropped
    assert(rows.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L))
    assert(rows.forall(_.n_frames == 5L))
    val direct = frames.indices.by(2).map(i =>
      Bmp.dhash60(BmpImage(11, 6, frames(i))))
    assert(rows.map(_.fp).toSeq == direct)
  }

  test("energyHash60: identity frames hand-computed; gain-invariant; empty clip is 0") {
    // n = 61 → one sample per frame, e_j = s_j²: rising |amplitude|
    // sets every gradient bit, falling clears them
    val rising = Array.tabulate[Short](61)(i => i.toShort)
    assert(Wav.energyHash60(rising) == (1L << 60) - 1)
    val falling = Array.tabulate[Short](61)(i => (61 - i).toShort)
    assert(Wav.energyHash60(falling) == 0L)
    // energies scale by g² under gain — gradient signs survive
    val mixed = Array.tabulate[Short](61)(i => ((i * 37) % 50 - 25).toShort)
    val doubled = mixed.map(v => (v * 2).toShort)
    assert(Wav.energyHash60(mixed) == Wav.energyHash60(doubled))
    assert(Wav.energyHash60(Array.empty[Short]) == 0L)
  }

  test("energyHash60: clips past ~35.2M samples (j*61 Int overflow) still hash") {
    // 36M samples × 61 > Int.MaxValue at the tail — the frame index
    // must be computed in Long or the last frames go negative and
    // crash; a rising-energy staircase keeps the expected value exact
    val n = 36_000_000
    val s = new Array[Short](n)
    var j = 0
    while (j < n) { s(j) = ((j.toLong * 61 / n) * 3).toShort; j += 1 }
    assert(Wav.energyHash60(s) == (1L << 60) - 1)
  }

  test("rawvideo: header dims overflowing w*h*3 in Int decode to None, not a crash") {
    // 65535×65535×3 overflows Int; the truncation check must run in
    // Long so corrupt/adversarial headers get the contracted None
    val b = new Array[Byte](64)
    b(0) = 'R'; b(1) = 'V'; b(2) = 'I'; b(3) = 'D'
    b(4) = -1; b(5) = -1 // w = 65535
    b(6) = -1; b(7) = -1 // h = 65535
    b(8) = 1             // n_frames = 1
    assert(Multimodal.RawVideo.decode(b).isEmpty)
  }

  test("spark: bmpDHashes + hammingNearDupPairs find planted perturbed copies") {
    // quad of near-identical images (one low bit differs) + one far image
    val base = gradientImage(0)
    def perturb(seed: Int): Array[Byte] = {
      val b = base.bgr.clone()
      val o = ((seed % 6) * 11 + seed % 11) * 3
      b(o) = (b(o) + 1).toByte; b(o + 1) = b(o); b(o + 2) = b(o)
      b
    }
    val far = gradientImage(0).bgr.map(v => (200 - v).toByte)
    val media = Seq(
      Multimodal.MediaRecord(1L, Bmp.encode24(11, 6, base.bgr), "image/bmp"),
      Multimodal.MediaRecord(2L, Bmp.encode24(11, 6, perturb(7)), "image/bmp"),
      Multimodal.MediaRecord(3L, Bmp.encode24(11, 6, perturb(23)), "image/bmp"),
      Multimodal.MediaRecord(9L, Bmp.encode24(11, 6, far), "image/bmp")).toDF()
    val fps = Multimodal.bmpDHashes(spark, media, 2).toDF()
    val banded = Dedup.hammingNearDupPairs(fps, "media_id", "fp", 60, 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // brute force over the collected fingerprints
    val m = fps.select("media_id", "fp").as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- m.keys; b <- m.keys if a < b
      if java.lang.Long.bitCount(m(a) ^ m(b)) <= 3
    } yield (a, b)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty && brute.forall { case (a, b) => a != 9L && b != 9L })
  }

  test("imageDHashes: magic-byte dispatch hashes a mixed BMP/JPEG corpus; junk dropped") {
    // strong ±20/px gradient — dHash only survives a LOSSY codec
    // when gradient structure dominates quantization noise (the
    // Δ=1 gradientImage fixture is a near-tie and legitimately
    // scatters through JPEG)
    val img = {
      val bgr = new Array[Byte](11 * 6 * 3)
      for (y <- 0 until 6; x <- 0 until 11) {
        val v = (20 + (if (y % 2 == 0) x * 20 else 200 - x * 20)).toByte
        val o = (y * 11 + x) * 3
        bgr(o) = v; bgr(o + 1) = v; bgr(o + 2) = v
      }
      BmpImage(11, 6, bgr)
    }
    val bmp = Bmp.encode24(img.width, img.height, img.bgr)
    val jpg = Jpeg.encode(img, quality = 95)
    val media = Seq(
      Multimodal.MediaRecord(1L, bmp, "image/bmp"),
      Multimodal.MediaRecord(2L, jpg, "image/jpeg"),
      Multimodal.MediaRecord(3L, "neither format".getBytes, "text/plain"),
      Multimodal.MediaRecord(4L, jpg.take(jpg.length / 2), "image/jpeg")).toDF()
    val rows = Multimodal.imageDHashes(spark, media, 2).collect()
      .map(r => r.media_id -> r).toMap
    assert(rows.keySet == Set(1L, 2L)) // junk + truncated dropped
    assert(rows(1L).width == img.width && rows(2L).width == img.width)
    // the BMP fingerprint is exact; the JPEG one decodes lossily but
    // stays within the near-dup radius of it
    assert(rows(1L).fp == Bmp.dhash60(img))
    assert(java.lang.Long.bitCount(rows(1L).fp ^ rows(2L).fp) <= 3)
  }

  test("wavWindowHashes: window split matches direct hashing; trailing partial dropped") {
    val samples = Array.tabulate[Short](250)(j => ((j * 37) % 97 - 48).toShort)
    val wav = Wav.encodePcm16(samples, 8000)
    val media = Seq(Multimodal.MediaRecord(7L, wav, "audio/wav"),
      Multimodal.MediaRecord(8L, "junk".getBytes, "audio/wav")).toDF()
    val rows = Multimodal.wavWindowHashes(spark, media, windowSamples = 100,
      partitions = 2).collect().sortBy(_.frame_idx)
    assert(rows.map(_.media_id).toSet == Set(7L)) // corrupt dropped
    assert(rows.map(_.frame_idx).toSeq == Seq(0L, 1L)) // 250 → 2 full windows
    assert(rows.forall(_.n_frames == 2L))
    val direct = (0 until 2).map(i =>
      Wav.energyHash60(samples.slice(i * 100, (i + 1) * 100)))
    assert(rows.map(_.fp).toSeq == direct)
  }

  test("videoSequenceNearDupPairs: one-frame offset passes the vote; single-frame coincidence fails") {
    import org.apache.spark.sql.functions.col
    // clip 1: fast-changing frames f0..f5 (adjacent hashes far apart)
    // clip 2: clip 1 delayed one frame (first frame duplicated)
    // clip 3: shares ONE frame with clip 1 (a coincidence, not a dup)
    def fps(seed: Int): Long = 0x3FFL << ((seed % 6) * 10) // far-apart frame hashes
    val rows =
      (0 until 6).map(f => (1L, 6L, f.toLong, fps(f))) ++
      (0 until 6).map(f => (2L, 6L, f.toLong, fps(math.max(f - 1, 0)))) ++
      Seq((3L, 6L, 0L, fps(4)), (3L, 6L, 1L, 0x155L), (3L, 6L, 2L, 0x2AAL),
        (3L, 6L, 3L, 0x555L), (3L, 6L, 4L, 0xAAAL), (3L, 6L, 5L, 0x1555L))
    val fh = rows.toDF("media_id", "n_frames", "frame_idx", "fp")
    val pairs = Multimodal.videoSequenceNearDupPairs(fh, maxDistance = 2)
      .select("id_a", "id_b", "votes").as[(Long, Long, Long)].collect().toSet
    // (1,2) at offset 1 aligns 5 of 6 frames (majority) — matched
    // with 5 votes; (1,3)'s single shared frame is 1 vote — dropped
    assert(pairs == Set((1L, 2L, 5L)))
    // keyframe grain misses the same pair: middle frames f3 vs f2
    // hash 20 bits apart
    val keyed = fh.filter(col("frame_idx") === 3L)
    val kp = Dedup.hammingNearDupPairs(
      keyed.select(col("media_id"), col("fp")), "media_id", "fp",
      bits = 60, maxDistance = 2).count()
    assert(kp == 0L)
  }

  test("hammingNearDupPairs: hot-bucket grid guard ≡ brute force on a skewed flat-image fixture") {
    // the real-world skew the uniform-bucket assumption misses: flat
    // (near-black) images all dHash to 0, so every chunk bucket of
    // every flat image is (i, 0) — one bucket holds the whole corpus.
    // 500 flat images + a halo within distance ≤3 + distant outliers;
    // a tiny bucketCap forces the grid-salted branch to do the work.
    val flat = (1L to 500L).map(id => id -> 0L)
    val halo = Seq(601L -> 1L, 602L -> 6L, 603L -> (1L << 44),
      604L -> ((1L << 3) | (1L << 17) | (1L << 59)))
    val far = Seq(701L -> 0x0ffffffffffffffL, 702L -> 0x5555555555555L)
    val all = flat ++ halo ++ far
    val fps = all.toDF("media_id", "fp")
    val guarded = Dedup.hammingNearDupPairs(fps, "media_id", "fp", 60, 3,
        bucketCap = 16, maxSalt = 4)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (a, fa) <- all; (b, fb) <- all if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(guarded == brute)
    // sanity on the fixture shape: the flat clique alone is 124,750
    // pairs, the halo joins it, the far pair stays out
    assert(brute.size > 124750)
    assert(!brute.exists { case (a, b, _) => a >= 700L || b >= 700L })
    // and the guard changed the ROUTE, not the answer: default cap
    // (no bucket over 2^14) gives the identical set
    val unguarded = Dedup.hammingNearDupPairs(fps, "media_id", "fp", 60, 3)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(unguarded == brute)
  }

  test("shotBoundaries: lag rule, threshold, and running shot index") {
    // clip 1: hashes 0,0,15,15,15,13 with maxDistance 2 →
    // boundaries at f=0 (first), f=2 (0→15 is 4 bits), NOT f=5
    // (15→13 is 1 bit, within threshold); clip 2: single frame
    val rows = Seq(
      (1L, 6L, 0L, 0L), (1L, 6L, 1L, 0L), (1L, 6L, 2L, 15L),
      (1L, 6L, 3L, 15L), (1L, 6L, 4L, 15L), (1L, 6L, 5L, 13L),
      (2L, 1L, 0L, 7L))
      .toDF("media_id", "n_frames", "frame_idx", "fp")
    val out = Multimodal.shotBoundaries(rows, maxDistance = 2)
      .orderBy("media_id", "frame_idx")
      .select("media_id", "frame_idx", "is_boundary", "shot_idx")
      .as[(Long, Long, Boolean, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, true, 0L), (1L, 1L, false, 0L), (1L, 2L, true, 1L),
      (1L, 3L, false, 1L), (1L, 4L, false, 1L), (1L, 5L, false, 1L),
      (2L, 0L, true, 0L)))
  }

  // ------------------------------------------------ bilinear resize

  test("resizeBilinear: same-dims resample is the identity") {
    val bgr = Array.tabulate(7 * 5 * 3)(i => ((i * 37) % 256).toByte)
    val img = BmpImage(7, 5, bgr)
    val out = Bmp.resizeBilinear(img, 7, 5)
    assert(java.util.Arrays.equals(out.bgr, bgr))
  }

  test("resizeBilinear: constant image stays constant at any geometry") {
    val img = BmpImage(9, 4, Array.fill(9 * 4 * 3)(77.toByte))
    for ((w, h) <- Seq((1, 1), (3, 3), (18, 8), (100, 1)))
      assert(Bmp.resizeBilinear(img, w, h).bgr.forall(_ == 77))
  }

  test("resizeBilinear: 2x upscale of a step edge interpolates exactly") {
    // 2×1 image, channel values 0 | 200 → out 4×1: 0, 50, 150, 200
    // (align-centers: sx = -0.25, 0.25, 0.75, 1.25, border-clamped)
    val img = BmpImage(2, 1, Array[Byte](0, 0, 0, 200.toByte, 200.toByte, 200.toByte))
    val out = Bmp.resizeBilinear(img, 4, 1)
    val b = out.bgr.grouped(3).map(_(0) & 0xff).toSeq
    assert(b == Seq(0, 50, 150, 200))
  }

  test("resizeBilinear: exact 2:1 downscale is the 2x2 block mean") {
    // 4×2 image with distinct per-pixel values; 2×1 output pixels are
    // the rounded mean of each aligned 2×2 block (fx = fy = 1/2)
    val vals = Array(10, 20, 30, 40, 50, 60, 70, 80) // row-major
    val bgr = new Array[Byte](4 * 2 * 3)
    for (p <- 0 until 8; c <- 0 until 3) bgr(p * 3 + c) = vals(p).toByte
    val out = Bmp.resizeBilinear(BmpImage(4, 2, bgr), 2, 1)
    val got = out.bgr.grouped(3).map(_(0) & 0xff).toSeq
    assert(got == Seq((10 + 20 + 50 + 60) / 4, (30 + 40 + 70 + 80) / 4))
  }

  test("resizeBilinear: gray input stays gray; dims contract holds") {
    val img = BmpImage(13, 7, Array.tabulate(13 * 7 * 3) { i =>
      (((i / 3) * 11) % 256).toByte // b = g = r per pixel
    })
    val out = Bmp.resizeBilinear(img, 5, 9)
    assert(out.width == 5 && out.height == 9 && out.bgr.length == 5 * 9 * 3)
    out.bgr.grouped(3).foreach(px => assert(px(0) == px(1) && px(1) == px(2)))
  }

  test("thumbnailDHashes: 22x12 thumbnail of the strip corpus keeps the strip fingerprint") {
    // 44×24 strip image (4-px strips) → 22×12: every output pixel
    // averages a same-strip pair, so the thumbnail IS the strip
    // pattern at half size and dHash matches the full-size hash
    val levels = Array(40, 128, 216)
    val seq = Array(0, 1, 2, 0, 1, 2, 0, 1, 2, 0, 1)
    val bgr = new Array[Byte](44 * 24 * 3)
    for (y <- 0 until 24; x <- 0 until 44; c <- 0 until 3)
      bgr((y * 44 + x) * 3 + c) = levels(seq(x / 4)).toByte
    val img = BmpImage(44, 24, bgr)
    val thumb = Bmp.resizeBilinear(img, 22, 12)
    assert(Bmp.dhash60(thumb) == Bmp.dhash60(img))
    // and the thumbnail pixels are exactly the strip levels
    for (y <- 0 until 12; x <- 0 until 22)
      assert((thumb.bgr((y * 22 + x) * 3) & 0xff) == levels(seq(x / 2)))
  }
}
