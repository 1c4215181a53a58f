package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode/feature-extract
  * plumbing a training-data pipeline needs.
  *
  * Every decode tier is REAL, in pure JVM byte parsing — no codec
  * library and no stubs: [[Wav]] (RIFF chunk walk + PCM16), [[Bmp]]
  * (BITMAPINFOHEADER + padded bottom-up pixel rows), [[RawVideo]]
  * (the self-defined uncompressed container), baseline JPEG
  * ([[Jpeg]] — marker walk, Huffman entropy decode, dequant, IDCT,
  * chroma upsample, YCbCr→RGB), PNG ([[Png]] — chunk walk with
  * CRC-32, a from-scratch RFC 1951 inflate, scanline unfilter),
  * lossless audio ([[Flac]]), lossy audio ([[Mpeg1]] — MPEG-1 Layer
  * I), and compressed video ([[Mpeg1Video]] — MPEG-1 intra-coded
  * pictures, ISO 11172-2; P/B motion compensation is the one
  * disclosed scope cut, rejected as `None` rather than stubbed).
  * Each decoder has a corrupt-safe `Option` result (malformed
  * payloads surface as nulls, the O-05 discipline, never as
  * executor crashes).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String)

  /** Generic content-features row ([[decodeFeatures]]). */
  final case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Int,
      features: Array[Float])

  /** Content-agnostic byte-histogram featurizer — the fallback for
    * payloads with no format-specific decoder (opaque/unknown mimes),
    * and q25's oracle-replayable generic feature extractor. Formerly
    * named ByteHistogram when it stood in for the then-stubbed video
    * tier; video is now real ([[Mpeg1Video]]), and this remains as a
    * deliberately format-blind featurizer, not a stand-in.
    */
  object ByteHistogram {
    val featureDim = 8
    def decode(payload: Array[Byte]): Array[Float] = {
      val hist = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) % featureDim) += 1f
        i += 1
      }
      val n = math.max(payload.length, 1).toFloat
      hist.map(_ / n)
    }
  }

  /** Wrap an (id, string payload) frame as a media table — binary
    * payload plus metadata columns computed in-plan (codegen'd):
    * byte length and a content-addressed sha256.
    */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String, mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      lit(mime).as("mime"))
      .withColumn("n_bytes", octet_length(col("payload")))
      .withColumn("sha256", sha2(col("payload"), 256))

  /** Frame sampling for video-like payloads: treat the binary as
    * fixed-size frames and keep every `every`-th one — in-plan
    * (`substring` on binary is codegen'd), so sampling happens during
    * the scan, before any decode cost. The frame size is metadata a
    * real container format would provide; the byte math is real, the
    * "frames" here are synthetic.
    */
  def frameSample(payload: org.apache.spark.sql.Column, frameSize: Int, every: Int)
      : org.apache.spark.sql.Column = {
    val nFrames = floor(octet_length(payload) / frameSize)
    val lastIdx = greatest(((nFrames - 1) / every).cast("long"), lit(0L))
    transform(
      sequence(lit(0L), lastIdx),
      i => substring(payload, (i * every * frameSize + 1).cast("int"), lit(frameSize)))
  }

  // (the former byte-decimation `resizeStub` is gone: real scalers
  // live in [[Bmp.resizeNearest]] and [[Bmp.resizeBilinear]], fed by
  // the real BMP/JPEG/PNG decoders)

  // ------------------------------------------------------- WAV (real)

  /** Decoded PCM16 audio: format metadata + the raw samples. */
  final case class WavPcm(
      sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Short])

  /** Integer-exact audio features (every value reproducible in SQL
    * from the source samples — no floats anywhere).
    */
  final case class WavFeatures(
      media_id: Long, sample_rate: Int, n_samples: Long, duration_us: Long,
      peak: Int, sum_sq: Long, zero_crossings: Long)

  /** REAL WAV/PCM16 handling — RIFF writer + chunk-walking reader.
    * Pure byte parsing (little-endian), no codec library involved.
    * The writer emits a `LIST/INFO` chunk between `fmt ` and `data`
    * on purpose: a reader that assumes the canonical 44-byte layout
    * instead of walking chunks breaks on these files, so the tests
    * pin genuine chunk-walk behavior.
    */
  object Wav {
    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
    }
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def rd32(b: Array[Byte], off: Int): Int =
      rd16(b, off) | (rd16(b, off + 2) << 16)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def putTag(b: Array[Byte], off: Int, t: String): Unit =
      System.arraycopy(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII), 0, b, off, 4)

    private val Info = "GRFT"

    /** Mono PCM16 → WAV bytes (RIFF / fmt / LIST-INFO / data). */
    def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      require(sampleRate > 0, "sampleRate must be positive")
      val dataLen = samples.length * 2
      val infoLen = 4 + 8 + Info.length          // 'INFO' + sub-chunk hdr + text
      val riffLen = 4 + (8 + 16) + (8 + infoLen) + (8 + dataLen)
      val out = new Array[Byte](8 + riffLen)
      var o = 0
      putTag(out, o, "RIFF"); le32(out, o + 4, riffLen); o += 8
      putTag(out, o, "WAVE"); o += 4
      putTag(out, o, "fmt "); le32(out, o + 4, 16); o += 8
      le16(out, o, 1)                            // PCM
      le16(out, o + 2, 1)                        // mono
      le32(out, o + 4, sampleRate)
      le32(out, o + 8, sampleRate * 2)           // byte rate
      le16(out, o + 12, 2)                       // block align
      le16(out, o + 14, 16); o += 16             // bits/sample
      putTag(out, o, "LIST"); le32(out, o + 4, infoLen); o += 8
      putTag(out, o, "INFO"); o += 4
      putTag(out, o, "INAM"); le32(out, o + 4, Info.length); o += 8
      System.arraycopy(Info.getBytes, 0, out, o, Info.length); o += Info.length
      putTag(out, o, "data"); le32(out, o + 4, dataLen); o += 8
      var i = 0
      while (i < samples.length) { le16(out, o + 2 * i, samples(i) & 0xffff); i += 1 }
      out
    }

    /** Chunk-walking parser; `None` on any malformed payload (bad
      * magic, truncated chunk, missing fmt/data, non-PCM16-mono).
      */
    def decode(payload: Array[Byte]): Option[WavPcm] = {
      if (payload == null || payload.length < 12) return None
      if (tag(payload, 0) != "RIFF" || tag(payload, 8) != "WAVE") return None
      var o = 12
      var fmt: Option[(Int, Int, Int)] = None    // (channels, rate, bits)
      var data: Option[(Int, Int)] = None        // (offset, len)
      while (o + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
        val t = tag(payload, o)
        val len = rd32(payload, o + 4)
        if (len < 0 || o + 8 + len > payload.length) return None
        t match {
          case "fmt " =>
            if (len < 16) return None
            val codec = rd16(payload, o + 8)
            if (codec != 1) return None          // PCM only
            fmt = Some((rd16(payload, o + 10), rd32(payload, o + 12), rd16(payload, o + 22)))
          case "data" => data = Some((o + 8, len))
          case _      => ()                      // skip LIST/INFO etc.
        }
        o += 8 + len + (len & 1)                 // RIFF chunks are word-aligned
      }
      for {
        (ch, rate, bits) <- fmt
        (off, len) <- data
        if ch == 1 && bits == 16 && rate > 0 && len % 2 == 0
      } yield {
        val samples = new Array[Short](len / 2)
        var i = 0
        while (i < samples.length) { samples(i) = rd16(payload, off + 2 * i).toShort; i += 1 }
        WavPcm(rate, ch, bits, samples)
      }
    }

    /** Integer-exact features of decoded PCM: sample count, duration
      * (floor µs), peak |amplitude|, energy (Σs²), and strict
      * sign-change zero crossings (a sample is "negative" iff < 0).
      */
    def features(id: Long, w: WavPcm): WavFeatures = {
      val s = w.samples
      var peak = 0; var sumSq = 0L; var zc = 0L
      var i = 0
      while (i < s.length) {
        val v = s(i).toInt
        val a = math.abs(v)
        if (a > peak) peak = a
        sumSq += v.toLong * v
        if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
        i += 1
      }
      WavFeatures(id, w.sampleRate, s.length.toLong,
        s.length.toLong * 1000000L / w.sampleRate, peak, sumSq, zc)
    }

    /** 60-bit audio ENERGY-GRADIENT hash — the acoustic analogue of
      * [[Bmp.dhash60]] (the same idea as public audio-fingerprint
      * practice: hash the sign of energy deltas between adjacent
      * frames, which survives gain changes and low-amplitude noise):
      * samples bucket into 61 near-equal frames (`frame(j) = j·61/n`,
      * integer division), each frame's energy is the exact Σs² long,
      * and bit i is set when `e_i < e_{i+1}`. Integer-exact end to
      * end — an oracle replays frame assignment, energies, and bits
      * from the raw samples. 60 bits, non-negative, so the
      * fingerprint rides [[graft.ext.Dedup.hammingNearDupPairs]]'s
      * pigeonhole banding unchanged. Clips shorter than 61 samples
      * leave some frames empty (energy 0) — still deterministic.
      */
    def energyHash60(samples: Array[Short]): Long = {
      val n = samples.length
      if (n == 0) return 0L
      val e = new Array[Long](61)
      var j = 0
      while (j < n) {
        val v = samples(j).toLong
        // frame index in Long: j*61 overflows Int past ~35.2M samples
        // (≈13 min at 44.1kHz), well under the 2GB payload limit
        e((j.toLong * 61 / n).toInt) += v * v
        j += 1
      }
      var fp = 0L
      var i = 0
      while (i < 60) {
        if (e(i) < e(i + 1)) fp |= 1L << i
        i += 1
      }
      fp
    }
  }

  // ----------------------------------------------- raw video (real)

  /** Decoded raw video clip: dims + top-down BGR frames. */
  final case class RawVideoClip(
      width: Int, height: Int, frames: IndexedSeq[Array[Byte]])

  /** Minimal UNCOMPRESSED video container (self-defined, documented
    * here — the honest tier between "opaque binary" and the stubbed
    * compressed codecs): `RVID` magic, le16 width, le16 height,
    * le32 n_frames, then n_frames × (w·h·3) top-down BGR planes.
    * Real byte parsing with corrupt-safe `Option` decode (bad magic,
    * zero dims, truncated frame data → None), the Wav/Bmp
    * discipline; every frame is a [[BmpImage]]-shaped plane, so the
    * whole image toolchain (dHash, resize, features) applies
    * per frame.
    */
  object RawVideo {
    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
    }
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def rd32(b: Array[Byte], off: Int): Int =
      rd16(b, off) | (rd16(b, off + 2) << 16)

    def encode(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(width > 0 && height > 0 && frames.nonEmpty, "need positive dims + frames")
      val fl = width * height * 3
      require(frames.forall(_.length == fl), "every frame must be w*h*3 BGR")
      val out = new Array[Byte](12 + fl * frames.length)
      out(0) = 'R'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
      le16(out, 4, width); le16(out, 6, height)
      le32(out, 8, frames.length)
      frames.zipWithIndex.foreach { case (f, i) =>
        System.arraycopy(f, 0, out, 12 + i * fl, fl)
      }
      out
    }

    def decode(payload: Array[Byte]): Option[RawVideoClip] = {
      if (payload == null || payload.length < 12) return None
      if (payload(0) != 'R' || payload(1) != 'V' ||
        payload(2) != 'I' || payload(3) != 'D') return None
      val w = rd16(payload, 4); val h = rd16(payload, 6)
      val n = rd32(payload, 8)
      if (w <= 0 || h <= 0 || n <= 0) return None
      // frame length in Long first: header-claimed dims up to
      // 65535x65535 overflow w*h*3 in Int, which would defeat the
      // truncation check and crash instead of the contracted None
      val flL = w.toLong * h * 3
      if (flL > Int.MaxValue || 12L + flL * n > payload.length) return None
      val fl = flL.toInt
      Some(RawVideoClip(w, h, IndexedSeq.tabulate(n) { i =>
        val f = new Array[Byte](fl)
        System.arraycopy(payload, 12 + i * fl, f, 0, fl)
        f
      }))
    }
  }

  /** Per-sampled-frame perceptual fingerprint row. */
  final case class FrameHashRow(
      media_id: Long, n_frames: Long, frame_idx: Long, fp: Long)

  /** SHOT-BOUNDARY detection over per-frame fingerprint rows
    * ([[FrameHashRow]] shape): frame 0 and every frame whose dHash
    * moves more than `maxDistance` bits from its predecessor's start
    * a new shot — the standard content-change segmentation a video
    * training pipeline runs before per-shot sampling/captioning. ONE
    * lag window per clip over the relational index (video bytes were
    * touched once, at fingerprint time); codegen'd `bit_count` on
    * the XOR, no decode, no self-join. Emits every frame row with
    * `is_boundary` plus the running `shot_idx` so per-shot grouping
    * is a plain groupBy downstream.
    */
  def shotBoundaries(frameHashes: DataFrame, maxDistance: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_id")).orderBy(col("frame_idx"))
    frameHashes
      .withColumn("__prev", lag(col("fp"), 1).over(w))
      .withColumn("is_boundary", col("__prev").isNull ||
        bit_count(col("fp").bitwiseXOR(col("__prev"))) > maxDistance)
      .withColumn("shot_idx",
        sum(col("is_boundary").cast("long")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)) - 1)
      .drop("__prev")
  }

  /** Mime-dispatched video decode: `video/mpeg` → the real MPEG-1
    * I-frame decoder ([[Mpeg1Video]]), anything else → the
    * uncompressed [[RawVideo]] container. Both corrupt-safe.
    */
  def decodeVideo(payload: Array[Byte], mime: String): Option[RawVideoClip] =
    if (mime == "video/mpeg") Mpeg1Video.decode(payload)
    else RawVideo.decode(payload)

  /** FRAME SAMPLING over a video media table (compressed MPEG-1 or
    * the raw container, per row mime): decode once, keep every
    * `stride`-th frame (index 0 included), fingerprint each
    * kept frame with [[Bmp.dhash60]] — the video leg of the
    * multimodal matrix, riding the image toolchain per frame. Corrupt
    * payloads dropped (DLQ callers split first). Only this decode
    * pass ever touches video bytes; everything downstream (keyframe
    * near-dup, per-frame retrieval) is relational.
    */
  def videoFrameHashes(spark: SparkSession, media: DataFrame,
      stride: Int, partitions: Int): Dataset[FrameHashRow] = {
    require(stride >= 1, "stride must be >= 1")
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        decodeVideo(r.payload, r.mime).toSeq.flatMap { clip =>
          clip.frames.indices.by(stride).map { i =>
            FrameHashRow(r.media_id, clip.frames.length.toLong, i.toLong,
              Bmp.dhash60(BmpImage(clip.width, clip.height, clip.frames(i))))
          }
        }
      })
  }

  /** One A/V asset's joint fingerprint rows: per sampled video frame,
    * with the clip-level audio fingerprint and decoded sample count
    * carried on every row (denormalized so ONE demux+decode pass
    * yields both modalities).
    */
  final case class AvFrameRow(media_id: Long, n_frames: Long,
      frame_idx: Long, fp: Long, audio_fp: Long, n_samples: Long)

  /** MUXED-ASSET fingerprinting: each payload is an ISO 11172-1
    * program stream ([[Mpeg1System]]); demux once, decode the video
    * elementary stream ([[Mpeg1Video]]) and the audio elementary
    * stream ([[decodeAudio]] — the 0xFFE sync dispatches to the
    * Layer I decoder), and emit per-frame dHash rows carrying the
    * clip's audio energy fingerprint. Corrupt containers, or
    * containers whose INNER streams fail their codecs, drop (DLQ
    * callers split first). This is the multimodal matrix closing
    * over a real interleaved container: both modalities of one asset
    * from one payload, one decode pass.
    */
  def avFrameHashes(spark: SparkSession, media: DataFrame,
      stride: Int, partitions: Int): Dataset[AvFrameRow] = {
    require(stride >= 1, "stride must be >= 1")
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        Mpeg1System.demuxAv(r.payload).toSeq.flatMap { case (ves, aes) =>
          (Mpeg1Video.decode(ves), decodeAudio(aes)) match {
            case (Some(clip), Some(pcm)) =>
              val afp = Wav.energyHash60(pcm.samples)
              clip.frames.indices.by(stride).map { i =>
                AvFrameRow(r.media_id, clip.frames.length.toLong, i.toLong,
                  Bmp.dhash60(BmpImage(clip.width, clip.height, clip.frames(i))),
                  afp, pcm.samples.length.toLong)
              }
            case _ => Seq.empty
          }
        }
      })
  }

  /** SEQUENCE-grain video near-dup pairs over a stride-1
    * [[videoFrameHashes]] table — the standard step past
    * keyframe-grain matching (which misses a clip offset by a single
    * frame whenever content moves fast enough that adjacent frames
    * hash far apart): candidate clip pairs come from ANY shared
    * frame-level Hamming band (the exact pigeonhole banding applied
    * at frame grain via a `media·2²⁰ + frame` composite key — never
    * clips², and the hot-bucket grid guard rides along for
    * degenerate frames), each candidate carries the OFFSET its
    * matching frames imply (`o = k_b − k_a`), and a pair is a
    * sequence near-dup when some offset aligns a MAJORITY of the
    * shorter clip's frames within `maxDistance`
    * (`2·votes ≥ min(len_a, len_b) + 1`). A one-frame-offset
    * duplicate scores `n−1` aligned exact matches at `o = 1` and
    * passes; an accidental single-frame collision scores 1 and
    * fails — the vote is what separates sequence identity from
    * frame coincidence. Clips are assumed under 2²⁰ sampled frames
    * (a 12-day clip at 1 fps) — the composite-key headroom.
    *
    * 100 TB posture: one banded frame join for candidates, one
    * keyed equi-join per candidate offset for the vote, one
    * aggregation — no clip-pair surface is ever materialized beyond
    * band-verified candidates.
    */
  def videoSequenceNearDupPairs(
      fh: DataFrame, // (media_id, n_frames, frame_idx, fp), stride 1
      maxDistance: Int = 2): DataFrame =
    sequenceNearDupPairs(fh, maxDistance)

  /** The fingerprint-agnostic core of [[videoSequenceNearDupPairs]]:
    * any ordered-fingerprint table in [[FrameHashRow]] shape rides
    * the same banded-candidates → aligned-offset majority vote —
    * video frames and audio windows ([[wavWindowHashes]]) share it,
    * the [[graft.ext.Dedup.hammingNearDupPairs]] factoring pattern
    * at sequence grain.
    */
  def sequenceNearDupPairs(
      fh: DataFrame, // (media_id, n_frames, frame_idx, fp)
      maxDistance: Int = 2): DataFrame = {
    val M = 1L << 20
    val frames = fh.select(col("media_id"), col("frame_idx").as("k"), col("fp"))
    val fpairs = graft.ext.Dedup.hammingNearDupPairs(
      frames.select((col("media_id") * M + col("k")).as("fid"), col("fp")),
      "fid", "fp", bits = 60, maxDistance = maxDistance)
    val cand = fpairs
      .select(shiftright(col("id_a"), 20).as("ma"),
        col("id_a").bitwiseAND(M - 1).as("ka"),
        shiftright(col("id_b"), 20).as("mb"),
        col("id_b").bitwiseAND(M - 1).as("kb"))
      .filter(col("ma") < col("mb")) // same-clip frame pairs are not candidates
      .select(col("ma"), col("mb"), (col("kb") - col("ka")).as("o"))
      .distinct()
    val votes = cand
      .join(frames.select(col("media_id").as("ma"), col("k").as("ka2"),
        col("fp").as("fp_a")), Seq("ma"))
      .withColumn("kb_want", col("ka2") + col("o"))
      .join(frames.select(col("media_id").as("mb"), col("k").as("kb_want"),
        col("fp").as("fp_b")), Seq("mb", "kb_want"))
      .groupBy(col("ma"), col("mb"), col("o"))
      .agg(sum(when(graft.ext.Dedup.hammingDistance(col("fp_a"), col("fp_b"))
        <= maxDistance, 1L).otherwise(0L)).as("votes"))
    val lens = fh.groupBy(col("media_id")).agg(count(lit(1)).as("len"))
    votes.groupBy(col("ma"), col("mb")).agg(max(col("votes")).as("max_votes"))
      .join(lens.select(col("media_id").as("ma"), col("len").as("len_a")),
        Seq("ma"))
      .join(lens.select(col("media_id").as("mb"), col("len").as("len_b")),
        Seq("mb"))
      .filter(col("max_votes") * 2 >= least(col("len_a"), col("len_b")) + 1)
      .select(col("ma").as("id_a"), col("mb").as("id_b"),
        col("max_votes").as("votes"))
  }

  /** WINDOW-grain acoustic fingerprints: each clip's samples split
    * into fixed-length windows (trailing partial window dropped),
    * each window hashed with [[Wav.energyHash60]] — rows in
    * [[FrameHashRow]] shape (`frame_idx` = window ordinal), so the
    * audio sequence rides [[sequenceNearDupPairs]]'s banded vote
    * unchanged: the Shazam-style offset-matching shape (a clip
    * embedded in another at a window offset) without a parallel
    * implementation. Corrupt payloads dropped; one decode pass per
    * clip.
    */
  def wavWindowHashes(spark: SparkSession, media: DataFrame,
      windowSamples: Int, partitions: Int): Dataset[FrameHashRow] = {
    require(windowSamples >= 1, "windowSamples must be >= 1")
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        Wav.decode(r.payload).toSeq.flatMap { pcm =>
          val nw = pcm.samples.length / windowSamples
          (0 until nw).map { i =>
            FrameHashRow(r.media_id, nw.toLong, i.toLong,
              Wav.energyHash60(java.util.Arrays.copyOfRange(
                pcm.samples, i * windowSamples, (i + 1) * windowSamples)))
          }
        }
      })
  }

  /** Per-clip acoustic fingerprint row. */
  final case class AudioHashRow(media_id: Long, n_samples: Long, fp: Long)

  /** Real WAV decode → [[Wav.energyHash60]] fingerprint per clip;
    * corrupt payloads dropped (DLQ callers split first). Downstream
    * near-dup joins run on the banded Hamming machinery — only this
    * pass touches audio bytes.
    */
  def wavEnergyHashes(spark: SparkSession, media: DataFrame,
      partitions: Int): Dataset[AudioHashRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap(r => Wav.decode(r.payload).map(w =>
        AudioHashRow(r.media_id, w.samples.length.toLong,
          Wav.energyHash60(w.samples)))))
  }

  /** Magic-byte audio dispatch — the audio mirror of [[decodeImage]]:
    * RIFF/WAVE → [[Wav.decode]], fLaC → [[Flac.decode]], MPEG sync
    * (0xFFE) → [[Mpeg1.decode]] (the lossy Layer I tier). All return
    * the same [[WavPcm]] shape, so every downstream fingerprint and
    * feature op is format-blind.
    */
  def decodeAudio(payload: Array[Byte]): Option[WavPcm] =
    if (payload == null || payload.length < 4) None
    else if (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F')
      Wav.decode(payload)
    else if (payload(0) == 'f' && payload(1) == 'L' && payload(2) == 'a' && payload(3) == 'C')
      Flac.decode(payload)
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xe0) == 0xe0)
      Mpeg1.decode(payload)
    else None

  /** [[wavEnergyHashes]] generalized over [[decodeAudio]]: one decode
    * pass → relational fingerprint rows for a mixed WAV/FLAC corpus;
    * corrupt payloads dropped (DLQ callers split first).
    */
  def audioEnergyHashes(spark: SparkSession, media: DataFrame,
      partitions: Int): Dataset[AudioHashRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap(r => decodeAudio(r.payload).map(w =>
        AudioHashRow(r.media_id, w.samples.length.toLong,
          Wav.energyHash60(w.samples)))))
  }

  // ------------------------------------------------------- BMP (real)

  /** Decoded 24-bit image: dims + top-down row-major BGR bytes. */
  final case class BmpImage(width: Int, height: Int, bgr: Array[Byte])

  /** Integer-exact image features: dims, per-channel sums, and the
    * nearest-neighbor half-scale dims + gray sum (b+g+r over kept
    * pixels) — all reproducible in SQL from the source pixel recipe.
    */
  final case class BmpFeatures(
      media_id: Long, width: Int, height: Int,
      sum_b: Long, sum_g: Long, sum_r: Long,
      half_w: Int, half_h: Int, half_sum: Long)

  /** REAL BMP (BITMAPINFOHEADER, 24bpp) writer + reader. The file
    * stores rows BOTTOM-UP with each row padded to a 4-byte boundary
    * — both quirks are honored (and the tests sweep widths whose row
    * padding is 0..3 bytes, so a reader that ignores padding fails).
    */
  object Bmp {
    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      le16(b, off, v & 0xffff); le16(b, off + 2, (v >>> 16) & 0xffff)
    }
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def rd32(b: Array[Byte], off: Int): Int =
      rd16(b, off) | (rd16(b, off + 2) << 16)

    private def rowBytes(width: Int): Int = (width * 3 + 3) & ~3

    /** Top-down row-major BGR pixels → BMP bytes (bottom-up, padded). */
    def encode24(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
      require(width > 0 && height > 0, "dims must be positive")
      require(bgr.length == width * height * 3, "pixel buffer must be w*h*3 BGR")
      val stride = rowBytes(width)
      val dataLen = stride * height
      val out = new Array[Byte](54 + dataLen)
      out(0) = 'B'; out(1) = 'M'
      le32(out, 2, 54 + dataLen)                 // file size
      le32(out, 10, 54)                          // pixel data offset
      le32(out, 14, 40)                          // BITMAPINFOHEADER size
      le32(out, 18, width)
      le32(out, 22, height)                      // positive = bottom-up
      le16(out, 26, 1)                           // planes
      le16(out, 28, 24)                          // bpp
      le32(out, 34, dataLen)
      var y = 0
      while (y < height) {
        val srcOff = y * width * 3
        val dstOff = 54 + (height - 1 - y) * stride
        System.arraycopy(bgr, srcOff, out, dstOff, width * 3)
        y += 1
      }
      out
    }

    /** `None` on malformed payloads (bad magic, wrong bpp/planes,
      * compressed, out-of-range offset, truncated pixel data).
      * Returns TOP-DOWN row-major BGR regardless of file row order.
      */
    def decode24(payload: Array[Byte]): Option[BmpImage] = {
      if (payload == null || payload.length < 54) return None
      if (payload(0) != 'B' || payload(1) != 'M') return None
      val off = rd32(payload, 10)
      val hdrSize = rd32(payload, 14)
      val width = rd32(payload, 18)
      val height = rd32(payload, 22)             // only bottom-up supported
      val planes = rd16(payload, 26)
      val bpp = rd16(payload, 28)
      val compression = rd32(payload, 30)
      if (hdrSize < 40 || width <= 0 || height <= 0 || planes != 1 ||
          bpp != 24 || compression != 0) return None
      val stride = rowBytes(width)
      if (off < 54 || off.toLong + stride.toLong * height > payload.length) return None
      val bgr = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        System.arraycopy(payload, off + (height - 1 - y) * stride, bgr, y * width * 3, width * 3)
        y += 1
      }
      Some(BmpImage(width, height, bgr))
    }

    /** REAL nearest-neighbor downscale: output pixel (y, x) samples
      * source pixel (y·factor, x·factor); output dims are
      * ceil(dim / factor) (every source pixel on the sampling grid
      * survives, including the last partial block's anchor).
      */
    def resizeNearest(img: BmpImage, factor: Int): BmpImage = {
      require(factor >= 1, "factor must be >= 1")
      val w = (img.width + factor - 1) / factor
      val h = (img.height + factor - 1) / factor
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val src = (y * factor * img.width + x * factor) * 3
          val dst = (y * w + x) * 3
          out(dst) = img.bgr(src); out(dst + 1) = img.bgr(src + 1); out(dst + 2) = img.bgr(src + 2)
          x += 1
        }
        y += 1
      }
      BmpImage(w, h, out)
    }

    /** REAL bilinear resample to arbitrary target dims — pure integer
      * 16.16 fixed point (weights and accumulation in Long), so the
      * result is bit-reproducible across executors and platforms:
      * the determinism contract every oracle-checked fixture leans
      * on, with no float rounding in sight. Source coordinates use
      * the align-centers convention (`sx = (ox+½)·w/outW − ½`,
      * clamped at the borders) — the standard image-pipeline
      * definition, so a thumbnail produced here matches what a
      * training-data preprocessor would produce modulo codec.
      */
    def resizeBilinear(img: BmpImage, outW: Int, outH: Int): BmpImage = {
      require(outW >= 1 && outH >= 1, "output dims must be >= 1")
      val w = img.width; val h = img.height
      val out = new Array[Byte](outW * outH * 3)
      // 16.16 source coordinate for each output index, align-centers
      def coord(o: Int, srcDim: Int, outDim: Int): Long =
        ((2L * o + 1) * srcDim << 15) / outDim - (1L << 15)
      var oy = 0
      while (oy < outH) {
        val syF = coord(oy, h, outH)
        val sy0 = math.max(0L, math.min((h - 1).toLong, syF >> 16)).toInt
        val sy1 = math.min(h - 1, sy0 + 1)
        val fy = if (syF < 0) 0L else syF & 0xffffL
        var ox = 0
        while (ox < outW) {
          val sxF = coord(ox, w, outW)
          val sx0 = math.max(0L, math.min((w - 1).toLong, sxF >> 16)).toInt
          val sx1 = math.min(w - 1, sx0 + 1)
          val fx = if (sxF < 0) 0L else sxF & 0xffffL
          val o00 = (sy0 * w + sx0) * 3; val o10 = (sy0 * w + sx1) * 3
          val o01 = (sy1 * w + sx0) * 3; val o11 = (sy1 * w + sx1) * 3
          val dst = (oy * outW + ox) * 3
          var c = 0
          while (c < 3) {
            val v = (img.bgr(o00 + c) & 0xff) * (65536L - fx) * (65536L - fy) +
              (img.bgr(o10 + c) & 0xff) * fx * (65536L - fy) +
              (img.bgr(o01 + c) & 0xff) * (65536L - fx) * fy +
              (img.bgr(o11 + c) & 0xff) * fx * fy
            out(dst + c) = ((v + (1L << 31)) >>> 32).toByte
            c += 1
          }
          ox += 1
        }
        oy += 1
      }
      BmpImage(outW, outH, out)
    }

    /** Features of a decoded image + its half-scale resize. */
    def features(id: Long, img: BmpImage): BmpFeatures = {
      var sb = 0L; var sg = 0L; var sr = 0L
      var i = 0
      while (i < img.bgr.length) {
        sb += img.bgr(i) & 0xff; sg += img.bgr(i + 1) & 0xff; sr += img.bgr(i + 2) & 0xff
        i += 3
      }
      val half = resizeNearest(img, 2)
      var hs = 0L
      i = 0
      while (i < half.bgr.length) { hs += half.bgr(i) & 0xff; i += 1 }
      BmpFeatures(id, img.width, img.height, sb, sg, sr, half.width, half.height, hs)
    }

    /** 60-bit difference hash (dHash — Krawetz's gradient perceptual
      * hash, public blog literature; the standard cheap near-dup key
      * for re-encoded/re-compressed images) over an 11×6
      * nearest-neighbor sample grid: integer luma
      * `gray = (299·r + 587·g + 114·b) / 1000` at each sampled pixel,
      * bit `gy·10 + gx` set when `gray(gy,gx) < gray(gy,gx+1)` —
      * 10 horizontal comparisons × 6 rows = 60 bits, deliberately the
      * same width as [[graft.ext.Dedup.simhash]] so the fingerprint
      * shares the pigeonhole band-blocking geometry (4 × 15-bit
      * chunks at Hamming distance ≤ 3) and stays non-negative in a
      * Long. Gradient bits are invariant to global brightness shifts
      * and robust to low-amplitude noise — the properties that make
      * dHash a near-dup key rather than an exact-content hash.
      * Sampling truncates (`sx = gx·w / 11`), so images narrower than
      * the grid just re-sample pixels; any positive dims are legal.
      */
    def dhash60(img: BmpImage): Long = {
      val gw = 11; val gh = 6
      val gray = new Array[Int](gw)
      var fp = 0L
      var gy = 0
      while (gy < gh) {
        val sy = gy * img.height / gh
        var gx = 0
        while (gx < gw) {
          val sx = gx * img.width / gw
          val o = (sy * img.width + sx) * 3
          val b = img.bgr(o) & 0xff
          val g = img.bgr(o + 1) & 0xff
          val r = img.bgr(o + 2) & 0xff
          gray(gx) = (299 * r + 587 * g + 114 * b) / 1000
          gx += 1
        }
        gx = 0
        while (gx < gw - 1) {
          if (gray(gx) < gray(gx + 1)) fp |= 1L << (gy * 10 + gx)
          gx += 1
        }
        gy += 1
      }
      fp
    }
  }

  /** Per-image perceptual fingerprint row. */
  final case class DHashRow(media_id: Long, width: Int, height: Int, fp: Long)

  /** Real BMP decode → [[Bmp.dhash60]] perceptual fingerprint per
    * image; corrupt payloads dropped (DLQ callers split first, the
    * O-07 pattern). The output is relational (id, dims, 60-bit fp) —
    * downstream near-dup joins run on
    * [[graft.ext.Dedup.hammingNearDupPairs]]'s banded blocking, never
    * on payload bytes, so only this decode pass ever touches the
    * binary column.
    */
  def bmpDHashes(spark: SparkSession, media: DataFrame, partitions: Int): Dataset[DHashRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap(r => Bmp.decode24(r.payload).map(img =>
        DHashRow(r.media_id, img.width, img.height, Bmp.dhash60(img)))))
  }

  /** Format-dispatching image decode: BMP by the `BM` magic, baseline
    * JPEG by the `FFD8` SOI marker; anything else (or a corrupt
    * payload of either format) → None. The single entry point a
    * mixed-format corpus needs — both formats land in the same
    * [[BmpImage]] plane, so every downstream feature is
    * format-agnostic.
    */
  def decodeImage(payload: Array[Byte]): Option[BmpImage] =
    if (payload == null || payload.length < 2) None
    else if (payload(0) == 'B' && payload(1) == 'M') Bmp.decode24(payload)
    else if ((payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8)
      Jpeg.decode(payload)
    else if ((payload(0) & 0xff) == 0x89 && payload(1) == 'P')
      Png.decode(payload)
    else None

  /** [[bmpDHashes]] generalized over [[decodeImage]]: one decode pass
    * → relational (id, dims, 60-bit dHash) rows for a mixed BMP/JPEG
    * corpus; corrupt payloads dropped (DLQ callers split first).
    */
  def imageDHashes(spark: SparkSession, media: DataFrame, partitions: Int): Dataset[DHashRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap(r => decodeImage(r.payload).map(img =>
        DHashRow(r.media_id, img.width, img.height, Bmp.dhash60(img)))))
  }

  /** The training-data preprocessor shape: decode once →
    * [[Bmp.resizeBilinear]] to a fixed thumbnail geometry →
    * fingerprint the THUMBNAIL. One pass over payload bytes, the
    * heavy decode+resample work embarrassingly parallel per
    * partition, and the emitted rows are a fixed few dozen bytes
    * regardless of source resolution — the property that lets a
    * 100 TB mixed-resolution crawl fingerprint into a uniform dedup
    * space. Corrupt payloads dropped (DLQ callers split first).
    */
  def thumbnailDHashes(spark: SparkSession, media: DataFrame,
      outW: Int, outH: Int, partitions: Int): Dataset[DHashRow] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap { r =>
        decodeImage(r.payload).map { img =>
          val thumb = Bmp.resizeBilinear(img, outW, outH)
          DHashRow(r.media_id, thumb.width, thumb.height, Bmp.dhash60(thumb))
        }
      })
  }

  /** Real decode over a WAV media table: parse + feature-extract per
    * partition (the same imperative tier as [[decodeFeatures]], but
    * with an actual parser). Corrupt payloads are DROPPED here —
    * callers wanting a DLQ split filter on `Wav.decode(...).isEmpty`
    * first (the O-07 pattern).
    */
  def wavFeatures(spark: SparkSession, media: DataFrame, partitions: Int): Dataset[WavFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap(r => Wav.decode(r.payload).map(Wav.features(r.media_id, _))))
  }

  /** Real decode over a BMP media table; corrupt payloads dropped. */
  def bmpFeatures(spark: SparkSession, media: DataFrame, partitions: Int): Dataset[BmpFeatures] = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions(_.flatMap(r => Bmp.decode24(r.payload).map(Bmp.features(r.media_id, _))))
  }

  /** Decode/feature-extract over partitions. `mapPartitions` is the
    * deliberate choice here (SURVEY.md §7.3 preference (d) applies to
    * relational ops — media decode is genuine per-partition imperative
    * work): each partition amortizes decoder init, the iterator shape
    * matches batch-oriented codecs, and `repartition(media_id)` upstream
    * spreads decode cost evenly across executors.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame, partitions: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // decoder init would happen once per partition here
        it.map { r =>
          MediaFeatures(r.media_id, r.mime, r.payload.length, ByteHistogram.decode(r.payload))
        }
      }
  }
}
