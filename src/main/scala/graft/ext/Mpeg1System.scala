package graft.ext

/** MPEG-1 Systems layer (ISO/IEC 11172-1) — from-scratch mux/demux of
  * elementary streams into the pack/packet program-stream container,
  * pure JVM byte parsing. Closes the loop on the media stack: the
  * [[Mpeg1Video]] (11172-2) and [[Mpeg1]] audio (11172-3) codecs now
  * ride ONE real interleaved wire, the `.mpg` shape a crawl actually
  * yields, so a multimodal pipeline can fingerprint both modalities
  * of one asset from one payload.
  *
  * Wire (cited to 11172-1 §2.4.3): pack_start_code `000001BA` +
  * '0010' + 33-bit SCR split 3/15/15 with marker bits + 22-bit
  * mux_rate; one system_header (`000001BB`, §2.4.3.2) in the first
  * pack carrying rate/audio/video bounds and per-stream STD buffer
  * bounds; packets (`000001` + stream_id ≥ 0xBC) with 16-bit length,
  * optional 0xFF stuffing, optional '01'-prefixed STD buffer field,
  * and '0010' PTS / '0011' PTS+DTS / 0x0F no-timestamp headers;
  * program_end_code `000001B9`. The demuxer parses STRUCTURALLY
  * (lengths, not start-code scans — payloads are free to contain
  * `000001`), reassembles elementary streams per stream id, verifies
  * every marker bit it reads, and returns the contracted None on any
  * malformed, truncated, or decode-bomb payload.
  *
  * The encoder interleaves round-robin at `packetPayload` granularity
  * (video first), stamps a PTS on each stream's first packet and
  * 0x0F elsewhere, emits the STD buffer field once per stream, and
  * varies stuffing deterministically so the decode paths stay
  * encoder-reachable. The reference pipeline (kavyarana/
  * cryptocurrency-data-pipeline) has no media surface at all — this
  * is north-star scope for the 100 TB training-data engine.
  */
object Mpeg1System {

  /** Default video / audio stream ids (first of each class). */
  val VideoStreamId = 0xe0
  val AudioStreamId = 0xc0

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ---------------------------------------------------------- mux

  /** Mux elementary streams into an 11172-1 program stream. Streams
    * are cut into `packetPayload`-byte packets and interleaved
    * round-robin in the given order until every stream drains; each
    * packet rides its own pack header (legal and simplest), the first
    * pack also carries the system header.
    */
  def mux(streams: Seq[(Int, Array[Byte])],
      packetPayload: Int = 2048): Array[Byte] = {
    require(streams.nonEmpty, "at least one elementary stream")
    require(streams.forall { case (id, es) =>
      id >= 0xbc && id <= 0xff && es != null && es.nonEmpty
    }, "stream ids must be 0xBC-0xFF with non-empty payloads")
    require(packetPayload >= 64 && packetPayload <= 0xf000,
      "packet payload must fit the 16-bit packet_length")
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def code(id: Int): Unit = { b(0); b(0); b(1); b(id) }

    def packHeader(scr: Long): Unit = {
      code(0xba)
      // '0010' + SCR[32:30] + m | SCR[29:22] | SCR[21:15] + m + SCR[14:8]
      // ... assembled bitwise below (64 bits after the code)
      var bits = 0L
      bits |= 0x2L << 60 // '0010'
      bits |= ((scr >> 30) & 0x7L) << 57
      bits |= 1L << 56 // marker
      bits |= ((scr >> 15) & 0x7fffL) << 41
      bits |= 1L << 40 // marker
      bits |= (scr & 0x7fffL) << 25
      bits |= 1L << 24 // marker
      bits |= 1L << 23 // marker before mux_rate
      bits |= (0x6270L & 0x3fffffL) << 1 // mux_rate (nominal)
      bits |= 1L // trailing marker
      var i = 7
      while (i >= 0) { b(((bits >> (8 * i)) & 0xff).toInt); i -= 1 }
    }

    def systemHeader(ids: Seq[Int]): Unit = {
      code(0xbb)
      val len = 6 + 3 * ids.length
      b(len >> 8); b(len)
      // marker | rate_bound(22) | marker
      val rate = 0x6270
      b(0x80 | ((rate >> 15) & 0x7f))
      b((rate >> 7) & 0xff)
      b(((rate & 0x7f) << 1) | 1)
      // audio_bound(6) fixed(1) CSPS(1)
      val audioBound = ids.count(i => i >= 0xc0 && i <= 0xdf)
      b((audioBound << 2) | 0)
      // locks(2) marker(1) video_bound(5)
      val videoBound = ids.count(i => i >= 0xe0 && i <= 0xef)
      b(0x20 | videoBound)
      b(0xff) // reserved_byte
      ids.foreach { id =>
        b(id)
        // '11' + STD_buffer_bound_scale + size_bound(13)
        val scale = if (id >= 0xe0) 1 else 0
        val size = if (id >= 0xe0) 46 else 32 // × (1024|128) bytes
        b(0xc0 | (scale << 5) | ((size >> 8) & 0x1f))
        b(size & 0xff)
      }
    }

    def packet(id: Int, payload: Array[Byte], off: Int, n: Int,
        first: Boolean, stuffing: Int, pts: Long): Unit = {
      code(id)
      val stdBytes = if (first) 2 else 0
      val tsBytes = if (first) 5 else 1
      val len = stuffing + stdBytes + tsBytes + n
      b(len >> 8); b(len)
      var s = 0
      while (s < stuffing) { b(0xff); s += 1 }
      if (first) {
        // '01' + STD_buffer_scale(1) + STD_buffer_size(13)
        val scale = if (id >= 0xe0) 1 else 0
        val size = if (id >= 0xe0) 46 else 32
        b(0x40 | (scale << 5) | ((size >> 8) & 0x1f))
        b(size & 0xff)
        // '0010' + PTS 3/15/15 with markers
        b(0x21 | (((pts >> 30) & 0x7L) << 1).toInt)
        b(((pts >> 22) & 0xff).toInt)
        b(((((pts >> 15) & 0x7fL) << 1) | 1).toInt)
        b(((pts >> 7) & 0xff).toInt)
        b(((((pts & 0x7fL) << 1) | 1)).toInt)
      } else b(0x0f) // no timestamp
      out.write(payload, off, n)
    }

    val offs = Array.fill(streams.length)(0)
    val emitted = Array.fill(streams.length)(false)
    var scr = 0L
    var pkt = 0L // packet ordinal — drives the stuffing variation
    var live = true
    var firstPack = true
    while (live) {
      live = false
      var si = 0
      while (si < streams.length) {
        val (id, es) = streams(si)
        if (offs(si) < es.length) {
          val n = math.min(packetPayload, es.length - offs(si))
          packHeader(scr)
          if (firstPack) { systemHeader(streams.map(_._1)); firstPack = false }
          // stuffing cycles 0/1/2 by packet ORDINAL (scr steps are a
          // multiple of 3, so keying on scr would always yield 0 and
          // leave the demuxer's stuffing-skip branch encoder-unreachable)
          packet(id, es, offs(si), n, first = !emitted(si),
            stuffing = (pkt % 3L).toInt, pts = 3600L + scr)
          emitted(si) = true
          offs(si) += n
          scr += 1200L
          pkt += 1L
          live = live || offs(si) < es.length
        }
        si += 1
      }
    }
    code(0xb9) // program_end_code
    out.toByteArray
  }

  /** Convenience: one video + one audio elementary stream. */
  def muxAv(video: Array[Byte], audio: Array[Byte],
      packetPayload: Int = 2048): Array[Byte] =
    mux(Seq(VideoStreamId -> video, AudioStreamId -> audio), packetPayload)

  // -------------------------------------------------------- demux

  /** Demux a program stream back into elementary streams keyed by
    * stream id. Malformed/truncated/bomb payloads → None.
    * `maxOutBytes` caps the total reassembled bytes.
    */
  def demux(data: Array[Byte], maxOutBytes: Long = 1L << 26)
      : Option[Map[Int, Array[Byte]]] =
    if (data == null || data.length < 12) None
    else
      try Some(demuxChecked(data, maxOutBytes))
      catch {
        case _: Malformed | _: ArrayIndexOutOfBoundsException => None
      }

  /** Convenience: (video, audio) from the first stream of each class. */
  def demuxAv(data: Array[Byte], maxOutBytes: Long = 1L << 26)
      : Option[(Array[Byte], Array[Byte])] =
    demux(data, maxOutBytes).flatMap { m =>
      for {
        v <- m.collectFirst { case (id, es) if id >= 0xe0 && id <= 0xef => es }
        a <- m.collectFirst { case (id, es) if id >= 0xc0 && id <= 0xdf => es }
      } yield (v, a)
    }

  private def demuxChecked(data: Array[Byte],
      maxOutBytes: Long): Map[Int, Array[Byte]] = {
    val out = scala.collection.mutable.LinkedHashMap
      .empty[Int, java.io.ByteArrayOutputStream]
    var outBytes = 0L
    var pos = 0
    def u8(i: Int): Int = {
      if (i >= data.length) fail()
      data(i) & 0xff
    }
    var ended = false
    while (!ended) {
      if (pos + 4 > data.length) fail() // truncated before end code
      if (u8(pos) != 0 || u8(pos + 1) != 0 || u8(pos + 2) != 1) fail()
      val id = u8(pos + 3)
      pos += 4
      id match {
        case 0xba => // pack header: 8 bytes, verify structure
          if (pos + 8 > data.length) fail()
          if ((u8(pos) >> 4) != 0x2) fail() // '0010'
          if ((u8(pos) & 1) != 1) fail() // marker after SCR[32:30]
          if ((u8(pos + 2) & 1) != 1) fail() // marker after SCR[29:15]
          if ((u8(pos + 4) & 1) != 1) fail() // marker after SCR[14:0]
          if ((u8(pos + 5) & 0x80) != 0x80) fail() // marker before rate
          if ((u8(pos + 7) & 1) != 1) fail() // marker after mux_rate
          pos += 8
        case 0xbb => // system header: skip by length
          val len = (u8(pos) << 8) | u8(pos + 1)
          pos += 2 + len
          if (pos > data.length) fail()
        case 0xb9 => // program end
          ended = true
        case sid if sid >= 0xbc && sid <= 0xff =>
          val len = (u8(pos) << 8) | u8(pos + 1)
          pos += 2
          val end = pos + len
          if (end > data.length) fail()
          if (sid != 0xbe && sid != 0xbf) { // skip padding/private2 whole
            // packet header: stuffing, optional STD, timestamps
            while (pos < end && u8(pos) == 0xff) pos += 1
            if (pos >= end) fail()
            if ((u8(pos) >> 6) == 0x1) pos += 2 // '01' STD buffer field
            if (pos >= end) fail()
            (u8(pos) >> 4) match {
              case 0x2 => // PTS
                if ((u8(pos) & 1) != 1 || (u8(pos + 2) & 1) != 1 ||
                    (u8(pos + 4) & 1) != 1) fail()
                pos += 5
              case 0x3 => // PTS + DTS
                if ((u8(pos) & 1) != 1 || (u8(pos + 2) & 1) != 1 ||
                    (u8(pos + 4) & 1) != 1) fail()
                if ((u8(pos + 5) >> 4) != 0x1) fail()
                if ((u8(pos + 5) & 1) != 1 || (u8(pos + 7) & 1) != 1 ||
                    (u8(pos + 9) & 1) != 1) fail()
                pos += 10
              case 0x0 =>
                if (u8(pos) != 0x0f) fail()
                pos += 1
              case _ => fail()
            }
            if (pos > end) fail()
            val n = end - pos
            outBytes += n
            if (outBytes > maxOutBytes) fail()
            out.getOrElseUpdate(sid, new java.io.ByteArrayOutputStream())
              .write(data, pos, n)
          }
          pos = end
        case _ => fail()
      }
    }
    if (out.isEmpty) fail()
    out.map { case (k, v) => k -> v.toByteArray }.toMap
  }
}
