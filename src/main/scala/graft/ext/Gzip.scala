package graft.ext

/** gzip (RFC 1952) on top of the from-scratch DEFLATE engine in
  * [[Png]] — the compressed-TEXT source tier: large-scale training
  * corpora land as `.gz` (WET/WARC files are per-record gzip
  * members), so an engine that owns its inflate can read them with
  * no codec dependency. Supports MULTI-MEMBER streams (concatenated
  * members — the WARC shape), optional header fields (FEXTRA /
  * FNAME / FCOMMENT / FHCRC, each verified or skipped per spec), and
  * verifies every member's CRC-32 and ISIZE. Same corrupt-safe
  * `Option` discipline as the rest of the codec tier.
  *
  * The COMPRESSOR exists for fixtures (selectable DEFLATE block mode
  * via [[Png.DeflateStored]]/[[Png.DeflateFixed]]/
  * [[Png.DeflateDynamic]], optional FNAME/FEXTRA/FHCRC headers,
  * member splitting) — enough surface to exercise every reader path
  * with bytes we control. Deterministic: MTIME is written as 0.
  */
object Gzip {

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** CRC-32 shared with the PNG chunk checksum (same polynomial). */
  private def crc32(data: Array[Byte], off: Int, len: Int): Int =
    Png.crc32Std(data, off, len)

  /** Decompress a (possibly multi-member) gzip stream; total output
    * capped at `maxOut` (zip-bomb guard). `None` for malformed,
    * truncated, checksum-failing, or over-cap payloads.
    */
  def decompress(payload: Array[Byte], maxOut: Int = 1 << 26): Option[Array[Byte]] =
    if (payload == null || payload.length < 18 ||
      (payload(0) & 0xff) != 0x1f || (payload(1) & 0xff) != 0x8b) None
    else
      try Some(decompressChecked(payload, maxOut))
      catch {
        case _: Malformed | _: Png.Malformed |
          _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException => None
      }

  private def decompressChecked(data: Array[Byte], maxOut: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(maxOut, data.length * 3))
    var pos = 0
    def u8(): Int = { if (pos >= data.length) fail(); val b = data(pos) & 0xff; pos += 1; b }
    def u16(): Int = { val lo = u8(); lo | (u8() << 8) }
    def u32(): Long = { val lo = u16().toLong; lo | (u16().toLong << 16) }
    while (pos < data.length) {
      val headerStart = pos
      if (u8() != 0x1f || u8() != 0x8b) fail()
      if (u8() != 8) fail() // CM must be DEFLATE
      val flg = u8()
      if ((flg & 0xe0) != 0) fail() // reserved bits must be zero
      u32() // MTIME
      u8(); u8() // XFL, OS
      if ((flg & 0x04) != 0) { // FEXTRA
        val xlen = u16()
        if (pos + xlen > data.length) fail()
        pos += xlen
      }
      if ((flg & 0x08) != 0) while (u8() != 0) () // FNAME, zero-terminated
      if ((flg & 0x10) != 0) while (u8() != 0) () // FCOMMENT
      if ((flg & 0x02) != 0) { // FHCRC: low 16 bits of header CRC-32
        val stored = u16()
        val expect = crc32(data, headerStart, pos - 2 - headerStart) & 0xffff
        if (stored != expect) fail()
      }
      val remainingCap = maxOut - out.size()
      if (remainingCap < 0) fail()
      val (member, used) = Png.inflate(data, pos, data.length, remainingCap)
      pos += used
      if (u32() != (crc32(member, 0, member.length).toLong & 0xffffffffL)) fail()
      if (u32() != (member.length.toLong & 0xffffffffL)) fail()
      out.write(member, 0, member.length)
    }
    out.toByteArray
  }

  /** Compress `data` as one or more gzip members (`splitAt` byte
    * offsets carve the input into consecutive members — the WARC
    * multi-member shape). `deflateMode` picks the block encoding;
    * `fname`/`fextra`/`fhcrc` exercise the optional header fields.
    */
  def compress(data: Array[Byte], deflateMode: Int = Png.DeflateDynamic,
      splitAt: Seq[Int] = Nil, fname: Option[String] = None,
      fextra: Option[Array[Byte]] = None, fhcrc: Boolean = false): Array[Byte] = {
    require(splitAt.forall(s => s > 0 && s < data.length), "splits must be interior")
    require(splitAt == splitAt.sorted && splitAt.distinct == splitAt, "splits must be ascending")
    val bounds = (0 +: splitAt :+ data.length).sliding(2).toSeq
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    bounds.foreach { case Seq(from, until) =>
      val member = java.util.Arrays.copyOfRange(data, from, until)
      val header = new java.io.ByteArrayOutputStream(32)
      header.write(0x1f); header.write(0x8b); header.write(8)
      var flg = 0
      if (fextra.isDefined) flg |= 0x04
      if (fname.isDefined) flg |= 0x08
      if (fhcrc) flg |= 0x02
      header.write(flg)
      header.write(0); header.write(0); header.write(0); header.write(0) // MTIME = 0
      header.write(0) // XFL
      header.write(255) // OS unknown
      fextra.foreach { x =>
        // XLEN is a 16-bit field; a longer array would silently truncate to
        // the low 16 bits and emit a structurally corrupt member header
        require(x.length <= 0xffff, "FEXTRA must fit in 16-bit XLEN")
        header.write(x.length & 0xff); header.write((x.length >> 8) & 0xff)
        header.write(x, 0, x.length)
      }
      fname.foreach { n =>
        val b = n.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        header.write(b, 0, b.length); header.write(0)
      }
      val hb = header.toByteArray
      out.write(hb, 0, hb.length)
      if (fhcrc) {
        val c = crc32(hb, 0, hb.length) & 0xffff
        out.write(c & 0xff); out.write((c >> 8) & 0xff)
      }
      val body = Png.deflate(member, deflateMode)
      out.write(body, 0, body.length)
      val crc = crc32(member, 0, member.length)
      out.write(crc & 0xff); out.write((crc >> 8) & 0xff)
      out.write((crc >> 16) & 0xff); out.write((crc >> 24) & 0xff)
      val isize = member.length
      out.write(isize & 0xff); out.write((isize >> 8) & 0xff)
      out.write((isize >> 16) & 0xff); out.write((isize >> 24) & 0xff)
    }
    out.toByteArray
  }
}
