package graft.ext

/** ZIP archives (PKWARE APPNOTE 4.4.x core) — from-scratch writer +
  * reader over the repo's raw-DEFLATE tier ([[Png.inflate]] /
  * [[Png.deflate]]), no codec library. Completes the archive-ingest
  * matrix next to [[Tar]]: tar concatenates then compresses (one
  * damaged byte loses the whole archive), zip compresses per member
  * with a per-member CRC — so the reader can DROP the damaged member
  * and keep the rest, the member-grain DLQ a crawl-scale ingest
  * wants.
  *
  * Writer: one local file header (`PK\3\4`, method 8 DEFLATE or 0
  * stored when compression does not help) + data per entry, then the
  * central directory (`PK\1\2` records) and the end-of-central-
  * directory record (`PK\5\6`). No zip64, no encryption, no data
  * descriptors — deterministic fixed timestamps.
  *
  * Reader: locates the EOCD by scanning back from the tail, walks
  * the CENTRAL directory (authoritative per the spec — local headers
  * of bit-3 writers carry zeroed sizes), reads each member's data at
  * its local-header offset, inflates (or copies, method 0), and
  * CRC-verifies. Structural damage (EOCD/directory/offsets) → the
  * contracted None; a member whose data fails its own CRC or inflate
  * is dropped individually with the rest preserved. `maxOutBytes`
  * caps total inflated output (zip-bomb guard).
  */
object Zip {

  final case class Entry(name: String, data: Array[Byte])

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ---------------------------------------------------------- write

  /** Write entries as a ZIP archive (DEFLATE unless stored is
    * smaller).
    */
  def archive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(entries.nonEmpty, "archive at least one entry")
    require(entries.length <= 0xffff,
      "entry count must fit the 16-bit EOCD fields (no zip64)")
    require(entries.forall { case (n, d) =>
      n.nonEmpty && n.getBytes("UTF-8").length <= 0xffff && d != null
    }, "entry names must fit the 16-bit name-length field")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    val centrals = Seq.newBuilder[Array[Byte]]
    entries.foreach { case (name, data) =>
      val offset = out.size()
      val nameB = name.getBytes("UTF-8")
      val crc = Png.crc32Std(data, 0, data.length) & 0xffffffffL
      val deflated = Png.deflate(data, Png.DeflateDynamic)
      val (method, payload) =
        if (deflated.length < data.length) (8, deflated) else (0, data)
      // local file header
      w32(0x04034b50L)
      w16(20); w16(0); w16(method)
      w16(0); w16(0x21) // fixed mod time/date (1980-01-01, deterministic)
      w32(crc); w32(payload.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB)
      out.write(payload)
      // central directory record, assembled now, emitted after data
      val c = new java.io.ByteArrayOutputStream()
      def c16(v: Int): Unit = { c.write(v & 0xff); c.write((v >> 8) & 0xff) }
      def c32(v: Long): Unit = { c16((v & 0xffff).toInt); c16(((v >> 16) & 0xffff).toInt) }
      c32(0x02014b50L)
      c16(20); c16(20); c16(0); c16(method)
      c16(0); c16(0x21)
      c32(crc); c32(payload.length.toLong); c32(data.length.toLong)
      c16(nameB.length); c16(0); c16(0) // name/extra/comment lengths
      c16(0); c16(0) // disk number, internal attrs
      c32(0L) // external attrs
      c32(offset.toLong)
      c.write(nameB)
      centrals += c.toByteArray
    }
    val cdOffset = out.size()
    centrals.result().foreach(out.write)
    val cdSize = out.size() - cdOffset
    w32(0x06054b50L) // EOCD
    w16(0); w16(0); w16(entries.length); w16(entries.length)
    w32(cdSize.toLong); w32(cdOffset.toLong); w16(0)
    out.toByteArray
  }

  // ----------------------------------------------------------- read

  /** Extract members. Structural damage → None; members failing
    * their own CRC/inflate are dropped individually. `maxOutBytes`
    * caps total inflated bytes.
    */
  def extract(payload: Array[Byte], maxOutBytes: Long = 1L << 26)
      : Option[Seq[Entry]] =
    if (payload == null || payload.length < 22) None
    else
      try Some(extractChecked(payload, maxOutBytes))
      catch {
        case _: Malformed | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => None
      }

  private def extractChecked(data: Array[Byte],
      maxOutBytes: Long): Seq[Entry] = {
    def u16(i: Int): Int = {
      if (i + 2 > data.length) fail()
      (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8)
    }
    def u32(i: Int): Long = u16(i).toLong | (u16(i + 2).toLong << 16)
    // EOCD: scan back from the end (its variable comment bounds the
    // search; cap the scan at 64 KiB + 22 per the 16-bit comment len)
    var eocd = -1
    var i = data.length - 22
    val stop = math.max(0, data.length - 22 - 0xffff)
    while (eocd < 0 && i >= stop) {
      if (u32(i) == 0x06054b50L &&
          i + 22 + u16(i + 20) == data.length) eocd = i
      else i -= 1
    }
    if (eocd < 0) fail()
    val n = u16(eocd + 10)
    if (n != u16(eocd + 8)) fail() // single-disk archives only
    val cdSize = u32(eocd + 12)
    val cdOffset = u32(eocd + 16)
    if (cdOffset + cdSize != eocd) fail()
    val out = Seq.newBuilder[Entry]
    var outBytes = 0L
    var pos = cdOffset.toInt
    var k = 0
    while (k < n) {
      if (u32(pos) != 0x02014b50L) fail()
      val method = u16(pos + 10)
      val crc = u32(pos + 16)
      val csize = u32(pos + 20)
      val usize = u32(pos + 24)
      val nameLen = u16(pos + 28)
      val extraLen = u16(pos + 30)
      val commentLen = u16(pos + 32)
      val lho = u32(pos + 42)
      if (pos + 46 + nameLen > eocd) fail()
      val name = new String(data, pos + 46, nameLen, "UTF-8")
      if (name.isEmpty) fail()
      // local header: sizes there may be zeroed (bit-3 writers) — the
      // central values above are authoritative; only the local name/
      // extra lengths matter to find the data start
      val h = lho.toInt
      if (u32(h) != 0x04034b50L) fail()
      val dataStart = h + 30 + u16(h + 26) + u16(h + 28)
      if (dataStart + csize > data.length) fail()
      if (usize > maxOutBytes) fail()
      // directories (trailing '/', zero size) are metadata: skip
      if (!(name.endsWith("/") && usize == 0)) {
        outBytes += usize
        if (outBytes > maxOutBytes) fail()
        val member: Option[Array[Byte]] =
          try {
            val raw = method match {
              case 0 =>
                if (csize != usize) fail()
                java.util.Arrays.copyOfRange(data, dataStart,
                  dataStart + csize.toInt)
              case 8 =>
                val (b, _) = Png.inflate(data, dataStart,
                  dataStart + csize.toInt, usize.toInt)
                b
              case _ => fail() // methods beyond stored/deflate
            }
            if (raw.length != usize ||
                (Png.crc32Std(raw, 0, raw.length) & 0xffffffffL) != crc) None
            else Some(raw)
          } catch {
            // member-grain damage (bad inflate — including the DEFLATE
            // tier's own Malformed — CRC-hostile bytes, or a method we
            // do not decode): drop the member, keep the archive
            case scala.util.control.NonFatal(_) => None
          }
        member.foreach(m => out += Entry(name, m))
        if (member.isEmpty) outBytes -= usize // dropped: uncount
      }
      pos += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    if (pos != eocd) fail()
    out.result()
  }
}
