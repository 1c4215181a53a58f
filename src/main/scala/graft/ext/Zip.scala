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
  * directory record (`PK\5\6`). [[archive]] writes classic 16/32-bit
  * records (≤ 65,535 entries); [[archiveZip64]] writes the zip64
  * shape — 0xFFFF/0xFFFFFFFF sentinels with the real values in
  * 0x0001 extra fields, an EOCD64 record (`PK\6\6`) and its locator
  * (`PK\6\7`) — the wire a > 64k-member or > 4 GiB crawl archive
  * actually ships as. No encryption, no data descriptors —
  * deterministic fixed timestamps.
  *
  * Reader: locates the EOCD by scanning back from the tail, follows
  * a zip64 EOCD locator when one precedes it (APPNOTE §4.3.15),
  * resolves 0xFFFF/0xFFFFFFFF sentinel fields from the EOCD64 and
  * per-entry 0x0001 extra fields, then walks the CENTRAL directory
  * (authoritative per the spec — local headers of bit-3 writers
  * carry zeroed sizes), reads each member's data at its local-header
  * offset, inflates (or copies, method 0), and CRC-verifies.
  * Structural damage (EOCD/directory/offsets) → the contracted None;
  * a member whose data fails its own CRC or inflate is dropped
  * individually with the rest preserved. `maxOutBytes` caps total
  * inflated output (zip-bomb guard).
  */
object Zip {

  final case class Entry(name: String, data: Array[Byte])

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ---------------------------------------------------------- write

  /** Write entries as a classic ZIP archive (DEFLATE unless stored
    * is smaller; ≤ 65,535 entries — [[archiveZip64]] above that).
    */
  def archive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(entries.length <= 0xffff,
      "entry count must fit the 16-bit EOCD fields (use archiveZip64)")
    archiveImpl(entries, zip64 = false)
  }

  /** Write entries in the zip64 shape: central records carry
    * 0xFFFFFFFF sentinels with the real size/offset values in 0x0001
    * extra fields, and the tail is EOCD64 + locator + a sentinel
    * EOCD. Valid per APPNOTE at ANY size — small archives written
    * this way exercise exactly the read path a > 64k-member or
    * > 4 GiB archive needs.
    */
  def archiveZip64(entries: Seq[(String, Array[Byte])]): Array[Byte] =
    archiveImpl(entries, zip64 = true)

  private def archiveImpl(entries: Seq[(String, Array[Byte])],
      zip64: Boolean): Array[Byte] = {
    require(entries.nonEmpty, "archive at least one entry")
    require(entries.forall { case (n, d) =>
      n.nonEmpty && n.getBytes("UTF-8").length <= 0xffff && d != null
    }, "entry names must fit the 16-bit name-length field")
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >>> 32) & 0xffffffffL) }
    val ver = if (zip64) 45 else 20 // version needed: 4.5 = zip64
    val centrals = Seq.newBuilder[Array[Byte]]
    entries.foreach { case (name, data) =>
      val offset = out.size()
      val nameB = name.getBytes("UTF-8")
      val crc = Png.crc32Std(data, 0, data.length) & 0xffffffffL
      val deflated = Png.deflate(data, Png.DeflateDynamic)
      val (method, payload) =
        if (deflated.length < data.length) (8, deflated) else (0, data)
      // local file header (real 32-bit values: they fit; zip64
      // sentinels are only required where a value overflows)
      w32(0x04034b50L)
      w16(ver); w16(0); w16(method)
      w16(0); w16(0x21) // fixed mod time/date (1980-01-01, deterministic)
      w32(crc); w32(payload.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB)
      out.write(payload)
      // central directory record, assembled now, emitted after data
      val c = new java.io.ByteArrayOutputStream()
      def c16(v: Int): Unit = { c.write(v & 0xff); c.write((v >> 8) & 0xff) }
      def c32(v: Long): Unit = { c16((v & 0xffff).toInt); c16(((v >> 16) & 0xffff).toInt) }
      def c64(v: Long): Unit = { c32(v & 0xffffffffL); c32((v >>> 32) & 0xffffffffL) }
      c32(0x02014b50L)
      c16(ver); c16(ver); c16(0); c16(method)
      c16(0); c16(0x21)
      c32(crc)
      if (zip64) { c32(0xffffffffL); c32(0xffffffffL) }
      else { c32(payload.length.toLong); c32(data.length.toLong) }
      c16(nameB.length)
      c16(if (zip64) 4 + 24 else 0) // extra: 0x0001 header + 3 × u64
      c16(0) // comment length
      c16(0); c16(0) // disk number, internal attrs
      c32(0L) // external attrs
      c32(if (zip64) 0xffffffffL else offset.toLong)
      c.write(nameB)
      if (zip64) {
        // 0x0001 extra field: values for each sentinel 32-bit field,
        // APPNOTE §4.5.3 order — original size, compressed, offset
        c16(0x0001); c16(24)
        c64(data.length.toLong); c64(payload.length.toLong); c64(offset.toLong)
      }
      centrals += c.toByteArray
    }
    val cdOffset = out.size()
    centrals.result().foreach(out.write)
    val cdSize = out.size() - cdOffset
    if (zip64) {
      val eocd64Off = out.size()
      w32(0x06064b50L) // zip64 EOCD record
      w64(44L) // size of remaining record (fixed fields, no ext data)
      w16(45); w16(45) // version made by / needed
      w32(0L); w32(0L) // this disk / CD start disk
      w64(entries.length.toLong); w64(entries.length.toLong)
      w64(cdSize.toLong); w64(cdOffset.toLong)
      w32(0x07064b50L) // zip64 EOCD locator
      w32(0L); w64(eocd64Off.toLong); w32(1L)
      w32(0x06054b50L) // sentinel EOCD
      w16(0); w16(0); w16(0xffff); w16(0xffff)
      w32(0xffffffffL); w32(0xffffffffL); w16(0)
    } else {
      w32(0x06054b50L) // EOCD
      w16(0); w16(0); w16(entries.length); w16(entries.length)
      w32(cdSize.toLong); w32(cdOffset.toLong); w16(0)
    }
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
    def u64(i: Int): Long = {
      val v = u32(i) | (u32(i + 4) << 32)
      if (v < 0) fail() // > 2^63: hostile
      v
    }
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
    // zip64: a locator (APPNOTE §4.3.15) immediately precedes the
    // EOCD; when present the EOCD64 record's counts/offsets are
    // authoritative and the EOCD's own fields are 0xFFFF sentinels.
    // The 4 locator signature bytes alone are NOT proof of zip64 — a
    // classic archive whose CD comment happens to end with 0x07064b50
    // would collide — so the zip64 path is only COMMITTED to when the
    // locator validates structurally or the EOCD carries sentinel
    // fields (a sentinel with a broken locator is genuinely corrupt);
    // otherwise fall back to the classic parse.
    def classicTail(): (Long, Long, Long, Int) = {
      val n0 = u16(eocd + 10)
      if (n0 != u16(eocd + 8)) fail() // single-disk archives only
      (n0.toLong, u32(eocd + 12), u32(eocd + 16), eocd)
    }
    def zip64Tail(): (Long, Long, Long, Int) = {
      if (u32(eocd - 16) != 0L || u32(eocd - 4) != 1L) fail() // single disk
      val e64 = u64(eocd - 12)
      // overflow-safe bound: `e64 + 56 > …` Long-overflows for a
      // hostile e64 near 2^63, passing the check and indexing at an
      // arbitrary truncated int — check the negative range explicitly
      // and subtract instead of adding
      if (e64 < 0L || e64 > (eocd - 20).toLong - 56L ||
          u32(e64.toInt) != 0x06064b50L) fail()
      val p = e64.toInt
      if (u32(p + 16) != 0L || u32(p + 20) != 0L) fail() // single disk
      val total = u64(p + 32)
      if (u64(p + 24) != total) fail()
      if (total > (1L << 24)) fail() // directory-bomb guard
      (total, u64(p + 40), u64(p + 48), p)
    }
    val eocdHasSentinel =
      u16(eocd + 8) == 0xffff || u16(eocd + 10) == 0xffff ||
        u32(eocd + 12) == 0xffffffffL || u32(eocd + 16) == 0xffffffffL
    val (n, cdSize, cdOffset, cdEnd) =
      if (eocd >= 20 && u32(eocd - 20) == 0x07064b50L) {
        if (eocdHasSentinel) zip64Tail()
        else try zip64Tail() catch { case _: Malformed => classicTail() }
      } else classicTail()
    if (cdOffset + cdSize != cdEnd.toLong) fail()
    val out = Seq.newBuilder[Entry]
    var outBytes = 0L
    var pos = cdOffset.toInt
    var k = 0L
    while (k < n) {
      if (u32(pos) != 0x02014b50L) fail()
      val method = u16(pos + 10)
      val crc = u32(pos + 16)
      var csize = u32(pos + 20)
      var usize = u32(pos + 24)
      val nameLen = u16(pos + 28)
      val extraLen = u16(pos + 30)
      val commentLen = u16(pos + 32)
      var lho = u32(pos + 42)
      if (pos + 46 + nameLen + extraLen > cdEnd) fail()
      // resolve 0xFFFFFFFF sentinels from the 0x0001 extra field —
      // one u64 per sentinel field, in usize/csize/offset order
      if (csize == 0xffffffffL || usize == 0xffffffffL || lho == 0xffffffffL) {
        var e = pos + 46 + nameLen
        val eStop = e + extraLen
        var found = false
        while (!found && e + 4 <= eStop) {
          val id = u16(e); val sz = u16(e + 2)
          if (e + 4 + sz > eStop) fail()
          if (id == 0x0001) {
            var f = e + 4
            def take(): Long = {
              if (f + 8 > e + 4 + sz) fail()
              val v = u64(f); f += 8; v
            }
            if (usize == 0xffffffffL) usize = take()
            if (csize == 0xffffffffL) csize = take()
            if (lho == 0xffffffffL) lho = take()
            found = true
          } else e += 4 + sz
        }
        if (!found) fail() // sentinel with no zip64 extra: corrupt
      }
      val name = new String(data, pos + 46, nameLen, "UTF-8")
      if (name.isEmpty) fail()
      // local header: sizes there may be zeroed (bit-3 writers) — the
      // central values above are authoritative; only the local name/
      // extra lengths matter to find the data start. Guard the Long
      // offset BEFORE the toInt: a hostile zip64 offset of exactly
      // 2^32 would otherwise truncate to 0 and alias member 0's
      // local header instead of failing structurally.
      if (lho + 30 > data.length.toLong) fail()
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
    if (pos != cdEnd) fail()
    out.result()
  }
}
