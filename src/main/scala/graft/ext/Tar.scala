package graft.ext

/** USTAR tape archives (POSIX.1-1988 `tar`) — from-scratch writer +
  * reader, pure JVM byte parsing. The single most common shape a
  * training corpus ships in is a `.tar.gz` of documents; composed
  * with the from-scratch [[Gzip]] DEFLATE tier this gives the engine
  * real archive-corpus ingest on its own wire, no codec library.
  *
  * Wire: 512-byte header blocks — name (100), mode/uid/gid (8 each,
  * zero-padded octal ASCII), size (12, octal), mtime (12), checksum
  * (8: six octal digits + NUL + space, computed over the header with
  * the checksum field as spaces), typeflag (1), linkname (100),
  * `ustar\0` magic + `00` version, uname/gname (32 each), dev
  * major/minor (8 each), prefix (155) — then ⌈size/512⌉ content
  * blocks, and ≥ 2 zero blocks at the end. The reader verifies the
  * magic and the checksum on every header, extracts regular files
  * (typeflag '0' or NUL), SKIPS other entry types by their size
  * (directories, symlinks, pax/gnu extension blocks — their content
  * is metadata, not corpus), and returns the contracted None on any
  * malformed, truncated, or over-budget payload.
  */
object Tar {

  final case class Entry(name: String, data: Array[Byte])

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ---------------------------------------------------------- write

  /** Write regular-file entries as a USTAR archive. */
  def archive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(entries.nonEmpty, "archive at least one entry")
    require(entries.forall { case (n, d) =>
      n.nonEmpty && n.getBytes("UTF-8").length <= 100 && d != null
    }, "entry names must fit the 100-byte ustar name field")
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      def putStr(off: Int, len: Int, s: String): Unit = {
        val b = s.getBytes("UTF-8")
        System.arraycopy(b, 0, h, off, math.min(b.length, len))
      }
      def putOctal(off: Int, len: Int, v: Long): Unit =
        // len-1 digits + NUL terminator, zero-padded
        putStr(off, len, ("%0" + (len - 1) + "o").format(v)) // NUL terminator = array zero
      putStr(0, 100, name)
      putOctal(100, 8, 0x1a4) // mode 0644
      putOctal(108, 8, 0) // uid
      putOctal(116, 8, 0) // gid
      putOctal(124, 12, data.length.toLong)
      putOctal(136, 12, 0) // mtime (deterministic archives)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum as spaces
      h(156) = '0' // typeflag: regular file
      putStr(257, 6, "ustar") // magic; byte 262 stays NUL (POSIX)
      putStr(263, 2, "00")
      var sum = 0
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      putStr(148, 7, "%06o".format(sum))
      h(154) = 0 // six octal digits, NUL, space (POSIX form)
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024)) // two terminator blocks
    out.toByteArray
  }

  /** `.tar.gz` in one call: [[archive]] through the [[Gzip]] tier. */
  def archiveGz(entries: Seq[(String, Array[Byte])]): Array[Byte] =
    Gzip.compress(archive(entries))

  // ----------------------------------------------------------- read

  /** Extract regular files. Headers are checksum- and magic-verified;
    * non-file entries are skipped by size; `maxOutBytes` caps the
    * total extracted content.
    */
  def extract(payload: Array[Byte], maxOutBytes: Long = 1L << 26)
      : Option[Seq[Entry]] =
    if (payload == null || payload.length < 1024) None
    else
      try Some(extractChecked(payload, maxOutBytes))
      catch {
        case _: Malformed | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => None
      }

  /** Gunzip then [[extract]] — the `.tar.gz` corpus wire.
    * `maxOutBytes` caps the extracted CONTENT (same meaning as
    * [[extract]]); the gunzip stage gets headroom for the container
    * overhead (512-byte headers, block padding, the zero trailer) so
    * an archive whose content fits the cap is never rejected at the
    * decompression stage.
    */
  def extractGz(payload: Array[Byte], maxOutBytes: Long = 1L << 26)
      : Option[Seq[Entry]] = {
    val containerCap =
      ((maxOutBytes * 2 + (1L << 20)) min Int.MaxValue.toLong).toInt
    Gzip.decompress(payload, maxOut = containerCap)
      .flatMap(extract(_, maxOutBytes))
  }

  private def extractChecked(data: Array[Byte],
      maxOutBytes: Long): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var outBytes = 0L
    var pos = 0
    def str(off: Int, len: Int): String = {
      var end = off
      val stop = off + len
      while (end < stop && data(end) != 0) end += 1
      new String(data, off, end - off, "UTF-8")
    }
    def octal(off: Int, len: Int): Long = {
      var v = 0L
      var i = off
      val stop = off + len
      // leading spaces tolerated; digits until NUL/space
      while (i < stop && data(i) == ' ') i += 1
      var seen = false
      while (i < stop && data(i) >= '0' && data(i) <= '7') {
        v = v * 8 + (data(i) - '0'); i += 1; seen = true
        if (v > (1L << 40)) fail() // absurd size: bomb/corruption
      }
      if (!seen) fail()
      v
    }
    var ended = false
    while (!ended) {
      if (pos + 512 > data.length) fail()
      // terminator: an all-zero block (spec asks for two; accept >= 1
      // then require the remainder be zeros)
      var allZero = true
      var i = 0
      while (allZero && i < 512) { allZero = data(pos + i) == 0; i += 1 }
      if (allZero) {
        var j = pos + 512
        while (j < data.length) { if (data(j) != 0) fail(); j += 1 }
        ended = true
      } else {
        if (str(pos + 257, 6) != "ustar") fail()
        // checksum: header bytes with the checksum field as spaces
        val stored = octal(pos + 148, 8)
        var sum = 0L
        i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else data(pos + i) & 0xff)
          i += 1
        }
        if (sum != stored) fail()
        val name = str(pos, 100)
        if (name.isEmpty) fail()
        val size = octal(pos + 124, 12)
        val tf = data(pos + 156)
        pos += 512
        val blocks = ((size + 511) / 512).toInt
        if (pos + blocks.toLong * 512 > data.length) fail()
        if (tf == '0' || tf == 0) {
          outBytes += size
          if (outBytes > maxOutBytes) fail()
          out += Entry(name, java.util.Arrays.copyOfRange(
            data, pos, pos + size.toInt))
        } // other types: metadata entries, skipped by size
        pos += blocks * 512
      }
    }
    out.result()
  }
}
