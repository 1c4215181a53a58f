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
  * (typeflag '0' or NUL), and returns the contracted None on any
  * malformed, truncated, or over-budget payload.
  *
  * Long paths (> 100 name-field bytes): the reader applies a POSIX
  * pax `x` extended header's `path` record and a GNU `L` long-name
  * entry to the entry that follows, and joins a non-empty ustar
  * `prefix` field as `prefix + "/" + name` — the three mechanisms
  * real crawl tarballs (GNU tar, bsdtar, HF dataset dumps) actually
  * emit. The writer emits a pax `x` header when a name overflows the
  * 100-byte field. Other entry types (directories, symlinks, pax `g`
  * globals) are skipped by size — metadata, not corpus.
  */
object Tar {

  final case class Entry(name: String, data: Array[Byte])

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  // ---------------------------------------------------------- write

  /** Write regular-file entries as a USTAR archive. A name that
    * overflows the 100-byte ustar name field is carried by a pax `x`
    * extended header (`NN path=<name>\n` record) preceding the file
    * entry, whose own header gets the first 100 name bytes — exactly
    * what `tar --format=pax` emits and what [[extract]] reads back.
    */
  def archive(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(entries.nonEmpty, "archive at least one entry")
    require(entries.forall { case (n, d) => n.nonEmpty && d != null },
      "entries need a non-empty name and non-null data")
    val out = new java.io.ByteArrayOutputStream()

    def writeHeader(name: String, size: Long, typeflag: Byte): Unit = {
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
      putOctal(124, 12, size)
      putOctal(136, 12, 0) // mtime (deterministic archives)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum as spaces
      h(156) = typeflag
      putStr(257, 6, "ustar") // magic; byte 262 stays NUL (POSIX)
      putStr(263, 2, "00")
      var sum = 0
      var i = 0
      while (i < 512) { sum += h(i) & 0xff; i += 1 }
      putStr(148, 7, "%06o".format(sum))
      h(154) = 0 // six octal digits, NUL, space (POSIX form)
      out.write(h)
    }
    def writeBody(data: Array[Byte]): Unit = {
      out.write(data)
      out.write(new Array[Byte]((512 - data.length % 512) % 512))
    }

    entries.foreach { case (name, data) =>
      val nameB = name.getBytes("UTF-8")
      val headerName =
        if (nameB.length <= 100) name
        else {
          // pax record: "<len> path=<name>\n" where <len> counts the
          // whole record including its own digits (POSIX.1-2001)
          val content = 1 + 5 + nameB.length + 1 // ' path=' + name + '\n'
          var len = content + 1
          while (len.toString.length + content != len)
            len = len.toString.length + content
          val rec = new java.io.ByteArrayOutputStream()
          rec.write(len.toString.getBytes("UTF-8"))
          rec.write(' '); rec.write("path=".getBytes("UTF-8"))
          rec.write(nameB); rec.write('\n')
          val paxBody = rec.toByteArray
          writeHeader(new String(nameB, 0, 100, "UTF-8"), paxBody.length.toLong, 'x')
          writeBody(paxBody)
          new String(nameB, 0, 100, "UTF-8") // reader overrides via pax
        }
      writeHeader(headerName, data.length.toLong, '0')
      writeBody(data)
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
    * total extracted content and `maxEntries` the total header count
    * (files AND metadata entries — the decode-bomb guard a
    * many-tiny-members archive needs).
    */
  def extract(payload: Array[Byte], maxOutBytes: Long = 1L << 26,
      maxEntries: Int = DefaultMaxEntries): Option[Seq[Entry]] =
    if (payload == null || payload.length < 1024) None
    else
      try Some(extractChecked(payload, maxOutBytes, maxEntries))
      catch {
        case _: Malformed | _: ArrayIndexOutOfBoundsException |
             _: NegativeArraySizeException => None
      }

  /** Entry-count bound shared by [[extract]] and [[extractGz]]. */
  val DefaultMaxEntries: Int = 1 << 17

  /** Gunzip then [[extract]] — the `.tar.gz` corpus wire.
    * `maxOutBytes` caps the extracted CONTENT (same meaning as
    * [[extract]]); the gunzip stage gets headroom sized from the
    * container's per-entry overhead — ≤ 512 header + 511 padding per
    * member, plus a pax pair (512-byte `x` header + body) sized for
    * names up to PATH_MAX (4096 bytes → body ≤ 4608 after padding) —
    * bounded by `maxEntries`, plus the 1 KiB zero trailer. An archive
    * whose content fits `maxOutBytes`, whose entry count fits
    * `maxEntries`, and whose member names are ≤ 4096 bytes is never
    * rejected at the decompression stage (a many-tiny-docs corpus is
    * MOSTLY overhead; a content-proportional headroom rejects exactly
    * that shape). Pathological pax bodies beyond that — up to the
    * 1 MiB-per-record metadata guard — may still trip the gunzip cap
    * first; they fail safe (None), not unsafely.
    */
  def extractGz(payload: Array[Byte], maxOutBytes: Long = 1L << 26,
      maxEntries: Int = DefaultMaxEntries): Option[Seq[Entry]] = {
    // per entry: 512 member header + 511 padding + 512 pax header +
    // 4608 pax body (PATH_MAX name, "<len> path=<name>\n", padded)
    val containerCap =
      ((maxOutBytes + 6144L * maxEntries + 2048L) min Int.MaxValue.toLong).toInt
    Gzip.decompress(payload, maxOut = containerCap)
      .flatMap(extract(_, maxOutBytes, maxEntries))
  }

  private def extractChecked(data: Array[Byte],
      maxOutBytes: Long, maxEntries: Int): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    var outBytes = 0L
    var entries = 0
    var pos = 0
    // long-name override pending from a pax 'x' or GNU 'L' entry —
    // applies to exactly the next non-metadata entry
    var pendingPath: String = null
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
        // POSIX magic is "ustar\0" + version "00"; GNU's old-style
        // magic is "ustar  \0" (spaces) — both carry 'L' / 'x' long
        // names in the wild, accept both
        val magic = str(pos + 257, 6)
        if (magic != "ustar" && magic != "ustar ") fail()
        // checksum: header bytes with the checksum field as spaces
        val stored = octal(pos + 148, 8)
        var sum = 0L
        i = 0
        while (i < 512) {
          sum += (if (i >= 148 && i < 156) ' '.toInt else data(pos + i) & 0xff)
          i += 1
        }
        if (sum != stored) fail()
        entries += 1
        if (entries > maxEntries) fail()
        // ustar prefix field (155 bytes at 345): POSIX splits long
        // paths as prefix + "/" + name — dropping it silently would
        // extract wrong (truncated) names, so join it back
        val prefix = str(pos + 345, 155)
        val base = str(pos, 100)
        if (base.isEmpty) fail()
        val name =
          if (pendingPath != null) pendingPath // pax/L override wins
          else if (prefix.nonEmpty) prefix + "/" + base
          else base
        val size = octal(pos + 124, 12)
        val tf = data(pos + 156)
        pos += 512
        val blocks = ((size + 511) / 512).toInt
        if (pos + blocks.toLong * 512 > data.length) fail()
        if (tf == '0' || tf == 0) {
          pendingPath = null
          outBytes += size
          if (outBytes > maxOutBytes) fail()
          out += Entry(name, java.util.Arrays.copyOfRange(
            data, pos, pos + size.toInt))
        } else if (tf == 'x') {
          // pax extended header: "<len> key=value\n" records; the
          // path record renames the FOLLOWING entry. Malformed pax
          // wire is corruption → the contracted None.
          if (size > (1 << 20)) fail() // metadata bomb guard
          pendingPath = paxPath(data, pos, size.toInt).orNull
        } else if (tf == 'L') {
          // GNU long-name: content IS the next entry's name,
          // NUL-terminated
          if (size > (1 << 20)) fail()
          var end = pos
          val stop = pos + size.toInt
          while (end < stop && data(end) != 0) end += 1
          val n = new String(data, pos, end - pos, "UTF-8")
          if (n.isEmpty) fail()
          pendingPath = n
        } else {
          // other types (dirs, links, pax 'g' globals): metadata,
          // skipped by size; a dangling rename does not cross them
          pendingPath = null
        }
        pos += blocks * 512
      }
    }
    out.result()
  }

  /** Parse a pax `x` header body — a sequence of `<len> key=value\n`
    * records where `<len>` is the decimal byte length of the WHOLE
    * record (its own digits included) — returning the `path` value if
    * present. Structural violations (bad length, missing '=', record
    * past the body) → [[fail]]: pax wire this broken is corruption.
    */
  private def paxPath(data: Array[Byte], off: Int, size: Int)
      : Option[String] = {
    var path: Option[String] = None
    var p = off
    val stop = off + size
    while (p < stop) {
      var q = p
      var len = 0
      while (q < stop && data(q) >= '0' && data(q) <= '9') {
        len = len * 10 + (data(q) - '0'); q += 1
        if (len > size) fail()
      }
      if (q == p || q >= stop || data(q) != ' ') fail()
      val recEnd = p + len
      if (len <= 0 || recEnd > stop || data(recEnd - 1) != '\n') fail()
      val kv = new String(data, q + 1, recEnd - q - 2, "UTF-8")
      val eq = kv.indexOf('=')
      if (eq < 0) fail()
      if (kv.substring(0, eq) == "path") {
        val v = kv.substring(eq + 1)
        if (v.isEmpty) fail()
        path = Some(v)
      }
      p = recEnd
    }
    path
  }
}
