package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0) container reader — the wire format
  * web-crawl training corpora actually arrive in (Common Crawl's
  * WARC/WET files: gzip members, one record per member, each record
  * a `WARC/1.0` header block + `Content-Length` payload). Composes
  * with [[graft.ext.Gzip]]: payloads may be plain WARC bytes or a
  * (multi-member) gzip stream — the reader sniffs the magic and
  * decompresses first. Pure byte parsing, corrupt-safe `Option`
  * (the O-05 discipline), no library dependency.
  *
  * The WRITER exists for fixtures: deterministic record assembly
  * with the mandatory header fields, so every reader path is
  * exercised with bytes we control.
  */
object Warc {

  /** One parsed WARC record: type, target URI (empty when absent),
    * date, and the raw content block.
    */
  final case class WarcRecord(
      warc_type: String, target_uri: String, date: String, content: Array[Byte],
      content_language: String = "")

  private final class Malformed extends RuntimeException(null, null, false, false)
  private def fail(): Nothing = throw new Malformed

  /** Parse a WARC file (plain or gzip — sniffed) into its records.
    * `None` for malformed/truncated/checksum-failing payloads.
    */
  def parse(payload: Array[Byte], maxOut: Int = 1 << 26): Option[Seq[WarcRecord]] =
    if (payload == null || payload.length < 4) None
    else {
      val bytes =
        if ((payload(0) & 0xff) == 0x1f && (payload(1) & 0xff) == 0x8b)
          graft.ext.Gzip.decompress(payload, maxOut) match {
            case Some(b) => b
            case None => return None
          }
        else payload
      try Some(parseChecked(bytes))
      catch { case _: Malformed | _: ArrayIndexOutOfBoundsException | _: NumberFormatException => None }
    }

  /** CRLF-terminated line reader shared by the WARC header walk and
    * the HTTP message parser (same bounds handling, same truncation
    * fail — only the charset differs).
    */
  private final class LineCursor(
      data: Array[Byte], var pos: Int, charset: java.nio.charset.Charset) {
    def readLine(): String = {
      val start = pos
      while (pos + 1 < data.length &&
        !(data(pos) == '\r' && data(pos + 1) == '\n')) pos += 1
      if (pos + 1 >= data.length) fail()
      val s = new String(data, start, pos - start, charset)
      pos += 2
      s
    }
  }

  private def parseChecked(data: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    val cur = new LineCursor(data, 0, java.nio.charset.StandardCharsets.UTF_8)
    def pos: Int = cur.pos
    def readLine(): String = cur.readLine()
    while (pos < data.length) {
      val version = readLine()
      if (version != "WARC/1.0" && version != "WARC/1.1") fail()
      var warcType = ""; var uri = ""; var date = ""; var language = ""
      var contentLength = -1L
      var line = readLine()
      while (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i <= 0) fail()
        val name = line.substring(0, i).trim.toLowerCase
        val value = line.substring(i + 1).trim
        name match {
          case "warc-type" => warcType = value
          case "warc-target-uri" => uri = value
          case "warc-date" => date = value
          case "warc-identified-content-language" => language = value
          case "content-length" => contentLength = value.toLong
          case _ => () // headers we don't model are skipped
        }
        line = readLine()
      }
      if (warcType.isEmpty || contentLength < 0 ||
        pos + contentLength + 4 > data.length) fail()
      val content = java.util.Arrays.copyOfRange(
        data, pos, pos + contentLength.toInt)
      cur.pos += contentLength.toInt
      // record terminator: two CRLFs
      if (!(data(pos) == '\r' && data(pos + 1) == '\n' &&
        data(pos + 2) == '\r' && data(pos + 3) == '\n')) fail()
      cur.pos += 4
      out += WarcRecord(warcType, uri, date, content, language)
    }
    out.result()
  }

  /** Parsed HTTP/1.x response message — what a WARC `response`
    * record's content block actually holds (RFC 9112 subset): status
    * code, Content-Type, and the decoded body. Real crawl processing
    * starts here; WET `conversion` records are the already-extracted
    * convenience form.
    */
  final case class HttpMessage(status: Int, content_type: String, body: Array[Byte])

  /** Parse an HTTP response message (status line + headers + body).
    * Body framing: `Transfer-Encoding: chunked` (hex sizes, chunk
    * extensions tolerated, trailer section skipped) else
    * `Content-Length` else the rest of the block (the
    * connection-close framing WARC captures allow). A
    * `Content-Encoding: gzip` body decodes through
    * [[graft.ext.Gzip]]. Malformed/truncated/over-`maxOut` → None,
    * never a throw (the codec discipline).
    */
  def parseHttp(block: Array[Byte], maxOut: Int = 1 << 26): Option[HttpMessage] =
    if (block == null || block.length < 12) None
    else
      try Some(parseHttpChecked(block, maxOut))
      catch {
        // IndexOutOfBoundsException (not just the Array subclass):
        // ByteArrayOutputStream.write throws the PLAIN variant on a
        // negative length
        case _: Malformed | _: IndexOutOfBoundsException |
             _: NumberFormatException => None
      }

  private def parseHttpChecked(data: Array[Byte], maxOut: Int): HttpMessage = {
    val cur = new LineCursor(data, 0,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    def pos: Int = cur.pos
    def readLine(): String = cur.readLine()
    val statusLine = readLine()
    if (!statusLine.startsWith("HTTP/1.")) fail()
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2) fail()
    val status = parts(1).toInt
    var contentType = ""; var contentLength = -1L
    var chunked = false; var gzipped = false
    var line = readLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i <= 0) fail()
      val name = line.substring(0, i).trim.toLowerCase
      val value = line.substring(i + 1).trim
      name match {
        case "content-type" => contentType = value
        case "content-length" => contentLength = value.toLong
        case "transfer-encoding" =>
          chunked = value.toLowerCase.contains("chunked")
        case "content-encoding" =>
          gzipped = value.toLowerCase == "gzip" || value.toLowerCase == "x-gzip"
        case _ => () // headers we don't model are skipped
      }
      line = readLine()
    }
    val raw: Array[Byte] =
      if (chunked) {
        val out = new java.io.ByteArrayOutputStream()
        var done = false
        while (!done) {
          // hex size, chunk extensions after ';' tolerated. Bound sz
          // BEFORE any arithmetic: a 16-hex-digit size near
          // Long.MaxValue would wrap out.size()+sz and pos+sz negative,
          // slipping both guards and reaching write() with a negative
          // length
          val sz = java.lang.Long.parseLong(
            readLine().split(";")(0).trim, 16)
          if (sz < 0 || sz > maxOut || out.size() + sz > maxOut) fail()
          if (sz == 0L) {
            // trailer section: lines until an empty line, or end of
            // block (WARC captures may omit the final CRLF pair)
            var open = pos + 1 < data.length
            while (open) {
              val t = readLine()
              if (t.isEmpty) open = false
              else open = pos + 1 < data.length
            }
            done = true
          } else {
            if (pos + sz > data.length) fail()
            out.write(data, pos, sz.toInt); cur.pos += sz.toInt
            if (pos + 1 >= data.length ||
              data(pos) != '\r' || data(pos + 1) != '\n') fail()
            cur.pos += 2
          }
        }
        out.toByteArray
      } else if (contentLength >= 0) {
        if (contentLength > maxOut || pos + contentLength > data.length) fail()
        java.util.Arrays.copyOfRange(data, pos, pos + contentLength.toInt)
      } else java.util.Arrays.copyOfRange(data, pos, data.length)
    val body =
      if (gzipped) graft.ext.Gzip.decompress(raw, maxOut).getOrElse(fail())
      else raw
    HttpMessage(status, contentType, body)
  }

  /** WARC `response` records → HTTP-parsed document rows: the real
    * crawl-processing entry point ([[warcRecords]] surfaces WET
    * `conversion` text; this surfaces the raw HTTP capture). One
    * decompress + WARC walk + HTTP parse per file; emits
    * (file id, record index, uri, date, language, status,
    * content type, body text). A corrupt FILE yields one
    * `rec_idx = -1` null row; a response record whose HTTP block is
    * malformed yields its row with null status/type/text — both DLQ
    * splits the O-07 way. Non-response records are skipped here
    * (warcinfo/request/metadata carry no document payload).
    */
  def httpResponseDocs(spark: SparkSession, media: DataFrame, partitions: Int)
      : DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[graft.ext.Multimodal.MediaRecord]
      .flatMap { r =>
        parse(r.payload) match {
          case None => Seq((r.media_id, -1, null: String, null: String,
            null: String, None: Option[Int], null: String, null: String))
          case Some(recs) => recs.zipWithIndex.collect {
            case (rec, i) if rec.warc_type == "response" =>
              parseHttp(rec.content) match {
                case Some(h) =>
                  (r.media_id, i, rec.target_uri, rec.date,
                    rec.content_language, Some(h.status): Option[Int],
                    h.content_type,
                    new String(h.body, java.nio.charset.StandardCharsets.UTF_8))
                case None =>
                  (r.media_id, i, rec.target_uri, rec.date,
                    rec.content_language, None: Option[Int],
                    null: String, null: String)
              }
          }
        }
      }
      .toDF("media_id", "rec_idx", "target_uri", "warc_date",
        "content_language", "status", "content_type", "text")
  }

  /** Assemble WARC bytes from records (fixture writer — mandatory
    * headers, deterministic order). `recordId` derives from the
    * index so output is reproducible.
    */
  def build(records: Seq[WarcRecord]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256 * records.size)
    val crlf = "\r\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    records.zipWithIndex.foreach { case (r, i) =>
      val sb = new StringBuilder
      sb.append("WARC/1.0\r\n")
      sb.append(s"WARC-Type: ${r.warc_type}\r\n")
      sb.append(s"WARC-Record-ID: <urn:graft:record-$i>\r\n")
      sb.append(s"WARC-Date: ${r.date}\r\n")
      if (r.target_uri.nonEmpty) sb.append(s"WARC-Target-URI: ${r.target_uri}\r\n")
      if (r.content_language.nonEmpty)
        sb.append(s"WARC-Identified-Content-Language: ${r.content_language}\r\n")
      sb.append(s"Content-Length: ${r.content.length}\r\n")
      sb.append("\r\n")
      val hb = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.write(hb, 0, hb.length)
      out.write(r.content, 0, r.content.length)
      out.write(crlf, 0, 2); out.write(crlf, 0, 2)
    }
    out.toByteArray
  }

  /** Byte offsets of each record start in [[build]]'s output — the
    * member-split points for the Common Crawl one-record-per-gzip-
    * member layout.
    */
  def recordOffsets(records: Seq[WarcRecord]): Seq[Int] = {
    var off = 0
    records.zipWithIndex.map { case (r, i) =>
      val start = off
      val header = ("WARC/1.0\r\n" +
        s"WARC-Type: ${r.warc_type}\r\n" +
        s"WARC-Record-ID: <urn:graft:record-$i>\r\n" +
        s"WARC-Date: ${r.date}\r\n" +
        (if (r.target_uri.nonEmpty) s"WARC-Target-URI: ${r.target_uri}\r\n" else "") +
        (if (r.content_language.nonEmpty)
          s"WARC-Identified-Content-Language: ${r.content_language}\r\n" else "") +
        s"Content-Length: ${r.content.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      off += header + r.content.length + 4
      start
    }
  }

  /** WARC corpus → relational record rows: decompress + parse ONCE
    * per file (per-partition imperative tier, the codec discipline),
    * emit (file id, record index, type, uri, date, text). Corrupt
    * files yield a single null-type row so DLQ callers can split.
    */
  def warcRecords(spark: SparkSession, media: DataFrame, partitions: Int)
      : DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("mime"))
      .repartition(partitions, col("media_id"))
      .as[graft.ext.Multimodal.MediaRecord]
      .flatMap { r =>
        parse(r.payload) match {
          case Some(recs) => recs.zipWithIndex.map { case (rec, i) =>
            (r.media_id, i, rec.warc_type, rec.target_uri, rec.date,
              rec.content_language,
              new String(rec.content, java.nio.charset.StandardCharsets.UTF_8))
          }
          case None => Seq((r.media_id, -1, null: String, null: String,
            null: String, null: String, null: String))
        }
      }
      .toDF("media_id", "rec_idx", "warc_type", "target_uri", "warc_date",
        "content_language", "text")
  }
}
