package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** WARC container coverage: build/parse roundtrip on every wire
  * (plain / gzip / record-per-member), header semantics
  * (case-insensitive names, unknown headers skipped, WARC/1.1
  * accepted), offset arithmetic, and corrupt-safety.
  */
class WarcSpec extends AnyFunSuite {

  private def recs(n: Int): Seq[Warc.WarcRecord] =
    (0 until n).map { i =>
      Warc.WarcRecord(
        if (i == 0) "warcinfo" else "conversion",
        if (i == 0) "" else s"http://x.test/$i",
        "2026-01-01T00:00:00Z",
        (s"payload $i " * (i + 1)).getBytes("UTF-8"))
    }

  test("build/parse roundtrip on plain, gzip, and member-split wires") {
    val rs = recs(4)
    val bytes = Warc.build(rs)
    for (wire <- Seq(
      bytes,
      graft.ext.Gzip.compress(bytes),
      graft.ext.Gzip.compress(bytes, splitAt = Warc.recordOffsets(rs).tail))) {
      val got = Warc.parse(wire).getOrElse(fail("parse failed"))
      assert(got.size == 4)
      got.zip(rs).foreach { case (g, e) =>
        assert(g.warc_type == e.warc_type && g.target_uri == e.target_uri &&
          g.date == e.date)
        assert(java.util.Arrays.equals(g.content, e.content))
      }
    }
  }

  test("recordOffsets point at each record's first byte") {
    val rs = recs(3)
    val bytes = Warc.build(rs)
    val offs = Warc.recordOffsets(rs)
    assert(offs.head == 0)
    offs.foreach { o =>
      assert(new String(bytes, o, 8, "US-ASCII") == "WARC/1.0")
    }
  }

  test("header names are case-insensitive; unknown headers skipped; 1.1 ok") {
    val body = "hello world"
    val raw = ("WARC/1.1\r\n" +
      "warc-type: conversion\r\n" +
      "WARC-TARGET-URI: http://y.test/a\r\n" +
      "X-Unknown-Header: whatever\r\n" +
      "WARC-Date: 2026-02-02T00:00:00Z\r\n" +
      s"content-length: ${body.length}\r\n" +
      "\r\n" + body + "\r\n\r\n").getBytes("UTF-8")
    val got = Warc.parse(raw).get
    assert(got.size == 1)
    assert(got.head.warc_type == "conversion")
    assert(got.head.target_uri == "http://y.test/a")
    assert(new String(got.head.content, "UTF-8") == body)
  }

  test("content-language header roundtrips; absent means empty") {
    val rs = Seq(
      Warc.WarcRecord("conversion", "http://a.test", "2026-01-01T00:00:00Z",
        "bonjour".getBytes("UTF-8"), "fr"),
      Warc.WarcRecord("conversion", "http://b.test", "2026-01-01T00:00:00Z",
        "plain".getBytes("UTF-8")))
    for (wire <- Seq(Warc.build(rs),
      graft.ext.Gzip.compress(Warc.build(rs), splitAt = Warc.recordOffsets(rs).tail))) {
      val got = Warc.parse(wire).get
      assert(got.map(_.content_language) == Seq("fr", ""))
    }
  }

  test("empty content block roundtrips") {
    val rs = Seq(Warc.WarcRecord("resource", "http://z.test", "2026-01-01T00:00:00Z",
      Array.emptyByteArray))
    val got = Warc.parse(Warc.build(rs)).get
    assert(got.size == 1 && got.head.content.isEmpty)
  }

  test("corrupt payloads parse to None, never crash") {
    val good = Warc.build(recs(2))
    var n = 0
    var boundaryCuts = 0
    while (n < good.length) {
      Warc.parse(java.util.Arrays.copyOf(good, n)) match {
        case None => ()
        case Some(rs) =>
          // legitimate only when the cut lands exactly on the
          // record-1/record-2 seam: a valid one-record file
          boundaryCuts += 1
          assert(rs.size == 1 && rs.head.warc_type == "warcinfo", s"trunc $n")
      }
      n += 1
    }
    assert(boundaryCuts == 1)
    assert(Warc.parse(null).isEmpty)
    assert(Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII")).isEmpty)
    // bad Content-Length (non-numeric / too large)
    val badLen = ("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 999\r\n\r\nshort\r\n\r\n")
      .getBytes("UTF-8")
    assert(Warc.parse(badLen).isEmpty)
    val nonNum = ("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: abc\r\n\r\n\r\n\r\n")
      .getBytes("UTF-8")
    assert(Warc.parse(nonNum).isEmpty)
    // gzip wire with a flipped byte
    val gz = graft.ext.Gzip.compress(good)
    val bad = gz.clone(); bad(bad.length - 2) = (bad(bad.length - 2) ^ 1).toByte
    assert(Warc.parse(bad).isEmpty)
  }

  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("parseHttp: Content-Length framing, status and content-type") {
    val body = "<html><body>hello</body></html>"
    val msg = ascii(
      s"HTTP/1.1 200 OK\r\nServer: x\r\nContent-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n$body")
    val h = Warc.parseHttp(msg).getOrElse(fail("parse failed"))
    assert(h.status == 200)
    assert(h.content_type == "text/html; charset=utf-8")
    assert(new String(h.body, "UTF-8") == body)
    // extra bytes after Content-Length are ignored (pipelined capture)
    val padded = msg ++ ascii("JUNK")
    assert(new String(Warc.parseHttp(padded).get.body, "UTF-8") == body)
  }

  test("parseHttp: chunked framing with extensions and trailers") {
    val a = "hello "; val b = "chunked world"
    def hex(n: Int) = Integer.toHexString(n)
    val msg = ascii(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        s"${hex(a.length)};ext=1\r\n$a\r\n${hex(b.length)}\r\n$b\r\n" +
        "0\r\nX-Trailer: y\r\n\r\n")
    val h = Warc.parseHttp(msg).getOrElse(fail("chunked parse failed"))
    assert(new String(h.body, "UTF-8") == a + b)
    // terminal 0-chunk with no trailer also accepted
    val bare = ascii(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        s"${hex(a.length)}\r\n$a\r\n0\r\n\r\n")
    assert(new String(Warc.parseHttp(bare).get.body, "UTF-8") == a)
  }

  test("parseHttp: gzip Content-Encoding decodes; connection-close framing") {
    val body = "compressed payload text"
    val gz = graft.ext.Gzip.compress(body.getBytes("UTF-8"))
    val msg = ascii(
      s"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\nContent-Length: ${gz.length}\r\n\r\n") ++ gz
    assert(new String(Warc.parseHttp(msg).get.body, "UTF-8") == body)
    // no Content-Length, no chunking: body = rest of block
    val close = ascii("HTTP/1.0 404 Not Found\r\nContent-Type: text/plain\r\n\r\nnot here")
    val h = Warc.parseHttp(close).get
    assert(h.status == 404 && new String(h.body, "UTF-8") == "not here")
  }

  test("parseHttp: Long-overflow chunk sizes are rejected, not crashed") {
    // a 16-hex-digit size near Long.MaxValue would wrap out.size()+sz
    // and pos+sz negative, slipping both guards and reaching write()
    // with a negative length (plain IndexOutOfBoundsException)
    for (sz <- Seq("7fffffffffffffff", "7ffffffffffffff0", "4000001")) {
      val msg = ascii(
        "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
          s"1\r\nA\r\n$sz\r\nBBBB\r\n0\r\n\r\n")
      assert(Warc.parseHttp(msg).isEmpty, sz)
    }
  }

  test("parseHttp: malformed messages are None, never a throw") {
    assert(Warc.parseHttp(null).isEmpty)
    assert(Warc.parseHttp(ascii("not http at all......")).isEmpty)
    assert(Warc.parseHttp(ascii("HTTP/1.1 OK\r\n\r\n")).isEmpty) // no code
    assert(Warc.parseHttp(ascii("HTTP/1.1 200 OK\r\nContent-Length: 99\r\n\r\nshort")).isEmpty)
    assert(Warc.parseHttp(ascii(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZ\r\nhi\r\n0\r\n\r\n")).isEmpty)
    // truncated mid-chunk
    assert(Warc.parseHttp(ascii(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nhi")).isEmpty)
    // corrupt gzip body
    val gz = graft.ext.Gzip.compress("x".getBytes("UTF-8"))
    gz(gz.length - 1) = (gz(gz.length - 1) ^ 1).toByte
    assert(Warc.parseHttp(ascii(
      s"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\nContent-Length: ${gz.length}\r\n\r\n") ++ gz).isEmpty)
    // byte-sweep truncation of a healthy chunked message: None or a
    // successful shorter parse, never a crash
    val good = ascii(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "5\r\nhello\r\n0\r\n\r\n")
    var n = 0
    while (n < good.length) {
      Warc.parseHttp(java.util.Arrays.copyOf(good, n)) // must not throw
      n += 1
    }
  }
}
