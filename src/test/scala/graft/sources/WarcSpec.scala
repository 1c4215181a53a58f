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
}
