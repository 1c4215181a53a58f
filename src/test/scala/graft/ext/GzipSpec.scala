package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** gzip (RFC 1952) coverage over the shared DEFLATE engine: byte-
  * exact roundtrip across block modes × header fields × member
  * splits, multi-member concatenation semantics, every-position
  * corruption fuzz (CRC-32/ISIZE/FHCRC verification), and a
  * hand-assembled fixture with bytes the compressor never produced.
  */
class GzipSpec extends AnyFunSuite {

  private def noise(n: Int, seed: Int): Array[Byte] = {
    var s = seed * 2654435761L + 17
    Array.tabulate(n) { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 40).toByte
    }
  }

  private def text(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ("the quick brown fox ".charAt(i % 20)).toByte)

  test("roundtrips bit-exactly across modes, headers, and splits") {
    for (data <- Seq(noise(3000, 1), text(5000), Array[Byte](42), noise(1, 9));
         mode <- Seq(Png.DeflateStored, Png.DeflateFixed, Png.DeflateDynamic)) {
      val gz = Gzip.compress(data, mode)
      assert(java.util.Arrays.equals(Gzip.decompress(gz).get, data))
      val full = Gzip.compress(data, mode, fname = Some("a.txt"),
        fextra = Some(Array[Byte](1, 2, 3)), fhcrc = true)
      assert(java.util.Arrays.equals(Gzip.decompress(full).get, data))
    }
    val data = text(4000)
    val multi = Gzip.compress(data, splitAt = Seq(1000, 1500, 3999))
    assert(java.util.Arrays.equals(Gzip.decompress(multi).get, data))
  }

  test("empty input roundtrips (one empty member)") {
    val gz = Gzip.compress(Array.emptyByteArray)
    assert(Gzip.decompress(gz).get.length == 0)
  }

  test("concatenated compress outputs decode as one stream") {
    val a = text(100); val b = noise(200, 5)
    val cat = Gzip.compress(a) ++ Gzip.compress(b, Png.DeflateStored,
      fname = Some("b"), fhcrc = true)
    assert(java.util.Arrays.equals(Gzip.decompress(cat).get, a ++ b))
  }

  test("FEXTRA longer than the 16-bit XLEN field is rejected at encode") {
    // XLEN is 16 bits; a 65536-byte array would silently truncate to 0
    // and emit a structurally corrupt member header
    intercept[IllegalArgumentException] {
      Gzip.compress(text(10), fextra = Some(new Array[Byte](0x10000)))
    }
    val atLimit = Gzip.compress(text(10), fextra = Some(new Array[Byte](0xffff)))
    assert(java.util.Arrays.equals(Gzip.decompress(atLimit).get, text(10)))
  }

  test("zip-bomb cap: over-cap streams return None") {
    val gz = Gzip.compress(noise(10000, 3))
    assert(Gzip.decompress(gz, maxOut = 9999).isEmpty)
    assert(Gzip.decompress(gz, maxOut = 10000).isDefined)
  }

  test("corrupt payloads decode to None or identical bytes, never crash") {
    val data = text(600)
    val good = Gzip.compress(data, splitAt = Seq(300),
      fname = Some("x"), fhcrc = true)
    var n = 0
    var boundaryCuts = 0
    while (n < good.length) {
      Gzip.decompress(java.util.Arrays.copyOf(good, n)) match {
        case None => ()
        case Some(d) =>
          // legitimate: a cut landing exactly on a member boundary is
          // a VALID shorter stream — but it must be a whole-member
          // prefix of the data, never garbage
          boundaryCuts += 1
          assert(d.length < data.length &&
            java.util.Arrays.equals(d, java.util.Arrays.copyOf(data, d.length)),
            s"trunc $n")
      }
      n += 1
    }
    assert(boundaryCuts == 1) // exactly the member-1/member-2 seam
    var i = 0
    while (i < good.length) {
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x20).toByte
      Gzip.decompress(bad) match {
        case None => ()
        case Some(d) =>
          // only header bytes outside every checksum (MTIME/XFL/OS)
          // may flip silently — the payload must still be intact
          assert(java.util.Arrays.equals(d, data), s"silent corruption at $i")
      }
      i += 1
    }
    assert(Gzip.decompress(null).isEmpty)
    assert(Gzip.decompress("not gzip at all".getBytes("US-ASCII")).isEmpty)
  }

  test("FCOMMENT header field is skipped (decode-only path)") {
    // take a compressor-built member and splice an FCOMMENT into the
    // header: set FLG bit 4 and insert the zero-terminated comment
    val data = text(120)
    val gz = Gzip.compress(data)
    val out = new java.io.ByteArrayOutputStream()
    out.write(gz, 0, 3)
    out.write(gz(3) | 0x10) // FLG |= FCOMMENT
    out.write(gz, 4, 6) // MTIME, XFL, OS
    val comment = "a comment field".getBytes("ISO-8859-1")
    out.write(comment, 0, comment.length)
    out.write(0) // zero terminator
    out.write(gz, 10, gz.length - 10)
    val got = Gzip.decompress(out.toByteArray)
    assert(got.isDefined && java.util.Arrays.equals(got.get, data))
  }

  test("hand-assembled member decodes (stored block, no encoder)") {
    val payload = "hello".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x1f); out.write(0x8b); out.write(8); out.write(0)
    out.write(0); out.write(0); out.write(0); out.write(0) // MTIME
    out.write(0); out.write(255) // XFL, OS
    out.write(0x01) // BFINAL=1 BTYPE=00
    out.write(5); out.write(0); out.write(0xfa); out.write(0xff) // LEN/NLEN
    out.write(payload, 0, payload.length)
    // CRC-32 of "hello" = 0x3610A686 (standard poly), little-endian
    out.write(0x86); out.write(0xa6); out.write(0x10); out.write(0x36)
    out.write(5); out.write(0); out.write(0); out.write(0) // ISIZE
    val got = Gzip.decompress(out.toByteArray)
    assert(got.isDefined && new String(got.get, "US-ASCII") == "hello")
  }
}
