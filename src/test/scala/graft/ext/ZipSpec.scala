package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** ZIP archive suite: roundtrips, method selection, EXTERNAL
  * conformance against Info-ZIP in both directions, member-grain
  * damage recovery (the property tar cannot have), structural
  * rejection, and decode-bomb caps.
  */
class ZipSpec extends AnyFunSuite {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  private def texty(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ("abcdef ,.\n"((i * 7 + seed) % 10)).toByte)

  test("archive/extract round-trips names and bytes exactly") {
    val entries = Seq(
      "a.txt" -> texty(5000, 1), // compressible → DEFLATE
      "b.bin" -> bytes(5000, 2), // random → stored
      "dir/c.txt" -> texty(100, 3),
      "empty" -> new Array[Byte](0))
    val got = Zip.extract(Zip.archive(entries)).getOrElse(fail("must extract"))
    assert(got.map(_.name) == entries.map(_._1))
    got.zip(entries).foreach { case (e, (_, d)) =>
      assert(e.data.sameElements(d), e.name)
    }
  }

  test("compressible members deflate, incompressible store") {
    val z1 = Zip.archive(Seq("t" -> texty(20000, 4)))
    assert(z1.length < 12000, s"text must compress: ${z1.length}")
    val r = bytes(20000, 5)
    val z2 = Zip.archive(Seq("r" -> r))
    assert(z2.length >= r.length, "random data stores, never inflates size")
  }

  test("Info-ZIP unzip reads our archives (external conformance)") {
    assume(new java.io.File("/usr/bin/unzip").canExecute)
    val entries = Seq("x.txt" -> texty(3000, 6), "y.bin" -> bytes(700, 7))
    val dir = java.nio.file.Files.createTempDirectory("zipspec").toFile
    val f = new java.io.File(dir, "ours.zip")
    java.nio.file.Files.write(f.toPath, Zip.archive(entries))
    import scala.sys.process._
    // -t verifies every member CRC; exit 0 = all good
    assert(Seq("unzip", "-t", f.getPath).! == 0, "unzip -t must pass")
    val x = new java.io.ByteArrayOutputStream()
    (Seq("unzip", "-p", f.getPath, "x.txt") #> x).!
    assert(x.toByteArray.sameElements(entries.head._2))
  }

  test("our reader extracts Info-ZIP archives incl. directory entries") {
    assume(new java.io.File("/usr/bin/zip").canExecute)
    val dir = java.nio.file.Files.createTempDirectory("zipspec2").toFile
    val sub = new java.io.File(dir, "d"); sub.mkdirs()
    val d1 = texty(1200, 8); val d2 = bytes(300, 9)
    java.nio.file.Files.write(new java.io.File(sub, "one.txt").toPath, d1)
    java.nio.file.Files.write(new java.io.File(sub, "two.bin").toPath, d2)
    import scala.sys.process._
    val f = new java.io.File(dir, "theirs.zip")
    assert(Process(Seq("zip", "-r", f.getPath, "d"), dir).! == 0)
    val got = Zip.extract(java.nio.file.Files.readAllBytes(f.toPath))
      .getOrElse(fail("must read an Info-ZIP archive"))
    assert(got.map(_.name).toSet == Set("d/one.txt", "d/two.bin"))
    assert(got.find(_.name == "d/one.txt").get.data.sameElements(d1))
    assert(got.find(_.name == "d/two.bin").get.data.sameElements(d2))
  }

  test("member-grain damage drops only the damaged member") {
    val entries = Seq("a.txt" -> texty(2000, 10), "b.txt" -> texty(2000, 11),
      "c.txt" -> texty(2000, 12))
    val good = Zip.archive(entries)
    // damage member b's compressed data: find its local header
    val bad = good.clone()
    var h = -1; var count = 0
    var i = 0
    while (h < 0 && i < bad.length - 4) {
      if ((bad(i) & 0xff) == 0x50 && bad(i + 1) == 0x4b &&
          bad(i + 2) == 3 && bad(i + 3) == 4) {
        if (count == 1) h = i else count += 1
      }
      i += 1
    }
    assert(h > 0)
    val nameLen = (bad(h + 26) & 0xff) | ((bad(h + 27) & 0xff) << 8)
    bad(h + 30 + nameLen + 3) = (bad(h + 30 + nameLen + 3) ^ 0x55).toByte
    val got = Zip.extract(bad).getOrElse(fail("archive must survive"))
    assert(got.map(_.name) == Seq("a.txt", "c.txt"),
      "only the damaged member drops")
    assert(got.head.data.sameElements(entries.head._2))
  }

  test("structural damage and truncation reject the whole archive") {
    val good = Zip.archive(Seq("a" -> texty(900, 13), "b" -> bytes(900, 14)))
    // EOCD magic damage
    val bad = good.clone()
    bad(bad.length - 22) = 0x51
    assert(Zip.extract(bad).isEmpty)
    // truncations lose the EOCD / directory / data
    (1 until good.length by 53).foreach { n =>
      val t = Zip.extract(java.util.Arrays.copyOf(good, n))
      // any successful parse must never fabricate members
      t.foreach(es => assert(es.forall(e =>
        e.name == "a" || e.name == "b")))
    }
    assert(Zip.extract(java.util.Arrays.copyOf(good, good.length - 1)).isEmpty)
    assert(Zip.extract(null).isEmpty)
    assert(Zip.extract(Array.fill[Byte](64)(0x42)).isEmpty)
  }

  test("decode-bomb cap bounds inflated bytes") {
    // 2 MiB of zeros deflates tiny but inflates big: the cap must fire
    val z = Zip.archive(Seq("zeros" -> new Array[Byte](1 << 21)))
    assert(z.length < (1 << 16))
    assert(Zip.extract(z, maxOutBytes = 1 << 20).isEmpty)
    assert(Zip.extract(z, maxOutBytes = 1 << 22).isDefined)
  }

  test("argument contracts and determinism") {
    assertThrows[IllegalArgumentException](Zip.archive(Seq.empty))
    val e = Seq("a" -> texty(100, 15))
    assert(java.util.Arrays.equals(Zip.archive(e), Zip.archive(e)))
  }

  test("zip64 archives round-trip through our writer and reader") {
    val entries = Seq("a.txt" -> texty(5000, 16), "b.bin" -> bytes(3000, 17),
      "dir/c" -> texty(100, 18), "empty" -> new Array[Byte](0))
    val z = Zip.archiveZip64(entries)
    // sentinel EOCD + EOCD64 + locator must be on the wire
    def u32at(i: Int): Long = (z(i) & 0xffL) | ((z(i + 1) & 0xffL) << 8) |
      ((z(i + 2) & 0xffL) << 16) | ((z(i + 3) & 0xffL) << 24)
    val eocd = z.length - 22
    assert(u32at(eocd) == 0x06054b50L)
    assert((z(eocd + 8) & 0xff) == 0xff && (z(eocd + 9) & 0xff) == 0xff,
      "EOCD entry count must be the 0xFFFF sentinel")
    assert(u32at(eocd - 20) == 0x07064b50L, "locator precedes the EOCD")
    val got = Zip.extract(z).getOrElse(fail("zip64 must extract"))
    assert(got.map(_.name) == entries.map(_._1))
    got.zip(entries).foreach { case (e, (_, d)) =>
      assert(e.data.sameElements(d), e.name)
    }
  }

  test("Info-ZIP and python zipfile read our zip64 archives (external)") {
    assume(new java.io.File("/usr/bin/unzip").canExecute)
    val entries = Seq("x.txt" -> texty(3000, 19), "y.bin" -> bytes(700, 20))
    val dir = java.nio.file.Files.createTempDirectory("zip64spec").toFile
    val f = new java.io.File(dir, "ours64.zip")
    java.nio.file.Files.write(f.toPath, Zip.archiveZip64(entries))
    import scala.sys.process._
    assert(Seq("unzip", "-t", f.getPath).! == 0,
      "unzip -t must CRC-verify every member of the zip64 wire")
    val x = new java.io.ByteArrayOutputStream()
    (Seq("unzip", "-p", f.getPath, "x.txt") #> x).!
    assert(x.toByteArray.sameElements(entries.head._2))
    if (new java.io.File("/usr/bin/python3").canExecute) {
      val py = "import zipfile,sys; z=zipfile.ZipFile(sys.argv[1]); " +
        "sys.exit(0 if z.testzip() is None and " +
        "z.read('y.bin')==open(sys.argv[2],'rb').read() else 1)"
      val yf = new java.io.File(dir, "y.ref")
      java.nio.file.Files.write(yf.toPath, entries(1)._2)
      assert(Seq("python3", "-c", py, f.getPath, yf.getPath).! == 0)
    }
  }

  test("our reader extracts python-written force_zip64 archives (external)") {
    assume(new java.io.File("/usr/bin/python3").canExecute)
    val dir = java.nio.file.Files.createTempDirectory("zip64py").toFile
    val f = new java.io.File(dir, "theirs64.zip")
    val d1 = texty(2500, 21)
    val src = new java.io.File(dir, "m1.txt")
    java.nio.file.Files.write(src.toPath, d1)
    import scala.sys.process._
    // force_zip64 writes the zip64 extra/EOCD64/locator shape even
    // for a small member — the exact wire a >4 GiB member would use
    val py = "import zipfile,sys\n" +
      "z=zipfile.ZipFile(sys.argv[1],'w',zipfile.ZIP_DEFLATED)\n" +
      "with open(sys.argv[2],'rb') as fh, " +
      "z.open('m1.txt','w',force_zip64=True) as out:\n" +
      "  out.write(fh.read())\n" +
      "z.close()\n"
    assert(Seq("python3", "-c", py, f.getPath, src.getPath).! == 0)
    val got = Zip.extract(java.nio.file.Files.readAllBytes(f.toPath))
      .getOrElse(fail("must read a python force_zip64 archive"))
    assert(got.map(_.name) == Seq("m1.txt"))
    assert(got.head.data.sameElements(d1))
  }

  test("zip64 structural damage rejects; member damage drops the member") {
    val entries = Seq("a" -> texty(1500, 22), "b" -> texty(1500, 23),
      "c" -> texty(1500, 24))
    val good = Zip.archiveZip64(entries)
    // EOCD64 signature damage (locator now points at garbage)
    var e64 = -1
    var i = 0
    while (e64 < 0 && i < good.length - 4) {
      if ((good(i) & 0xff) == 0x50 && good(i + 1) == 0x4b &&
          good(i + 2) == 6 && good(i + 3) == 6) e64 = i
      i += 1
    }
    assert(e64 > 0)
    val bad = good.clone(); bad(e64) = 0x51
    assert(Zip.extract(bad).isEmpty)
    // member-grain: damage b's data, keep the structure
    val bad2 = good.clone()
    var h = -1; var count = 0
    i = 0
    while (h < 0 && i < bad2.length - 4) {
      if ((bad2(i) & 0xff) == 0x50 && bad2(i + 1) == 0x4b &&
          bad2(i + 2) == 3 && bad2(i + 3) == 4) {
        if (count == 1) h = i else count += 1
      }
      i += 1
    }
    assert(h > 0)
    val nameLen = (bad2(h + 26) & 0xff) | ((bad2(h + 27) & 0xff) << 8)
    bad2(h + 30 + nameLen + 3) = (bad2(h + 30 + nameLen + 3) ^ 0x55).toByte
    val got = Zip.extract(bad2).getOrElse(fail("archive must survive"))
    assert(got.map(_.name) == Seq("a", "c"))
  }
  test("zip64 local-header offset beyond the archive fails, never aliases") {
    // a hostile offset of exactly 2^32 used to truncate via toInt to
    // 0 and alias member 0's local header; it must reject structurally
    val good = Zip.archiveZip64(Seq("m" -> texty(800, 31)))
    // locate the CD entry (PK\1\2) and its 0x0001 extra field; the
    // offset is the third u64 (bytes 16..23 of the extra data)
    var cd = -1; var i = 0
    while (cd < 0 && i < good.length - 4) {
      if ((good(i) & 0xff) == 0x50 && good(i + 1) == 0x4b &&
          good(i + 2) == 1 && good(i + 3) == 2) cd = i
      i += 1
    }
    assert(cd > 0)
    val nameLen = (good(cd + 28) & 0xff) | ((good(cd + 29) & 0xff) << 8)
    val off = cd + 46 + nameLen + 4 + 16 // extra header(4) + usize + csize
    val bad = good.clone()
    // little-endian 2^32 = 0x0000000100000000
    val v = Array[Byte](0, 0, 0, 0, 1, 0, 0, 0)
    System.arraycopy(v, 0, bad, off, 8)
    assert(Zip.extract(bad).isEmpty,
      "an impossible zip64 offset must reject the archive")
  }

  test("classic archive whose last CD comment ends with the locator signature still parses") {
    // the 4 locator bytes at eocd-20 alone are not proof of zip64: a
    // file comment on the last central-directory entry can collide
    val data = texty(700, 32)
    val good = Zip.archive(Seq("m.txt" -> data))
    // find the (single) CD entry and the EOCD
    var cd = -1; var eocd = -1; var i = 0
    while (i < good.length - 4) {
      if ((good(i) & 0xff) == 0x50 && good(i + 1) == 0x4b) {
        if (good(i + 2) == 1 && good(i + 3) == 2) cd = i
        if (good(i + 2) == 5 && good(i + 3) == 6) eocd = i
      }
      i += 1
    }
    assert(cd > 0 && eocd > cd)
    // craft a 20-byte file comment whose first 4 bytes are the zip64
    // locator signature (so it lands exactly at eocd-20 of the new
    // archive); remaining 16 bytes make every zip64 probe fail
    val comment = new Array[Byte](20)
    comment(0) = 0x50; comment(1) = 0x4b; comment(2) = 6; comment(3) = 7
    val out = new java.io.ByteArrayOutputStream()
    out.write(good, 0, eocd) // everything up to (excluding) EOCD
    out.write(comment)
    out.write(good, eocd, good.length - eocd)
    val patched = out.toByteArray
    // CD entry's comment-length field (cd+32) = 20
    patched(cd + 32) = 20
    // EOCD cdSize (eocd_new + 12, u32) += 20
    val eocdNew = eocd + 20
    val cdSizeOff = eocdNew + 12
    var cdSize = 0L
    var k = 0
    while (k < 4) { cdSize |= (patched(cdSizeOff + k) & 0xffL) << (8 * k); k += 1 }
    cdSize += 20
    k = 0
    while (k < 4) { patched(cdSizeOff + k) = ((cdSize >> (8 * k)) & 0xff).toByte; k += 1 }
    val got = Zip.extract(patched)
      .getOrElse(fail("comment collision must fall back to the classic parse"))
    assert(got.map(_.name) == Seq("m.txt"))
    assert(got.head.data.sameElements(data))

    // overflow probe: same collision but the locator's EOCD64 offset is
    // near 2^63 — `e64 + 56` used to Long-overflow negative, pass the
    // bound check, and index at the truncated int (AIOOBE, not caught by
    // the Malformed fallback), rejecting a parseable classic archive
    val hostile = patched.clone()
    val eocd2 = eocdNew
    // locator fields: disk# (eocd-16) = 0, e64 (eocd-12) = 0x7FFF...F0,
    // total disks (eocd-4) = 1 — so zip64Tail reaches the e64 bound check
    k = 0
    while (k < 4) { hostile(eocd2 - 16 + k) = 0; k += 1 }
    val e64Bytes = Array[Byte](0xF0.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F.toByte)
    System.arraycopy(e64Bytes, 0, hostile, eocd2 - 12, 8)
    hostile(eocd2 - 4) = 1; hostile(eocd2 - 3) = 0
    hostile(eocd2 - 2) = 0; hostile(eocd2 - 1) = 0
    val got2 = Zip.extract(hostile)
      .getOrElse(fail("hostile e64 near 2^63 must fail the bound check and fall back"))
    assert(got2.map(_.name) == Seq("m.txt"))
    assert(got2.head.data.sameElements(data))
  }
}
