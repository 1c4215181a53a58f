package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** USTAR archive suite — roundtrips across block-boundary sizes, the
  * `.tar.gz` composition, EXTERNAL conformance against GNU tar in
  * both directions, checksum/truncation rejection, entry-type
  * skipping, and decode-bomb caps.
  */
class TarSpec extends AnyFunSuite {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  test("archive/extract round-trips names and bytes exactly") {
    val entries = Seq(
      "docs/a.txt" -> bytes(511, 1),
      "docs/b.txt" -> bytes(512, 2),
      "docs/c.txt" -> bytes(513, 3),
      "empty.bin" -> new Array[Byte](0),
      "big.bin" -> bytes(100000, 4))
    val got = Tar.extract(Tar.archive(entries)).getOrElse(fail("must extract"))
    assert(got.map(_.name) == entries.map(_._1))
    got.zip(entries).foreach { case (e, (_, d)) =>
      assert(e.data.sameElements(d), e.name)
    }
  }

  test("tar.gz composition round-trips through the DEFLATE tier") {
    val entries = (0 until 20).map(i => s"doc_$i.txt" ->
      s"document body $i ${"x" * (i * 37 % 200)}".getBytes("UTF-8"))
    val gz = Tar.archiveGz(entries)
    // gzip magic on the outer wire
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b)
    val got = Tar.extractGz(gz).getOrElse(fail("must extract"))
    assert(got.size == 20)
    got.zip(entries).foreach { case (e, (n, d)) =>
      assert(e.name == n && e.data.sameElements(d))
    }
  }

  test("GNU tar reads our archives (external conformance)") {
    assume(new java.io.File("/usr/bin/tar").canExecute)
    val entries = Seq("x.bin" -> bytes(700, 5), "y/z.bin" -> bytes(300, 6))
    val dir = java.nio.file.Files.createTempDirectory("tarspec").toFile
    val f = new java.io.File(dir, "ours.tar")
    java.nio.file.Files.write(f.toPath, Tar.archive(entries))
    import scala.sys.process._
    val names = Seq("tar", "-tf", f.getPath).!!.trim.split("\n").toSeq
    assert(names == entries.map(_._1))
    val x = new java.io.ByteArrayOutputStream()
    (Seq("tar", "-xOf", f.getPath, "x.bin") #> x).!
    assert(x.toByteArray.sameElements(entries.head._2),
      "GNU tar must recover our entry bytes")
  }

  test("our reader extracts GNU-tar archives incl. skipped directory entries") {
    assume(new java.io.File("/usr/bin/tar").canExecute)
    val dir = java.nio.file.Files.createTempDirectory("tarspec2").toFile
    val sub = new java.io.File(dir, "d"); sub.mkdirs()
    val d1 = bytes(900, 7); val d2 = bytes(50, 8)
    java.nio.file.Files.write(new java.io.File(sub, "one.bin").toPath, d1)
    java.nio.file.Files.write(new java.io.File(sub, "two.bin").toPath, d2)
    import scala.sys.process._
    val f = new java.io.File(dir, "theirs.tar")
    // --format=ustar pins the POSIX wire; the archive carries a
    // DIRECTORY entry ("d/") our reader must skip, not extract
    assert(Seq("tar", "--format=ustar", "-cf", f.getPath, "-C",
      dir.getPath, "d").! == 0)
    val got = Tar.extract(java.nio.file.Files.readAllBytes(f.toPath))
      .getOrElse(fail("must read a GNU-written ustar archive"))
    assert(got.map(_.name).toSet == Set("d/one.bin", "d/two.bin"))
    assert(got.find(_.name == "d/one.bin").get.data.sameElements(d1))
    assert(got.find(_.name == "d/two.bin").get.data.sameElements(d2))
  }

  test("checksum flips, truncations, and garbage are rejected") {
    val good = Tar.archive(Seq("a" -> bytes(600, 9), "b" -> bytes(600, 10)))
    // flip a byte inside the FIRST header: checksum must catch it
    val bad = good.clone()
    bad(20) = (bad(20) ^ 0x41).toByte
    assert(Tar.extract(bad).isEmpty, "checksum must reject header damage")
    // any cut that loses header/content bytes (or the whole first
    // terminator block) must reject; a cut INSIDE the zero trailer
    // after one full terminator block still decodes completely
    (1 until good.length - 512 by 97).foreach { n =>
      assert(Tar.extract(java.util.Arrays.copyOf(good, n)).isEmpty, s"n=$n")
    }
    assert(Tar.extract(null).isEmpty)
    assert(Tar.extract(Array.fill[Byte](2048)(0x42)).isEmpty)
    // content damage is NOT detectable by ustar (no content checksum):
    // a flip inside file bytes still extracts, with the flipped byte
    val bad2 = good.clone()
    bad2(512 + 10) = (bad2(512 + 10) ^ 1).toByte
    assert(Tar.extract(bad2).isDefined)
  }

  test("decode-bomb cap bounds extracted bytes") {
    val big = Tar.archive(Seq("a" -> bytes(40000, 11), "b" -> bytes(40000, 12)))
    assert(Tar.extract(big, maxOutBytes = 50000).isEmpty)
    assert(Tar.extract(big, maxOutBytes = 90000).isDefined)
  }

  test("argument contracts and determinism") {
    assertThrows[IllegalArgumentException](Tar.archive(Seq.empty))
    assertThrows[IllegalArgumentException](Tar.archive(Seq("" -> bytes(1, 1))))
    val e = Seq("a" -> bytes(100, 13))
    assert(java.util.Arrays.equals(Tar.archive(e), Tar.archive(e)))
  }

  test("pax long names round-trip through our writer and reader") {
    val long1 = "corpus/" + "shard-" * 20 + "x" * 60 + "/doc.txt" // 188 chars
    val long2 = "d/" + "n" * 150
    val entries = Seq(long1 -> bytes(700, 20), "short.txt" -> bytes(30, 21),
      long2 -> bytes(513, 22))
    assert(long1.getBytes("UTF-8").length > 100)
    val got = Tar.extract(Tar.archive(entries)).getOrElse(fail("must extract"))
    assert(got.map(_.name) == entries.map(_._1),
      "pax path records must restore the full names")
    got.zip(entries).foreach { case (e, (_, d)) =>
      assert(e.data.sameElements(d), e.name)
    }
    // and through the .tar.gz wire
    val gz = Tar.extractGz(Tar.archiveGz(entries)).getOrElse(fail("gz"))
    assert(gz.map(_.name) == entries.map(_._1))
  }

  test("GNU tar reads our pax long-name archives (external conformance)") {
    assume(new java.io.File("/usr/bin/tar").canExecute)
    val long1 = "deep/" + "p" * 120 + "/member.bin"
    val entries = Seq(long1 -> bytes(400, 23), "plain.bin" -> bytes(100, 24))
    val dir = java.nio.file.Files.createTempDirectory("tarpax").toFile
    val f = new java.io.File(dir, "ours.tar")
    java.nio.file.Files.write(f.toPath, Tar.archive(entries))
    import scala.sys.process._
    val names = Seq("tar", "-tf", f.getPath).!!.trim.split("\n").toSeq
    assert(names == entries.map(_._1),
      "GNU tar must list the FULL pax-overridden names")
    val x = new java.io.ByteArrayOutputStream()
    (Seq("tar", "-xOf", f.getPath, long1) #> x).!
    assert(x.toByteArray.sameElements(entries.head._2))
  }

  test("our reader applies pax, GNU-L, and ustar-prefix long names") {
    assume(new java.io.File("/usr/bin/tar").canExecute)
    import scala.sys.process._
    // >100-char path: pax splits via 'x' header, gnu via 'L' entry,
    // ustar via the prefix field (all three are real-corpus wire)
    val relDir = "p" * 80 + "/" + "q" * 40
    val relPath = s"$relDir/file.bin"
    assert(relPath.length > 100 && relPath.length < 255)
    val payload = bytes(800, 25)
    Seq("posix", "gnu", "ustar").foreach { fmt =>
      val dir = java.nio.file.Files.createTempDirectory(s"tarfmt$fmt").toFile
      val sub = new java.io.File(dir, relDir); sub.mkdirs()
      java.nio.file.Files.write(new java.io.File(dir, relPath).toPath, payload)
      val f = new java.io.File(dir, "t.tar")
      assert(Seq("tar", s"--format=$fmt", "-cf", f.getPath, "-C",
        dir.getPath, relPath).! == 0, fmt)
      val got = Tar.extract(java.nio.file.Files.readAllBytes(f.toPath))
        .getOrElse(fail(s"must read --format=$fmt"))
      assert(got.map(_.name) == Seq(relPath), s"$fmt must keep the full path")
      assert(got.head.data.sameElements(payload), fmt)
    }
  }

  test("many-tiny-members tar.gz is not rejected by container overhead") {
    // 1500 ten-byte docs: content 15 KB, container ~770 KB — the
    // overhead-aware headroom must admit it under a tight content cap
    val entries = (0 until 1500).map(i => f"docs/d$i%04d.txt" ->
      s"doc $i".getBytes("UTF-8"))
    val gz = Tar.archiveGz(entries)
    val got = Tar.extractGz(gz, maxOutBytes = 50000)
      .getOrElse(fail("tiny-member corpus must extract under a small content cap"))
    assert(got.size == 1500)
    assert(got(777).data.sameElements("doc 777".getBytes("UTF-8")))
  }

  test("maxEntries caps header count (metadata-bomb guard)") {
    val entries = (0 until 30).map(i => s"e$i" -> bytes(8, 30 + i))
    val t = Tar.archive(entries)
    assert(Tar.extract(t, maxEntries = 10).isEmpty)
    assert(Tar.extract(t, maxEntries = 30).isDefined)
  }

  test("malformed pax records reject the archive (corrupt-safe)") {
    val long = "z" * 130
    val good = Tar.archive(Seq(long -> bytes(64, 40)))
    // pax body starts at the first content block (after the 'x'
    // header at block 0); corrupt its length digits
    val bad = good.clone()
    assert(bad(156) == 'x')
    bad(512) = 'A' // length field no longer decimal
    // header checksum covers only the header, not the body — the
    // reader must still reject via the pax parser
    assert(Tar.extract(bad).isEmpty)
  }
  test("a PATH_MAX-long pax name fits the gz headroom under tight caps") {
    // a pax body for a ~4000-byte name spans 8 content blocks; the
    // per-entry gz allowance must cover it so an archive within both
    // maxOutBytes and maxEntries is not rejected at decompression
    val name = "deep/" + ("n" * 3995)
    val payload = "tiny".getBytes("UTF-8")
    val gz = Tar.archiveGz(Seq(name -> payload))
    // 2 headers (pax 'x' + the member) and 16 content bytes of room
    val got = Tar.extractGz(gz, maxOutBytes = 16, maxEntries = 2)
      .getOrElse(fail("long-name member must extract under tight caps"))
    assert(got.map(_.name) == Seq(name))
    assert(got.head.data.sameElements(payload))
  }
}
