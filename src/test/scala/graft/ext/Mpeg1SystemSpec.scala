package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** MPEG-1 Systems (ISO 11172-1) mux/demux suite: byte-exact stream
  * reassembly across packet sizes and interleave orders, header-field
  * verification, end-to-end through both inner codecs, corruption
  * fuzz, and decode-bomb caps.
  */
class Mpeg1SystemSpec extends AnyFunSuite {

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Byte](n); rnd.nextBytes(a); a
  }

  test("mux/demux round-trips elementary streams byte-exactly") {
    for (sizes <- Seq((5000, 3000), (512, 512), (100, 9000), (65, 66));
         payload <- Seq(64, 512, 2048)) {
      val v = bytes(sizes._1, sizes._1 * 31 + payload)
      val a = bytes(sizes._2, sizes._2 * 17 + payload)
      val mux = Mpeg1System.muxAv(v, a, packetPayload = payload)
      val (dv, da) = Mpeg1System.demuxAv(mux).getOrElse(fail(s"$sizes/$payload"))
      assert(dv.sameElements(v), s"video ES $sizes/$payload")
      assert(da.sameElements(a), s"audio ES $sizes/$payload")
    }
  }

  test("payloads containing start-code bytes survive (structural parse)") {
    // a payload that is wall-to-wall 00 00 01 xx sequences must NOT
    // confuse a demuxer that scans instead of parsing lengths
    val cv = Array[Byte](0, 0, 1, 0xb9.toByte)
    val ca = Array[Byte](0, 0, 1, 0xba.toByte)
    val v = Array.tabulate(4096)(i => cv(i % 4))
    val a = Array.tabulate(2048)(i => ca(i % 4))
    val mux = Mpeg1System.muxAv(v, a, packetPayload = 256)
    val (dv, da) = Mpeg1System.demuxAv(mux).getOrElse(fail("must demux"))
    assert(dv.sameElements(v) && da.sameElements(a))
  }

  test("multi-stream mux keeps streams separate") {
    val streams = Seq(0xe0 -> bytes(1000, 1), 0xe1 -> bytes(900, 2),
      0xc0 -> bytes(800, 3), 0xc1 -> bytes(700, 4))
    val mux = Mpeg1System.mux(streams, packetPayload = 128)
    val m = Mpeg1System.demux(mux).getOrElse(fail("must demux"))
    streams.foreach { case (id, es) =>
      assert(m(id).sameElements(es), s"stream $id")
    }
    // demuxAv picks the first of each class
    val (dv, da) = Mpeg1System.demuxAv(mux).get
    assert(dv.sameElements(streams.head._2))
    assert(da.sameElements(streams(2)._2))
  }

  test("real codecs through the container: video + audio decode after demux") {
    val frames = (0 until 5).map { i =>
      val bgr = new Array[Byte](44 * 24 * 3)
      java.util.Arrays.fill(bgr, (40 + 44 * (i % 5)).toByte)
      bgr
    }
    val videoEs = Mpeg1Video.encode(44, 24, frames, qscale = 3,
      gopSize = 4, bFrames = 1)
    val samples = Array.tabulate(600)(j => (400 * (1 + (j / 150) % 4)).toShort)
    val audioEs = Mpeg1.encode(samples)
    val mux = Mpeg1System.muxAv(videoEs, audioEs, packetPayload = 512)
    val (dv, da) = Mpeg1System.demuxAv(mux).getOrElse(fail("must demux"))
    val clip = Mpeg1Video.decode(dv).getOrElse(fail("inner video must decode"))
    assert(clip.frames.length == 5)
    val pcm = Mpeg1.decode(da).getOrElse(fail("inner audio must decode"))
    assert(pcm.samples.length == samples.length)
  }

  test("corrupt containers demux to None or intact streams, never crash") {
    val v = bytes(3000, 7); val a = bytes(1500, 8)
    val good = Mpeg1System.muxAv(v, a, packetPayload = 256)
    val rnd = new scala.util.Random(11175)
    (0 until 400).foreach { _ =>
      val bad = good.clone()
      (0 to rnd.nextInt(3)).foreach { _ =>
        val i = rnd.nextInt(bad.length)
        bad(i) = (bad(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      Mpeg1System.demux(bad) match {
        case Some(m) => assert(m.nonEmpty) // lengths parsed consistently
        case None => ()
      }
    }
    (1 until good.length by 37).foreach { n =>
      // truncation before the end code must reject, not return partials
      assert(Mpeg1System.demux(java.util.Arrays.copyOf(good, n)).isEmpty, s"n=$n")
    }
    assert(Mpeg1System.demux(null).isEmpty)
    assert(Mpeg1System.demux(Array.fill[Byte](64)(0x42)).isEmpty)
  }

  test("decode-bomb cap bounds total reassembled bytes") {
    val v = bytes(40000, 9); val a = bytes(20000, 10)
    val mux = Mpeg1System.muxAv(v, a)
    assert(Mpeg1System.demux(mux, maxOutBytes = 30000).isEmpty)
    assert(Mpeg1System.demux(mux, maxOutBytes = 60000).isDefined)
  }

  test("mux argument contracts") {
    assertThrows[IllegalArgumentException](Mpeg1System.mux(Seq.empty))
    assertThrows[IllegalArgumentException](
      Mpeg1System.mux(Seq(0x10 -> bytes(10, 1)))) // bad stream id
    assertThrows[IllegalArgumentException](
      Mpeg1System.muxAv(bytes(10, 1), bytes(10, 2), packetPayload = 8))
  }

  test("mux is deterministic") {
    val v = bytes(5000, 11); val a = bytes(2500, 12)
    assert(java.util.Arrays.equals(
      Mpeg1System.muxAv(v, a), Mpeg1System.muxAv(v, a)))
  }
}
