package graft.tools

/** Single-threaded codec micro-bench (no Spark): per-clip encode /
  * decode cost of the MPEG-1 video wire on the q250-family strip
  * corpus — the number that bounds how much a synth-heavy video
  * query can cost per task slot. Run:
  * `sbt "runMain graft.tools.CodecBench"`.
  */
object CodecBench {
  private def stripLevels(s: Long): Array[Int] = {
    val lev = new Array[Int](11); lev(0) = (s % 3).toInt
    var i = 1
    while (i < 11) {
      val d = ((s * (i + 3) + i.toLong * i) % 2).toInt
      lev(i) = (lev(i - 1) + 1 + d) % 3; i += 1
    }
    lev
  }
  private def frame(s: Long): Array[Byte] = {
    val lev = stripLevels(s); val bgr = new Array[Byte](44 * 24 * 3)
    var y = 0
    while (y < 24) {
      var x = 0
      while (x < 44) {
        val v = (40 + 88 * lev(x / 4)).toByte
        val o = (y * 44 + x) * 3
        bgr(o) = v; bgr(o + 1) = v; bgr(o + 2) = v; x += 1
      }
      y += 1
    }
    bgr
  }

  def main(args: Array[String]): Unit = {
    val frames = (0 until 8).map(f => frame(97L + f * 31))
    (0 until 50).foreach { _ =>
      graft.ext.Mpeg1Video.decode(
        graft.ext.Mpeg1Video.encode(44, 24, frames, qscale = 3))
    }
    var t0 = System.nanoTime(); var n = 0
    while (n < 200) {
      graft.ext.Mpeg1Video.encode(44, 24, frames, qscale = 3); n += 1
    }
    val encMs = (System.nanoTime() - t0) / 1e6 / 200
    val wire = graft.ext.Mpeg1Video.encode(44, 24, frames, qscale = 3)
    t0 = System.nanoTime(); n = 0
    while (n < 200) { graft.ext.Mpeg1Video.decode(wire); n += 1 }
    val decMs = (System.nanoTime() - t0) / 1e6 / 200
    val ipp = graft.ext.Mpeg1Video.encode(44, 24, frames, qscale = 3,
      gopSize = 3, searchRange = 1)
    t0 = System.nanoTime(); n = 0
    while (n < 200) {
      graft.ext.Mpeg1Video.encode(44, 24, frames, qscale = 3,
        gopSize = 3, searchRange = 1); n += 1
    }
    val encPMs = (System.nanoTime() - t0) / 1e6 / 200
    t0 = System.nanoTime(); n = 0
    while (n < 200) { graft.ext.Mpeg1Video.decode(ipp); n += 1 }
    val decPMs = (System.nanoTime() - t0) / 1e6 / 200
    println(f"CODECBENCH allI enc $encMs%.3f ms dec $decMs%.3f ms wire ${wire.length}%d | " +
      f"ipp enc $encPMs%.3f ms dec $decPMs%.3f ms wire ${ipp.length}%d")
  }
}
