package graft

import graft.functions.Png
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure-JDK PNG codec backing
  * `multimodal_png_decode`. */
class PngSpec extends AnyFunSuite {

  private def lcgPixels(seed: Long, n: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) {
      s = (s * 1103515245L + 12345L) % 2147483648L
      (s % 256).toByte
    }
  }

  test("round-trip: decode(encode(px)) == px across sizes and filters") {
    for (seed <- 1L to 25L) {
      val w = (seed % 40 + 1).toInt
      val h = (seed * 7 % 40 + 1).toInt
      val px = lcgPixels(seed, w * h)
      for (filter <- 0 to 4) {
        val (dw, dh, dec) = Png.decode(Png.encode(w, h, px, _ => filter))
        assert(dw == w && dh == h, s"dims drifted at seed=$seed f=$filter")
        assert(dec.sameElements(px), s"pixels drifted at seed=$seed f=$filter")
      }
      // mixed per-row filters (what the gate uses)
      val (_, _, mixed) = Png.decode(Png.encode(w, h, px, r => (r + 3) % 5))
      assert(mixed.sameElements(px))
    }
  }

  test("edge shapes round-trip: 1x1, 1xN, Nx1, all-zero, all-255") {
    for ((w, h) <- Seq((1, 1), (1, 17), (17, 1), (3, 3))) {
      for (fill <- Seq(0, 255, 7)) {
        val px = Array.fill((w * h))(fill.toByte)
        val (dw, dh, dec) = Png.decode(Png.encode(w, h, px))
        assert(dw == w && dh == h && dec.sameElements(px))
      }
    }
  }

  test("a bad signature is rejected, not misparsed") {
    val png = Png.encode(4, 4, lcgPixels(9, 16))
    png(0) = 'X'.toByte
    val e = intercept[IllegalArgumentException](Png.decode(png))
    assert(e.getMessage.contains("signature"))
  }

  test("a flipped payload byte fails the chunk CRC") {
    val png = Png.encode(8, 8, lcgPixels(11, 64))
    // flip one byte inside the IDAT payload (well past IHDR's 33 bytes)
    png(45) = (png(45) ^ 0x40).toByte
    val e = intercept[Exception](Png.decode(png))
    assert(e.getMessage.toLowerCase.contains("crc"))
  }

  test("truncated files fail loudly") {
    val png = Png.encode(8, 8, lcgPixels(13, 64))
    intercept[Exception](Png.decode(png.take(png.length / 2)))
    intercept[Exception](Png.decode(png.take(7)))
  }
}
