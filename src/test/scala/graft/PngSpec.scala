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

  test("RGB round-trip: decodeRgb(encodeRgb(px)) == px, all filters") {
    for (seed <- 1L to 15L) {
      val w = (seed % 30 + 1).toInt
      val h = (seed * 11 % 30 + 1).toInt
      val px = lcgPixels(seed + 100, 3 * w * h)
      for (filter <- 0 to 4) {
        val (dw, dh, dec) = Png.decodeRgb(Png.encodeRgb(w, h, px, _ => filter))
        assert(dw == w && dh == h, s"dims drifted at seed=$seed f=$filter")
        assert(dec.sameElements(px), s"pixels drifted at seed=$seed f=$filter")
      }
      val (_, _, mixed) =
        Png.decodeRgb(Png.encodeRgb(w, h, px, r => (r + 2) % 5))
      assert(mixed.sameElements(px))
    }
  }

  test("RGB Sub/Paeth use the 3-byte-back neighbor, not the gray one") {
    // a gradient image where byte i-1 != byte i-3: if the decoder used
    // the grayscale offset, reconstruction would shift channel values
    val w = 16; val h = 4
    val px = Array.tabulate(3 * w * h)(i => ((i * 37 + (i % 3) * 91) % 256).toByte)
    for (filter <- Seq(1, 3, 4)) {
      val (_, _, dec) = Png.decodeRgb(Png.encodeRgb(w, h, px, _ => filter))
      assert(dec.sameElements(px), s"bpp-offset wrong under filter $filter")
    }
  }

  test("gray/RGB type confusion is rejected") {
    val g = Png.encode(4, 4, lcgPixels(3, 16))
    val c = Png.encodeRgb(4, 4, lcgPixels(4, 48))
    intercept[IllegalArgumentException](Png.decodeRgb(g))
    intercept[IllegalArgumentException](Png.decode(c))
  }

  test("a short IDAT stream fails fast instead of spinning") {
    // craft a PNG whose IHDR advertises more rows than IDAT carries:
    // encode 2 rows, then doctor IHDR height to 4 (fixing its CRC).
    val png = Png.encode(8, 2, lcgPixels(21, 16))
    import java.util.zip.CRC32
    // IHDR data starts at offset 16 (8 sig + 4 len + 4 tag); height at +4
    png(16 + 7) = 4.toByte
    val crc = new CRC32
    crc.update(png, 12, 4 + 13) // tag + IHDR payload
    val v = crc.getValue
    png(16 + 13) = (v >>> 24).toByte; png(16 + 14) = (v >>> 16).toByte
    png(16 + 15) = (v >>> 8).toByte; png(16 + 16) = v.toByte
    val t0 = System.nanoTime()
    val e = intercept[IllegalArgumentException](Png.decode(png))
    assert(e.getMessage.contains("short inflate"))
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "decode did not fail fast")
  }

  /** Doctor IHDR width/height (big-endian u32 at data offsets 0/4) and
    * re-stamp its CRC; returns the same array for chaining. */
  private def forgeDims(png: Array[Byte], w: Long, h: Long): Array[Byte] = {
    import java.util.zip.CRC32
    def put(at: Int, v: Long): Unit = {
      png(at) = (v >>> 24).toByte; png(at + 1) = (v >>> 16).toByte
      png(at + 2) = (v >>> 8).toByte; png(at + 3) = v.toByte
    }
    put(16, w); put(20, h) // IHDR data starts at 16
    val crc = new CRC32
    crc.update(png, 12, 4 + 13)
    put(16 + 13, crc.getValue)
    png
  }

  test("a forged giant header is rejected before allocation") {
    // 65535x65535 claimed off a 8x2 payload: must die on the IDAT
    // capacity bound, not attempt a 4 GiB allocation
    val e = intercept[IllegalArgumentException](
      Png.decode(forgeDims(Png.encode(8, 2, lcgPixels(23, 16)), 65535L, 65535L)))
    assert(e.getMessage.contains("IDAT capacity"))
  }

  test("header dims that overflow Int fail as a parse error") {
    // (w*bpp+1)*h overflows Int32: must be IllegalArgumentException,
    // never NegativeArraySizeException/OutOfMemoryError
    val forged = forgeDims(Png.encode(8, 2, lcgPixels(24, 16)),
      (1L << 30) - 1, 1L << 30)
    intercept[IllegalArgumentException](Png.decode(forged))
  }

  test("zero-dimension headers are rejected") {
    val e = intercept[IllegalArgumentException](
      Png.decode(forgeDims(Png.encode(8, 2, lcgPixels(25, 16)), 0L, 2L)))
    assert(e.getMessage.contains("bad dimensions"))
  }

  test("a stream missing IEND is a parse error, not an index crash") {
    val png = Png.encode(8, 8, lcgPixels(26, 64))
    val cut = png.take(png.length - 12) // IEND chunk is exactly 12 bytes
    val e = intercept[IllegalArgumentException](Png.decode(cut))
    assert(e.getMessage.contains("truncated"))
  }
}
