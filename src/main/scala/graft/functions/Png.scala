package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal REAL PNG codec — 8-bit grayscale AND 8-bit truecolor (RGB),
  * all five scanline filters — in pure JDK (zlib via `java.util.zip`,
  * CRC32 ditto). Public spec: PNG (ISO/IEC 15948 / RFC 2083).
  *
  * Purpose: the multimodal surface models media as opaque binary
  * columns, and this container has no codec libraries — but "no
  * libraries" need not mean "no real format". This encoder/decoder
  * pair makes the decode stage of [[graft.operators.Multimodal]]
  * exercise an actual file format end-to-end: chunk framing, CRC
  * validation, zlib inflate, and per-row filter reconstruction (None/
  * Sub/Up/Average/Paeth). A wrong reconstruction shifts pixel values,
  * which the oracle-checked position-weighted checksum catches. The
  * RGB path matters separately: filters operate per byte OFFSET by the
  * pixel width (left neighbor = 3 bytes back), so the Sub/Average/
  * Paeth reconstruction paths differ materially from grayscale.
  *
  * Deliberately NOT general: bit depth 8, color types 0 (gray) and
  * 2 (RGB) only, no interlace, no palette, no ancillary chunks. A
  * production deployment swaps in a full codec behind the same
  * byte-array boundary; everything this class does prove — batch
  * shape, partition parallelism, payload locality — carries over
  * unchanged.
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(v: Long): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    val t = tag.getBytes("US-ASCII")
    crc.update(t); crc.update(data)
    be32(data.length.toLong) ++ t ++ data ++ be32(crc.getValue)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val (pa, pb, pc) = ((p - a).abs, (p - b).abs, (p - c).abs)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode `pixels` (row-major, h rows × w cols, one byte per pixel)
    * as a real grayscale-8 PNG. `filterOf(row)` picks the scanline
    * filter (0–4) — callers vary it per row to exercise every decoder
    * path. */
  def encode(w: Int, h: Int, pixels: Array[Byte],
      filterOf: Int => Int = _ % 5): Array[Byte] =
    encodeBytes(w, h, 1, pixels, filterOf)

  /** Encode interleaved RGB bytes (row-major, 3 bytes per pixel:
    * R G B R G B …) as a real truecolor-8 PNG (color type 2). */
  def encodeRgb(w: Int, h: Int, pixels: Array[Byte],
      filterOf: Int => Int = _ % 5): Array[Byte] =
    encodeBytes(w, h, 3, pixels, filterOf)

  /** Shared scanline-filter encoder. The filter "left" neighbor is the
    * byte `bpp` positions back (PNG filters byte streams, not pixels —
    * the only thing color depth changes). */
  private def encodeBytes(w: Int, h: Int, bpp: Int, pixels: Array[Byte],
      filterOf: Int => Int): Array[Byte] = {
    val stride = w * bpp
    require(pixels.length == stride * h,
      s"pixels ${pixels.length} != $w*$h*$bpp")
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val f = filterOf(y) % 5
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = pixels(y * stride + x) & 0xFF
        val left = if (x >= bpp) pixels(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xFF else 0
        val ul =
          if (x >= bpp && y > 0) pixels((y - 1) * stride + x - bpp) & 0xFF
          else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xFF).toByte
      }
    }
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val colorType = if (bpp == 3) 2 else 0
    val ihdr = be32(w.toLong) ++ be32(h.toLong) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0) // depth 8, deflate, adaptive, none
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Decode a grayscale-8 PNG produced by any conformant encoder:
    * validates the signature and per-chunk CRCs, inflates the IDAT
    * stream, reconstructs all five filters. Returns (w, h, pixels). */
  def decode(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, ch, px) = decodeAny(png)
    require(ch == 1, s"expected grayscale, got $ch channels")
    (w, h, px)
  }

  /** Decode a truecolor-8 PNG. Returns (w, h, interleaved RGB bytes). */
  def decodeRgb(png: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, ch, px) = decodeAny(png)
    require(ch == 3, s"expected RGB, got $ch channels")
    (w, h, px)
  }

  /** Decode a grayscale-8 or truecolor-8 PNG. Returns
    * (w, h, channels, bytes) with bytes channel-interleaved. Hardened
    * against malformed input (this runs inside executors, where a bad
    * payload must become an error, not a stuck task): chunk lengths
    * are bounds-checked as Longs before Int truncation, and an IDAT
    * stream too short for the advertised dimensions fails fast instead
    * of spinning on a starved Inflater. */
  def decodeAny(png: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(png.length > 8 && png.take(8).sameElements(Signature),
      "not a PNG: bad signature")
    var off = 8
    var w = 0; var h = 0; var bpp = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(off + 8 <= png.length, "truncated chunk header")
      def u32(i: Int): Long =
        ((png(i) & 0xFFL) << 24) | ((png(i + 1) & 0xFFL) << 16) |
          ((png(i + 2) & 0xFFL) << 8) | (png(i + 3) & 0xFFL)
      // bound-check as Long: a length >= 2^31 truncates to a negative
      // Int, which would slip past an Int-arithmetic bound and surface
      // as an ArrayIndexOutOfBounds from CRC32 instead of a parse error
      val lenL = u32(off)
      val tag = new String(png.slice(off + 4, off + 8), "US-ASCII")
      require(off + 12L + lenL <= png.length, s"truncated $tag chunk")
      val len = lenL.toInt
      val crc = new CRC32
      crc.update(png, off + 4, 4 + len)
      require(crc.getValue == u32(off + 8 + len), s"bad CRC in $tag")
      val data = png.slice(off + 8, off + 8 + len)
      tag match {
        case "IHDR" =>
          require(len >= 13, s"IHDR too short: $len bytes")
          w = u32(off + 8).toInt; h = u32(off + 12).toInt
          // PNG dims are u31 by spec, but a crafted header can still
          // claim multi-GB images; dimension sanity is enforced against
          // the actual IDAT payload below, once all chunks are read
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          require(data(8) == 8, "only bit depth 8 supported")
          bpp = data(9) match {
            case 0 => 1
            case 2 => 3
            case other => sys.error(s"unsupported color type $other")
          }
          require(data(12) == 0, "interlace not supported")
        case "IDAT" => idat.write(data)
        case "IEND" => done = true
        case _ => () // ancillary chunks: CRC-checked, then skipped
      }
      off += 12 + len
    }
    require(bpp > 0, "missing IHDR")
    // Allocation guard BEFORE sizing any buffer: stride = w*bpp and
    // (stride+1)*h overflow Int for crafted headers (surfacing as
    // NegativeArraySizeException) or allocate multi-GB arrays the
    // short-inflate check would only catch after the fact. The raw
    // image cannot exceed the IDAT payload times zlib's maximum
    // expansion ratio (1032:1 for the degenerate all-literal case)
    // plus stream framing slack — anything larger is a forged header.
    val idatBytes = idat.toByteArray
    val rawLenL = (w.toLong * bpp + 1L) * h.toLong
    require(rawLenL <= idatBytes.length.toLong * 1032L + 64L,
      s"dimensions ${w}x$h ($bpp bpp) exceed IDAT capacity ${idatBytes.length}")
    require(rawLenL <= Int.MaxValue - 8,
      s"image too large: ${w}x$h ($bpp bpp)")
    val inf = new Inflater()
    inf.setInput(idatBytes)
    val stride = w * bpp
    val raw = new Array[Byte](rawLenL.toInt)
    var got = 0
    var stalled = false
    while (got < raw.length && !inf.finished() && !stalled) {
      val n = inf.inflate(raw, got, raw.length - got)
      // inflate()==0 with more output wanted means the stream ran dry
      // (needsInput) or needs a preset dictionary PNG forbids — either
      // way no forward progress is possible; break instead of spinning
      if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
      got += n
    }
    inf.end()
    require(got == raw.length, s"short inflate: $got of ${raw.length}")
    val px = new Array[Byte](stride * h)
    for (y <- 0 until h) {
      val f = raw(y * (stride + 1)) & 0xFF
      for (x <- 0 until stride) {
        val enc = raw(y * (stride + 1) + 1 + x) & 0xFF
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xFF else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xFF else 0
        val ul =
          if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xFF else 0
        val cur = f match {
          case 0 => enc
          case 1 => enc + left
          case 2 => enc + up
          case 3 => enc + (left + up) / 2
          case 4 => enc + paeth(left, up, ul)
          case other => sys.error(s"unknown filter $other")
        }
        px(y * stride + x) = (cur & 0xFF).toByte
      }
    }
    (w, h, bpp, px)
  }
}
