package graft.multimodal

/** Real pixel decoding for the codec-free public image formats — the
  * step past [[ImageHeaders]]'s metadata probes: 24-bit BI_RGB BMP and
  * binary PPM (P6) store their pixel arrays as plain bytes, and
  * non-interlaced 8-bit PNG compresses them with DEFLATE, which the JDK's
  * `java.util.zip.Inflater` decodes, and GIF's LZW is a self-contained
  * dictionary coder implemented here from the public spec — so actual
  * channel statistics are computable with the same pure-byte discipline
  * as the header parsers, no external codec library involved. Only JPEG
  * (DCT entropy coding) still requires a real codec;
  * [[Multimodal.StubCodec]] remains the declared stand-in for it.
  *
  * Formats (public specifications):
  *   - BMP: 14-byte file header ('B''M', le32 file size, le32 reserved,
  *     le32 pixel-array offset), then BITMAPINFOHEADER (le32 header size
  *     >= 40, le32 width, le32 height — negative = top-down row order,
  *     le16 planes, le16 bits-per-pixel, le32 compression). Decodable
  *     here: bpp 24, compression 0 (BI_RGB). Rows are BGR byte triples
  *     padded to 4-byte boundaries and stored bottom-up unless height is
  *     negative.
  *   - PPM P6: ASCII header "P6", whitespace-separated width, height,
  *     maxval (decodable at maxval <= 255), '#' comment lines allowed,
  *     one whitespace byte, then row-major RGB triples top-down.
  *   - PNG: 8-byte signature, then chunks of [be32 length][4-byte type]
  *     [payload][crc32]; IHDR carries be32 width/height + bit depth +
  *     color type + interlace flag; the concatenated IDAT payloads are
  *     one zlib stream of `height` filtered rows (see [[decodePng]]).
  *
  * Like the header probes this reads UNTRUSTED bytes: every failure mode
  * (wrong magic, unsupported bpp/compression, truncated pixel array,
  * dimension overflow) returns None rather than throwing.
  */
object PixelDecode {

  /** Decoded raster: row-major top-down RGB triples (3 bytes per pixel). */
  case class RgbImage(width: Int, height: Int, rgb: Array[Byte])

  /** Per-channel statistics over a decoded raster: means and population
    * standard deviations in [0, 255], plus the pixel count. Integer sums
    * (Long, exact far past any real image size) with a final double
    * division, so results are deterministic across partitionings.
    */
  case class ChannelStats(
      nPixels: Long,
      meanR: Double,
      meanG: Double,
      meanB: Double,
      stdR: Double,
      stdG: Double,
      stdB: Double)

  /** Cap on width*height (64 MPix) — bounds per-record decode memory so
    * one absurd (or corrupt) header cannot allocate gigabytes in an
    * executor task.
    */
  val MaxPixels: Long = 64L * 1024L * 1024L

  private def leInt(b: Array[Byte], off: Int): Int =
    ((b(off + 3) & 0xff) << 24) | ((b(off + 2) & 0xff) << 16) |
      ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def leShort(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def dimsOk(w: Int, h: Int): Boolean =
    w > 0 && h > 0 && w.toLong * h.toLong <= MaxPixels

  /** Decode a 24-bit uncompressed (BI_RGB) BMP pixel array; None for any
    * other BMP flavor or a truncated/corrupt stream.
    */
  def decodeBmp(blob: Array[Byte]): Option[RgbImage] = {
    if (blob.length < 54 || blob(0) != 'B' || blob(1) != 'M') return None
    val pixelOff = leInt(blob, 10)
    val hdrSize = leInt(blob, 14)
    val w = leInt(blob, 18)
    val rawH = leInt(blob, 22)
    val bpp = leShort(blob, 28)
    val compression = leInt(blob, 30)
    val topDown = rawH < 0
    // math.abs(Int.MinValue) is negative — reject via the Long magnitude
    val hL = math.abs(rawH.toLong)
    if (hdrSize < 40 || bpp != 24 || compression != 0) return None
    if (hL > Int.MaxValue || !dimsOk(w, hL.toInt)) return None
    val h = hL.toInt
    val rowStride = ((w.toLong * 3L + 3L) / 4L) * 4L
    if (pixelOff < 0 || pixelOff.toLong + rowStride * h > blob.length) return None
    val out = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      // bottom-up storage: file row 0 is the BOTTOM image row
      val srcRow = if (topDown) row else h - 1 - row
      var src = pixelOff + (rowStride * srcRow).toInt
      var dst = row * w * 3
      var x = 0
      while (x < w) {
        out(dst) = blob(src + 2) // BGR on disk -> RGB out
        out(dst + 1) = blob(src + 1)
        out(dst + 2) = blob(src)
        src += 3
        dst += 3
        x += 1
      }
      row += 1
    }
    Some(RgbImage(w, h, out))
  }

  /** Decode a binary PPM (P6, maxval <= 255); None otherwise. */
  def decodePpm(blob: Array[Byte]): Option[RgbImage] = {
    if (blob.length < 2 || blob(0) != 'P' || blob(1) != '6') return None
    var i = 2
    // read the three header ints, skipping whitespace and '#' comments
    def nextInt(): Long = {
      var inComment = false
      while (i < blob.length && {
          val c = blob(i)
          if (inComment) { if (c == '\n') inComment = false; true }
          else if (c == '#') { inComment = true; true }
          else c == ' ' || c == '\t' || c == '\n' || c == '\r'
        }) i += 1
      var v = -1L
      while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') {
        v = (if (v < 0) 0L else v) * 10L + (blob(i) - '0')
        if (v > Int.MaxValue) return -1L
        i += 1
      }
      v
    }
    val w = nextInt()
    val h = nextInt()
    val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    if (!dimsOk(w.toInt, h.toInt)) return None
    // exactly one whitespace byte separates header and raster — VERIFY it
    // is whitespace before stepping over it: a malformed P6 whose maxval
    // runs straight into raster bytes would otherwise decode one byte off
    // and silently produce wrong channel stats instead of None
    if (i >= blob.length || !(blob(i) == ' ' || blob(i) == '\t' || blob(i) == '\n' || blob(i) == '\r'))
      return None
    i += 1
    val need = w * h * 3L
    if (i.toLong + need > blob.length) return None
    Some(RgbImage(w.toInt, h.toInt, java.util.Arrays.copyOfRange(blob, i, i + need.toInt)))
  }

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** PNG spec's Paeth predictor: nearest of left/up/upper-left to the
    * linear estimate a + b - c, ties resolved a, then b, then c.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a non-interlaced 8-bit RGB (color type 2) or RGBA (type 6)
    * PNG; None for palette/gray/16-bit/interlaced flavors or any corrupt
    * stream. PNG's pixel data is DEFLATE-compressed — `java.util.zip
    * .Inflater` ships in the JDK, so unlike JPEG/GIF no codec library is
    * needed: inflate the concatenated IDAT payloads to `height` rows of
    * [filter byte][width*bpp samples], undo the per-row filter (None/
    * Sub/Up/Average/Paeth — byte arithmetic mod 256 against the left/up/
    * upper-left neighbors), and for RGBA drop the alpha channel. Chunk
    * CRCs are not validated: a flipped payload bit yields wrong pixels
    * either way, and every structural hazard (lengths, dims, truncation)
    * is bounds-checked explicitly.
    */
  def decodePng(blob: Array[Byte]): Option[RgbImage] = {
    if (blob.length < 45 || !blob.take(8).sameElements(PngSig)) return None
    // IHDR must be the first chunk, fixed 13-byte payload
    if (beInt(blob, 8) != 13 || blob(12) != 'I' || blob(13) != 'H' || blob(14) != 'D' ||
      blob(15) != 'R') return None
    val w = beInt(blob, 16)
    val h = beInt(blob, 20)
    val bitDepth = blob(24) & 0xff
    val colorType = blob(25) & 0xff
    val compression = blob(26) & 0xff
    val filterMethod = blob(27) & 0xff
    val interlace = blob(28) & 0xff
    if (bitDepth != 8 || (colorType != 2 && colorType != 6)) return None
    if (compression != 0 || filterMethod != 0 || interlace != 0) return None
    if (!dimsOk(w, h)) return None
    val bpp = if (colorType == 6) 4 else 3
    // chunk walk: concatenate IDAT payloads until IEND; Long cursor for
    // the same crafted-length reason as the WAV walk
    val idat = new java.io.ByteArrayOutputStream()
    var i = 33L // 8 signature + 25 IHDR chunk
    var sawEnd = false
    while (!sawEnd && i + 8 <= blob.length) {
      val len = beInt(blob, i.toInt)
      if (len < 0) return None
      val typ = new String(
        blob.slice(i.toInt + 4, i.toInt + 8), java.nio.charset.StandardCharsets.US_ASCII)
      val next = i + 8L + len + 4L // payload + CRC
      if (next > blob.length) return None // truncated chunk
      if (typ == "IDAT") idat.write(blob, i.toInt + 8, len)
      else if (typ == "IEND") sawEnd = true
      i = next
    }
    val comp = idat.toByteArray
    if (comp.isEmpty) return None
    val stride = 1L + w.toLong * bpp
    val rawLen = stride * h // <= MaxPixels * 4 + h, bounded by dimsOk
    if (rawLen > Int.MaxValue - 8) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated/odd stream
        off += n
      }
      if (off < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // undo the per-row filter in place (raw keeps its filter bytes; the
    // sample at (row, k) sits at row*stride + 1 + k)
    val strideI = stride.toInt
    val rowBytes = w * bpp
    var row = 0
    while (row < h) {
      val base = row * strideI
      val filter = raw(base) & 0xff
      if (filter > 4) return None
      var k = 0
      while (k < rowBytes) {
        val x = raw(base + 1 + k) & 0xff
        val a = if (k >= bpp) raw(base + 1 + k - bpp) & 0xff else 0
        val b = if (row > 0) raw(base - strideI + 1 + k) & 0xff else 0
        val c = if (row > 0 && k >= bpp) raw(base - strideI + 1 + k - bpp) & 0xff else 0
        val v = filter match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >> 1)
          case 4 => x + paeth(a, b, c)
        }
        raw(base + 1 + k) = (v & 0xff).toByte
        k += 1
      }
      row += 1
    }
    // emit RGB, dropping alpha for color type 6
    val out = new Array[Byte](w * h * 3)
    row = 0
    while (row < h) {
      var src = row * strideI + 1
      var dst = row * w * 3
      var x = 0
      while (x < w) {
        out(dst) = raw(src)
        out(dst + 1) = raw(src + 1)
        out(dst + 2) = raw(src + 2)
        src += bpp
        dst += 3
        x += 1
      }
      row += 1
    }
    Some(RgbImage(w, h, out))
  }

  /** Decode the FIRST image of a GIF87a/89a stream — GIF's LZW is a
    * self-contained dictionary coder (no external codec library needed,
    * same as PNG's Inflater): variable-width codes 3..12 bits packed
    * LSB-first into 255-byte sub-blocks, a clear code that resets the
    * dictionary, and the one subtle production — code == next (the
    * "KwKwK" case) expands to string(prev) + firstByte(string(prev)).
    * Interlaced images are de-woven through the four spec passes
    * (rows 0%8, 4%8, 2%4, 1%2). Local color tables override the global
    * one; a missing table, an out-of-range pixel index, or a stream that
    * ends before width*height pixels all return None. Later frames of an
    * animation are ignored by construction (first image wins).
    */
  def decodeGif(blob: Array[Byte]): Option[RgbImage] = {
    if (blob.length < 14 || blob(0) != 'G' || blob(1) != 'I' || blob(2) != 'F' ||
      blob(3) != '8' || (blob(4) != '7' && blob(4) != '9') || blob(5) != 'a') return None
    val packed = blob(10) & 0xff
    var i = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val sz = 3 * (1 << ((packed & 7) + 1))
      if (i + sz > blob.length) return None
      gct = java.util.Arrays.copyOfRange(blob, i, i + sz)
      i += sz
    }
    while (i < blob.length) {
      (blob(i) & 0xff) match {
        case 0x3b => return None // trailer before any image
        case 0x21 => // extension: label byte, then length-prefixed sub-blocks
          i += 2
          while (i < blob.length && (blob(i) & 0xff) != 0) i += 1 + (blob(i) & 0xff)
          if (i >= blob.length) return None
          i += 1 // sub-block terminator
        case 0x2c => // image descriptor — decode and return
          if (i + 10 > blob.length) return None
          val fw = leShort(blob, i + 5)
          val fh = leShort(blob, i + 7)
          val ip = blob(i + 9) & 0xff
          i += 10
          var ct = gct
          if ((ip & 0x80) != 0) {
            val sz = 3 * (1 << ((ip & 7) + 1))
            if (i + sz > blob.length) return None
            ct = java.util.Arrays.copyOfRange(blob, i, i + sz)
            i += sz
          }
          if (ct == null || !dimsOk(fw, fh)) return None
          val interlaced = (ip & 0x40) != 0
          if (i >= blob.length) return None
          val minCodeSize = blob(i) & 0xff
          i += 1
          if (minCodeSize < 2 || minCodeSize > 8) return None
          val data = new java.io.ByteArrayOutputStream()
          while (i < blob.length && (blob(i) & 0xff) != 0) {
            val n = blob(i) & 0xff
            if (i + 1 + n > blob.length) return None
            data.write(blob, i + 1, n)
            i += 1 + n
          }
          if (i >= blob.length) return None // missing terminator
          val idx = lzwDecode(data.toByteArray, minCodeSize, fw * fh) match {
            case Some(v) => v
            case None => return None
          }
          // interlace de-weave: source rows arrive in four-pass order
          val rowOrder = new Array[Int](fh)
          if (interlaced) {
            var src = 0
            for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
              var r = start
              while (r < fh) { rowOrder(src) = r; src += 1; r += step }
            }
          } else {
            var r = 0
            while (r < fh) { rowOrder(r) = r; r += 1 }
          }
          val nColors = ct.length / 3
          val out = new Array[Byte](fw * fh * 3)
          var srcRow = 0
          while (srcRow < fh) {
            val dstRow = rowOrder(srcRow)
            var x = 0
            while (x < fw) {
              val ci = idx(srcRow * fw + x) & 0xff
              if (ci >= nColors) return None
              val dst = (dstRow * fw + x) * 3
              out(dst) = ct(ci * 3)
              out(dst + 1) = ct(ci * 3 + 1)
              out(dst + 2) = ct(ci * 3 + 2)
              x += 1
            }
            srcRow += 1
          }
          return Some(RgbImage(fw, fh, out))
        case _ => return None
      }
    }
    None
  }

  /** GIF-variant LZW: decode exactly `expected` color indices from the
    * concatenated image sub-blocks. None on any malformed stream (code
    * past the dictionary frontier, stream exhausted early, overrun).
    */
  private def lzwDecode(
      data: Array[Byte],
      minCodeSize: Int,
      expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val endCode = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097) // longest expansion + the KwKwK push
    val out = new Array[Byte](expected)
    var outN = 0
    var k = 0
    while (k < clear) { prefix(k) = -1; suffix(k) = k.toByte; k += 1 }
    var next = clear + 2
    var width = minCodeSize + 1
    var prev = -1
    var first: Byte = 0
    var bitPos = 0
    val totalBits = data.length * 8
    def readCode(): Int = {
      if (bitPos + width > totalBits) return -1
      var v = 0
      var j = 0
      while (j < width) {
        val p = bitPos + j
        v |= ((data(p >> 3) >> (p & 7)) & 1) << j
        j += 1
      }
      bitPos += width
      v
    }
    while (outN < expected) {
      val code = readCode()
      if (code < 0) return None
      if (code == clear) {
        next = clear + 2
        width = minCodeSize + 1
        prev = -1
      } else if (code == endCode) {
        return None // end before expected pixels
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        out(outN) = suffix(code)
        outN += 1
        prev = code
        first = suffix(code)
      } else {
        // code == next only valid below 4096 (12-bit codes cap at 4095,
        // so a full dictionary admits every code < next and nothing else)
        if (code > next) return None
        var sp = 0
        var c = code
        if (code == next) { // KwKwK: string(prev) + firstByte(string(prev))
          stack(sp) = first // LIFO: pushed first => emitted last
          sp += 1
          c = prev
        }
        while (c >= 0) {
          stack(sp) = suffix(c)
          sp += 1
          c = prefix(c)
        }
        first = stack(sp - 1)
        if (outN + sp > expected) return None // overrun: corrupt stream
        while (sp > 0) {
          sp -= 1
          out(outN) = stack(sp)
          outN += 1
        }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    Some(out)
  }

  /** Try every decodable format. */
  def decode(blob: Array[Byte]): Option[RgbImage] =
    decodeBmp(blob)
      .orElse(decodePpm(blob))
      .orElse(decodePng(blob))
      .orElse(decodeGif(blob))
      .orElse(JpegDecode.decode(blob))

  /** Exact-integer channel means/stddevs over a decoded raster. */
  def channelStats(img: RgbImage): ChannelStats = {
    val n = img.width.toLong * img.height
    var sr = 0L; var sg = 0L; var sb = 0L
    var qr = 0L; var qg = 0L; var qb = 0L
    var i = 0
    while (i < img.rgb.length) {
      val r = img.rgb(i) & 0xff
      val g = img.rgb(i + 1) & 0xff
      val b = img.rgb(i + 2) & 0xff
      sr += r; sg += g; sb += b
      qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
      i += 3
    }
    def mean(s: Long) = s.toDouble / n
    def std(s: Long, q: Long) = {
      val m = mean(s)
      math.sqrt(math.max(0.0, q.toDouble / n - m * m))
    }
    ChannelStats(n, mean(sr), mean(sg), mean(sb), std(sr, qr), std(sg, qg), std(sb, qb))
  }
}
