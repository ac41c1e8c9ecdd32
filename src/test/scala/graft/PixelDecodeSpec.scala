package graft

import graft.multimodal.{Multimodal, PixelDecode}
import org.scalatest.funsuite.AnyFunSuite

/** Real pixel decoding over hand-built BMP/PPM byte arrays with KNOWN
  * pixel values: the means/stddevs must be the exact integers' exact
  * statistics, bottom-up vs top-down row order must both land pixels in
  * row-major top-down output, and every unsupported/corrupt flavor must
  * decode to None (feeding the StubCodec fallback), never throw.
  */
class PixelDecodeSpec extends AnyFunSuite {

  private def le4(i: Int) = Array[Byte](
    (i & 0xff).toByte, ((i >> 8) & 0xff).toByte, ((i >> 16) & 0xff).toByte, (i >>> 24).toByte)
  private def le2(i: Int) = Array[Byte]((i & 0xff).toByte, (i >> 8).toByte)

  /** Assemble a BI_RGB 24-bit BMP from row-major TOP-DOWN RGB pixels.
    * `storeTopDown` picks the height sign (negative = top-down storage);
    * bottom-up files get their rows written in reverse, so both store the
    * same logical image.
    */
  private def bmp(w: Int, h: Int, rgbTopDown: Seq[(Int, Int, Int)], storeTopDown: Boolean): Array[Byte] = {
    require(rgbTopDown.size == w * h)
    val stride = ((w * 3 + 3) / 4) * 4
    val pixelOff = 54
    val body = new Array[Byte](stride * h)
    for (row <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbTopDown(row * w + x)
      val fileRow = if (storeTopDown) row else h - 1 - row
      val off = fileRow * stride + x * 3
      body(off) = b.toByte; body(off + 1) = g.toByte; body(off + 2) = r.toByte
    }
    "BM".getBytes ++ le4(pixelOff + body.length) ++ le4(0) ++ le4(pixelOff) ++
      le4(40) ++ le4(w) ++ le4(if (storeTopDown) -h else h) ++ le2(1) ++ le2(24) ++
      le4(0) ++ le4(body.length) ++ le4(2835) ++ le4(2835) ++ le4(0) ++ le4(0) ++ body
  }

  // 3x2 image: top row solid red/green/blue, bottom row black/white/gray.
  // Width 3 -> 9 row bytes -> stride 12: the 3 padding bytes per row must
  // NOT leak into the decoded raster.
  private val pix = Seq(
    (255, 0, 0), (0, 255, 0), (0, 0, 255),
    (0, 0, 0), (255, 255, 255), (128, 128, 128))

  test("BMP 24-bit: bottom-up and top-down storage decode to the same top-down raster") {
    for (topDown <- Seq(false, true)) {
      val img = PixelDecode.decodeBmp(bmp(3, 2, pix, topDown))
        .getOrElse(fail(s"decode failed, topDown=$topDown"))
      assert(img.width == 3 && img.height == 2)
      val got = img.rgb.grouped(3).map(a => (a(0) & 0xff, a(1) & 0xff, a(2) & 0xff)).toSeq
      assert(got == pix, s"topDown=$topDown: $got")
    }
  }

  test("channel stats are the exact integer statistics of the known pixels") {
    val s = PixelDecode.channelStats(
      PixelDecode.decodeBmp(bmp(3, 2, pix, storeTopDown = false)).get)
    assert(s.nPixels == 6)
    // exact means: R (255+0+0+0+255+128)/6, G (0+255+0+0+255+128)/6, B (0+0+255+0+255+128)/6
    assert(s.meanR == 638.0 / 6 && s.meanG == 638.0 / 6 && s.meanB == 638.0 / 6)
    val varR = (255.0 * 255 * 2 + 128.0 * 128) / 6 - s.meanR * s.meanR
    assert(math.abs(s.stdR - math.sqrt(varR)) < 1e-9)
  }

  test("PPM P6 with comments decodes; maxval > 255 and truncation do not") {
    val hdr = "P6\n# a comment\n3 2\n255\n".getBytes
    val raster = pix.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }.toArray
    val img = PixelDecode.decodePpm(hdr ++ raster).getOrElse(fail("P6 decode failed"))
    assert(img.width == 3 && img.height == 2)
    assert(img.rgb.toSeq == raster.toSeq)
    assert(PixelDecode.decodePpm("P6 3 2 65535\n".getBytes ++ raster ++ raster).isEmpty,
      "16-bit maxval is not decodable here")
    assert(PixelDecode.decodePpm(hdr ++ raster.take(10)).isEmpty, "truncated raster")
    // maxval running straight into raster bytes (no whitespace separator)
    // is malformed — must be None, not a silently one-byte-off decode
    assert(PixelDecode.decodePpm("P6 3 2 255".getBytes ++ raster).isEmpty,
      "missing header/raster separator byte")
    // decode() dispatches: BMP bytes via the BMP path, PPM via PPM
    assert(PixelDecode.decode(hdr ++ raster).nonEmpty)
    assert(PixelDecode.decode(bmp(3, 2, pix, storeTopDown = false)).nonEmpty)
  }

  /** Assemble a non-interlaced 8-bit PNG from row-major top-down pixels,
    * FORWARD-filtering each row with the given filter type (so the
    * decoder's unfilter of every type is checked against ground-truth
    * pixels) and deflating with the JDK Deflater.
    */
  private def png(
      w: Int,
      h: Int,
      px: Seq[Seq[Int]], // per pixel: RGB (3) or RGBA (4) samples
      rowFilters: Seq[Int],
      colorType: Int = 2): Array[Byte] = {
    val bpp = if (colorType == 6) 4 else 3
    require(px.size == w * h && rowFilters.size == h && px.forall(_.size == bpp))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val rowBytes = w * bpp
    val plain = Array.tabulate(h, rowBytes)((r, k) => px(r * w + k / bpp)(k % bpp))
    val raw = new java.io.ByteArrayOutputStream()
    for (r <- 0 until h) {
      val f = rowFilters(r)
      raw.write(f)
      for (k <- 0 until rowBytes) {
        val x = plain(r)(k)
        val a = if (k >= bpp) plain(r)(k - bpp) else 0
        val b = if (r > 0) plain(r - 1)(k) else 0
        val c = if (r > 0 && k >= bpp) plain(r - 1)(k - bpp) else 0
        val filtered = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - ((a + b) >> 1)
          case 4 => x - paeth(a, b, c)
        }
        raw.write(filtered & 0xff)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw.toByteArray)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    def be4(i: Int) = Array[Byte]((i >>> 24).toByte, (i >> 16).toByte, (i >> 8).toByte, i.toByte)
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes); crc.update(payload)
      be4(payload.length) ++ typ.getBytes ++ payload ++ be4(crc.getValue.toInt)
    }
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be4(w) ++ be4(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", comp.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("PNG: every filter type unfilters back to the ground-truth pixels") {
    val rgb = pix.map { case (r, g, b) => Seq(r, g, b) }
    // 3x2 image, one row per filter across two files: None/Sub then Up/Avg
    for (filters <- Seq(Seq(0, 1), Seq(2, 3), Seq(4, 4), Seq(1, 4))) {
      val img = PixelDecode.decodePng(png(3, 2, rgb, filters))
        .getOrElse(fail(s"decode failed, filters=$filters"))
      assert(img.width == 3 && img.height == 2)
      val got = img.rgb.grouped(3).map(a => (a(0) & 0xff, a(1) & 0xff, a(2) & 0xff)).toSeq
      assert(got == pix, s"filters=$filters: $got")
    }
    // stats parity with the BMP twin of the same image
    val viaPng = PixelDecode.channelStats(PixelDecode.decodePng(png(3, 2, rgb, Seq(4, 1))).get)
    val viaBmp = PixelDecode.channelStats(PixelDecode.decodeBmp(bmp(3, 2, pix, false)).get)
    assert(viaPng == viaBmp, "identical pixels must give identical stats across containers")
  }

  test("PNG: RGBA drops alpha; decode() dispatches PNG bytes") {
    val rgba = pix.map { case (r, g, b) => Seq(r, g, b, 77) }
    val img = PixelDecode.decodePng(png(3, 2, rgba, Seq(4, 3), colorType = 6))
      .getOrElse(fail("RGBA decode failed"))
    val got = img.rgb.grouped(3).map(a => (a(0) & 0xff, a(1) & 0xff, a(2) & 0xff)).toSeq
    assert(got == pix, s"alpha must be dropped: $got")
    assert(PixelDecode.decode(png(3, 2, rgba, Seq(0, 0), colorType = 6)).nonEmpty)
  }

  test("PNG: unsupported flavors and corrupt streams return None, never throw") {
    val rgb = pix.map { case (r, g, b) => Seq(r, g, b) }
    val good = png(3, 2, rgb, Seq(0, 0))
    // palette color type
    val pal = good.clone(); pal(25) = 3
    assert(PixelDecode.decodePng(pal).isEmpty, "palette PNG needs a PLTE decoder")
    // 16-bit depth
    val deep = good.clone(); deep(24) = 16
    assert(PixelDecode.decodePng(deep).isEmpty)
    // Adam7 interlace
    val adam = good.clone(); adam(28) = 1
    assert(PixelDecode.decodePng(adam).isEmpty)
    // truncated IDAT: drop the tail (inflate cannot complete)
    assert(PixelDecode.decodePng(good.dropRight(20)).isEmpty)
    // garbage where the zlib stream should be
    val junk = png(3, 2, rgb, Seq(0, 0))
    var j = 41 // first IDAT payload byte (8 sig + 25 IHDR + 8 len/type)
    while (j < junk.length - 16) { junk(j) = 0x55; j += 1 }
    assert(PixelDecode.decodePng(junk).isEmpty)
    // 1 GPix dims rejected before any allocation
    val huge = good.clone()
    System.arraycopy(Array[Byte](0, 1, 0, 0), 0, huge, 16, 4) // w = 65536
    System.arraycopy(Array[Byte](0, 1, 0, 0), 0, huge, 20, 4) // h = 65536
    assert(PixelDecode.decodePng(huge).isEmpty)
  }

  test("unsupported and corrupt flavors return None, never throw") {
    val good = bmp(3, 2, pix, storeTopDown = false)
    assert(PixelDecode.decodeBmp("BMjunk".getBytes).isEmpty, "truncated header")
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(PixelDecode.decodeBmp(bpp8).isEmpty, "8-bit BMP is palette-indexed")
    val rle = good.clone(); rle(30) = 1
    assert(PixelDecode.decodeBmp(rle).isEmpty, "RLE compression")
    val truncated = good.dropRight(5)
    assert(PixelDecode.decodeBmp(truncated).isEmpty, "pixel array shorter than declared dims")
    // 1 GPix dimensions: rejected by the MaxPixels bound, no allocation
    val huge = good.clone()
    System.arraycopy(le4(40000), 0, huge, 18, 4)
    System.arraycopy(le4(30000), 0, huge, 22, 4)
    assert(PixelDecode.decodeBmp(huge).isEmpty)
    // Int.MinValue height: abs() is still negative in Int — must not wrap
    val minH = good.clone()
    System.arraycopy(le4(Int.MinValue), 0, minH, 22, 4)
    assert(PixelDecode.decodeBmp(minH).isEmpty)
  }

  test("PixelCodec: real stats for decodable media, StubCodec fallback otherwise") {
    val stats = Multimodal.PixelCodec.StatsDim
    val rec = Multimodal.MediaRecord(1L, "image", bmp(3, 2, pix, storeTopDown = false), 3, 2, 0)
    val f = Multimodal.PixelCodec.decodeFeatures(rec)
    assert(f.length == Multimodal.PixelCodec.FeatureDim && f(0) == 1f)
    assert(math.abs(f(1) - (638.0 / 6 / 255.0).toFloat) < 1e-6)
    assert(f.drop(stats).forall(_ == 0f), "decoded records zero the histogram slots")
    val opaque = Multimodal.MediaRecord(2L, "image", Array[Byte](9, 9, 9, 9), 0, 0, 0)
    val fb = Multimodal.PixelCodec.decodeFeatures(opaque)
    // ONE declared width for both paths — never ragged
    assert(fb.length == Multimodal.PixelCodec.FeatureDim)
    assert(fb(0) == 0f, "fallback records clear the decoded flag")
    assert(fb.slice(1, stats).forall(_ == 0f), "fallback records zero the stat slots")
    assert(fb.drop(stats).toSeq == Multimodal.StubCodec.decodeFeatures(opaque).toSeq,
      "undecodable payloads carry the stub histogram in the tail slots")
  }

  // ---- GIF ------------------------------------------------------------------

  /** GIF-variant LZW encoder for test fixtures: standard dictionary
    * build, codes packed LSB-first. The code WIDTH mirrors the decoder's
    * entry-count rule exactly (the decoder lags the encoder's dictionary
    * by one entry, so its width bump lands one code later than a naive
    * next_e == 2^w encoder bump — the classic GIF "late change").
    */
  private def lzwEncode(indices: Seq[Int], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var cur = 0L
    var nbits = 0
    var width = minCodeSize + 1
    var emitted = 0 // pixel codes since clear, to mirror the decoder width
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits
      nbits += width
      while (nbits >= 8) { out += (cur & 0xff).toByte; cur >>= 8; nbits -= 8 }
    }
    def putPixelCode(code: Int): Unit = {
      put(code)
      emitted += 1
      // decoder after its k-th pixel code has next = clear + 1 + k
      if (clear + 1 + emitted == (1 << width) && width < 12) width += 1
    }
    val dict = scala.collection.mutable.Map[(Int, Int), Int]()
    var next = clear + 2
    put(clear)
    var prev = -1
    for (b <- indices) {
      if (prev < 0) prev = b
      else dict.get((prev, b)) match {
        case Some(c) => prev = c
        case None =>
          putPixelCode(prev)
          if (next < 4096) { dict((prev, b)) = next; next += 1 }
          prev = b
      }
    }
    if (prev >= 0) putPixelCode(prev)
    put(clear + 1) // end code
    if (nbits > 0) out += (cur & 0xff).toByte
    out.toArray
  }

  /** Assemble a single-image GIF with a global color table; indices are
    * LOGICAL top-down row-major — for `interlaced` the builder stores
    * rows in the four-pass spec order so decode must de-weave them.
    */
  private def gif(
      w: Int,
      h: Int,
      palette: Seq[(Int, Int, Int)],
      indices: Seq[Int],
      minCodeSize: Int,
      interlaced: Boolean = false): Array[Byte] = {
    require(indices.size == w * h && palette.size <= (1 << minCodeSize))
    var gctExp = 0 // field n: table holds 2^(n+1) entries
    while ((2 << gctExp) < palette.size) gctExp += 1
    val table = palette.padTo(2 << gctExp, (0, 0, 0)).flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte)
    }
    val rowOrder =
      if (interlaced) Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (s, st) => s until h by st }
      else 0 until h
    val stored = rowOrder.flatMap(r => indices.slice(r * w, (r + 1) * w))
    val lzw = lzwEncode(stored, minCodeSize)
    val sub = lzw.grouped(255).flatMap(b => Array(b.length.toByte) ++ b).toArray
    "GIF89a".getBytes ++ le2(w) ++ le2(h) ++ Array((0x80 | gctExp).toByte, 0.toByte, 0.toByte) ++
      table ++
      Array(0x2c.toByte) ++ le2(0) ++ le2(0) ++ le2(w) ++ le2(h) ++
      Array((if (interlaced) 0x40 else 0).toByte, minCodeSize.toByte) ++
      sub ++ Array(0.toByte, 0x3b.toByte)
  }

  test("GIF: LZW round-trip recovers the ground-truth pixels; stats match the BMP twin") {
    val img = PixelDecode.decodeGif(gif(3, 2, pix, 0 until 6, 3))
      .getOrElse(fail("GIF decode failed"))
    assert(img.width == 3 && img.height == 2)
    val got = img.rgb.grouped(3).map(a => (a(0) & 0xff, a(1) & 0xff, a(2) & 0xff)).toSeq
    assert(got == pix, s"decoded $got")
    val viaGif = PixelDecode.channelStats(img)
    val viaBmp = PixelDecode.channelStats(PixelDecode.decodeBmp(bmp(3, 2, pix, false)).get)
    assert(viaGif == viaBmp, "identical pixels must give identical stats across containers")
    assert(PixelDecode.decode(gif(3, 2, pix, 0 until 6, 3)).nonEmpty, "decode() dispatches GIF")
  }

  test("GIF: runs (KwKwK), dictionary growth across width bumps, and interlace de-weave") {
    // long same-index runs force code == next immediately; 24x24 of
    // patterned data grows the dictionary past the 3->4->5 bit bumps
    val pal4 = Seq((10, 20, 30), (200, 100, 0), (0, 0, 0), (255, 255, 255))
    val w = 24; val h = 24
    val patterned = (0 until w * h).map(i => ((i * 7) / 11 + i / w) % 4)
    val runs = Seq.fill(w * h)(1)
    for (ix <- Seq(patterned, runs)) {
      val img = PixelDecode.decodeGif(gif(w, h, pal4, ix, 2))
        .getOrElse(fail("decode failed"))
      val got = img.rgb.grouped(3).map(a => (a(0) & 0xff, a(1) & 0xff, a(2) & 0xff)).toSeq
      assert(got == ix.map(pal4), "pixel-exact round-trip")
    }
    // interlaced: stored pass order 0,8,16 / 4,12,20 / 2,6,... must de-weave
    val img = PixelDecode.decodeGif(gif(w, h, pal4, patterned, 2, interlaced = true))
      .getOrElse(fail("interlaced decode failed"))
    val got = img.rgb.grouped(3).map(a => (a(0) & 0xff, a(1) & 0xff, a(2) & 0xff)).toSeq
    assert(got == patterned.map(pal4), "interlaced rows land top-down")
  }

  test("GIF: extensions are skipped; corrupt flavors return None, never throw") {
    val good = gif(3, 2, pix, 0 until 6, 3)
    // splice a graphic-control extension (0x21 0xf9, 4-byte block) after the GCT
    val gctEnd = 13 + 3 * 8
    val ext = Array[Byte](0x21.toByte, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val withExt = good.take(gctEnd) ++ ext ++ good.drop(gctEnd)
    assert(PixelDecode.decodeGif(withExt).map(_.rgb.toSeq) == PixelDecode.decodeGif(good).map(_.rgb.toSeq))
    assert(PixelDecode.decodeGif("GIF89a".getBytes).isEmpty, "truncated header")
    assert(PixelDecode.decodeGif(good.dropRight(8)).isEmpty, "truncated LZW stream")
    val noTable = good.clone(); noTable(10) = 0 // GCT flag off but table bytes still inline
    assert(PixelDecode.decodeGif(noTable).isEmpty, "no color table -> undecodable")
    // an index past the palette: 1x1 image whose only code is out of range
    val tiny = gif(1, 1, Seq((1, 2, 3)), Seq(0), 2)
    assert(PixelDecode.decodeGif(tiny).nonEmpty)
    // first pixel code references a non-root (> clear): hand-built stream
    val bad = tiny.clone()
    // LZW data sub-block starts after 13 hdr + 12 GCT(2^3... minCode 2 -> 2<<0? ) — locate: find 0x2c
    val descAt = bad.indexOf(0x2c.toByte)
    val lzwAt = descAt + 10 + 1 // descriptor + minCode byte = first sub-block length
    // overwrite the packed stream with code 6 (= clear+2, past frontier) after clear
    // clear=4 end=5 width=3: bits = 100 then 110 -> byte 0b00110100 = 0x34
    bad(lzwAt + 1) = 0x34.toByte
    assert(PixelDecode.decodeGif(bad).isEmpty, "code past the dictionary frontier")
  }
}
