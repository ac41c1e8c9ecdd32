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
}
