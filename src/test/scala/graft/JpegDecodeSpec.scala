package graft

import graft.multimodal.{JpegDecode, MediaFixtures, PixelDecode}
import org.scalatest.funsuite.AnyFunSuite

/** The JPEG plane, held to two INDEPENDENT rulers:
  *
  *  1. the flat-tile gate fixtures must decode to their declared pixel
  *     truth exactly (DC-only streams are lossless — see MediaFixtures);
  *  2. the JDK's own ImageIO JPEG codec (a libjpeg lineage wholly
  *     independent of this repo) must agree — it decodes our fixtures to
  *     the same truth, and our decoder reproduces its decode of an
  *     ImageIO-ENCODED gradient (standard Annex-K tables, real AC
  *     coefficients) within ±1 per sample (IDCT implementations may
  *     legitimately differ by one in the last place).
  */
class JpegDecodeSpec extends AnyFunSuite {

  private def fixture(id: Long) = MediaFixtures.fixtures.find(_.mediaId == id).get

  private def decodeTruth(id: Long): Unit = {
    val f = fixture(id)
    val img = JpegDecode.decode(f.blob).getOrElse(fail(s"fixture $id did not decode"))
    assert(img.width * img.height == f.truth.size)
    val got = img.rgb.grouped(3).map(p => ((p(0) & 0xff), (p(1) & 0xff), (p(2) & 0xff))).toSeq
    assert(got == f.truth, s"fixture $id pixel mismatch")
  }

  test("grayscale flat-tile fixture decodes bit-exactly (odd crop)")(decodeTruth(10L))
  test("4:4:4 fixture with restart markers decodes bit-exactly")(decodeTruth(11L))
  test("4:2:0 colored-chroma fixture decodes bit-exactly")(decodeTruth(12L))
  test("PROGRESSIVE grayscale fixture decodes bit-exactly (odd crop)")(decodeTruth(14L))
  test("PROGRESSIVE 4:2:0 fixture decodes bit-exactly")(decodeTruth(15L))

  test("truncated JPEG scan returns None, never garbage") {
    assert(JpegDecode.decode(fixture(13L).blob).isEmpty)
    assert(PixelDecode.decode(fixture(13L).blob).isEmpty)
  }

  test("baseline stream relabeled SOF2 is rejected (illegal progressive scan header)") {
    // a sequential scan header (Ss=0, Se=63) is malformed under
    // progressive rules — a DC scan is exactly the [0,0] band — so the
    // never-garbage contract still holds for mislabeled streams
    val b = fixture(10L).blob.clone()
    val sof = b.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(sof > 0)
    b(sof + 1) = 0xc2.toByte
    assert(JpegDecode.decode(b).isEmpty)
  }

  private def imageIoDecode(blob: Array[Byte]): Option[java.awt.image.BufferedImage] =
    Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob)))

  test("ImageIO independently decodes every gate fixture to the declared truth") {
    for (id <- Seq(10L, 11L, 12L, 14L, 15L)) {
      val f = fixture(id)
      val bi = imageIoDecode(f.blob).getOrElse(fail(s"ImageIO rejected fixture $id"))
      val w = bi.getWidth
      assert(w * bi.getHeight == f.truth.size)
      val gray = bi.getColorModel.getNumComponents == 1
      f.truth.zipWithIndex.foreach { case ((r, g, b), i) =>
        // raw raster samples: getRGB on TYPE_BYTE_GRAY would push the
        // values through a linear-gray -> sRGB ICC transform
        val got =
          if (gray) {
            val s = bi.getRaster.getSample(i % w, i / w, 0); (s, s, s)
          } else {
            val argb = bi.getRGB(i % w, i / w)
            ((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
          }
        assert(got == ((r, g, b)), s"fixture $id pixel $i: ImageIO=$got truth=${(r, g, b)}")
      }
    }
  }

  test("our decoder matches ImageIO's decode of an ImageIO-encoded gradient") {
    // real AC coefficients + standard Huffman tables, grayscale (no
    // subsampling/color-convert variance in the comparison)
    val w = 40; val h = 24
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 255 / (w - 1) + y * 7 + (x * y) % 31) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bos))
    val blob = bos.toByteArray

    val ours = JpegDecode.decode(blob).getOrElse(fail("our decoder rejected ImageIO output"))
    val theirs = imageIoDecode(blob).get
    assert(ours.width == w && ours.height == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val o = ours.rgb((y * w + x) * 3) & 0xff
      val t = theirs.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(o - t))
    }
    assert(maxDiff <= 1, s"max per-sample divergence $maxDiff > 1")
  }

  /** Encode with the JDK's writer in PROGRESSIVE mode (libjpeg's default
    * multi-scan script: DC successive approximation + AC spectral bands
    * with refinement passes and EOBRUNs) and require our decoder to
    * match ImageIO's own decode of the same bytes.
    */
  private def imageIoProgressive(bi: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    ios.close(); writer.dispose()
    val blob = bos.toByteArray
    // make sure the writer really produced SOF2, or the test is vacuous
    assert(blob.indexOfSlice(Seq(0xff.toByte, 0xc2.toByte)) > 0, "writer did not emit SOF2")
    blob
  }

  test("progressive grayscale: our decoder matches ImageIO on its own multi-scan output") {
    val w = 40; val h = 24
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, (x * 255 / (w - 1) + y * 7 + (x * y) % 31) % 256)
    val blob = imageIoProgressive(bi)
    val ours = JpegDecode.decode(blob).getOrElse(fail("our decoder rejected progressive output"))
    val theirs = imageIoDecode(blob).get
    assert(ours.width == w && ours.height == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val o = ours.rgb((y * w + x) * 3) & 0xff
      val t = theirs.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(o - t))
    }
    assert(maxDiff <= 1, s"progressive max per-sample divergence $maxDiff > 1")
  }

  test("progressive color (subsampled): our decoder matches ImageIO within chroma-replication tolerance") {
    val w = 37; val h = 29 // non-multiple-of-8/16: exercises partial MCUs in every scan kind
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 11 + y * 3) % 256; val g = (255 - x * 7 + y * 5) % 256; val b = (x * y) % 256
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val blob = imageIoProgressive(bi)
    val ours = JpegDecode.decode(blob).getOrElse(fail("our decoder rejected progressive output"))
    val theirs = imageIoDecode(blob).get
    // luma path is exact-to-±1; chroma differs only by our documented
    // replication (vs libjpeg's fancy triangle) upsampling, so compare
    // WHOLE-IMAGE channel means, which upsampling barely moves
    def mean(ch: Int, f: (Int, Int) => Int): Double =
      (0 until h).flatMap(y => (0 until w).map(x => f(x, y))).sum.toDouble / (w * h)
    for (ch <- 0 until 3) {
      val om = mean(ch, (x, y) => ours.rgb((y * w + x) * 3 + ch) & 0xff)
      val tm = mean(ch, (x, y) => (theirs.getRGB(x, y) >> (16 - 8 * ch)) & 0xff)
      assert(math.abs(om - tm) < 2.0, s"channel $ch mean diverged: ours=$om imageio=$tm")
    }
    // truncating the entropy stream of ANY scan must never yield pixels
    assert(JpegDecode.decode(blob.dropRight(blob.length / 3)).isEmpty)
  }
}
