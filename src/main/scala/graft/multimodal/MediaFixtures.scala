package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The m1_pixel_stats oracle gate: deterministic in-code media fixtures
  * whose pixel content is DEFINED as integer tuples, encoded into real
  * container bytes (BMP bottom-up/top-down, PPM, PNG RGB/RGBA across all
  * five row filters, GIF plain and interlaced through the LZW coder,
  * plus undecodable streams), decoded back through the DISTRIBUTED
  * [[PixelDecode]] path, and summarized as exact integer channel
  * statistics.
  *
  * The two gate sides never share a derivation: the Spark result decodes
  * the encoded BYTES (container parsing, inflate, unfilter), while
  * [[oracleSql]] is a VALUES literal computed from the ground-truth pixel
  * TUPLES by plain integer arithmetic at string-build time — if encoder
  * and decoder ever agreed on a wrong byte layout, the tuples would not
  * match and the hash would diverge. Statistics are integer sums/sums of
  * squares (exact in Long far past any real image), following the repo's
  * integer-oracle discipline; means/stddevs are derived downstream.
  */
object MediaFixtures {

  /** One fixture: declared format label (what [[ImageHeaders.probe]]
    * must report), ground-truth pixels (empty for undecodable streams),
    * and the encoded container bytes.
    */
  final case class Fixture(
      mediaId: Long,
      format: String,
      truth: Seq[(Int, Int, Int)],
      blob: Array[Byte])

  private val W = 8
  private val H = 5

  /** Deterministic pixel pattern — varies by fixture so no two fixtures
    * share statistics.
    */
  private def pixels(k: Int): Seq[(Int, Int, Int)] =
    (0 until W * H).map { i =>
      (((k * 37 + i * 11) % 256), ((k * 53 + i * 7) % 256), ((k * 29 + i * 13) % 256))
    }

  // ---- container encoders (forward direction of PixelDecode's parsers) --

  private def le4(i: Int) = Array[Byte](
    (i & 0xff).toByte, ((i >> 8) & 0xff).toByte, ((i >> 16) & 0xff).toByte, (i >>> 24).toByte)
  private def le2(i: Int) = Array[Byte]((i & 0xff).toByte, (i >> 8).toByte)
  private def be4(i: Int) = Array[Byte](
    (i >>> 24).toByte, ((i >> 16) & 0xff).toByte, ((i >> 8) & 0xff).toByte, (i & 0xff).toByte)

  private[multimodal] def bmpBytes(
      px: Seq[(Int, Int, Int)],
      w: Int,
      h: Int,
      storeTopDown: Boolean): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val pixelOff = 54
    val body = new Array[Byte](stride * h)
    for (row <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(row * w + x)
      val fileRow = if (storeTopDown) row else h - 1 - row
      val off = fileRow * stride + x * 3
      body(off) = b.toByte; body(off + 1) = g.toByte; body(off + 2) = r.toByte
    }
    "BM".getBytes ++ le4(pixelOff + body.length) ++ le4(0) ++ le4(pixelOff) ++
      le4(40) ++ le4(w) ++ le4(if (storeTopDown) -h else h) ++ le2(1) ++ le2(24) ++
      le4(0) ++ le4(body.length) ++ le4(2835) ++ le4(2835) ++ le4(0) ++ le4(0) ++ body
  }

  private def ppmBytes(px: Seq[(Int, Int, Int)], w: Int, h: Int): Array[Byte] =
    s"P6\n# graft fixture\n$w $h\n255\n".getBytes ++
      px.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }.toArray

  /** Forward-filtered, deflated PNG; `alpha >= 0` switches to RGBA with
    * that constant alpha byte (dropped by the decoder).
    */
  private[multimodal] def pngBytes(
      px: Seq[(Int, Int, Int)],
      w: Int,
      h: Int,
      rowFilters: Seq[Int],
      alpha: Int): Array[Byte] = {
    val bpp = if (alpha >= 0) 4 else 3
    val colorType = if (alpha >= 0) 6 else 2
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val rowBytes = w * bpp
    val plain = Array.tabulate(h, rowBytes) { (r, k) =>
      val (pr, pg, pb) = px(r * w + k / bpp)
      (k % bpp) match { case 0 => pr; case 1 => pg; case 2 => pb; case _ => alpha }
    }
    val raw = new java.io.ByteArrayOutputStream()
    for (r <- 0 until h) {
      val f = rowFilters(r % rowFilters.size)
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
    val buf = new Array[Byte](512)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
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

  /** Palette-quantized GIF with its LZW forward coder (the encoder's
    * code-width schedule mirrors the decoder's entry-count rule — the
    * GIF "late change"); `interlaced` stores rows in the four-pass spec
    * order so decode must de-weave them.
    */
  private[multimodal] def gifBytes(
      px: Seq[(Int, Int, Int)],
      w: Int,
      h: Int,
      interlaced: Boolean): Array[Byte] = {
    val palette = px.distinct
    require(palette.size <= 256, "GIF palette cap")
    var minCode = 2
    while ((1 << minCode) < palette.size) minCode += 1
    val index = palette.zipWithIndex.toMap
    val clear = 1 << minCode
    var gctExp = 0
    while ((2 << gctExp) < palette.size) gctExp += 1
    val table = palette.padTo(2 << gctExp, (0, 0, 0)).flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte)
    }
    val rowOrder =
      if (interlaced) Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap { case (s, st) => s until h by st }
      else 0 until h
    val stored = rowOrder.flatMap(r => px.slice(r * w, (r + 1) * w)).map(index)
    // LZW: codes LSB-first; width bump when the DECODER's entry count
    // (clear + 1 + emitted) reaches 2^width
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    var cur = 0L; var nbits = 0; var width = minCode + 1; var emitted = 0
    def put(code: Int): Unit = {
      cur |= code.toLong << nbits; nbits += width
      while (nbits >= 8) { out += (cur & 0xff).toByte; cur >>= 8; nbits -= 8 }
    }
    def putPixel(code: Int): Unit = {
      put(code); emitted += 1
      if (clear + 1 + emitted == (1 << width) && width < 12) width += 1
    }
    val dict = scala.collection.mutable.Map[(Int, Int), Int]()
    var next = clear + 2
    put(clear)
    var prev = -1
    for (b <- stored) {
      if (prev < 0) prev = b
      else dict.get((prev, b)) match {
        case Some(c) => prev = c
        case None =>
          putPixel(prev)
          if (next < 4096) { dict((prev, b)) = next; next += 1 }
          prev = b
      }
    }
    if (prev >= 0) putPixel(prev)
    put(clear + 1)
    if (nbits > 0) out += (cur & 0xff).toByte
    val sub = out.toArray.grouped(255).flatMap(b => Array(b.length.toByte) ++ b).toArray
    "GIF89a".getBytes ++ le2(w) ++ le2(h) ++
      Array((0x80 | gctExp).toByte, 0.toByte, 0.toByte) ++ table ++
      Array(0x2c.toByte) ++ le2(0) ++ le2(0) ++ le2(w) ++ le2(h) ++
      Array((if (interlaced) 0x40 else 0).toByte, minCode.toByte) ++
      sub ++ Array(0.toByte, 0x3b.toByte)
  }

  /** Baseline JPEG encoder for FLAT-TILE images: every 8×8 block holds one
    * constant sample per component, so the entropy stream is DC-only and
    * ANY correct decoder reconstructs the declared pixels EXACTLY — with
    * DC quant 8 and coefficient v−128, the dequantized DC is 8(v−128)
    * whose IDCT is the flat value (8·dc+4)>>3 = dc, no rounding anywhere
    * (that is what makes a LOSSY codec oracle-gateable bit-exactly).
    * Custom canonical Huffman tables: DC categories 0–8 as the nine
    * 5-bit codes 00000–01000, AC as a single 2-bit EOB — exercised
    * against the standard Annex-K tables in JpegDecodeSpec via ImageIO.
    *
    * `chroma`: None → grayscale; Some((cb, cr, sub)) → YCbCr where each
    * chroma block is constant (per MCU when `sub`, i.e. 4:2:0 — constant
    * chroma also makes the upsampling filter irrelevant, so replication
    * and "fancy" decoders agree). `restartEvery` > 0 emits DRI + RSTn.
    */
  private def jpegBytes(
      w: Int,
      h: Int,
      luma: (Int, Int) => Int,
      chroma: Option[((Int, Int) => Int, (Int, Int) => Int, Boolean)],
      restartEvery: Int = 0): Array[Byte] = {
    val sub = chroma.exists(_._3)
    val mcuPx = if (sub) 16 else 8
    val mcusX = (w + mcuPx - 1) / mcuPx
    val mcusY = (h + mcuPx - 1) / mcuPx

    val entropy = scala.collection.mutable.ArrayBuffer[Byte]()
    var cur = 0; var nb = 0
    def emitByte(): Unit = {
      entropy += cur.toByte
      if ((cur & 0xff) == 0xff) entropy += 0.toByte // byte stuffing
      cur = 0; nb = 0
    }
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >> i) & 1); nb += 1
        if (nb == 8) emitByte()
        i -= 1
      }
    }
    def flushOnes(): Unit = if (nb > 0) { while (nb < 8) { cur = (cur << 1) | 1; nb += 1 }; emitByte() }
    def category(v: Int): Int = { var t = 0; var a = math.abs(v); while (a > 0) { t += 1; a >>= 1 }; t }
    def putBlock(dcq: Int, pred: Int): Int = {
      val diff = dcq - pred
      val t = category(diff)
      put(t, 5) // DC huffman: symbol s == code s at length 5
      if (t > 0) put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      put(0, 2) // AC huffman: EOB
      dcq
    }

    var predY = 0; var predCb = 0; var predCr = 0
    var mcu = 0
    var rst = 0
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (restartEvery > 0 && mcu > 0 && mcu % restartEvery == 0) {
        flushOnes()
        entropy += 0xff.toByte += (0xd0 | rst).toByte
        rst = (rst + 1) % 8
        predY = 0; predCb = 0; predCr = 0
      }
      if (sub) {
        for (by <- 0 until 2; bx <- 0 until 2)
          predY = putBlock(luma(mx * 2 + bx, my * 2 + by) - 128, predY)
      } else predY = putBlock(luma(mx, my) - 128, predY)
      chroma.foreach { case (cb, cr, _) =>
        predCb = putBlock(cb(mx, my) - 128, predCb)
        predCr = putBlock(cr(mx, my) - 128, predCr)
      }
      mcu += 1
    }
    flushOnes()

    def be2(i: Int) = Array[Byte]((i >> 8).toByte, (i & 0xff).toByte)
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte) ++ be2(payload.length + 2) ++ payload
    // quant table 0 in zigzag order: DC 8, AC 16 (unused — all AC zero)
    val dqt = seg(0xdb, Array(0x00.toByte) ++ Array.tabulate[Byte](64)(i => if (i == 0) 8 else 16))
    val ncomp = if (chroma.isDefined) 3 else 1
    val sofComps = (1 to ncomp).flatMap { cid =>
      val hv = if (cid == 1 && sub) 0x22 else 0x11
      Seq(cid.toByte, hv.toByte, 0.toByte)
    }.toArray
    val sof = seg(0xc0, Array(8.toByte) ++ be2(h) ++ be2(w) ++ Array(ncomp.toByte) ++ sofComps)
    val dcBits = new Array[Byte](16); dcBits(4) = 9 // nine 5-bit codes
    val acBits = new Array[Byte](16); acBits(1) = 1 // one 2-bit code
    val dht = seg(0xc4,
      Array(0x00.toByte) ++ dcBits ++ Array.tabulate[Byte](9)(_.toByte) ++
        Array(0x10.toByte) ++ acBits ++ Array[Byte](0x00))
    val dri = if (restartEvery > 0) seg(0xdd, be2(restartEvery)) else Array.empty[Byte]
    val sosComps = (1 to ncomp).flatMap(cid => Seq(cid.toByte, 0x00.toByte)).toArray
    val sos = seg(0xda, Array(ncomp.toByte) ++ sosComps ++ Array[Byte](0, 63, 0))
    Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++ dht ++ dri ++ sos ++
      entropy.toArray ++ Array(0xff.toByte, 0xd9.toByte)
  }

  /** PROGRESSIVE (SOF2) twin of [[jpegBytes]]: the same DC-only flat
    * tiles (still bit-exact through the IDCT) emitted as a legal
    * multi-scan progressive stream — DC first pass with a 1-bit point
    * transform (Al=1), a DC successive-approximation refinement scan
    * (raw bits, no huffman), then one non-interleaved AC scan per
    * component (Ss=1..63) of pure end-of-band codes. Exercises the
    * progressive scan plumbing (interleaved vs component block order,
    * point-transform accumulation, multi-SOS parsing) under the gate's
    * exactness contract; real AC/EOBRUN/refinement entropy paths are
    * covered against ImageIO's own progressive encoder in JpegDecodeSpec.
    */
  private def jpegProgBytes(
      w: Int,
      h: Int,
      luma: (Int, Int) => Int,
      chroma: Option[((Int, Int) => Int, (Int, Int) => Int, Boolean)]): Array[Byte] = {
    val sub = chroma.exists(_._3)
    val mcuPx = if (sub) 16 else 8
    val hMax = if (sub) 2 else 1
    val mcusX = (w + mcuPx - 1) / mcuPx
    val mcusY = (h + mcuPx - 1) / mcuPx

    final class BitBuf {
      val out = scala.collection.mutable.ArrayBuffer[Byte]()
      private var cur = 0
      private var nb = 0
      private def emit(): Unit = {
        out += cur.toByte
        if ((cur & 0xff) == 0xff) out += 0.toByte
        cur = 0; nb = 0
      }
      def put(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) { cur = (cur << 1) | ((code >> i) & 1); nb += 1; if (nb == 8) emit(); i -= 1 }
      }
      def done(): Array[Byte] = {
        if (nb > 0) { while (nb < 8) { cur = (cur << 1) | 1; nb += 1 }; emit() }
        out.toArray
      }
    }
    def category(v: Int): Int = { var t = 0; var a = math.abs(v); while (a > 0) { t += 1; a >>= 1 }; t }

    // per-MCU block emission order (matches the decoder's interleaved
    // walk): luma v*h blocks then cb then cr; collect each component's
    // dcq sequence for the per-block refinement bits and AC block counts
    val dcSeqs = Array.fill(if (chroma.isDefined) 3 else 1)(scala.collection.mutable.ArrayBuffer[Int]())
    for (my <- 0 until mcusY; mx <- 0 until mcusX) {
      if (sub) for (by <- 0 until 2; bx <- 0 until 2)
        dcSeqs(0) += luma(mx * 2 + bx, my * 2 + by) - 128
      else dcSeqs(0) += luma(mx, my) - 128
      chroma.foreach { case (cb, cr, _) =>
        dcSeqs(1) += cb(mx, my) - 128
        dcSeqs(2) += cr(mx, my) - 128
      }
    }
    val ncomp = dcSeqs.length

    // scan 1: interleaved DC first pass, Al=1 — diffs of (dcq >> 1)
    val dc1 = new BitBuf
    val preds = new Array[Int](ncomp)
    val idxs = new Array[Int](ncomp)
    for (_ <- 0 until mcusY * mcusX) {
      for (ci <- 0 until ncomp) {
        val blocksInMcu = if (ci == 0 && sub) 4 else 1
        for (_ <- 0 until blocksInMcu) {
          val v1 = dcSeqs(ci)(idxs(ci)) >> 1
          idxs(ci) += 1
          val diff = v1 - preds(ci)
          preds(ci) = v1
          val t = category(diff)
          dc1.put(t, 5)
          if (t > 0) dc1.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        }
      }
    }
    // scan 2: DC refinement, Ah=1 Al=0 — the low bit of each dcq, raw
    val dc2 = new BitBuf
    java.util.Arrays.fill(idxs, 0)
    for (_ <- 0 until mcusY * mcusX)
      for (ci <- 0 until ncomp) {
        val blocksInMcu = if (ci == 0 && sub) 4 else 1
        for (_ <- 0 until blocksInMcu) { dc2.put(dcSeqs(ci)(idxs(ci)) & 1, 1); idxs(ci) += 1 }
      }
    // AC scans: per component, non-interleaved block raster, EOB0 each
    def acScan(ci: Int): Array[Byte] = {
      val ch = if (ci == 0 && sub) 2 else 1
      val nbW = (w * ch + 8 * hMax - 1) / (8 * hMax)
      val nbH = (h * ch + 8 * hMax - 1) / (8 * hMax)
      val b = new BitBuf
      for (_ <- 0 until nbW * nbH) b.put(0, 2) // AC huffman EOB0
      b.done()
    }

    def be2(i: Int) = Array[Byte]((i >> 8).toByte, (i & 0xff).toByte)
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte) ++ be2(payload.length + 2) ++ payload
    val dqt = seg(0xdb, Array(0x00.toByte) ++ Array.tabulate[Byte](64)(i => if (i == 0) 8 else 16))
    val sofComps = (1 to ncomp).flatMap { cid =>
      val hv = if (cid == 1 && sub) 0x22 else 0x11
      Seq(cid.toByte, hv.toByte, 0.toByte)
    }.toArray
    val sof = seg(0xc2, Array(8.toByte) ++ be2(h) ++ be2(w) ++ Array(ncomp.toByte) ++ sofComps)
    val dcBits = new Array[Byte](16); dcBits(4) = 9
    val acBits = new Array[Byte](16); acBits(1) = 1
    val dht = seg(0xc4,
      Array(0x00.toByte) ++ dcBits ++ Array.tabulate[Byte](9)(_.toByte) ++
        Array(0x10.toByte) ++ acBits ++ Array[Byte](0x00))
    def sos(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Array[Byte] =
      seg(0xda, Array(comps.size.toByte) ++ comps.flatMap(c => Seq(c.toByte, 0x00.toByte)).toArray ++
        Array(ss.toByte, se.toByte, ((ah << 4) | al).toByte))
    Array(0xff.toByte, 0xd8.toByte) ++ dqt ++ sof ++ dht ++
      sos(1 to ncomp, 0, 0, 0, 1) ++ dc1.done() ++
      sos(1 to ncomp, 0, 0, 1, 0) ++ dc2.done() ++
      (0 until ncomp).flatMap(ci => sos(Seq(ci + 1), 1, 63, 0, 0) ++ acScan(ci)).toArray ++
      Array(0xff.toByte, 0xd9.toByte)
  }

  /** The SCALEBITS=16 fixed-point YCbCr→RGB shared contract (like the GIF
    * LZW width schedule, mirrored encoder↔decoder by design — and
    * independently confirmed bit-exact against ImageIO in JpegDecodeSpec).
    */
  private def ycc(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    val pb = cb - 128; val pr = cr - 128
    (cl(y + ((91881 * pr + 32768) >> 16)),
      cl(y + ((-22554 * pb - 46802 * pr + 32768) >> 16)),
      cl(y + ((116130 * pb + 32768) >> 16)))
  }

  // JPEG fixture tile value functions (flat per 8×8 block / per MCU)
  private def grayTile(bx: Int, by: Int): Int = 40 + bx * 77 + by * 53
  private def lumaTile(bx: Int, by: Int): Int = 32 + ((bx * 64 + by * 96) % 224)
  private def luma420(bx: Int, by: Int): Int = 50 + ((bx * 85 + by * 60) % 200)

  private[multimodal] def jpegGray: Array[Byte] =
    jpegBytes(14, 11, grayTile, None)
  private[multimodal] def jpegGrayProg: Array[Byte] =
    jpegProgBytes(14, 11, grayTile, None)
  private[multimodal] def jpegGrayTruth: Seq[(Int, Int, Int)] =
    for (y <- 0 until 11; x <- 0 until 14) yield {
      val v = grayTile(x / 8, y / 8); (v, v, v)
    }

  private[multimodal] def jpeg444: Array[Byte] =
    jpegBytes(16, 16, lumaTile, Some(((_, _) => 128, (_, _) => 128, false)), restartEvery = 2)
  private[multimodal] def jpeg444Truth: Seq[(Int, Int, Int)] =
    for (y <- 0 until 16; x <- 0 until 16) yield {
      val v = lumaTile(x / 8, y / 8); (v, v, v) // neutral chroma: exact gray
    }

  private val Cb420 = 90
  private val Cr420 = 170
  private[multimodal] def jpeg420: Array[Byte] =
    jpegBytes(16, 16, luma420, Some(((_, _) => Cb420, (_, _) => Cr420, true)))
  private[multimodal] def jpeg420Truth: Seq[(Int, Int, Int)] =
    for (y <- 0 until 16; x <- 0 until 16) yield ycc(luma420(x / 8, y / 8), Cb420, Cr420)

  /** The fixture set: every decodable container flavor plus the two
    * undecodable shapes (truncated PNG — header probes fine, pixels do
    * not decode — and a non-image byte stream).
    */
  def fixtures: Seq[Fixture] = {
    val truncatedPng = pngBytes(pixels(6), W, H, Seq(0), alpha = -1).dropRight(24)
    Seq(
      Fixture(1L, "bmp", pixels(1), bmpBytes(pixels(1), W, H, storeTopDown = false)),
      Fixture(2L, "bmp", pixels(2), bmpBytes(pixels(2), W, H, storeTopDown = true)),
      Fixture(3L, "unknown", pixels(3), ppmBytes(pixels(3), W, H)), // ImageHeaders has no PPM probe
      Fixture(4L, "png", pixels(4), pngBytes(pixels(4), W, H, Seq(0, 1, 2, 3, 4), alpha = -1)),
      Fixture(5L, "png", pixels(5), pngBytes(pixels(5), W, H, Seq(4, 3, 2, 1, 0), alpha = 200)),
      Fixture(6L, "png", Seq.empty, truncatedPng),
      Fixture(7L, "unknown", Seq.empty, Array.tabulate[Byte](64)(i => (i * 17).toByte)),
      Fixture(8L, "gif", pixels(8), gifBytes(pixels(8), W, H, interlaced = false)),
      Fixture(9L, "gif", pixels(9), gifBytes(pixels(9), W, H, interlaced = true)),
      // JPEG: DC-only flat tiles decode bit-exactly (see jpegBytes doc)
      Fixture(10L, "jpeg", jpegGrayTruth, jpegGray), // grayscale, non-multiple-of-8 crop
      Fixture(11L, "jpeg", jpeg444Truth, jpeg444), // 4:4:4 + restart markers
      Fixture(12L, "jpeg", jpeg420Truth, jpeg420), // 4:2:0, colored chroma
      Fixture(13L, "jpeg", Seq.empty, jpegGray.dropRight(20)), // truncated scan
      // PROGRESSIVE JPEG (SOF2): same flat-tile exactness through the
      // multi-scan path — DC successive approximation + per-component
      // AC band scans (see jpegProgBytes doc)
      Fixture(
        14L,
        "jpeg",
        jpegGrayTruth,
        jpegProgBytes(14, 11, grayTile, None)),
      Fixture(
        15L,
        "jpeg",
        jpeg420Truth,
        jpegProgBytes(16, 16, luma420, Some(((_, _) => Cb420, (_, _) => Cr420, true)))))
  }

  /** The m1 gate query: decode every fixture through the distributed
    * mapPartitions path and emit exact integer channel statistics
    * (decoded=0 rows carry zeros). `sfDir` is unused — the fixtures are
    * the dataset — but the signature matches the SparkEntry contract.
    */
  def pixelStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fx = fixtures.map(f => (f.mediaId, f.blob))
    spark
      .createDataset(fx)
      .repartition(4) // exercise the multi-partition decode path
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val fmt = ImageHeaders.probe(blob).format
          PixelDecode.decode(blob) match {
            case Some(img) =>
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
              (id, fmt, 1L, img.width.toLong * img.height, sr, sg, sb, qr, qg, qb)
            case None => (id, fmt, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF(
        "media_id", "format", "decoded", "n_pixels",
        "sum_r", "sum_g", "sum_b", "sumsq_r", "sumsq_g", "sumsq_b")
      .orderBy("media_id")
      .coalesce(1)
  }

  /** DuckDB twin: pure VALUES literals computed from the ground-truth
    * pixel tuples (never from the decoder) at string-build time.
    */
  def oracleSql: String = {
    val rows = fixtures.map { f =>
      val dec = if (f.truth.nonEmpty) 1L else 0L
      val n = if (f.truth.nonEmpty) f.truth.size.toLong else 0L
      def s(sel: ((Int, Int, Int)) => Int) = if (dec == 1L) f.truth.map(p => sel(p).toLong).sum else 0L
      def q(sel: ((Int, Int, Int)) => Int) =
        if (dec == 1L) f.truth.map(p => sel(p).toLong * sel(p)).sum else 0L
      s"(${f.mediaId}, '${f.format}', $dec, $n, " +
        s"${s(_._1)}, ${s(_._2)}, ${s(_._3)}, ${q(_._1)}, ${q(_._2)}, ${q(_._3)})"
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, format,
       |  CAST(decoded AS BIGINT) AS decoded, CAST(n_pixels AS BIGINT) AS n_pixels,
       |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       |  CAST(sum_b AS BIGINT) AS sum_b, CAST(sumsq_r AS BIGINT) AS sumsq_r,
       |  CAST(sumsq_g AS BIGINT) AS sumsq_g, CAST(sumsq_b AS BIGINT) AS sumsq_b
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, format, decoded, n_pixels, sum_r, sum_g, sum_b, sumsq_r, sumsq_g, sumsq_b)
       |ORDER BY media_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("m1_pixel_stats" -> (pixelStats(_, _)))

  val oracle: Map[String, String] = Map("m1_pixel_stats" -> oracleSql)
}
