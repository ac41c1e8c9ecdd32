package graft.multimodal

/** Baseline (SOF0/1) AND progressive (SOF2) JPEG decoder in pure JVM
  * code — the real codec of the multimodal plane, replacing the declared
  * StubCodec fallback.
  *
  * Scope: sequential and progressive DCT, 8-bit precision, 1–3
  * components, sampling factors 1 or 2 per axis (4:4:4, 4:2:2, 4:2:0,
  * grayscale), restart markers, byte stuffing. Progressive covers the
  * full T.81 Annex G huffman feature set: spectral selection (per-band
  * AC scans in non-interleaved component order), successive
  * approximation (DC first/refine, AC first/refine with correction
  * bits), and end-of-band run coding (EOBRUN spanning blocks) — the
  * scan script libjpeg emits by default, i.e. the progressive files
  * actually found in the wild. Arithmetic coding, hierarchical mode and
  * 12-bit precision return None — the never-garbage contract shared by
  * every decoder in this package (PixelDecode.scala): anything malformed
  * or unsupported is None, never wrong pixels.
  *
  * Exactness: the IDCT is the classic integer "islow" algorithm
  * (Loeffler–Ligtenberg–Moshovitz as fixed-point, CONST_BITS=13 /
  * PASS1_BITS=2 — the JPEG spec's informative annex form, same rounding
  * as the widely-deployed IJG implementation), and YCbCr→RGB is the
  * matching SCALEBITS=16 fixed-point transform. Chroma upsampling is
  * nearest-neighbor replication (documented divergence from "fancy"
  * triangle filters — MediaFixturesSpec pins the behavior).
  *
  * Reference behavior anchored on the public JPEG interchange format
  * (ITU T.81); fixture parity with the JDK's independent ImageIO decoder
  * is asserted in JpegDecodeSpec.
  */
object JpegDecode {

  import PixelDecode.RgbImage

  private val MaxPixels = 64000000L

  // ---- fixed-point IDCT constants (CONST_BITS = 13) ----
  private val ConstBits = 13
  private val Pass1Bits = 2
  private val Fix_0_298631336 = 2446
  private val Fix_0_390180644 = 3196
  private val Fix_0_541196100 = 4433
  private val Fix_0_765366865 = 6270
  private val Fix_0_899976223 = 7373
  private val Fix_1_175875602 = 9633
  private val Fix_1_501321110 = 12299
  private val Fix_1_847759065 = 15137
  private val Fix_1_961570560 = 16069
  private val Fix_2_053119869 = 16819
  private val Fix_2_562915447 = 20995
  private val Fix_3_072711026 = 25172

  private def descale(x: Long, n: Int): Int = ((x + (1L << (n - 1))) >> n).toInt

  /** In-place 2-D islow IDCT of one dequantized 8×8 block (row-major),
    * leaving level-shifted clamped samples 0..255.
    */
  private def idctBlock(b: Array[Int]): Unit = {
    val ws = new Array[Long](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      if (b(8 + c) == 0 && b(16 + c) == 0 && b(24 + c) == 0 && b(32 + c) == 0 &&
        b(40 + c) == 0 && b(48 + c) == 0 && b(56 + c) == 0) {
        val dc = (b(c).toLong) << Pass1Bits
        var r = 0
        while (r < 8) { ws(r * 8 + c) = dc; r += 1 }
      } else {
        var z2 = b(16 + c).toLong
        var z3 = b(48 + c).toLong
        var z1 = (z2 + z3) * Fix_0_541196100
        val t2 = z1 + z3 * (-Fix_1_847759065)
        val t3 = z1 + z2 * Fix_0_765366865
        z2 = b(c).toLong
        z3 = b(32 + c).toLong
        val t0 = (z2 + z3) << ConstBits
        val t1 = (z2 - z3) << ConstBits
        val t10 = t0 + t3; val t13 = t0 - t3; val t11 = t1 + t2; val t12 = t1 - t2
        var o0 = b(56 + c).toLong
        var o1 = b(40 + c).toLong
        var o2 = b(24 + c).toLong
        var o3 = b(8 + c).toLong
        z1 = o0 + o3; z2 = o1 + o2; z3 = o0 + o2; var z4 = o1 + o3
        val z5 = (z3 + z4) * Fix_1_175875602
        o0 *= Fix_0_298631336; o1 *= Fix_2_053119869
        o2 *= Fix_3_072711026; o3 *= Fix_1_501321110
        z1 *= -Fix_0_899976223; z2 *= -Fix_2_562915447
        z3 = z3 * (-Fix_1_961570560) + z5
        z4 = z4 * (-Fix_0_390180644) + z5
        o0 += z1 + z3; o1 += z2 + z4; o2 += z2 + z3; o3 += z1 + z4
        ws(c) = descale(t10 + o3, ConstBits - Pass1Bits)
        ws(56 + c) = descale(t10 - o3, ConstBits - Pass1Bits)
        ws(8 + c) = descale(t11 + o2, ConstBits - Pass1Bits)
        ws(48 + c) = descale(t11 - o2, ConstBits - Pass1Bits)
        ws(16 + c) = descale(t12 + o1, ConstBits - Pass1Bits)
        ws(40 + c) = descale(t12 - o1, ConstBits - Pass1Bits)
        ws(24 + c) = descale(t13 + o0, ConstBits - Pass1Bits)
        ws(32 + c) = descale(t13 - o0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    // pass 2: rows, final descale + level shift + clamp
    var r = 0
    while (r < 8) {
      val o = r * 8
      var z2 = ws(o + 2)
      var z3 = ws(o + 6)
      var z1 = (z2 + z3) * Fix_0_541196100
      val t2 = z1 + z3 * (-Fix_1_847759065)
      val t3 = z1 + z2 * Fix_0_765366865
      z2 = ws(o)
      z3 = ws(o + 4)
      val t0 = (z2 + z3) << ConstBits
      val t1 = (z2 - z3) << ConstBits
      val t10 = t0 + t3; val t13 = t0 - t3; val t11 = t1 + t2; val t12 = t1 - t2
      var o0 = ws(o + 7)
      var o1 = ws(o + 5)
      var o2 = ws(o + 3)
      var o3 = ws(o + 1)
      z1 = o0 + o3; z2 = o1 + o2; z3 = o0 + o2; var z4 = o1 + o3
      val z5 = (z3 + z4) * Fix_1_175875602
      o0 *= Fix_0_298631336; o1 *= Fix_2_053119869
      o2 *= Fix_3_072711026; o3 *= Fix_1_501321110
      z1 *= -Fix_0_899976223; z2 *= -Fix_2_562915447
      z3 = z3 * (-Fix_1_961570560) + z5
      z4 = z4 * (-Fix_0_390180644) + z5
      o0 += z1 + z3; o1 += z2 + z4; o2 += z2 + z3; o3 += z1 + z4
      def clamp(v: Long): Int = {
        val s = descale(v, ConstBits + Pass1Bits + 3) + 128
        if (s < 0) 0 else if (s > 255) 255 else s
      }
      b(o) = clamp(t10 + o3)
      b(o + 7) = clamp(t10 - o3)
      b(o + 1) = clamp(t11 + o2)
      b(o + 6) = clamp(t11 - o2)
      b(o + 2) = clamp(t12 + o1)
      b(o + 5) = clamp(t12 - o1)
      b(o + 3) = clamp(t13 + o0)
      b(o + 4) = clamp(t13 - o0)
      r += 1
    }
  }

  /** Zigzag index -> natural (row-major) index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table: maxcode/valptr decode (T.81 F.16). */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + (code - minCode(len)))
  }

  private final class Component {
    var id = 0
    var h = 1
    var v = 1
    var tq = 0
    var dcTbl = 0
    var acTbl = 0
    var pred = 0
    var data: Array[Int] = null // full-resolution-in-blocks sample plane
    var bw = 0 // plane width in samples (blocksAcross*8)
    var bh = 0
    // progressive state: per-block ZIGZAG-order coefficients, the padded
    // (MCU-grid) block dims, and the non-interleaved (ceil) block dims
    // single-component scans iterate (T.81 A.2.2)
    var coefs: Array[Int] = null
    var bwBlocks = 0
    var bhBlocks = 0
    var nbW = 0
    var nbH = 0
  }

  private final class BitReader(blob: Array[Byte], var pos: Int) {
    var acc = 0L
    var nbits = 0
    var sawEof = false
    var starved = false // bits requested past the end: truncated stream

    /** Refill skipping stuffed zero bytes; an embedded marker = hard stop. */
    private def fill(): Unit =
      while (nbits <= 56 && !sawEof) {
        if (pos >= blob.length) { sawEof = true }
        else {
          val b = blob(pos) & 0xff
          if (b == 0xff) {
            if (pos + 1 < blob.length && (blob(pos + 1) & 0xff) == 0x00) {
              acc |= 0xffL << (56 - nbits); nbits += 8; pos += 2
            } else sawEof = true // RST/EOI/other marker: stop feeding
          } else { acc |= b.toLong << (56 - nbits); nbits += 8; pos += 1 }
        }
      }

    def bit(): Int = {
      if (nbits == 0) fill()
      if (nbits == 0) { starved = true; 0 } // past end: truncated stream
      else {
        val r = ((acc >>> 63) & 1L).toInt
        acc <<= 1; nbits -= 1
        r
      }
    }

    def bits(n: Int): Int = {
      var r = 0
      var i = 0
      while (i < n) { r = (r << 1) | bit(); i += 1 }
      r
    }

    /** Align to byte and consume an expected RSTn marker. False on anything else. */
    def restart(): Boolean = {
      acc = 0; nbits = 0; sawEof = false
      if (pos + 1 >= blob.length) return false
      if ((blob(pos) & 0xff) != 0xff) return false
      val m = blob(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
  }

  private def huffDecode(br: BitReader, h: Huff): Int = {
    var code = br.bit()
    var l = 1
    while (l <= 16 && (h.maxCode(l) < 0 || code > h.maxCode(l))) {
      code = (code << 1) | br.bit()
      l += 1
    }
    if (l > 16) -1 else h.value(l, code)
  }

  /** T.81 F.12 EXTEND: map a magnitude-category bit pattern to its value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  def decode(blob: Array[Byte]): Option[RgbImage] = {
    if (blob.length < 4 || (blob(0) & 0xff) != 0xff || (blob(1) & 0xff) != 0xd8) return None
    val quant = Array.ofDim[Int](4, 64) // natural order after parse
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var progressive = false
    var planesReady = false // progressive coefficient planes allocated
    var mcusX = 0
    var mcusY = 0
    var pos = 2

    def be2(i: Int) = ((blob(i) & 0xff) << 8) | (blob(i + 1) & 0xff)

    while (pos + 2 <= blob.length) {
      if ((blob(pos) & 0xff) != 0xff) return None
      val marker = blob(pos + 1) & 0xff
      if (marker == 0xff) { pos += 1 } // fill byte before a marker
      else if (marker == 0xd9) { // EOI: a complete progressive image finishes here
        return if (progressive && planesReady) finishProgressive(comps, quant, width, height)
        else None
      } else if (marker >= 0xd0 && marker <= 0xd7) { pos += 2 } // stray RST: skip
      else {
        if (pos + 4 > blob.length) return None
        val len = be2(pos + 2)
        if (len < 2 || pos + 2 + len > blob.length) return None
        val seg = pos + 4
        val segEnd = pos + 2 + len
        var nextPos = segEnd
        marker match {
          case 0xdb => // DQT
            var p = seg
            while (p < segEnd) {
              val pq = (blob(p) & 0xff) >> 4
              val tq = blob(p) & 0x0f
              if (pq != 0 || tq > 3 || p + 1 + 64 > segEnd) return None // 8-bit only
              var k = 0
              while (k < 64) { quant(tq)(ZigZag(k)) = blob(p + 1 + k) & 0xff; k += 1 }
              p += 65
            }
          case 0xc4 => // DHT
            var p = seg
            while (p < segEnd) {
              val tc = (blob(p) & 0xff) >> 4
              val th = blob(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = blob(p + l) & 0xff; total += bits(l); l += 1 }
              if (p + 17 + total > segEnd || total > 256) return None
              val vals = new Array[Int](total)
              var k = 0
              while (k < total) { vals(k) = blob(p + 17 + k) & 0xff; k += 1 }
              val h = new Huff(bits, vals)
              if (tc == 0) dcHuff(th) = h else acHuff(th) = h
              p += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
            if (comps != null) return None // one frame per stream
            progressive = marker == 0xc2
            if (blob(seg) != 8) return None // 8-bit precision only
            height = be2(seg + 1)
            width = be2(seg + 3)
            val nc = blob(seg + 5) & 0xff
            if (width <= 0 || height <= 0 || width.toLong * height > MaxPixels) return None
            if (nc != 1 && nc != 3) return None
            if (seg + 6 + nc * 3 > segEnd) return None
            comps = Array.fill(nc)(new Component)
            var i = 0
            while (i < nc) {
              val o = seg + 6 + i * 3
              comps(i).id = blob(o) & 0xff
              comps(i).h = (blob(o + 1) & 0xff) >> 4
              comps(i).v = blob(o + 1) & 0x0f
              comps(i).tq = blob(o + 2) & 0xff
              if (comps(i).h < 1 || comps(i).h > 2 || comps(i).v < 1 || comps(i).v > 2 ||
                comps(i).tq > 3) return None
              i += 1
            }
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            return None // lossless / arithmetic / hierarchical: unsupported
          case 0xdd => // DRI
            restartInterval = be2(seg)
          case 0xda if !progressive => // sequential SOS — decode the one scan
            if (comps == null) return None
            val ns = blob(seg) & 0xff
            if (ns != comps.length) return None // interleaved single scan only
            if (seg + 1 + ns * 2 + 3 > segEnd) return None
            var i = 0
            while (i < ns) {
              val cid = blob(seg + 1 + i * 2) & 0xff
              val tbl = blob(seg + 2 + i * 2) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.dcTbl = tbl >> 4
              comp.acTbl = tbl & 0x0f
              i += 1
            }
            return decodeScan(blob, segEnd, comps, quant, dcHuff, acHuff,
              width, height, restartInterval)
          case 0xda => // progressive SOS — one of several scans
            if (comps == null) return None
            val ns = blob(seg) & 0xff
            if (ns < 1 || ns > comps.length || seg + 1 + ns * 2 + 3 > segEnd) return None
            val scanComps = new Array[Component](ns)
            var i = 0
            while (i < ns) {
              val cid = blob(seg + 1 + i * 2) & 0xff
              val tbl = blob(seg + 2 + i * 2) & 0xff
              val comp = comps.find(_.id == cid).getOrElse(return None)
              comp.dcTbl = tbl >> 4
              comp.acTbl = tbl & 0x0f
              scanComps(i) = comp
              i += 1
            }
            val ss = blob(seg + 1 + ns * 2) & 0xff
            val se = blob(seg + 2 + ns * 2) & 0xff
            val ahal = blob(seg + 3 + ns * 2) & 0xff
            if (!planesReady) {
              val hMax = comps.map(_.h).max
              val vMax = comps.map(_.v).max
              mcusX = (width + 8 * hMax - 1) / (8 * hMax)
              mcusY = (height + 8 * vMax - 1) / (8 * vMax)
              comps.foreach { c =>
                c.bwBlocks = mcusX * c.h
                c.bhBlocks = mcusY * c.v
                if (c.bwBlocks.toLong * c.bhBlocks * 64 > 4L * MaxPixels) return None
                c.coefs = new Array[Int](c.bwBlocks * c.bhBlocks * 64)
                c.nbW = (width * c.h + 8 * hMax - 1) / (8 * hMax)
                c.nbH = (height * c.v + 8 * vMax - 1) / (8 * vMax)
              }
              planesReady = true
            }
            val after = decodeProgressiveScan(blob, segEnd, scanComps, dcHuff, acHuff,
              ss, se, ahal >> 4, ahal & 0x0f, restartInterval, mcusX, mcusY)
            if (after < 0) return None
            nextPos = skipToMarker(blob, after)
          case _ => // APPn / COM / others: skip
        }
        pos = nextPos
      }
    }
    None
  }

  /** Advance from the end of a scan's entropy data to the next marker:
    * past pad bits, stuffed bytes, stray restarts and fill 0xFF bytes.
    */
  private def skipToMarker(blob: Array[Byte], start: Int): Int = {
    var p = start
    while (p + 1 < blob.length) {
      if ((blob(p) & 0xff) != 0xff) p += 1
      else {
        val m = blob(p + 1) & 0xff
        if (m == 0x00) p += 2 // stuffed data byte
        else if (m == 0xff) p += 1 // fill byte
        else if (m >= 0xd0 && m <= 0xd7) p += 2 // restart leftover
        else return p
      }
    }
    blob.length
  }

  private def decodeScan(
      blob: Array[Byte],
      dataStart: Int,
      comps: Array[Component],
      quant: Array[Array[Int]],
      dcHuff: Array[Huff],
      acHuff: Array[Huff],
      width: Int,
      height: Int,
      restartInterval: Int): Option[RgbImage] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.bw = mcusX * c.h * 8
      c.bh = mcusY * c.v * 8
      if (c.bw.toLong * c.bh > 4L * MaxPixels) return None
      c.data = new Array[Int](c.bw * c.bh)
      c.pred = 0
      if (dcHuff(c.dcTbl) == null || acHuff(c.acTbl) == null) return None
    }
    val br = new BitReader(blob, dataStart)
    val block = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = quant(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(block, 0)
            // DC
            val t = huffDecode(br, dcHuff(c.dcTbl))
            if (t < 0 || t > 15) return None
            val diff = extend(br.bits(t), t)
            c.pred += diff
            block(0) = c.pred * q(0)
            // AC
            var k = 1
            while (k < 64) {
              val rs = huffDecode(br, acHuff(c.acTbl))
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else k = 64 // EOB
              } else {
                k += run
                if (k > 63) return None
                val nat = ZigZag(k)
                block(nat) = extend(br.bits(size), size) * q(nat)
                k += 1
              }
            }
            idctBlock(block)
            // write samples into the component plane
            val x0 = (mx * c.h + bx) * 8
            val y0 = (my * c.v + by) * 8
            var r = 0
            while (r < 8) {
              var cc = 0
              while (cc < 8) {
                c.data((y0 + r) * c.bw + (x0 + cc)) = block(r * 8 + cc)
                cc += 1
              }
              r += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // never-garbage: a scan that ran out of entropy data was truncated —
    // encoders pad only the final byte, so starvation is always an error
    if (br.starved) return None
    Some(toImage(comps, width, height))
  }

  /** Color conversion + upsample-by-replication from the decoded
    * component sample planes into the output raster — shared by the
    * sequential and progressive paths.
    */
  private def toImage(comps: Array[Component], width: Int, height: Int): RgbImage = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val out = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val s = c.data(y * c.bw + x).toByte
          val o = (y * width + x) * 3
          out(o) = s; out(o + 1) = s; out(o + 2) = s
          x += 1
        }
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      val sxB = hMax / cb.h; val syB = vMax / cb.v
      val sxR = hMax / cr.h; val syR = vMax / cr.v
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val yy = cy.data(y / (vMax / cy.v) * cy.bw + x / (hMax / cy.h))
          val pb = cb.data((y / syB) * cb.bw + (x / sxB)) - 128
          val pr = cr.data((y / syR) * cr.bw + (x / sxR)) - 128
          // SCALEBITS=16 fixed-point BT.601 inverse transform
          val r = yy + ((91881 * pr + 32768) >> 16)
          val g = yy + ((-22554 * pb - 46802 * pr + 32768) >> 16)
          val b = yy + ((116130 * pb + 32768) >> 16)
          def cl(v: Int): Byte = (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          val o = (y * width + x) * 3
          out(o) = cl(r); out(o + 1) = cl(g); out(o + 2) = cl(b)
          x += 1
        }
        y += 1
      }
    }
    RgbImage(width, height, out)
  }

  /** One progressive scan (T.81 Annex G, huffman): DC first/refinement
    * (interleaved over the MCU grid when ns > 1), AC first/refinement
    * (always a single component in its non-interleaved block raster),
    * successive-approximation point transforms, EOBRUN end-of-band runs,
    * and restart intervals counted in MCUs (or blocks when ns == 1).
    * Returns the position after the scan's entropy data, or -1 on any
    * malformed condition (including entropy starvation — never-garbage).
    */
  private def decodeProgressiveScan(
      blob: Array[Byte],
      dataStart: Int,
      scanComps: Array[Component],
      dcHuff: Array[Huff],
      acHuff: Array[Huff],
      ss: Int,
      se: Int,
      ah: Int,
      al: Int,
      restartInterval: Int,
      mcusX: Int,
      mcusY: Int): Int = {
    // scan-header discipline: a DC scan is exactly the [0,0] band; an AC
    // band never includes 0 and belongs to ONE component; a refinement
    // pass lowers the point transform by exactly one bit
    if (ss == 0 && se != 0) return -1
    if (ss > 0 && (scanComps.length != 1 || se < ss || se > 63)) return -1
    if (al > 13 || (ah != 0 && ah != al + 1)) return -1
    if (ss == 0 && ah == 0 && scanComps.exists(c => dcHuff(c.dcTbl) == null)) return -1
    if (ss > 0 && acHuff(scanComps(0).acTbl) == null) return -1
    val br = new BitReader(blob, dataStart)
    var eobrun = 0
    var sinceRestart = 0
    scanComps.foreach(_.pred = 0)

    def restartIfDue(): Boolean = {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        if (!br.restart()) return false
        scanComps.foreach(_.pred = 0)
        eobrun = 0
        sinceRestart = 0
      }
      sinceRestart += 1
      true
    }

    def dcBlock(c: Component, off: Int): Boolean = {
      if (ah == 0) {
        val t = huffDecode(br, dcHuff(c.dcTbl))
        if (t < 0 || t > 15) return false
        c.pred += extend(br.bits(t), t)
        c.coefs(off) = c.pred << al
      } else if (br.bit() == 1) c.coefs(off) |= 1 << al
      true
    }

    def acFirstBlock(c: Component, off: Int): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = huffDecode(br, acHuff(c.acTbl))
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1 + (if (r > 0) br.bits(r) else 0)
            return true // current block's band ends here
          }
        } else {
          k += r
          if (k > se) return false
          c.coefs(off + k) = extend(br.bits(s), s) << al
          k += 1
        }
      }
      true
    }

    def acRefineBlock(c: Component, off: Int): Boolean = {
      val p1 = 1 << al
      def correct(idx: Int): Unit = {
        val v = c.coefs(idx)
        if (v != 0 && br.bit() == 1 && (v & p1) == 0)
          c.coefs(idx) = if (v >= 0) v + p1 else v - p1
      }
      var k = ss
      if (eobrun == 0) {
        var inBand = true
        while (inBand && k <= se) {
          val rs = huffDecode(br, acHuff(c.acTbl))
          if (rs < 0) return false
          var r = rs >> 4
          val s = rs & 0x0f
          var newval = 0
          if (s == 0) {
            if (r < 15) {
              // refinement EOBRUN counts the CURRENT block too — its
              // remaining coefficients still take correction bits below
              eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
              inBand = false
            } // r == 15: ZRL — skip 16 zero-history positions
          } else {
            if (s != 1) return false // refinement codes only ±1
            newval = if (br.bit() == 1) p1 else -p1
          }
          if (inBand) {
            var advancing = true
            while (advancing && k <= se) {
              val idx = off + k
              if (c.coefs(idx) != 0) correct(idx)
              else if (r == 0) {
                if (newval != 0) c.coefs(idx) = newval
                advancing = false
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) { correct(off + k); k += 1 }
        eobrun -= 1
      }
      true
    }

    if (ss == 0 && scanComps.length > 1) {
      // interleaved DC scan over the frame MCU grid
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        if (!restartIfDue()) return -1
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val off = ((my * c.v + by) * c.bwBlocks + (mx * c.h + bx)) * 64
              if (!dcBlock(c, off)) return -1
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    } else {
      // single-component scan (all AC scans; DC scans of a 1-component
      // frame or single-component DC passes): non-interleaved raster
      val c = scanComps(0)
      var by = 0
      while (by < c.nbH) {
        var bx = 0
        while (bx < c.nbW) {
          if (!restartIfDue()) return -1
          val off = (by * c.bwBlocks + bx) * 64
          val ok = if (ss == 0) dcBlock(c, off) else if (ah == 0) acFirstBlock(c, off)
          else acRefineBlock(c, off)
          if (!ok) return -1
          bx += 1
        }
        by += 1
      }
    }
    if (br.starved) -1 else br.pos
  }

  /** Dequantize + inverse-transform the accumulated progressive
    * coefficient planes and assemble the raster.
    */
  private def finishProgressive(
      comps: Array[Component],
      quant: Array[Array[Int]],
      width: Int,
      height: Int): Option[RgbImage] = {
    val block = new Array[Int](64)
    comps.foreach { c =>
      if (c.coefs == null || quant(c.tq) == null) return None
      val q = quant(c.tq)
      c.bw = c.bwBlocks * 8
      c.bh = c.bhBlocks * 8
      c.data = new Array[Int](c.bw * c.bh)
      var by = 0
      while (by < c.bhBlocks) {
        var bx = 0
        while (bx < c.bwBlocks) {
          val off = (by * c.bwBlocks + bx) * 64
          var k = 0
          while (k < 64) { block(ZigZag(k)) = c.coefs(off + k) * q(ZigZag(k)); k += 1 }
          idctBlock(block)
          val x0 = bx * 8
          val y0 = by * 8
          var r = 0
          while (r < 8) {
            var cc = 0
            while (cc < 8) {
              c.data((y0 + r) * c.bw + (x0 + cc)) = block(r * 8 + cc)
              cc += 1
            }
            r += 1
          }
          bx += 1
        }
        by += 1
      }
    }
    Some(toImage(comps, width, height))
  }
}
