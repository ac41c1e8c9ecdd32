package graft.multimodal

/** Baseline (SOF0) JPEG decoder in pure JVM code — the last real codec of
  * the multimodal plane, replacing the declared StubCodec fallback.
  *
  * Scope: sequential DCT, 8-bit precision, 1–3 components, sampling
  * factors 1 or 2 per axis (4:4:4, 4:2:2, 4:2:0, grayscale), restart
  * markers, byte stuffing. Progressive (SOF2), arithmetic coding and
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
    var pos = 2

    def be2(i: Int) = ((blob(i) & 0xff) << 8) | (blob(i + 1) & 0xff)

    while (pos + 4 <= blob.length) {
      if ((blob(pos) & 0xff) != 0xff) return None
      val marker = blob(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS produced pixels
      val len = be2(pos + 2)
      if (len < 2 || pos + 2 + len > blob.length) return None
      val seg = pos + 4
      val segEnd = pos + 2 + len
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
        case 0xc0 | 0xc1 => // SOF0/1 baseline(-ish sequential)
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
        case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // progressive / arithmetic / hierarchical: unsupported
        case 0xdd => // DRI
          restartInterval = be2(seg)
        case 0xda => // SOS — decode the scan
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
        case _ => // APPn / COM / others: skip
      }
      pos = segEnd
    }
    None
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

    // color conversion + upsample-by-replication into the output raster
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
    Some(RgbImage(width, height, out))
  }
}
