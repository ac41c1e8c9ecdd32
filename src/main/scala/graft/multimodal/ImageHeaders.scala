package graft.multimodal

/** Real (non-stubbed) image metadata extraction: PNG and BMP dimensions
  * read straight from the container header bytes — pure integer
  * arithmetic, no codec library involved, so unlike pixel decoding this
  * step needs nothing the environment lacks.
  *
  * Formats (public specifications):
  *   - PNG: 8-byte signature 89 50 4E 47 0D 0A 1A 0A, then the IHDR
  *     chunk whose big-endian width/height sit at byte offsets 16 and 20.
  *   - BMP: 'B''M' signature; BITMAPINFOHEADER little-endian int32
  *     width/height at offsets 18 and 22 (height may be negative for
  *     top-down rows — reported as its magnitude).
  *   - GIF: 'GIF87a'/'GIF89a' signature, then the logical-screen
  *     little-endian uint16 width/height at byte offsets 6 and 8.
  *   - JPEG: FF D8 (SOI), then a marker-segment walk — each segment is
  *     FF <marker> <big-endian length incl. itself>; dimensions live in
  *     the first SOFn frame header (C0-CF except the non-frame C4/C8/CC):
  *     [length 2][precision 1][height 2][width 2]. The walk skips fill
  *     FFs and length-less markers (01, D0-D7) and stops at SOS/EOI.
  *
  * Used by the multimodal plane to validate/derive width/height from the
  * payload itself instead of trusting sidecar metadata columns.
  */
object ImageHeaders {

  case class Probe(format: String, width: Int, height: Int)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    ((b(off + 3) & 0xff) << 24) | ((b(off + 2) & 0xff) << 16) |
      ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def beShort(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** Walk the JPEG marker segments to the first SOFn frame header and
    * read height/width; `jpeg`/0x0 for a syntactically-JPEG stream whose
    * frame header is truncated or absent (dimensionless probe beats
    * misclassifying the container).
    */
  private def jpegProbe(b: Array[Byte]): Probe = {
    var i = 2
    while (i + 1 < b.length && (b(i) & 0xff) == 0xff) {
      var j = i + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return Probe("jpeg", 0, 0)
      val m = b(j) & 0xff
      if (m == 0xd9 || m == 0xda) return Probe("jpeg", 0, 0) // EOI / SOS: no frame seen
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i = j + 1 // length-less markers
      else {
        if (j + 2 >= b.length) return Probe("jpeg", 0, 0)
        val segLen = beShort(b, j + 1)
        val isFrame = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isFrame)
          return if (j + 7 < b.length) Probe("jpeg", beShort(b, j + 6), beShort(b, j + 4))
          else Probe("jpeg", 0, 0)
        if (segLen < 2) return Probe("jpeg", 0, 0) // corrupt length
        i = j + 1 + segLen
      }
    }
    Probe("jpeg", 0, 0)
  }

  /** Identify the container and read its dimensions; `unknown`/0x0 when
    * the bytes are not a recognized image header.
    */
  def probe(blob: Array[Byte]): Probe = {
    if (blob.length >= 24 && blob.take(8).sameElements(PngSig) &&
      blob(12) == 'I' && blob(13) == 'H' && blob(14) == 'D' && blob(15) == 'R')
      Probe("png", beInt(blob, 16), beInt(blob, 20))
    else if (blob.length >= 26 && blob(0) == 'B' && blob(1) == 'M')
      Probe("bmp", leInt(blob, 18), math.abs(leInt(blob, 22)))
    else if (blob.length >= 10 && blob(0) == 'G' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == '8' && (blob(4) == '7' || blob(4) == '9') && blob(5) == 'a')
      Probe(
        "gif",
        ((blob(7) & 0xff) << 8) | (blob(6) & 0xff),
        ((blob(9) & 0xff) << 8) | (blob(8) & 0xff))
    else if (blob.length >= 4 && (blob(0) & 0xff) == 0xff && (blob(1) & 0xff) == 0xd8)
      jpegProbe(blob)
    else Probe("unknown", 0, 0)
  }
}
