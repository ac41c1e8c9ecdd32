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

  /** Identify the container and read its dimensions; `unknown`/0x0 when
    * the bytes are not a recognized image header.
    */
  def probe(blob: Array[Byte]): Probe = {
    if (blob.length >= 24 && blob.take(8).sameElements(PngSig) &&
      blob(12) == 'I' && blob(13) == 'H' && blob(14) == 'D' && blob(15) == 'R')
      Probe("png", beInt(blob, 16), beInt(blob, 20))
    else if (blob.length >= 26 && blob(0) == 'B' && blob(1) == 'M')
      Probe("bmp", leInt(blob, 18), math.abs(leInt(blob, 22)))
    else Probe("unknown", 0, 0)
  }
}
