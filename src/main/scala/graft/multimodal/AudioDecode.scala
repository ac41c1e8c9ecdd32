package graft.multimodal

/** Real PCM sample decode for RIFF/WAVE payloads — the sample-level
  * counterpart of [[AudioHeaders]] (which reads metadata only): locate
  * the 'fmt ' and 'data' chunks, then decode the integer PCM frames to
  * signed sample values. Pure integer byte arithmetic, no codec library
  * — the same from-the-bytes-up discipline as [[PixelDecode]].
  *
  * Supported: format tag 1 (integer PCM) at 8 (unsigned, centered to
  * signed by −128), 16, 24, and 32 bits per sample, any channel count,
  * interleaved frames (the WAV layout). Anything else — compressed or
  * float encodings, a data payload shorter than its declared size, a
  * payload that does not divide into whole frames — returns None, never
  * garbage samples: partial audio corrupts downstream statistics
  * silently, which is worse than absent audio.
  */
object AudioDecode {

  /** Decoded clip: interleaved signed samples (channel-major within each
    * frame, frames in time order). 8-bit samples are centered (−128..127)
    * so every width shares a signed zero baseline.
    */
  final case class PcmClip(
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      samples: Array[Int]) {
    def nFrames: Long = samples.length.toLong / channels
  }

  private def leShort(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    ((b(off + 3) & 0xff) << 24) | ((b(off + 2) & 0xff) << 16) |
      ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), java.nio.charset.StandardCharsets.US_ASCII)

  def decode(blob: Array[Byte]): Option[PcmClip] = {
    if (blob.length < 12 || tag(blob, 0) != "RIFF" || tag(blob, 8) != "WAVE") return None
    var fmtTag = -1
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var dataOff = -1
    var dataLen = -1
    var i = 12
    while (i + 8 <= blob.length && (fmtTag < 0 || dataOff < 0)) {
      val id = tag(blob, i)
      val size = leInt(blob, i + 4)
      if (size < 0) return None // corrupt length: no sample decode
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > blob.length) return None
        fmtTag = leShort(blob, i + 8)
        channels = leShort(blob, i + 10)
        sampleRate = leInt(blob, i + 12)
        bits = leShort(blob, i + 22)
      } else if (id == "data") {
        dataOff = i + 8
        dataLen = size
      }
      // Long cursor for the same near-Int.MaxValue wrap AudioHeaders guards
      val next = i.toLong + 8L + size.toLong + (size & 1)
      if (next > blob.length) i = blob.length else i = next.toInt
    }
    if (fmtTag != 1 || dataOff < 0 || channels < 1 || sampleRate <= 0) return None
    if (!Set(8, 16, 24, 32).contains(bits)) return None
    // the DECLARED payload must be fully present — a truncated fetch
    // decodes as None, not as a shorter clip
    if (dataOff.toLong + dataLen.toLong > blob.length) return None
    val bytesPerSample = bits / 8
    val frameBytes = bytesPerSample * channels
    if (dataLen % frameBytes != 0) return None
    val n = dataLen / bytesPerSample
    val out = new Array[Int](n)
    var s = 0
    var off = dataOff
    while (s < n) {
      out(s) = bits match {
        case 8 => (blob(off) & 0xff) - 128
        case 16 => leShort(blob, off).toShort.toInt
        case 24 =>
          // sign-extend the 24-bit LE value
          (((blob(off + 2) & 0xff) << 16) | ((blob(off + 1) & 0xff) << 8) |
            (blob(off) & 0xff)) << 8 >> 8
        case _ => leInt(blob, off)
      }
      off += bytesPerSample
      s += 1
    }
    Some(PcmClip(channels, sampleRate, bits, out))
  }
}
