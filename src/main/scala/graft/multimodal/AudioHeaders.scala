package graft.multimodal

/** Real (non-stubbed) audio metadata extraction: WAV (RIFF/WAVE) format
  * parameters read straight from the container bytes — the audio twin of
  * [[ImageHeaders]]; pure integer arithmetic, no codec library.
  *
  * Format (public specification): 'RIFF' <le32 size> 'WAVE', then a chunk
  * walk — each chunk is a 4-byte id + le32 payload size + payload (padded
  * to even length). The 'fmt ' chunk payload carries le16 audio format
  * (1 = PCM), le16 channels, le32 sample rate, le32 byte rate, le16 block
  * align, le16 bits per sample.
  */
object AudioHeaders {

  /** `format` is "wav-pcm", "wav" (non-PCM encoding tag) or "unknown". */
  case class AudioProbe(format: String, channels: Int, sampleRate: Int, bitsPerSample: Int)

  private val Unknown = AudioProbe("unknown", 0, 0, 0)

  private def leShort(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    ((b(off + 3) & 0xff) << 24) | ((b(off + 2) & 0xff) << 16) |
      ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the RIFF chunks to 'fmt ' and read the format parameters;
    * `unknown` when the bytes are not a RIFF/WAVE stream or the fmt chunk
    * is missing/truncated.
    */
  def probe(blob: Array[Byte]): AudioProbe = {
    if (blob.length < 12 || tag(blob, 0) != "RIFF" || tag(blob, 8) != "WAVE") return Unknown
    var i = 12
    while (i + 8 <= blob.length) {
      val id = tag(blob, i)
      val size = leInt(blob, i + 4)
      if (size < 0) return Unknown // corrupt length
      if (id == "fmt ") {
        if (size < 16 || i + 8 + 16 > blob.length) return Unknown
        val fmtTag = leShort(blob, i + 8)
        return AudioProbe(
          if (fmtTag == 1) "wav-pcm" else "wav",
          leShort(blob, i + 10),
          leInt(blob, i + 12),
          leShort(blob, i + 22))
      }
      i += 8 + size + (size & 1) // chunks pad to even offsets
    }
    Unknown
  }
}
