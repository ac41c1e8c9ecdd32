package graft.multimodal

/** Real (non-stubbed) audio metadata extraction: WAV (RIFF/WAVE) format
  * parameters read straight from the container bytes — the audio twin of
  * [[ImageHeaders]]; pure integer arithmetic, no codec library.
  *
  * Format (public specification): 'RIFF' <le32 size> 'WAVE', then a chunk
  * walk — each chunk is a 4-byte id + le32 payload size + payload (padded
  * to even length). The 'fmt ' chunk payload carries le16 audio format
  * (1 = PCM), le16 channels, le32 sample rate, le32 byte rate, le16 block
  * align, le16 bits per sample. The 'data' chunk's declared size divided
  * by the byte rate gives the clip duration — the metadata a real audio
  * pipeline filters on (too-short/too-long clips) without decoding a
  * sample.
  *
  * This parser exists to read UNTRUSTED payload bytes, so the walk must
  * return Unknown on any corrupt stream rather than throw: the cursor
  * advances in Long because a crafted chunk size near Int.MaxValue would
  * wrap `i + 8 + size + pad` negative and turn the next header read into
  * an ArrayIndexOutOfBoundsException that kills the Spark task.
  */
object AudioHeaders {

  /** `format` is "wav-pcm", "wav" (non-PCM encoding tag) or "unknown".
    * `dataBytes` is the 'data' chunk's DECLARED payload size (valid even
    * when only a header prefix of the file was fetched); `durationMs` =
    * dataBytes * 1000 / byteRate, 0 when either is absent.
    */
  case class AudioProbe(
      format: String,
      channels: Int,
      sampleRate: Int,
      bitsPerSample: Int,
      byteRate: Int,
      dataBytes: Long,
      durationMs: Long)

  private val Unknown = AudioProbe("unknown", 0, 0, 0, 0, 0L, 0L)

  private def leShort(b: Array[Byte], off: Int): Int =
    ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    ((b(off + 3) & 0xff) << 24) | ((b(off + 2) & 0xff) << 16) |
      ((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b.slice(off, off + 4), java.nio.charset.StandardCharsets.US_ASCII)

  /** Walk the RIFF chunks reading 'fmt ' format parameters and the 'data'
    * chunk's declared size; `unknown` when the bytes are not a RIFF/WAVE
    * stream or the fmt chunk is missing/truncated. The walk stops once
    * both chunks are seen (headers lead the payload, so a prefix fetch
    * suffices) or the cursor leaves the blob.
    */
  def probe(blob: Array[Byte]): AudioProbe = {
    if (blob.length < 12 || tag(blob, 0) != "RIFF" || tag(blob, 8) != "WAVE") return Unknown
    var fmtTag = -1
    var channels = 0
    var sampleRate = 0
    var byteRate = 0
    var bitsPerSample = 0
    var dataBytes = -1L
    var i = 12
    while (i + 8 <= blob.length && (fmtTag < 0 || dataBytes < 0)) {
      val id = tag(blob, i)
      val size = leInt(blob, i + 4)
      if (size < 0) {
        // corrupt length: stop the walk like the past-the-blob case so
        // fmt params already parsed survive — a negative trailing chunk
        // and a huge positive one are the same corrupt-tail condition
        i = blob.length
      } else {
        if (id == "fmt ") {
          if (size < 16 || i + 8 + 16 > blob.length) return Unknown
          fmtTag = leShort(blob, i + 8)
          channels = leShort(blob, i + 10)
          sampleRate = leInt(blob, i + 12)
          byteRate = leInt(blob, i + 16)
          bitsPerSample = leShort(blob, i + 22)
        } else if (id == "data") {
          dataBytes = size.toLong // declared size — payload may be truncated
        }
        // Long cursor: size can sit near Int.MaxValue in a corrupt stream,
        // and wrapping negative here would index a negative header offset
        // next iteration instead of falling out of the loop.
        val next = i.toLong + 8L + size.toLong + (size & 1)
        if (next > blob.length) i = blob.length // past the blob: stop
        else i = next.toInt
      }
    }
    if (fmtTag < 0) return Unknown
    val data = math.max(0L, dataBytes)
    val durationMs = if (byteRate > 0 && data > 0) data * 1000L / byteRate else 0L
    AudioProbe(
      if (fmtTag == 1) "wav-pcm" else "wav",
      channels,
      sampleRate,
      bitsPerSample,
      byteRate,
      data,
      durationMs)
  }
}
