package graft

import graft.multimodal.{AudioDecode, AudioFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** [[AudioDecode]] edge cases the m2 fixture gate does not pin: frame
  * alignment, corrupt chunk lengths, and the never-garbage contract on
  * malformed streams.
  */
class AudioDecodeSpec extends AnyFunSuite {

  private def le4(i: Int) = Array[Byte](
    (i & 0xff).toByte, ((i >> 8) & 0xff).toByte, ((i >> 16) & 0xff).toByte, (i >>> 24).toByte)
  private def le2(i: Int) = Array[Byte]((i & 0xff).toByte, (i >> 8).toByte)
  private def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  private def wav(fmtTag: Int, ch: Int, bits: Int, data: Array[Byte], declared: Int): Array[Byte] = {
    val blockAlign = math.max(1, ch * bits / 8)
    val chunks = ascii("fmt ") ++ le4(16) ++ le2(fmtTag) ++ le2(ch) ++ le4(8000) ++
      le4(8000 * blockAlign) ++ le2(blockAlign) ++ le2(bits) ++
      ascii("data") ++ le4(declared) ++ data
    ascii("RIFF") ++ le4(4 + chunks.length) ++ ascii("WAVE") ++ chunks
  }

  test("every fixture round-trips: decoded samples equal declared truth") {
    AudioFixtures.fixtures.foreach { f =>
      val got = AudioDecode.decode(f.blob)
      if (f.truth.isEmpty) assert(got.isEmpty, s"fixture ${f.mediaId} must not decode")
      else {
        val clip = got.getOrElse(fail(s"fixture ${f.mediaId} must decode"))
        assert(clip.samples.toSeq == f.truth, s"fixture ${f.mediaId}")
        assert(clip.channels == f.channels && clip.sampleRate == f.sampleRate
          && clip.bitsPerSample == f.bits)
      }
    }
  }

  test("stereo frame count halves the sample count") {
    val data = (0 until 12).flatMap(i => le2(i)).toArray
    val clip = AudioDecode.decode(wav(1, 2, 16, data, data.length)).get
    assert(clip.nFrames == 6L && clip.samples.length == 12)
  }

  test("data length not a whole number of frames decodes as None") {
    // 5 bytes of 16-bit stereo (frame = 4 bytes)
    val blob = wav(1, 2, 16, Array[Byte](1, 2, 3, 4, 5, 0), 5)
    assert(AudioDecode.decode(blob).isEmpty)
  }

  test("corrupt negative chunk size decodes as None, never throws") {
    val data = le2(100) ++ le2(200)
    val good = wav(1, 1, 16, data, data.length)
    // corrupt the data chunk's size field to a negative value
    val bad = good.clone()
    val sizeOff = good.length - data.length - 4
    bad(sizeOff + 3) = 0x80.toByte
    assert(AudioDecode.decode(bad).isEmpty)
  }

  test("unsupported bit widths decode as None") {
    val blob = wav(1, 1, 12, Array[Byte](1, 2, 3), 3)
    assert(AudioDecode.decode(blob).isEmpty)
  }
}
