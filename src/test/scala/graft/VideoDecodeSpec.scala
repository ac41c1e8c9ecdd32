package graft

import graft.multimodal.{AviDecode, Multimodal, PixelDecode, VideoFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-AVI container walk + per-frame decode: round-trip through
  * the fixture encoder, word-alignment pads, malformed-input safety,
  * temporal sampling policy, and the VideoCodec feature contract.
  */
class VideoDecodeSpec extends AnyFunSuite {

  private def frame(k: Int, len: Int): Array[Byte] =
    Array.tabulate[Byte](len)(i => ((i * 7 + k * 31) % 251).toByte)

  test("round-trip: frames out == frames in, including odd-length payloads") {
    val in = Seq(frame(1, 100), frame(2, 33), frame(3, 57), frame(4, 8))
    val out = AviDecode.frames(VideoFixtures.aviBytes(in, 16, 16))
    assert(out.size == in.size)
    in.zip(out).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
  }

  test("malformed inputs never throw and yield no frames") {
    val good = VideoFixtures.aviBytes(Seq(frame(1, 41)), 8, 8)
    assert(AviDecode.frames(Array.emptyByteArray).isEmpty)
    assert(AviDecode.frames("RIFFxxxx".getBytes).isEmpty)
    assert(AviDecode.frames(Array.tabulate[Byte](128)(_.toByte)).isEmpty)
    // truncate INSIDE the movi list: the walk stops at the torn chunk
    assert(AviDecode.frames(good.dropRight(30)).size <= 1)
    // size field pointing past the buffer
    val torn = good.clone()
    torn(4) = -1; torn(5) = -1; torn(6) = -1; torn(7) = 0x7f
    AviDecode.frames(torn) // must not throw
  }

  test("even temporal sampling keeps first and last frames") {
    val all = (0 until 10).map(k => frame(k, 20))
    val s = AviDecode.sampleEvenly(all, 4)
    assert(s.size == 4)
    assert(s.head.toSeq == all.head.toSeq && s.last.toSeq == all.last.toSeq)
    assert(AviDecode.sampleEvenly(all, 1).head.toSeq == all.head.toSeq)
    assert(AviDecode.sampleEvenly(all, 99).size == 10)
  }

  test("fixture AVI decodes per-frame to the declared ground truth") {
    val f201 = VideoFixtures.fixtures.find(_.mediaId == 201L).get
    val frames = AviDecode.frames(f201.blob)
    assert(frames.size == 3)
    frames.zip(f201.truths).foreach { case (fr, truth) =>
      val img = PixelDecode.decode(fr).get
      val got = (0 until truth.size).map { i =>
        (img.rgb(3 * i) & 0xff, img.rgb(3 * i + 1) & 0xff, img.rgb(3 * i + 2) & 0xff)
      }
      assert(got == truth)
    }
    // 202: middle frame is a truncated odd-length JPEG — chunk parses,
    // decode fails, neighbors are unaffected (pad byte honored)
    val f202 = VideoFixtures.fixtures.find(_.mediaId == 202L).get
    val fr2 = AviDecode.frames(f202.blob)
    assert(fr2.size == 3)
    assert(fr2(1).length % 2 == 1, "fixture must exercise the word-alignment pad")
    assert(PixelDecode.decode(fr2(1)).isEmpty)
    assert(PixelDecode.decode(fr2(0)).nonEmpty && PixelDecode.decode(fr2(2)).nonEmpty)
  }

  test("VideoCodec: real channel stats for AVI blobs, stub fallback otherwise") {
    val avi = VideoFixtures.fixtures.find(_.mediaId == 201L).get.blob
    val rec = Multimodal.MediaRecord(1L, "video", avi, 16, 16, 0)
    val feats = Multimodal.VideoCodec.decodeFeatures(rec)
    assert(feats.length == Multimodal.PixelCodec.FeatureDim)
    assert(feats(0) == 1f && feats.slice(1, 4).exists(_ > 0f))
    assert(feats.slice(7, 23).forall(_ == 0f), "decoded video must not carry stub histogram")
    val junk = Multimodal.MediaRecord(2L, "video", frame(9, 64), 0, 0, 0)
    val fb = Multimodal.VideoCodec.decodeFeatures(junk)
    assert(fb(0) == 0f && fb.slice(7, 23).exists(_ > 0f), "fallback must use stub histogram")
    assert(Multimodal.VideoCodec.sampleFrames(avi, 2).size == 2)
  }
}
