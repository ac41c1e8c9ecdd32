package graft

import graft.multimodal.{AudioDecode, AudioFingerprint}
import org.scalatest.funsuite.AnyFunSuite

/** m7's designed invariants, independent of the oracle gate: the
  * decode-path fingerprint (RIFF bytes → AudioDecode → mono mix) equals
  * the truth-path fingerprint for every decodable fixture; bit-depth
  * re-encode (×256 scaling) and dual-mono stereo leave the fingerprint
  * unchanged; distinct waveforms fingerprint apart.
  */
class AudioFingerprintSpec extends AnyFunSuite {

  private def truthFp(f: AudioFingerprint.AfFixture): (Long, Long) =
    AudioFingerprint.fingerprint(AudioFingerprint.monoMix(f.truth.toArray, f.channels))

  test("decoded-byte fingerprints equal ground-truth fingerprints") {
    for (f <- AudioFingerprint.fixtures if f.truth.nonEmpty) {
      val clip = AudioDecode.decode(f.blob).getOrElse(fail(s"fixture ${f.mediaId} must decode"))
      val got = AudioFingerprint.fingerprint(
        AudioFingerprint.monoMix(clip.samples, clip.channels))
      assert(got == truthFp(f), s"fixture ${f.mediaId}: decode fp diverges")
    }
  }

  test("bit-depth and stereo re-encodings collapse to one fingerprint; waveforms separate") {
    val fp = AudioFingerprint.fixtures.filter(_.truth.nonEmpty).map(f => f.mediaId -> truthFp(f)).toMap
    assert(fp(1L) == fp(2L), "8-bit vs 16-bit twin must fingerprint identically")
    assert(fp(1L) == fp(3L), "dual-mono stereo twin must fingerprint identically")
    assert(fp(4L) == fp(5L), "waveform B twins must match")
    assert(fp(1L) != fp(4L), "distinct waveforms must fingerprint apart")
  }

  test("undecodable fixture contributes no fingerprint") {
    val junk = AudioFingerprint.fixtures.find(_.truth.isEmpty).get
    assert(AudioDecode.decode(junk.blob).forall(_.samples.isEmpty))
  }
}
