package graft

import graft.multimodal.{ImagePhash, PixelDecode}
import org.scalatest.funsuite.AnyFunSuite

/** The m5 perceptual-hash plane's designed invariants, pinned
  * independently of the oracle gate:
  *
  *  - decode-path hashes (container bytes → PixelDecode → phashFromRgb)
  *    equal truth-path hashes (ground-truth tuples → phashFromTuples)
  *    for every decodable fixture — the encoder↔decoder round trip at
  *    the hash level, across PNG/BMP/GIF/JPEG baseline+progressive;
  *  - the constructed Hamming geometry: brightness shift ≡ 0, the
  *    corner-cell perturbation ≡ 2, unrelated patterns far (> threshold);
  *  - pigeonhole recall of the 4×13-bit banding at threshold 3: every
  *    within-threshold pair shares at least one exact band.
  */
class PhashSpec extends AnyFunSuite {

  private def hashes: Map[Long, Long] =
    ImagePhash.fixtures.filter(_.truth.nonEmpty).map { f =>
      f.mediaId -> ImagePhash.phashFromTuples(f.truth, f.w, f.h)
    }.toMap

  private def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("decoded-byte hashes equal ground-truth-tuple hashes for every decodable fixture") {
    for (f <- ImagePhash.fixtures if f.truth.nonEmpty) {
      val img = PixelDecode.decode(f.blob).getOrElse(fail(s"fixture ${f.mediaId} must decode"))
      assert(img.width == f.w && img.height == f.h, s"fixture ${f.mediaId} dims")
      assert(
        ImagePhash.phashFromRgb(img.rgb, img.width, img.height) ==
          ImagePhash.phashFromTuples(f.truth, f.w, f.h),
        s"fixture ${f.mediaId}: decode-path hash diverges from truth-path hash")
    }
  }

  test("undecodable fixture contributes no hash") {
    val junk = ImagePhash.fixtures.find(_.truth.isEmpty).get
    assert(PixelDecode.decode(junk.blob).isEmpty)
  }

  test("designed Hamming geometry: re-encode 0, brightness shift 0, corner cell 2, unrelated far") {
    val h = hashes
    // containers of identical pixels: PNG (1) == BMP (2); JPEG baseline (7) == progressive (8)
    assert(h(1L) == h(2L))
    assert(h(7L) == h(8L))
    // mean-comparison bits are brightness-shift invariant
    assert(hd(h(1L), h(3L)) == 0, "global +10 brightness must not move the hash")
    // perturbing corner cell (0,0) flips exactly its two adjacent comparisons
    assert(hd(h(1L), h(4L)) == 2, s"corner perturbation: got ${hd(h(1L), h(4L))}")
    // pattern B is unrelated — far outside the near-dup threshold
    assert(hd(h(1L), h(5L)) > ImagePhash.MaxHamming, s"A vs B: ${hd(h(1L), h(5L))}")
    assert(hd(h(1L), h(7L)) > ImagePhash.MaxHamming, s"A vs jpeg: ${hd(h(1L), h(7L))}")
  }

  test("pigeonhole recall: every within-threshold pair shares an exact 13-bit band") {
    val h = hashes
    val ids = h.keys.toSeq.sorted
    def band(v: Long, i: Int): Long = (v >>> (i * 13)) & 0x1fffL
    val pairs = for {
      a <- ids; b <- ids if a < b
      if hd(h(a), h(b)) <= ImagePhash.MaxHamming
    } yield (a, b)
    assert(pairs.nonEmpty, "the fixture set must produce near-dup pairs")
    for ((a, b) <- pairs)
      assert(
        (0 until 4).exists(i => band(h(a), i) == band(h(b), i)),
        s"pair ($a,$b) within threshold but no band collides — banding would lose it")
  }
}
