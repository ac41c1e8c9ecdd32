package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** m7_audio_fingerprint: audio near-duplicate detection — the m5 twin
  * for the audio plane. The fingerprint is the ENERGY-PROFILE SIGNATURE:
  * decode → truncating mono mix → 16-sample frames → exact integer frame
  * energies Σs² → one bit per adjacent frame pair (energy rising?),
  * up to [[MaxDeltaBits]] bits in a Long plus the frame count.
  *
  * The delta-sign bits are invariant under any positive per-sample
  * scaling (sign(E·c² deltas) = sign(E deltas)), so the SAME waveform
  * re-encoded at a different bit depth (8-bit vs 16-bit: decoded values
  * scale exactly ×256) or duplicated across stereo channels (truncating
  * mix returns the shared channel) fingerprints identically — the
  * re-encode dedup a multimodal pipeline actually needs. Pairing is an
  * exact (n_frames, fingerprint) group join — at 100 TB a hash
  * aggregation by signature, never a pairwise comparison.
  *
  * Gate independence: Spark fingerprints pixels DECODED from real RIFF
  * containers (chunk walk, bit-depth decode, channel de-interleave),
  * the oracle fingerprints the ground-truth sample TUPLES at
  * string-build time and pairs them in SQL.
  */
object AudioFingerprint {

  private val FrameLen = 16
  private val MaxDeltaBits = 48

  /** (nFrames, delta-sign bits) from a mono sample sequence — shared
    * bit assembly; the two gate sides differ in where samples come from.
    */
  private[graft] def fingerprint(mono: Array[Int]): (Long, Long) = {
    val energies = mono
      .grouped(FrameLen)
      .map { fr =>
        var e = 0L; var j = 0
        while (j < fr.length) { e += fr(j).toLong * fr(j); j += 1 }
        e
      }
      .toArray
    var bits = 0L
    val nb = math.min(energies.length - 1, MaxDeltaBits)
    var i = 0
    while (i < nb) {
      if (energies(i + 1) > energies(i)) bits |= 1L << i
      i += 1
    }
    (energies.length.toLong, bits)
  }

  private[graft] def monoMix(samples: Array[Int], channels: Int): Array[Int] = {
    val n = samples.length / channels
    val mono = new Array[Int](n)
    var i = 0
    while (i < n) {
      var c = 0; var s = 0
      while (c < channels) { s += samples(i * channels + c); c += 1 }
      mono(i) = s / channels
      i += 1
    }
    mono
  }

  /** One fixture: channels + interleaved ground-truth samples (empty →
    * undecodable) + encoded RIFF bytes.
    */
  final case class AfFixture(mediaId: Long, channels: Int, truth: Seq[Int], blob: Array[Byte])

  // Two waveforms in 8-bit range; twins re-encode the SAME waveform at
  // 16-bit (×256 — the exact decode scaling) and as dual-mono stereo.
  private val N = 96 // 6 frames
  private def waveA(i: Int): Int = ((i * 23 + 7) % 241) - 120
  private def waveB(i: Int): Int = ((i * 41 + 3) % 233) - 116
  private def w(f: Int => Int): Seq[Int] = (0 until N).map(f)

  def fixtures: Seq[AfFixture] = {
    val a8 = w(waveA)
    val a16 = a8.map(_ * 256)
    val b8 = w(waveB)
    Seq(
      AfFixture(1L, 1, a8, AudioFixtures.pcmWav(1, 8000, 8, a8)),
      AfFixture(2L, 1, a16, AudioFixtures.pcmWav(1, 8000, 16, a16)),
      AfFixture(3L, 2, a16.flatMap(s => Seq(s, s)), AudioFixtures.pcmWav(2, 8000, 16, a16.flatMap(s => Seq(s, s)))),
      AfFixture(4L, 1, b8, AudioFixtures.pcmWav(1, 8000, 8, b8)),
      AfFixture(5L, 1, b8.map(_ * 256), AudioFixtures.pcmWav(1, 8000, 16, b8.map(_ * 256))),
      AfFixture(6L, 1, Seq.empty, Array.tabulate[Byte](40)(i => (i * 31).toByte)))
  }

  def audioFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fx = fixtures.map(f => (f.mediaId, f.blob))
    val fps = spark
      .createDataset(fx)
      .repartition(3)
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          AudioDecode.decode(blob) match {
            case Some(clip) if clip.samples.nonEmpty =>
              val (nf, bits) = fingerprint(monoMix(clip.samples, clip.channels))
              Some((id, nf, bits))
            case _ => None
          }
        }
      }
      .toDF("media_id", "n_frames", "fp")
    fps
      .as("x")
      .join(
        fps.as("y"),
        col("x.n_frames") === col("y.n_frames") && col("x.fp") === col("y.fp") &&
          col("x.media_id") < col("y.media_id"))
      .select(
        col("x.media_id").as("media_a"),
        col("y.media_id").as("media_b"),
        col("x.n_frames").as("n_frames"),
        col("x.fp").as("fp"))
      .orderBy("media_a", "media_b")
      .coalesce(1)
  }

  def oracleSql: String = {
    val rows = fixtures.filter(_.truth.nonEmpty).map { f =>
      val (nf, bits) = fingerprint(monoMix(f.truth.toArray, f.channels))
      s"(${f.mediaId}, $nf, $bits)"
    }
    s"""WITH fp(media_id, n_frames, fp) AS (VALUES
       |  ${rows.mkString(",\n  ")})
       |SELECT CAST(a.media_id AS BIGINT) AS media_a, CAST(b.media_id AS BIGINT) AS media_b,
       |  CAST(a.n_frames AS BIGINT) AS n_frames, CAST(a.fp AS BIGINT) AS fp
       |FROM fp a JOIN fp b
       |  ON a.n_frames = b.n_frames AND a.fp = b.fp AND a.media_id < b.media_id
       |ORDER BY media_a, media_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("m7_audio_fingerprint" -> (audioFingerprint(_, _)))

  val oracle: Map[String, String] = Map("m7_audio_fingerprint" -> oracleSql)
}
