package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The m2_audio_stats oracle gate — [[MediaFixtures]]' pattern applied to
  * audio: deterministic sample sequences DEFINED as integer tuples,
  * encoded into real RIFF/WAVE containers (8/16/24-bit, mono/stereo,
  * extra LIST and odd-length chunks with pad bytes, plus undecodable
  * float/truncated/garbage streams), decoded back through the
  * distributed [[AudioDecode]] path, and summarized as exact integer
  * sample statistics. The oracle side is a VALUES literal computed from
  * the ground-truth samples at string-build time — encoder and decoder
  * never share a derivation.
  */
object AudioFixtures {

  final case class AudioFixture(
      mediaId: Long,
      probeFormat: String,
      channels: Int,
      sampleRate: Int,
      bits: Int,
      truth: Seq[Int], // decoded interleaved samples; empty = undecodable
      blob: Array[Byte])

  private def le4(i: Int) = Array[Byte](
    (i & 0xff).toByte, ((i >> 8) & 0xff).toByte, ((i >> 16) & 0xff).toByte, (i >>> 24).toByte)
  private def le2(i: Int) = Array[Byte]((i & 0xff).toByte, (i >> 8).toByte)
  private def ascii(s: String) = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Deterministic full-range sample pattern per fixture. */
  private def samples16(k: Int, n: Int): Seq[Int] =
    (0 until n).map(i => ((k * 37 + i * 11) * 257 % 65536 + 65536) % 65536 - 32768)
  private def samples8(k: Int, n: Int): Seq[Int] =
    (0 until n).map(i => (k * 53 + i * 7) % 256 - 128)
  private def samples24(k: Int, n: Int): Seq[Int] =
    (0 until n).map(i => ((k * 29 + i * 13) * 65537 % 16777216 + 16777216) % 16777216 - 8388608)

  private def fmtChunk(fmtTag: Int, ch: Int, rate: Int, bits: Int): Array[Byte] = {
    val blockAlign = ch * bits / 8
    ascii("fmt ") ++ le4(16) ++ le2(fmtTag) ++ le2(ch) ++ le4(rate) ++
      le4(rate * blockAlign) ++ le2(blockAlign) ++ le2(bits)
  }

  private def sampleBytes(s: Int, bits: Int): Array[Byte] = bits match {
    case 8 => Array[Byte]((s + 128).toByte)
    case 16 => le2(s & 0xffff)
    case 24 => Array[Byte]((s & 0xff).toByte, ((s >> 8) & 0xff).toByte, ((s >> 16) & 0xff).toByte)
    case _ => le4(s)
  }

  /** RIFF/WAVE container: optional extra chunks (with RIFF even-padding)
    * between fmt and data exercise the chunk walk.
    */
  private def wavBytes(
      fmtTag: Int,
      ch: Int,
      rate: Int,
      bits: Int,
      truth: Seq[Int],
      extraChunks: Seq[Array[Byte]] = Seq.empty): Array[Byte] = {
    val data = truth.flatMap(sampleBytes(_, bits)).toArray
    val chunks =
      fmtChunk(fmtTag, ch, rate, bits) ++
        extraChunks.flatten ++
        ascii("data") ++ le4(data.length) ++ data ++
        (if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    ascii("RIFF") ++ le4(4 + chunks.length) ++ ascii("WAVE") ++ chunks
  }

  /** Plain PCM WAV from interleaved samples (the m7 fixture encoder). */
  private[multimodal] def pcmWav(ch: Int, rate: Int, bits: Int, truth: Seq[Int]): Array[Byte] =
    wavBytes(1, ch, rate, bits, truth)

  /** An odd-length junk chunk — must be skipped with its pad byte. */
  private def oddChunk: Array[Byte] =
    ascii("junk") ++ le4(5) ++ Array[Byte](1, 2, 3, 4, 5, 0)
  private def listChunk: Array[Byte] =
    ascii("LIST") ++ le4(8) ++ ascii("INFOxxxx")

  def fixtures: Seq[AudioFixture] = {
    val t1 = samples16(1, 64)
    val t2 = samples16(2, 96) // 48 stereo frames
    val t3 = samples8(3, 33) // odd data length → pad byte after data
    val t4 = samples24(4, 40)
    val t5 = samples16(5, 32)
    val whole = wavBytes(1, 1, 8000, 16, samples16(6, 64))
    val truncated = whole.dropRight(10) // data declared 128, payload short
    Seq(
      AudioFixture(1L, "wav-pcm", 1, 8000, 16, t1, wavBytes(1, 1, 8000, 16, t1)),
      AudioFixture(2L, "wav-pcm", 2, 44100, 16, t2, wavBytes(1, 2, 44100, 16, t2)),
      AudioFixture(3L, "wav-pcm", 1, 11025, 8, t3, wavBytes(1, 1, 11025, 8, t3)),
      AudioFixture(4L, "wav-pcm", 1, 48000, 24, t4, wavBytes(1, 1, 48000, 24, t4)),
      AudioFixture(
        5L, "wav-pcm", 1, 16000, 16, t5,
        wavBytes(1, 1, 16000, 16, t5, Seq(oddChunk, listChunk))),
      // IEEE float (fmt tag 3): metadata probes as "wav", samples do not
      // integer-decode
      AudioFixture(6L, "wav", 1, 8000, 32, Seq.empty, wavBytes(3, 1, 8000, 32, samples16(7, 16))),
      AudioFixture(7L, "wav-pcm", 1, 8000, 16, Seq.empty, truncated),
      AudioFixture(8L, "unknown", 0, 0, 0, Seq.empty,
        Array.tabulate[Byte](48)(i => (i * 23).toByte)))
  }

  /** The m2 gate query: decode every fixture through the distributed
    * mapPartitions path; undecodable rows carry zeros but keep the
    * header-probe metadata. `sfDir` is unused — the fixtures are the
    * dataset — but the signature matches the SparkEntry contract.
    */
  def audioStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fx = fixtures.map(f => (f.mediaId, f.blob))
    spark
      .createDataset(fx)
      .repartition(3) // exercise the multi-partition decode path
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val probe = AudioHeaders.probe(blob)
          AudioDecode.decode(blob) match {
            case Some(clip) =>
              var sum = 0L
              var sq = 0L
              var mn = Int.MaxValue
              var mx = Int.MinValue
              var i = 0
              while (i < clip.samples.length) {
                val s = clip.samples(i)
                sum += s; sq += s.toLong * s
                if (s < mn) mn = s
                if (s > mx) mx = s
                i += 1
              }
              (id, probe.format, 1L, clip.channels.toLong, clip.sampleRate.toLong,
                clip.bitsPerSample.toLong, clip.nFrames, sum, sq, mn.toLong, mx.toLong)
            case None =>
              (id, probe.format, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF(
        "media_id", "format", "decoded", "channels", "sample_rate", "bits",
        "n_frames", "sum_s", "sumsq_s", "min_s", "max_s")
      .orderBy("media_id")
      .coalesce(1)
  }

  /** DuckDB twin: VALUES literals from the ground-truth samples. */
  def oracleSql: String = {
    val rows = fixtures.map { f =>
      val dec = if (f.truth.nonEmpty) 1L else 0L
      val (ch, rate, bits, frames, sum, sq, mn, mx) =
        if (f.truth.nonEmpty)
          (f.channels.toLong, f.sampleRate.toLong, f.bits.toLong,
            f.truth.size.toLong / f.channels,
            f.truth.map(_.toLong).sum,
            f.truth.map(s => s.toLong * s).sum,
            f.truth.min.toLong, f.truth.max.toLong)
        else (0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
      s"(${f.mediaId}, '${f.probeFormat}', $dec, $ch, $rate, $bits, $frames, $sum, $sq, $mn, $mx)"
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, format,
       |  CAST(decoded AS BIGINT) AS decoded, CAST(channels AS BIGINT) AS channels,
       |  CAST(sample_rate AS BIGINT) AS sample_rate, CAST(bits AS BIGINT) AS bits,
       |  CAST(n_frames AS BIGINT) AS n_frames, CAST(sum_s AS BIGINT) AS sum_s,
       |  CAST(sumsq_s AS BIGINT) AS sumsq_s, CAST(min_s AS BIGINT) AS min_s,
       |  CAST(max_s AS BIGINT) AS max_s
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, format, decoded, channels, sample_rate, bits, n_frames,
       |    sum_s, sumsq_s, min_s, max_s)
       |ORDER BY media_id""".stripMargin
  }

  /** m4: framed audio feature extraction — the per-window features a
    * speech-data pipeline computes right after decode (VAD gating,
    * silence trimming, clipping detection): channel-mixed mono frames of
    * [[AudioFrameLen]] samples, each reporting exact integer energy
    * (Σs²), zero-crossing count, and peak amplitude. All integers (the
    * m2 discipline); stereo mixes as the truncating per-frame channel
    * mean (identical division semantics both engines); the trailing
    * partial frame is kept with its own n_samples. Undecodable streams
    * contribute NO frame rows — the framing operator consumes decoded
    * PCM, not container bytes.
    */
  private val AudioFrameLen = 16

  /** The distributed frame-feature frame (unordered — gate outputs add
    * their own deterministic ordering), shared by m4 and m9.
    */
  private def frameFeatures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val fx = fixtures.map(f => (f.mediaId, f.blob))
    spark
      .createDataset(fx)
      .repartition(3)
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          AudioDecode.decode(blob) match {
            case Some(clip) =>
              val ch = clip.channels
              val n = clip.nFrames.toInt
              val mono = new Array[Int](n)
              var i = 0
              while (i < n) {
                var c = 0
                var s = 0
                while (c < ch) { s += clip.samples(i * ch + c); c += 1 }
                mono(i) = s / ch // Java / truncates toward zero, like div
                i += 1
              }
              mono.grouped(AudioFrameLen).zipWithIndex.map { case (fr, idx) =>
                var energy = 0L
                var zc = 0L
                var peak = 0L
                var j = 0
                while (j < fr.length) {
                  val s = fr(j)
                  energy += s.toLong * s
                  if (j > 0 && ((s < 0) != (fr(j - 1) < 0))) zc += 1
                  val a = math.abs(s.toLong)
                  if (a > peak) peak = a
                  j += 1
                }
                (id, idx.toLong, fr.length.toLong, energy, zc, peak)
              }
            case None => Iterator.empty
          }
        }
      }
      .toDF("media_id", "frame_idx", "n_samples", "energy", "zero_crossings", "peak")
  }

  def audioFrames(spark: SparkSession, sfDir: String): DataFrame =
    frameFeatures(spark)
      .orderBy("media_id", "frame_idx")
      .coalesce(1)

  /** DuckDB twin of m4: VALUES literals computed from the ground-truth
    * samples (mix/frame/feature arithmetic re-derived here from the
    * tuples, never from the decoder).
    */
  def framesOracleSql: String = {
    val rows = fixtures.filter(_.truth.nonEmpty).flatMap { f =>
      val mono = f.truth.grouped(f.channels).map(_.sum / f.channels).toSeq
      mono.grouped(AudioFrameLen).zipWithIndex.map { case (fr, idx) =>
        val energy = fr.map(s => s.toLong * s).sum
        val zc = (1 until fr.length).count(j => (fr(j) < 0) != (fr(j - 1) < 0))
        val peak = if (fr.isEmpty) 0L else fr.map(s => math.abs(s.toLong)).max
        s"(${f.mediaId}, $idx, ${fr.length}, $energy, $zc, $peak)"
      }
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  CAST(n_samples AS BIGINT) AS n_samples, CAST(energy AS BIGINT) AS energy,
       |  CAST(zero_crossings AS BIGINT) AS zero_crossings, CAST(peak AS BIGINT) AS peak
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, frame_idx, n_samples, energy, zero_crossings, peak)
       |ORDER BY media_id, frame_idx""".stripMargin
  }

  /** m9: activity (VAD-shape) segmentation — the silence-trimming stage a
    * speech pipeline runs on m4's frame features: a frame is ACTIVE when
    * its mean energy per sample exceeds the clip's own mean (exact
    * integer cross-multiply `energy·tot_samples > tot_energy·n_samples`
    * — data-derived, no fixture constant), and consecutive same-flag
    * frames collapse into segments (the Sessionize flip/running-sum
    * idiom, keyed windows only). Per segment: the flag, frame extent,
    * and exact energy mass — the rows a trim/keep decision consumes.
    * The per-clip threshold makes the operator scale-free: each clip is
    * judged against itself, so a quiet recording still splits into its
    * own louder/quieter runs.
    */
  def audioSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val frames = frameFeatures(spark)
    val tot = frames
      .groupBy(col("media_id"))
      .agg(sum(col("energy")).as("tot_energy"), sum(col("n_samples")).as("tot_samples"))
    val w = Window.partitionBy(col("media_id")).orderBy(col("frame_idx"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frames
      .join(broadcast(tot), Seq("media_id"))
      .withColumn(
        "active",
        (col("energy") * col("tot_samples") > col("tot_energy") * col("n_samples"))
          .cast("long"))
      .withColumn(
        "flip",
        when(lag(col("active"), 1).over(w).isNull
          || lag(col("active"), 1).over(w) =!= col("active"), 1L).otherwise(0L))
      .withColumn("seg_idx", sum(col("flip")).over(run))
      .groupBy(col("media_id"), col("seg_idx"))
      .agg(
        max(col("active")).as("active"),
        min(col("frame_idx")).as("first_frame"),
        max(col("frame_idx")).as("last_frame"),
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("sum_energy"))
      .orderBy("media_id", "seg_idx")
      .coalesce(1)
  }

  /** DuckDB twin of m9: segments re-derived from the ground-truth tuples. */
  def segmentsOracleSql: String = {
    val rows = fixtures.filter(_.truth.nonEmpty).flatMap { f =>
      val mono = f.truth.grouped(f.channels).map(_.sum / f.channels).toSeq
      val frames = mono.grouped(AudioFrameLen).zipWithIndex.map { case (fr, idx) =>
        (idx.toLong, fr.length.toLong, fr.map(s => s.toLong * s).sum)
      }.toSeq
      val totEnergy = frames.map(_._3).sum
      val totSamples = frames.map(_._2).sum
      val flagged = frames.map { case (idx, n, e) =>
        (idx, n, e, if (e * totSamples > totEnergy * n) 1L else 0L)
      }
      val segs = scala.collection.mutable.ListBuffer.empty[String]
      var segIdx = 0L
      var i = 0
      while (i < flagged.size) {
        var j = i
        while (j + 1 < flagged.size && flagged(j + 1)._4 == flagged(i)._4) j += 1
        segIdx += 1
        val block = flagged.slice(i, j + 1)
        segs += s"(${f.mediaId}, $segIdx, ${flagged(i)._4}, ${block.head._1}, " +
          s"${block.last._1}, ${block.size}, ${block.map(_._3).sum})"
        i = j + 1
      }
      segs
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, CAST(seg_idx AS BIGINT) AS seg_idx,
       |  CAST(active AS BIGINT) AS active, CAST(first_frame AS BIGINT) AS first_frame,
       |  CAST(last_frame AS BIGINT) AS last_frame, CAST(n_frames AS BIGINT) AS n_frames,
       |  CAST(sum_energy AS BIGINT) AS sum_energy
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, seg_idx, active, first_frame, last_frame, n_frames, sum_energy)
       |ORDER BY media_id, seg_idx""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "m2_audio_stats" -> (audioStats(_, _)),
      "m4_audio_frames" -> (audioFrames(_, _)),
      "m9_audio_segments" -> (audioSegments(_, _)))

  val oracle: Map[String, String] =
    Map(
      "m2_audio_stats" -> oracleSql,
      "m4_audio_frames" -> framesOracleSql,
      "m9_audio_segments" -> segmentsOracleSql)
}
