package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** m11_audio_decimate: the sample-rate reduction stage of an audio ingest
  * pipeline — every decodable WAV fixture is decoded through the
  * distributed [[AudioDecode]] path and DECIMATED by each integer factor
  * in [[Factors]] (keep every D-th FRAME, all channels — the exact
  * resample when the target rate divides the source rate; fractional
  * ratios need an interpolation kernel, which would put floats between
  * the engines). Emits exact integer sample stats plus an md5 of the
  * decimated samples' canonical byte stream, so one wrong frame pick
  * diverges the gate.
  *
  * The oracle decimates the GROUND-TRUTH sample tuples with the same
  * index arithmetic at string-build time — it never touches the decoder,
  * so decode and decimate each get independent coverage (the m1/m10
  * discipline). Scale posture: row-local work only (decode + decimate in
  * one mapPartitions pass, no shuffle), the shape that tiles to any
  * corpus size.
  */
object AudioResample {

  private val Factors = Seq(2, 3)

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(bytes)
      .map(b => f"${b & 0xff}%02x")
      .mkString

  /** Every D-th frame of interleaved samples, all channels kept. */
  private def decimate(samples: IndexedSeq[Int], channels: Int, d: Int): IndexedSeq[Int] = {
    val nFrames = samples.length / channels
    for {
      f <- 0 until nFrames if f % d == 0
      c <- 0 until channels
    } yield samples(f * channels + c)
  }

  /** Canonical byte stream: 4-byte big-endian per sample (24-bit samples
    * exceed a short; both sides build the identical encoding).
    */
  private def pcmBytes(samples: IndexedSeq[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 4)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      out(i * 4) = (s >> 24).toByte
      out(i * 4 + 1) = (s >> 16).toByte
      out(i * 4 + 2) = (s >> 8).toByte
      out(i * 4 + 3) = s.toByte
      i += 1
    }
    out
  }

  def decimated(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fx = AudioFixtures.fixtures.map(f => (f.mediaId, f.blob))
    val factors = Factors
    spark
      .createDataset(fx)
      .repartition(3)
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          val clip = AudioDecode.decode(blob)
          factors.map { d =>
            clip match {
              case Some(c) =>
                val dec = decimate(c.samples.toIndexedSeq, c.channels, d)
                var sum = 0L
                var sq = 0L
                dec.foreach { s => sum += s; sq += s.toLong * s }
                (id, d.toLong, 1L, dec.length.toLong / c.channels, sum, sq, md5Hex(pcmBytes(dec)))
              case None =>
                (id, d.toLong, 0L, 0L, 0L, 0L, "")
            }
          }
        }
      }
      .toDF("media_id", "factor", "decoded", "out_frames", "sum_s", "sumsq_s", "pcm_md5")
      .orderBy("media_id", "factor")
      .coalesce(1)
  }

  /** DuckDB twin: VALUES literals decimated from the ground-truth tuples
    * by the same frame arithmetic — never through the decoder.
    */
  def oracleSql: String = {
    val rows = AudioFixtures.fixtures.flatMap { f =>
      Factors.map { d =>
        if (f.truth.isEmpty) s"(${f.mediaId}, $d, 0, 0, 0, 0, '')"
        else {
          val dec = decimate(f.truth.toIndexedSeq, f.channels, d)
          val sum = dec.map(_.toLong).sum
          val sq = dec.map(s => s.toLong * s).sum
          s"(${f.mediaId}, $d, 1, ${dec.length / f.channels}, $sum, $sq, '${md5Hex(pcmBytes(dec))}')"
        }
      }
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, CAST(factor AS BIGINT) AS factor,
       |  CAST(decoded AS BIGINT) AS decoded, CAST(out_frames AS BIGINT) AS out_frames,
       |  CAST(sum_s AS BIGINT) AS sum_s, CAST(sumsq_s AS BIGINT) AS sumsq_s, pcm_md5
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, factor, decoded, out_frames, sum_s, sumsq_s, pcm_md5)
       |ORDER BY media_id, factor""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("m11_audio_decimate" -> (decimated(_, _)))

  val oracle: Map[String, String] = Map("m11_audio_decimate" -> oracleSql)
}
