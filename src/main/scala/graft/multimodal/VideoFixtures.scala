package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The m3_video_stats oracle gate — [[MediaFixtures]]' two-sided
  * discipline applied to the video modality: fixture AVIs are ENCODED
  * from the JPEG fixtures whose pixel content is defined as integer
  * tuples (full RIFF form: avih/strh/strf headers, `movi` frame chunks
  * with word-alignment pads, idx1 index), decoded back through the
  * DISTRIBUTED [[AviDecode]]+[[PixelDecode]] path, and summarized as
  * exact integer per-video channel statistics; the DuckDB side is a
  * VALUES literal computed from the ground-truth tuples by plain
  * integer arithmetic at string-build time. Encoder and decoder never
  * share a derivation.
  */
object VideoFixtures {

  /** One video fixture: per-frame ground truth (empty tuple seq = frame
    * present but undecodable) and the encoded AVI bytes. `truths` empty
    * = no frames at all (not an AVI / empty movi).
    */
  final case class VideoFixture(
      mediaId: Long,
      truths: Seq[Seq[(Int, Int, Int)]],
      blob: Array[Byte])

  private def le4(i: Int) = Array[Byte](
    (i & 0xff).toByte, ((i >> 8) & 0xff).toByte, ((i >> 16) & 0xff).toByte, (i >>> 24).toByte)
  private def le2(i: Int) = Array[Byte]((i & 0xff).toByte, (i >> 8).toByte)
  private def fcc(s: String) = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if ((data.length & 1) == 1) Array[Byte](0) else Array.emptyByteArray
    fcc(id) ++ le4(data.length) ++ data ++ pad
  }
  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", fcc(listType) ++ payload)

  /** A complete single-stream MJPEG AVI (25 fps declared) around the
    * given frame payloads.
    */
  def aviBytes(frames: Seq[Array[Byte]], width: Int, height: Int): Array[Byte] = {
    val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
    val avih = le4(40000) ++ le4(0) ++ le4(0) ++ le4(0x10) ++ // usPerFrame, bps, pad, AVIF_HASINDEX
      le4(frames.size) ++ le4(0) ++ le4(1) ++ le4(maxFrame) ++ // totalFrames, initial, streams, sugBuf
      le4(width) ++ le4(height) ++ Array.fill[Byte](16)(0)
    val strh = fcc("vids") ++ fcc("MJPG") ++ le4(0) ++ le2(0) ++ le2(0) ++ // type, handler, flags, prio, lang
      le4(0) ++ le4(1) ++ le4(25) ++ le4(0) ++ // initialFrames, scale, rate, start
      le4(frames.size) ++ le4(maxFrame) ++ le4(-1) ++ le4(0) ++ // length, sugBuf, quality, sampleSize
      le2(0) ++ le2(0) ++ le2(width) ++ le2(height) // rcFrame
    val strf = le4(40) ++ le4(width) ++ le4(height) ++ le2(1) ++ le2(24) ++
      fcc("MJPG") ++ le4(width * height * 3) ++ le4(0) ++ le4(0) ++ le4(0) ++ le4(0)
    val hdrl = list(
      "hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frameChunks = frames.map(f => chunk("00dc", f))
    val movi = list("movi", frameChunks.flatten.toArray)
    // idx1 offsets are relative to the 'movi' fourcc position
    val offsets = frameChunks.scanLeft(4)((off, c) => off + c.length).init
    val idx1 = chunk(
      "idx1",
      frames.indices.flatMap { i =>
        fcc("00dc") ++ le4(0x10) ++ le4(offsets(i)) ++ le4(frames(i).length) // AVIIF_KEYFRAME
      }.toArray)
    val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ le4(body.length) ++ body
  }

  /** Fixture set: the three JPEG flavors in one stream (mixed frame
    * sizes are fine — MJPEG frames are independent), a stream with a
    * truncated ODD-LENGTH frame (exercises the word-alignment pad AND
    * the per-frame decode failure path), a non-AVI byte stream, and an
    * empty movi.
    */
  def fixtures: Seq[VideoFixture] = {
    import MediaFixtures.{jpeg420, jpeg420Truth, jpeg444, jpeg444Truth, jpegGray, jpegGrayTruth}
    val truncOdd = {
      val full = jpegGray
      val keep = if (((full.length - 21) & 1) == 1) full.length - 21 else full.length - 22
      full.take(keep) // odd length, scan cut mid-entropy: parses as a chunk, fails decode
    }
    Seq(
      VideoFixture(
        201L,
        Seq(jpegGrayTruth, jpeg444Truth, jpeg420Truth),
        aviBytes(Seq(jpegGray, jpeg444, jpeg420), 16, 16)),
      VideoFixture(
        202L,
        Seq(jpeg420Truth, Seq.empty, jpeg444Truth),
        aviBytes(Seq(jpeg420, truncOdd, jpeg444), 16, 16)),
      VideoFixture(203L, Seq.empty, Array.tabulate[Byte](64)(i => (i * 23).toByte)),
      VideoFixture(204L, Seq.empty, aviBytes(Seq.empty, 16, 16)))
  }

  /** The m3 gate query: every fixture through the distributed decode
    * path — container walk, per-frame JPEG decode, exact integer channel
    * sums over the decoded frames. `sfDir` unused (fixtures are the
    * dataset), per the m1/m2 contract.
    */
  def videoStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fx = fixtures.map(f => (f.mediaId, f.blob))
    spark
      .createDataset(fx)
      .repartition(2)
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val frames = AviDecode.frames(blob)
          var decoded = 0L
          var n = 0L
          var sr = 0L; var sg = 0L; var sb = 0L
          var qr = 0L; var qg = 0L; var qb = 0L
          frames.foreach { fr =>
            PixelDecode.decode(fr).foreach { img =>
              decoded += 1
              n += img.width.toLong * img.height
              var i = 0
              while (i < img.rgb.length) {
                val r = img.rgb(i) & 0xff
                val g = img.rgb(i + 1) & 0xff
                val b = img.rgb(i + 2) & 0xff
                sr += r; sg += g; sb += b
                qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
                i += 3
              }
            }
          }
          (id, frames.size.toLong, decoded, n, sr, sg, sb, qr, qg, qb)
        }
      }
      .toDF(
        "media_id", "n_frames", "decoded_frames", "n_pixels",
        "sum_r", "sum_g", "sum_b", "sumsq_r", "sumsq_g", "sumsq_b")
      .orderBy("media_id")
      .coalesce(1)
  }

  /** m8: scene-change detection — the TEMPORAL analysis over
    * [[AviDecode]]'s frame stream (m3 summarizes per video; this scores
    * per transition): consecutive DECODED frames compared by the exact
    * sum of absolute channel differences (SAD), a transition is a cut
    * when the mean per-channel delta exceeds [[SceneCutThreshold]]
    * (SAD > thr·3·n_pixels in integers), and a resolution change (pixel
    * count differs) is a cut by definition (SAD := -1, no meaningful
    * positional diff). Undecodable frames are TRANSPARENT — the
    * comparison chain skips them, so a corrupted frame cannot mint two
    * phantom cuts around itself (fixture 202 pins exactly this: its
    * surviving transition is frame 0 → frame 2). The oracle recomputes
    * everything from the ground-truth tuples at string-build time —
    * encoder/decoder independence, as m3.
    */
  private val SceneCutThreshold = 48L

  def sceneChanges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark
      .createDataset(fixtures.map(f => (f.mediaId, f.blob)))
      .repartition(2)
      .flatMap { case (id, blob) =>
        val decoded = AviDecode
          .frames(blob)
          .zipWithIndex
          .flatMap { case (fr, i) => PixelDecode.decode(fr).map(img => (i.toLong, img)) }
        decoded
          .sliding(2)
          .collect { case Seq((ia, a), (ib, b)) =>
            val na = a.rgb.length / 3
            val nb = b.rgb.length / 3
            if (na != nb) (id, ia, ib, na.toLong, nb.toLong, -1L, 1L)
            else {
              var sad = 0L
              var i = 0
              while (i < a.rgb.length) {
                sad += math.abs((a.rgb(i) & 0xff) - (b.rgb(i) & 0xff))
                i += 1
              }
              val cut = if (sad > SceneCutThreshold * 3L * na) 1L else 0L
              (id, ia, ib, na.toLong, nb.toLong, sad, cut)
            }
          }
          .toSeq
      }
      .toDF("media_id", "frame_a", "frame_b", "px_a", "px_b", "sad", "is_cut")
      .orderBy("media_id", "frame_a")
      .coalesce(1)
  }

  /** m8's DuckDB twin: the same skip-chain + SAD + threshold from the
    * ground-truth tuples.
    */
  def sceneOracleSql: String = {
    val rows = fixtures.flatMap { f =>
      val decoded = f.truths.zipWithIndex.collect { case (t, i) if t.nonEmpty => (i.toLong, t) }
      decoded.sliding(2).toSeq.collect { case Seq((ia, a), (ib, b)) =>
        if (a.size != b.size) s"(${f.mediaId}, $ia, $ib, ${a.size}, ${b.size}, -1, 1)"
        else {
          val sad = a
            .zip(b)
            .map { case ((r1, g1, b1), (r2, g2, b2)) =>
              (r1 - r2).abs.toLong + (g1 - g2).abs + (b1 - b2).abs
            }
            .sum
          val cut = if (sad > SceneCutThreshold * 3L * a.size) 1 else 0
          s"(${f.mediaId}, $ia, $ib, ${a.size}, ${b.size}, $sad, $cut)"
        }
      }
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, CAST(frame_a AS BIGINT) AS frame_a,
       |  CAST(frame_b AS BIGINT) AS frame_b, CAST(px_a AS BIGINT) AS px_a,
       |  CAST(px_b AS BIGINT) AS px_b, CAST(sad AS BIGINT) AS sad,
       |  CAST(is_cut AS BIGINT) AS is_cut
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, frame_a, frame_b, px_a, px_b, sad, is_cut)
       |ORDER BY media_id, frame_a""".stripMargin
  }

  /** DuckDB twin: VALUES literals from the ground-truth tuples. */
  def oracleSql: String = {
    val rows = fixtures.map { f =>
      val dec = f.truths.filter(_.nonEmpty)
      val px = dec.flatten
      def s(sel: ((Int, Int, Int)) => Int) = px.map(p => sel(p).toLong).sum
      def q(sel: ((Int, Int, Int)) => Int) = px.map(p => sel(p).toLong * sel(p)).sum
      s"(${f.mediaId}, ${f.truths.size}, ${dec.size}, ${px.size}, " +
        s"${s(_._1)}, ${s(_._2)}, ${s(_._3)}, ${q(_._1)}, ${q(_._2)}, ${q(_._3)})"
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, CAST(n_frames AS BIGINT) AS n_frames,
       |  CAST(decoded_frames AS BIGINT) AS decoded_frames,
       |  CAST(n_pixels AS BIGINT) AS n_pixels,
       |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       |  CAST(sum_b AS BIGINT) AS sum_b, CAST(sumsq_r AS BIGINT) AS sumsq_r,
       |  CAST(sumsq_g AS BIGINT) AS sumsq_g, CAST(sumsq_b AS BIGINT) AS sumsq_b
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, n_frames, decoded_frames, n_pixels,
       |    sum_r, sum_g, sum_b, sumsq_r, sumsq_g, sumsq_b)
       |ORDER BY media_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "m3_video_stats" -> (videoStats(_, _)),
      "m8_scene_changes" -> (sceneChanges(_, _)))

  val oracle: Map[String, String] = Map(
    "m3_video_stats" -> oracleSql,
    "m8_scene_changes" -> sceneOracleSql)
}
