package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** m10_thumbnail: the RESIZE stage of a multimodal ingest pipeline —
  * every decodable fixture container is decoded through the distributed
  * [[PixelDecode]] path and nearest-neighbor resampled to each target in
  * [[Targets]] (one downsample, one non-integer-ratio upsample), emitting
  * exact integer channel sums plus an md5 of the resampled RGB byte
  * stream, so a single wrong pixel pick diverges the gate.
  *
  * Nearest-neighbor with the floor map src = (dst · srcDim) / dstDim —
  * pure integer arithmetic, which is what makes the stage oracle-able
  * bit-exactly (bilinear would put a float kernel between the engines).
  * The oracle side resamples the GROUND-TRUTH pixel tuples with the same
  * index arithmetic at string-build time — it never touches the decoder,
  * so decode and resample each get independent coverage (the m1
  * discipline). The per-fixture source dims are declared here and
  * cross-checked against the truth tuple counts at build time; a decoder
  * that disagreed on dimensions would diverge the hash.
  *
  * Scale posture: row-local work only (decode + resample inside one
  * mapPartitions pass, no shuffle at all) — the shape that tiles to any
  * corpus size, same as m1/m6.
  */
object ImageResample {

  private val Targets = Seq((4, 3), (11, 7))

  /** Source dims per fixture id (empty-truth fixtures omitted) —
    * cross-checked against truth sizes in [[oracleSql]].
    */
  private val Dims: Map[Long, (Int, Int)] = Map(
    1L -> ((8, 5)), 2L -> ((8, 5)), 3L -> ((8, 5)), 4L -> ((8, 5)), 5L -> ((8, 5)),
    8L -> ((8, 5)), 9L -> ((8, 5)), 10L -> ((14, 11)), 11L -> ((16, 16)), 12L -> ((16, 16)),
    14L -> ((14, 11)), 15L -> ((16, 16)))

  private def resample(rgb: Array[Byte], w: Int, h: Int, tw: Int, th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        val sx = x * w / tw
        val si = (sy * w + sx) * 3
        val oi = (y * tw + x) * 3
        out(oi) = rgb(si); out(oi + 1) = rgb(si + 1); out(oi + 2) = rgb(si + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(bytes)
      .map(b => f"${b & 0xff}%02x")
      .mkString

  def thumbnails(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fx = MediaFixtures.fixtures.map(f => (f.mediaId, f.blob))
    val targets = Targets
    spark
      .createDataset(fx)
      .repartition(4)
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          val decoded = PixelDecode.decode(blob)
          targets.map { case (tw, th) =>
            decoded match {
              case Some(img) =>
                val rs = resample(img.rgb, img.width, img.height, tw, th)
                var sr = 0L; var sg = 0L; var sb = 0L
                var i = 0
                while (i < rs.length) {
                  sr += rs(i) & 0xff; sg += rs(i + 1) & 0xff; sb += rs(i + 2) & 0xff
                  i += 3
                }
                (id, tw.toLong, th.toLong, 1L, tw.toLong * th, sr, sg, sb, md5Hex(rs))
              case None =>
                (id, tw.toLong, th.toLong, 0L, 0L, 0L, 0L, 0L, "")
            }
          }
        }
      }
      .toDF("media_id", "tw", "th", "decoded", "n_pixels", "sum_r", "sum_g", "sum_b", "rgb_md5")
      .orderBy("media_id", "tw")
      .coalesce(1)
  }

  /** DuckDB twin: VALUES literals resampled from the ground-truth tuples
    * by the same floor-map arithmetic — never through the decoder.
    */
  def oracleSql: String = {
    val rows = MediaFixtures.fixtures.flatMap { f =>
      Targets.map { case (tw, th) =>
        if (f.truth.isEmpty) s"(${f.mediaId}, $tw, $th, 0, 0, 0, 0, 0, '')"
        else {
          val (w, h) = Dims(f.mediaId)
          require(f.truth.size == w * h,
            s"fixture ${f.mediaId}: declared dims ${w}x$h disagree with ${f.truth.size} truth tuples")
          val picked = for (y <- 0 until th; x <- 0 until tw) yield f.truth(y * h / th * w + x * w / tw)
          val bytes = picked.flatMap { case (r, g, b) => Seq(r.toByte, g.toByte, b.toByte) }.toArray
          val (sr, sg, sb) =
            (picked.map(_._1.toLong).sum, picked.map(_._2.toLong).sum, picked.map(_._3.toLong).sum)
          s"(${f.mediaId}, $tw, $th, 1, ${tw * th}, $sr, $sg, $sb, '${md5Hex(bytes)}')"
        }
      }
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, CAST(tw AS BIGINT) AS tw,
       |  CAST(th AS BIGINT) AS th, CAST(decoded AS BIGINT) AS decoded,
       |  CAST(n_pixels AS BIGINT) AS n_pixels, CAST(sum_r AS BIGINT) AS sum_r,
       |  CAST(sum_g AS BIGINT) AS sum_g, CAST(sum_b AS BIGINT) AS sum_b, rgb_md5
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, tw, th, decoded, n_pixels, sum_r, sum_g, sum_b, rgb_md5)
       |ORDER BY media_id, tw""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("m10_thumbnail" -> (thumbnails(_, _)))

  val oracle: Map[String, String] = Map("m10_thumbnail" -> oracleSql)
}
