package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** m6_image_quality: the image-side quality-scoring pass (the t2 twin
  * for the pixel plane) — per decoded image, the exact integer features
  * a multimodal curation pipeline filters on before training:
  *
  *  - `n_gray`      pixels with r = g = b (≈n_pixels → grayscale image)
  *  - `n_dark` / `n_bright`  extreme pixels (brightness r+g+b below 30 /
  *                 above 735) — near-black / blown-out detectors
  *  - `n_distinct_capped`  distinct packed RGB values, counted up to a
  *                 cap of 4096 — the low-color-count (solid fill, chart,
  *                 synthetic) detector; the cap bounds per-image state
  *                 at scale, where an image may hold 10⁸ pixels but the
  *                 filter only asks "fewer than a few thousand colors?"
  *  - `mode_count` multiplicity of the most frequent RGB value — the
  *                 flatness detector (mode_count ≈ n_pixels → banner /
  *                 letterboxed / solid image). The COUNT is emitted, not
  *                 the color, so ties cannot diverge the gate. The
  *                 frequency table backing it is capped at the SAME 4096
  *                 colors (the first ones encountered in row-major
  *                 order, a deterministic set): a photographic image can
  *                 hold 2^24 distinct RGBs, and an uncapped map is
  *                 hundreds of MB of executor state per image. Past the
  *                 cap, colors outside the tracked set still count
  *                 pixels but not candidates — exact for every image the
  *                 flatness filter actually fires on (a flat image's
  *                 mode is in the first 4096 colors by definition), and
  *                 a disclosed undercount on color-rich images, which
  *                 the filter discards anyway.
  *  - `bright_range`  max−min brightness — dynamic-range detector.
  *
  * All counters are row-local integer work inside the distributed decode
  * pass (the m1 plumbing); nothing shuffles but the per-image feature
  * rows. Oracle: the same counters computed from the ground-truth pixel
  * TUPLES at string-build time (never the decoder) as a VALUES literal —
  * the m1 independence contract.
  */
object ImageQuality {

  private val DarkMax = 30
  private val BrightMin = 735
  private val DistinctCap = 4096

  /** (nGray, nDark, nBright, nDistinctCapped, modeCount, range) */
  private[graft] def counters(px: Iterator[(Int, Int, Int)]): (Long, Long, Long, Long, Long, Long) = {
    var nGray = 0L; var nDark = 0L; var nBright = 0L
    var bMin = Int.MaxValue; var bMax = Int.MinValue
    val freq = new java.util.HashMap[Int, Long]()
    var distinct = 0L
    var mode = 0L
    while (px.hasNext) {
      val (r, g, b) = px.next()
      if (r == g && g == b) nGray += 1L
      val s = r + g + b
      if (s < DarkMax) nDark += 1L
      if (s > BrightMin) nBright += 1L
      if (s < bMin) bMin = s
      if (s > bMax) bMax = s
      val packed = (r << 16) | (g << 8) | b
      // the freq map is capped with the distinct counter: beyond
      // DistinctCap tracked colors, unseen colors are not inserted (see
      // the mode_count doc — O(DistinctCap) state per image, never
      // O(distinct colors))
      if (freq.size < DistinctCap || freq.containsKey(packed)) {
        val c = freq.merge(packed, 1L, (a, x) => a + x)
        if (c == 1L && distinct < DistinctCap) distinct += 1L
        if (c > mode) mode = c
      }
    }
    val range = if (bMax >= bMin) (bMax - bMin).toLong else 0L
    (nGray, nDark, nBright, distinct, mode, range)
  }

  def imageQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fx = MediaFixtures.fixtures.map(f => (f.mediaId, f.blob))
    spark
      .createDataset(fx)
      .repartition(4)
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          PixelDecode.decode(blob) match {
            case Some(img) =>
              val px = img.rgb
                .grouped(3)
                .map(a => (a(0) & 0xff, a(1) & 0xff, a(2) & 0xff))
              val (ng, nd, nb, ndc, mc, rg) = counters(px)
              (id, 1L, img.width.toLong * img.height, ng, nd, nb, ndc, mc, rg)
            case None => (id, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
          }
        }
      }
      .toDF(
        "media_id", "decoded", "n_pixels", "n_gray", "n_dark", "n_bright",
        "n_distinct_capped", "mode_count", "bright_range")
      .orderBy("media_id")
      .coalesce(1)
  }

  def oracleSql: String = {
    val rows = MediaFixtures.fixtures.map { f =>
      if (f.truth.isEmpty) s"(${f.mediaId}, 0, 0, 0, 0, 0, 0, 0, 0)"
      else {
        val (ng, nd, nb, ndc, mc, rg) = counters(f.truth.iterator)
        s"(${f.mediaId}, 1, ${f.truth.size}, $ng, $nd, $nb, $ndc, $mc, $rg)"
      }
    }
    s"""SELECT CAST(media_id AS BIGINT) AS media_id, CAST(decoded AS BIGINT) AS decoded,
       |  CAST(n_pixels AS BIGINT) AS n_pixels, CAST(n_gray AS BIGINT) AS n_gray,
       |  CAST(n_dark AS BIGINT) AS n_dark, CAST(n_bright AS BIGINT) AS n_bright,
       |  CAST(n_distinct_capped AS BIGINT) AS n_distinct_capped,
       |  CAST(mode_count AS BIGINT) AS mode_count,
       |  CAST(bright_range AS BIGINT) AS bright_range
       |FROM (VALUES
       |  ${rows.mkString(",\n  ")})
       |  t(media_id, decoded, n_pixels, n_gray, n_dark, n_bright,
       |    n_distinct_capped, mode_count, bright_range)
       |ORDER BY media_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("m6_image_quality" -> (imageQuality(_, _)))

  val oracle: Map[String, String] = Map("m6_image_quality" -> oracleSql)
}
