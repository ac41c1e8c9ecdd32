package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** m5_image_phash: perceptual-hash near-duplicate detection over decoded
  * images — the image-side twin of the text near-dup plane (d2/d3), the
  * dedup pass a multimodal training-data pipeline runs so the same
  * picture re-encoded (PNG vs BMP vs GIF vs JPEG), re-compressed, or
  * brightness-shifted collapses to one representative.
  *
  * The hash is an integer-exact dHash variant: the decoded image is
  * partitioned into an 8×4 grid of cells on floor boundaries
  * (cx ∈ [⌊cx·w/8⌋, ⌊(cx+1)·w/8⌋), likewise rows — every cell non-empty
  * for w ≥ 8, h ≥ 4), each cell reduced to an exact integer brightness
  * sum Σ(r+g+b) plus its pixel count, and one bit emitted per adjacent
  * cell pair — 7×4 horizontal + 8×3 vertical = 52 bits. Ragged cells
  * (w not a multiple of 8, e.g. the 14×11 JPEG fixtures) compare
  * cross-multiplied means (sumA·cntB vs sumB·cntA — exact in Long far
  * past any real image: sum ≤ 765·cellpx, product ≤ 765·cellpx², i.e.
  * < 2⁶³ for images up to ~10⁸ px/cell). Mean-comparison bits make the
  * hash invariant under global brightness shift — fixture 3 proves it.
  *
  * Pairing is the LSH band path, not all-pairs: the 52-bit hash splits
  * into 4 disjoint 13-bit bands; candidates come from a bucket self-join
  * on (band, value) and are then verified with an exact popcount of the
  * XOR. By pigeonhole, any pair within Hamming distance [[MaxHamming]] = 3
  * differs in at most 3 of the 4 bands, so at least one band collides —
  * the banding loses NOTHING at the gate's threshold, which the oracle
  * proves by computing the same pair set from an unbanded all-pairs
  * join. At 100 TB the band join is the scale path (|images|·4 index
  * rows, bucket-sized probes), the same posture as d3/d18.
  *
  * Gate sides never share a derivation: Spark hashes pixels DECODED from
  * real container bytes (PNG inflate/unfilter, BMP, GIF LZW, baseline +
  * progressive JPEG), while the oracle hashes the ground-truth pixel
  * TUPLES at string-build time and pairs them all-pairs in DuckDB
  * (`bit_count(xor(...))`). A byte-layout bug on either codec side, or a
  * recall hole in the banding, diverges the hash.
  */
object ImagePhash {

  private val GX = 8
  private val GY = 4
  private val Bands = 4
  private val BandBits = 13
  private[graft] val MaxHamming = 3L

  /** Cell sums/counts → 52-bit hash (shared bit-assembly; the two gate
    * sides differ in WHERE the pixels come from, decode vs truth).
    */
  private def assemble(sum: Array[Array[Long]], cnt: Array[Array[Long]]): Long = {
    var hash = 0L
    var bit = 0
    // horizontal: right cell brighter than left
    var cy = 0
    while (cy < GY) {
      var cx = 0
      while (cx < GX - 1) {
        if (sum(cx + 1)(cy) * cnt(cx)(cy) > sum(cx)(cy) * cnt(cx + 1)(cy))
          hash |= 1L << bit
        bit += 1
        cx += 1
      }
      cy += 1
    }
    // vertical: lower cell brighter than upper
    var cx = 0
    while (cx < GX) {
      var cy2 = 0
      while (cy2 < GY - 1) {
        if (sum(cx)(cy2 + 1) * cnt(cx)(cy2) > sum(cx)(cy2) * cnt(cx)(cy2 + 1))
          hash |= 1L << bit
        bit += 1
        cy2 += 1
      }
      cx += 1
    }
    hash
  }

  private def cellOf(i: Int, n: Int, g: Int): Int = {
    // inverse of the floor boundary: largest c with floor(c*n/g) <= i
    var c = (i.toLong * g / n).toInt
    while ((c + 1).toLong * n / g <= i) c += 1
    c
  }

  /** Hash from the decoder's packed RGB bytes (the Spark side). */
  private[graft] def phashFromRgb(rgb: Array[Byte], w: Int, h: Int): Long = {
    val sum = Array.ofDim[Long](GX, GY)
    val cnt = Array.ofDim[Long](GX, GY)
    var y = 0
    while (y < h) {
      val cy = cellOf(y, h, GY)
      var x = 0
      while (x < w) {
        val cx = cellOf(x, w, GX)
        val o = (y * w + x) * 3
        sum(cx)(cy) += (rgb(o) & 0xff) + (rgb(o + 1) & 0xff) + (rgb(o + 2) & 0xff)
        cnt(cx)(cy) += 1L
        x += 1
      }
      y += 1
    }
    assemble(sum, cnt)
  }

  /** Hash from ground-truth tuples (the oracle side, string-build time). */
  private[graft] def phashFromTuples(px: Seq[(Int, Int, Int)], w: Int, h: Int): Long = {
    val sum = Array.ofDim[Long](GX, GY)
    val cnt = Array.ofDim[Long](GX, GY)
    var i = 0
    while (i < px.size) {
      val cx = cellOf(i % w, w, GX)
      val cy = cellOf(i / w, h, GY)
      val (r, g, b) = px(i)
      sum(cx)(cy) += r + g + b
      cnt(cx)(cy) += 1L
      i += 1
    }
    assemble(sum, cnt)
  }

  /** One fixture: ground-truth tuples (empty → undecodable, no hash row)
    * plus the encoded container bytes the Spark side must decode.
    */
  final case class PhFixture(
      mediaId: Long,
      w: Int,
      h: Int,
      truth: Seq[(Int, Int, Int)],
      blob: Array[Byte])

  // Constructed patterns: 16×8 images of flat 2×2 cells aligned to the
  // 8×4 hash grid, so every comparison bit is decided by the cell value
  // function alone and the designed Hamming distances are provable:
  //   - vA's adjacent cells differ by 7·15 mod 11·15 horizontally and
  //     5·15 vertically, never 0 → no ties → a global +10 brightness
  //     shift preserves every comparison (fixture 3 ≡ fixtures 1/2).
  //   - the corner perturbation (cell (0,0): 60 → 255) flips exactly the
  //     two comparisons that touch that cell → Hamming 2.
  private val PW = 16
  private val PH = 8
  private def flat(f: (Int, Int) => Int): Seq[(Int, Int, Int)] =
    for (y <- 0 until PH; x <- 0 until PW) yield { val v = f(x / 2, y / 2); (v, v, v) }
  private def vA(cx: Int, cy: Int): Int = 60 + ((cx * 7 + cy * 5) % 11) * 15
  private def vB(cx: Int, cy: Int): Int = 50 + ((cx * 3 + cy * 8) % 13) * 12

  def fixtures: Seq[PhFixture] = {
    val pxA = flat(vA)
    val pxABright = flat((cx, cy) => vA(cx, cy) + 10)
    val pxACorner = flat((cx, cy) => if (cx == 0 && cy == 0) 255 else vA(cx, cy))
    val pxB = flat(vB)
    Seq(
      PhFixture(1L, PW, PH, pxA, MediaFixtures.pngBytes(pxA, PW, PH, Seq(0, 1, 2, 3, 4), -1)),
      PhFixture(2L, PW, PH, pxA, MediaFixtures.bmpBytes(pxA, PW, PH, storeTopDown = false)),
      PhFixture(3L, PW, PH, pxABright, MediaFixtures.gifBytes(pxABright, PW, PH, interlaced = false)),
      PhFixture(4L, PW, PH, pxACorner, MediaFixtures.pngBytes(pxACorner, PW, PH, Seq(4, 3, 2, 1, 0), 120)),
      PhFixture(5L, PW, PH, pxB, MediaFixtures.bmpBytes(pxB, PW, PH, storeTopDown = true)),
      PhFixture(6L, PW, PH, pxB, MediaFixtures.gifBytes(pxB, PW, PH, interlaced = true)),
      // the same 14×11 gray tiles through BOTH JPEG entropy layouts:
      // identical pixels → identical hash → a distance-0 pair (7, 8)
      PhFixture(7L, 14, 11, MediaFixtures.jpegGrayTruth, MediaFixtures.jpegGray),
      PhFixture(8L, 14, 11, MediaFixtures.jpegGrayTruth, MediaFixtures.jpegGrayProg),
      PhFixture(9L, 0, 0, Seq.empty, Array.tabulate[Byte](48)(i => (i * 29).toByte)))
  }

  /** The m5 gate: decode distributed, hash, band self-join, exact
    * popcount verify. Output: near-dup pairs (Hamming ≤ [[MaxHamming]])
    * with both hashes — gating the hash values themselves, the pair set,
    * and the banding's recall in one row set.
    */
  def imagePhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fx = fixtures.map(f => (f.mediaId, f.blob))
    val hashes = spark
      .createDataset(fx)
      .repartition(4) // exercise the multi-partition decode path
      .mapPartitions { it =>
        it.flatMap { case (id, blob) =>
          PixelDecode.decode(blob) match {
            case Some(img) if img.width >= GX && img.height >= GY =>
              Some((id, phashFromRgb(img.rgb, img.width, img.height)))
            case _ => None // undecodable or sub-grid: no hash row
          }
        }
      }
      .toDF("media_id", "phash")
    val bands = hashes
      .withColumn("band", explode(array((0 until Bands).map(lit): _*)))
      .withColumn("bv", expr(s"shiftright(phash, band * $BandBits) & ${(1 << BandBits) - 1}"))
    val cand = bands
      .as("x")
      .join(
        bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.media_id") < col("y.media_id"))
      .select(
        col("x.media_id").as("media_a"),
        col("y.media_id").as("media_b"),
        col("x.phash").as("hash_a"),
        col("y.phash").as("hash_b"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(hash_a ^ hash_b)").cast("long"))
      .filter(col("hamming") <= MaxHamming)
      .orderBy("media_a", "media_b")
      .coalesce(1)
  }

  /** DuckDB twin: hashes computed from the ground-truth tuples at
    * string-build time, paired ALL-PAIRS (no banding) — identical output
    * proves the band join's pigeonhole recall.
    */
  def oracleSql: String = {
    val rows = fixtures
      .filter(_.truth.nonEmpty)
      .map(f => s"(${f.mediaId}, ${phashFromTuples(f.truth, f.w, f.h)})")
    s"""WITH h(media_id, phash) AS (VALUES
       |  ${rows.mkString(",\n  ")})
       |SELECT CAST(a.media_id AS BIGINT) AS media_a, CAST(b.media_id AS BIGINT) AS media_b,
       |  CAST(a.phash AS BIGINT) AS hash_a, CAST(b.phash AS BIGINT) AS hash_b,
       |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
       |FROM h a JOIN h b ON a.media_id < b.media_id
       |WHERE bit_count(xor(a.phash, b.phash)) <= $MaxHamming
       |ORDER BY media_a, media_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("m5_image_phash" -> (imagePhash(_, _)))

  val oracle: Map[String, String] = Map("m5_image_phash" -> oracleSql)
}
