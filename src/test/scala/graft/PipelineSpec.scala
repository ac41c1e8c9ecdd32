package graft

import graft.multimodal.Multimodal
import graft.operators.FeatureAggJob
import graft.sources.Csv
import graft.store.OnlineFeatureStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composition tests: the reference's batch job (scan ->
  * windows -> export + store), CSV source parity quirk, and the
  * multimodal decode plumbing.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")
  import spark.implicits._

  test("batch feature job: store snapshot matches the latest-per-key query") {
    val store = new OnlineFeatureStore(Seq("cnt_1w", "avg_1w"))
    val events = Tables
      .events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("ts"), col("value").as("amount"))
    val dir = java.nio.file.Files.createTempDirectory("job").toString

    val result = FeatureAggJob.run(
      events, "user_id", "ts", "amount", store, Some(s"$dir/train"))

    assert(store.size == 15) // one record per user at sf0.001
    // cross-check one user against the aggregate frame
    val snap = result.snapshot.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    snap.foreach { case (k, cnt) =>
      assert(store.getFeature(k, "cnt_1w").contains(cnt))
    }
    // training CSV written as a single part with header
    val files = new java.io.File(s"$dir/train").listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val firstLine = scala.io.Source.fromFile(files.head).getLines().next()
    assert(firstLine.startsWith("user_id,amount,num_trans_last_10m"))
  }

  test("csv reference quirk: header row becomes an all-null artifact, dropped") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DoubleType)))
    Seq((1L, 2.5), (2L, 3.5)).toDF("id", "amount").coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(dir + "/data")

    val fixed = Csv.readTyped(spark, dir + "/data", schema)
    assert(fixed.count() == 2)

    val quirkKept = Csv.readReferenceQuirk(spark, dir + "/data", schema, dropNullArtifacts = false)
    assert(quirkKept.count() == 3) // header parsed as null row (reference S1)
    assert(quirkKept.filter(col("id").isNull && col("amount").isNull).count() == 1)

    val quirkDropped = Csv.readReferenceQuirk(spark, dir + "/data", schema)
    assert(quirkDropped.count() == 2) // reference's later dropna (P6)
  }

  test("multimodal: decode runs per-partition, features deterministic, resize plan pure") {
    val media = Multimodal.syntheticMedia(spark, 100, partitions = 4)
    val feats = Multimodal.extractFeatures(media, batchSize = 16).collect()
    assert(feats.length == 100)
    assert(feats.forall(_.features.length == Multimodal.StubCodec.FeatureDim))
    // deterministic across re-runs (stable hash features, no RNG)
    val again = Multimodal.extractFeatures(media, batchSize = 7).collect()
    assert(feats.sortBy(_.mediaId).zip(again.sortBy(_.mediaId))
      .forall { case (a, b) => a.features.sameElements(b.features) })
    // frame sampling bounds
    val frames = Multimodal.StubCodec.sampleFrames(Array.tabulate[Byte](100)(_.toByte), 5)
    assert(frames.length == 5 && frames.forall(_.nonEmpty))
    // resize plan never upscales and preserves aspect bound
    val resized = Multimodal.resizePlan(media.toDF(), maxDim = 128)
    assert(resized.filter(col("target_width") > col("width")).count() == 0)
    assert(resized.filter(greatest(col("target_width"), col("target_height")) > 128).count() == 0)
  }

  test("multimodal: PNG/BMP dimensions parse from REAL container headers, not metadata") {
    import graft.multimodal.{ImageHeaders, Multimodal}
    import graft.multimodal.Multimodal.MediaRecord
    // genuine PNG layout: signature, IHDR length(13), "IHDR", BE w/h
    def be(i: Int) = Array[Byte]((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    val png = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be(13) ++ "IHDR".getBytes ++ be(640) ++ be(480) ++ Array[Byte](8, 6, 0, 0, 0)
    // genuine BMP layout: "BM", file header, LE w/h at offsets 18/22
    def le(i: Int) = Array[Byte](i.toByte, (i >>> 8).toByte, (i >>> 16).toByte, (i >>> 24).toByte)
    val bmp = "BM".getBytes ++ le(126) ++ le(0) ++ le(54) ++ le(40) ++ le(320) ++ le(-200) ++
      Array[Byte](1, 0)
    assert(ImageHeaders.probe(png) == ImageHeaders.Probe("png", 640, 480))
    assert(ImageHeaders.probe(bmp) == ImageHeaders.Probe("bmp", 320, 200), "top-down BMP height")
    assert(ImageHeaders.probe(Array[Byte](1, 2, 3)).format == "unknown")
    // genuine JPEG layout: SOI, APP0 (JFIF), DQT filler segment, then a
    // baseline SOF0 frame header [len][precision][BE height][BE width]
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xff.toByte, marker.toByte,
        ((payload.length + 2) >>> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
    def be2(i: Int) = Array[Byte]((i >>> 8).toByte, (i & 0xff).toByte)
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = seg(0xe0, "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val dqt = seg(0xdb, Array.fill[Byte](65)(3))
    val sof0 = seg(0xc0, Array[Byte](8) ++ be2(240) ++ be2(320) ++ Array[Byte](3))
    val sof2 = seg(0xc2, Array[Byte](8) ++ be2(64) ++ be2(128) ++ Array[Byte](1))
    assert(ImageHeaders.probe(soi ++ app0 ++ dqt ++ sof0) ==
      ImageHeaders.Probe("jpeg", 320, 240), "baseline SOF0 dims")
    assert(ImageHeaders.probe(soi ++ app0 ++ sof2) ==
      ImageHeaders.Probe("jpeg", 128, 64), "progressive SOF2 dims")
    // truncated-after-SOI and SOS-before-SOF streams probe as dimensionless jpeg
    assert(ImageHeaders.probe(soi ++ app0) == ImageHeaders.Probe("jpeg", 0, 0))
    assert(ImageHeaders.probe(soi ++ Array(0xff, 0xda).map(_.toByte)) ==
      ImageHeaders.Probe("jpeg", 0, 0))
    // genuine GIF layout: signature + LE logical-screen dims at offsets 6/8
    val gif = "GIF89a".getBytes ++
      Array[Byte]((500 & 0xff).toByte, (500 >> 8).toByte, (300 & 0xff).toByte, (300 >> 8).toByte) ++
      Array[Byte](0, 0, 0)
    assert(ImageHeaders.probe(gif) == ImageHeaders.Probe("gif", 500, 300))
    // genuine WAV layout: RIFF/WAVE, a junk chunk BEFORE fmt (the walk
    // must skip unknown chunks, including odd-length pad), then PCM fmt
    import graft.multimodal.AudioHeaders
    def le2(i: Int) = Array[Byte]((i & 0xff).toByte, (i >> 8).toByte)
    def le4(i: Int) = Array[Byte](
      (i & 0xff).toByte, ((i >> 8) & 0xff).toByte, ((i >> 16) & 0xff).toByte, (i >>> 24).toByte)
    val fmt = le2(1) ++ le2(2) ++ le4(44100) ++ le4(44100 * 4) ++ le2(4) ++ le2(16)
    val wav = "RIFF".getBytes ++ le4(200) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le4(3) ++ Array[Byte](7, 7, 7, 0) ++ // odd payload, even-padded
      "fmt ".getBytes ++ le4(16) ++ fmt ++
      "data".getBytes ++ le4(0)
    assert(AudioHeaders.probe(wav) ==
      AudioHeaders.AudioProbe("wav-pcm", 2, 44100, 16, 44100 * 4, 0L, 0L))
    assert(AudioHeaders.probe("RIFF1234AVI ".getBytes).format == "unknown")
    assert(AudioHeaders.probe(Array[Byte](1, 2)).format == "unknown")
    // duration from the data chunk's DECLARED size: 2.5 s of 44.1 kHz
    // 16-bit stereo = 441000 bytes at byteRate 176400 — the payload itself
    // is absent (header-prefix fetch), which must not matter
    val wavDur = "RIFF".getBytes ++ le4(441036) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ fmt ++
      "data".getBytes ++ le4(441000)
    val durProbe = AudioHeaders.probe(wavDur)
    assert(durProbe.dataBytes == 441000L && durProbe.durationMs == 2500L,
      s"declared-size duration, got $durProbe")
    // data BEFORE fmt (legal RIFF ordering): the walk continues past the
    // payload and still finds fmt; 8820 bytes at byteRate 176400 = 50 ms
    val wavRev = "RIFF".getBytes ++ le4(8856) ++ "WAVE".getBytes ++
      "data".getBytes ++ le4(8820) ++ Array.fill[Byte](8820)(0) ++
      "fmt ".getBytes ++ le4(16) ++ fmt
    val revProbe = AudioHeaders.probe(wavRev)
    assert(revProbe.format == "wav-pcm" && revProbe.durationMs == 50L,
      s"data-first chunk order, got $revProbe")
    // a crafted chunk size near Int.MaxValue must yield a clean probe,
    // not an ArrayIndexOutOfBoundsException from cursor wraparound
    val wavEvil = "RIFF".getBytes ++ le4(200) ++ "WAVE".getBytes ++
      "JUNK".getBytes ++ le4(Int.MaxValue - 4) ++ Array[Byte](0, 0, 0, 0)
    assert(AudioHeaders.probe(wavEvil).format == "unknown")
    val wavEvil2 = "RIFF".getBytes ++ le4(200) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ fmt ++
      "JUNK".getBytes ++ le4(Int.MaxValue - 4)
    assert(AudioHeaders.probe(wavEvil2).format == "wav-pcm",
      "fmt params already parsed must survive a corrupt trailing chunk")
    // NEGATIVE trailing chunk size is the same corrupt-tail condition as
    // the huge positive one — parsed fmt params must survive both alike
    val wavEvil3 = "RIFF".getBytes ++ le4(200) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ fmt ++
      "JUNK".getBytes ++ le4(-100)
    assert(AudioHeaders.probe(wavEvil3).format == "wav-pcm",
      "fmt params already parsed must survive a negative trailing chunk size")

    import spark.implicits._
    val rows = Seq(
      MediaRecord(1L, "image", png, 0, 0, 0),
      MediaRecord(2L, "image", bmp, 0, 0, 0),
      MediaRecord(3L, "audio", Array[Byte](9, 9, 9), 0, 0, 16000)).toDS()
    val probed = Multimodal.probeDims(rows).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(probed(1L) == (("png", 640, 480)))
    assert(probed(2L) == (("bmp", 320, 200)))
    assert(probed(3L) == (("unknown", 0, 0)))
  }
}
