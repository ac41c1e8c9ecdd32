package graft

import graft.sources.Snapshots
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The snapshot table's commit contracts — what x4's oracle gate cannot
  * see: torn commits stay invisible, history survives logical overwrite,
  * and version discovery ignores unpublished staging artifacts.
  */
class SnapshotsSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")

  test("commit/append/overwrite lifecycle: history stays readable and bit-stable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_spec").toString
    val v1 = Snapshots.commitOverwrite(Seq((1L, 10L), (2L, 20L)).toDF("id", "x"), dir)
    val v1Rows = Snapshots.readVersion(spark, dir, v1).as[(Long, Long)].collect().toSet
    val v2 = Snapshots.commitAppend(Seq((3L, 30L)).toDF("id", "x"), dir)
    val v3 = Snapshots.commitOverwrite(Seq((9L, 90L)).toDF("id", "x"), dir)
    assert((v1, v2, v3) == (1, 2, 3))
    assert(Snapshots.readVersion(spark, dir, 1).as[(Long, Long)].collect().toSet == v1Rows,
      "v1 must read identically after later commits logically replaced it")
    assert(Snapshots.readVersion(spark, dir, 2).as[(Long, Long)].collect().toSet
      == v1Rows + ((3L, 30L)), "append must see previous files plus its own")
    assert(Snapshots.readVersion(spark, dir, 3).as[(Long, Long)].collect().toSet
      == Set((9L, 90L)), "overwrite must see only its own files")
    assert(Snapshots.readLatest(spark, dir).as[(Long, Long)].collect().toSet == Set((9L, 90L)))
  }

  test("a torn commit (leftover .tmp manifest) is invisible to readers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_torn").toString
    Snapshots.commitOverwrite(Seq((1L, 1L)).toDF("id", "x"), dir)
    // simulate a writer that crashed after staging its manifest: data
    // files and a .tmp exist, the rename never happened
    val md = java.nio.file.Paths.get(dir, "_manifests")
    java.nio.file.Files.writeString(md.resolve("v2.list.tmp"), "file:/nonexistent.parquet\n")
    assert(Snapshots.latestVersion(spark, dir) == 1,
      "an unpublished .tmp manifest must not count as a version")
    intercept[IllegalArgumentException](Snapshots.readVersion(spark, dir, 2))
    // a crashed attempt also leaves an orphan STAGE directory; staging is
    // per-attempt-unique, so the retry of the same version must neither
    // collide with it nor read its junk
    val orphan = java.nio.file.Paths.get(dir, "data", "commit-v2")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("junk.parquet"), "not parquet")
    // the NEXT real commit publishes v2 normally over all the debris
    assert(Snapshots.commitAppend(Seq((2L, 2L)).toDF("id", "x"), dir) == 2)
    assert(Snapshots.readVersion(spark, dir, 2).count() == 2)
  }

  test("zone maps actually skip files, and never change results") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_zonemap").toString
    val rows = (1L to 4000L).map(i => (i, i % 97))
    Snapshots.commitOverwrite(
      rows.toDF("id", "x").repartitionByRange(8, col("id")), dir, Some("id"))
    val pruned = Snapshots.readVersionRange(spark, dir, 1, 100L, 400L)
    val full = Snapshots.readVersion(spark, dir, 1).filter(col("id").between(100L, 400L))
    assert(pruned.inputFiles.length < Snapshots.readVersion(spark, dir, 1).inputFiles.length,
      "the range read must hand the scan strictly fewer files on a range-clustered table")
    assert(pruned.as[(Long, Long)].collect().toSet == full.as[(Long, Long)].collect().toSet,
      "pruning must never change results")
    // a range outside every zone map reads no matching rows
    assert(Snapshots.readVersionRange(spark, dir, 1, 100000L, 200000L).count() == 0)
  }

  test("copy-on-write delete rewrites only overlapping files; prior version intact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_delete").toString
    val rows = (1L to 4000L).map(i => (i, i % 97))
    Snapshots.commitOverwrite(
      rows.toDF("id", "x").repartitionByRange(8, col("id")), dir, Some("id"))
    val v1Files = Snapshots.readVersion(spark, dir, 1).inputFiles.toSet
    assert(Snapshots.commitDelete(spark, dir, 100L, 400L) == 2)
    val v2Files = Snapshots.readVersion(spark, dir, 2).inputFiles.toSet
    val carried = v1Files.intersect(v2Files)
    assert(carried.nonEmpty, "files outside the deleted range must be carried, not rewritten")
    assert(v1Files.diff(v2Files).nonEmpty, "files holding doomed rows must be replaced")
    // v2 = v1 minus the range; v1 still reads every original row
    val v2Ids = Snapshots.readVersion(spark, dir, 2).select("id").as[Long].collect().toSet
    assert(v2Ids == (1L to 4000L).toSet.filterNot(i => i >= 100L && i <= 400L))
    assert(Snapshots.readVersion(spark, dir, 1).count() == 4000L,
      "time travel across a delete must still read the undeleted snapshot")
  }

  test("vacuum reference-counts by FILE: carried files survive, expired versions die") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_vacuum").toString
    val rows = (1L to 4000L).map(i => (i, i % 97))
    Snapshots.commitOverwrite(
      rows.toDF("id", "x").repartitionByRange(8, col("id")), dir, Some("id"))
    Snapshots.commitAppend(
      (4001L to 4100L).map(i => (i, i % 97)).toDF("id", "x"), dir, Some("id"))
    Snapshots.commitDelete(spark, dir, 100L, 400L)
    val v3Before = Snapshots.readVersion(spark, dir, 3).as[(Long, Long)].collect().toSet

    // keepFrom = 2: v2 still references EVERY v1 file (append carried
    // them), so nothing is deletable yet — only v1's manifest expires
    assert(Snapshots.vacuum(spark, dir, keepFrom = 2) == 0,
      "files referenced by a surviving version must never be deleted")
    intercept[IllegalArgumentException](Snapshots.readVersion(spark, dir, 1))
    assert(Snapshots.readVersion(spark, dir, 2).count() == 4100L)

    // keepFrom = 3: only now do the delete-rewritten originals lose their
    // last reference and get erased; v3 must read bit-identically after
    assert(Snapshots.vacuum(spark, dir, keepFrom = 3) > 0,
      "the rewritten-away files must be physically erased once unreferenced")
    intercept[IllegalArgumentException](Snapshots.readVersion(spark, dir, 2))
    assert(Snapshots.readVersion(spark, dir, 3).as[(Long, Long)].collect().toSet == v3Before,
      "surviving versions must read bit-identically across a vacuum")
  }

  test("exactly-once streaming sink: a replayed micro-batch is a no-op") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("snap_sink").toString
    val dir = s"$root/table"
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = source
      .toDS()
      .toDF("id", "x")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(Snapshots.sink(dir))
      .start()
    try {
      source.addData((1L, 10L), (2L, 20L))
      q.processAllAvailable()
      source.addData((3L, 30L))
      q.processAllAvailable()
    } finally q.stop()
    def tableRows() = Snapshots.readLatest(spark, dir).as[(Long, Long)].collect().toSet
    assert(tableRows() == Set((1L, 10L), (2L, 20L), (3L, 30L)),
      "the sink must land every micro-batch exactly once")

    // the at-least-once failure mode: the engine replays batch 1 (same
    // id, same data) after a crash between manifest rename and
    // checkpoint commit — the recorded batch id makes it a no-op
    val vBefore = Snapshots.latestVersion(spark, dir)
    assert(!Snapshots.commitAppendExactlyOnce(Seq((3L, 30L)).toDF("id", "x"), dir, 1L),
      "a replayed batch id must be skipped")
    assert(Snapshots.latestVersion(spark, dir) == vBefore && tableRows().size == 3,
      "the replay must leave the table untouched")

    // a genuinely new batch id still commits
    assert(Snapshots.commitAppendExactlyOnce(Seq((4L, 40L)).toDF("id", "x"), dir, 2L))
    assert(tableRows() == Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))

    // idempotence survives a retention pass: vacuum down to the newest
    // version (whose manifest carries the highest batch id) — an old
    // replay must STILL be skipped, and a fresh batch still commits
    Snapshots.vacuum(spark, dir, keepFrom = Snapshots.latestVersion(spark, dir))
    assert(!Snapshots.commitAppendExactlyOnce(Seq((1L, 10L)).toDF("id", "x"), dir, 2L),
      "a replayed batch id must stay skipped after vacuum")
    assert(Snapshots.commitAppendExactlyOnce(Seq((5L, 50L)).toDF("id", "x"), dir, 3L))
    assert(tableRows().size == 5)
  }

  test("reads push filters into the snapshot's parquet scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap_pushdown").toString
    Snapshots.commitOverwrite((1L to 100L).map(i => (i, i * 2)).toDF("id", "x"), dir)
    val plan = Snapshots
      .readLatest(spark, dir)
      .filter(col("id") > 90L)
      .select("id")
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      s"snapshot read must stay an ordinary pushdown-capable parquet scan:\n$plan")
  }
}
