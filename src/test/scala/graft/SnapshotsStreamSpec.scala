package graft

import graft.sources.Snapshots
import graft.streaming.StreamingAgg
import graft.streaming.StreamingAgg.StreamEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The two round-10 planes COMPOSED: Structured Streaming's per-event
  * trailing-window operator feeding the snapshot table through the
  * exactly-once sink, then audited through time travel. The parts are
  * spec'd separately (StreamingSpec: batch≡stream bit-parity;
  * SnapshotsSpec: sink idempotence, manifest isolation) — this spec
  * guards the INTEGRATION: version k of the table is exactly the
  * micro-batches ≤ k, a replayed batch is a no-op against the live
  * table, a restart resumes the version chain from the checkpoint, and
  * a historical read reproduces the store as it stood after batch k —
  * the reproducible-training contract ("train on the features as of
  * Tuesday") that motivates versioning a feature store at all.
  */
class SnapshotsStreamSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")

  private def emitsOf(dir: String, version: Int): Set[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Snapshots
      .readVersion(spark, dir, version)
      .select("userId", "ordUs", "cnt", "sumCents")
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSet
  }

  test("stream -> trailing agg -> exactly-once sink -> time travel, end to end") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("snap_stream_e2e").toString
    val dir = s"$root/table"
    val ckpt = s"$root/ckpt"

    // three micro-batches of per-user events inside one trailing horizon
    val m = 60L * 1000000L
    val chunks = Seq(
      Seq(StreamEvent(1L, 1 * m, 100L), StreamEvent(2L, 1 * m, 50L)),
      Seq(StreamEvent(1L, 2 * m, 300L)),
      Seq(StreamEvent(2L, 3 * m, 150L), StreamEvent(1L, 3 * m, 500L)))

    val source = MemoryStream[StreamEvent]
    def startQuery() = StreamingAgg
      .trailingAgg(source.toDS())
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch((ds: org.apache.spark.sql.Dataset[StreamingAgg.AggEmit], id: Long) =>
        Snapshots.sink(dir)(ds.toDF(), id))
      .start()

    // capture the LIVE table contents after each micro-batch: the
    // time-travel assertions below replay history against these
    val live = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long, Long)]]
    val q = startQuery()
    try {
      chunks.foreach { c =>
        source.addData(c)
        q.processAllAvailable()
        live += emitsOf(dir, Snapshots.latestVersion(spark, dir))
      }
    } finally q.stop()

    assert(Snapshots.latestVersion(spark, dir) == 3,
      "each data-carrying micro-batch must publish exactly one version")
    assert(live(0).size == 2 && live(1).size == 3 && live(2).size == 5,
      "per-event emission: one table row per input event, accreting across batches")

    // version k IS the store as of batch k — bit-identical to what a
    // reader saw live, forever
    (1 to 3).foreach { v =>
      assert(emitsOf(dir, v) == live(v - 1),
        s"historical read of v$v must reproduce the store exactly as of batch ${v - 1}")
    }

    // the streamed table equals the BATCH form of the same operator over
    // the full replay — the cross-plane parity StreamingSpec pins for
    // emissions, now holding THROUGH the sink and the manifests
    val batchForm = StreamingAgg
      .trailingAgg(chunks.flatten.toDS())
      .select("userId", "ordUs", "cnt", "sumCents")
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSet
    assert(emitsOf(dir, 3) == batchForm,
      "stream-through-sink must be bit-identical to the batch operator")

    // a replayed micro-batch (crash between manifest rename and
    // checkpoint commit) is a no-op
    val replay = StreamingAgg.trailingAgg(chunks(1).toDS())
    assert(!Snapshots.commitAppendExactlyOnce(replay.toDF(), dir, 1L))
    assert(Snapshots.latestVersion(spark, dir) == 3 && emitsOf(dir, 3) == live(2),
      "the replay must leave the table untouched")

    // a RESTART from the checkpoint resumes the batch-id chain: the new
    // query's first batch continues, versions keep accreting
    val q2 = startQuery()
    try {
      source.addData(Seq(StreamEvent(3L, 4 * m, 700L)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(Snapshots.latestVersion(spark, dir) == 4,
      "a restarted query must append the next version, not fork or replay")
    assert(emitsOf(dir, 4) == live(2) + ((3L, 4 * m, 1L, 700L)))
    // and history below the restart is untouched
    assert(emitsOf(dir, 2) == live(1))
  }

  test("checked sink: a poisoned micro-batch fails the query; a clean restart loses nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("snap_stream_chk").toString
    val dir = s"$root/table"
    val cons = Seq("cents_pos" -> (col("cents") > 0L))

    val source = MemoryStream[StreamEvent]
    def startQuery() = source
      .toDS()
      .toDF()
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch(Snapshots.checkedSink(dir, cons))
      .start()

    val q = startQuery()
    val failed =
      try {
        source.addData(Seq(StreamEvent(1L, 1L, 100L)))
        q.processAllAvailable()
        assert(Snapshots.latestVersion(spark, dir) == 1)
        // the poisoned batch: the query must FAIL, not land it silently
        source.addData(Seq(StreamEvent(2L, 2L, -5L), StreamEvent(3L, 3L, 30L)))
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        true
      } finally q.stop()
    assert(failed)
    assert(Snapshots.latestVersion(spark, dir) == 1,
      "a refused micro-batch must publish nothing")
    assert(Snapshots.readLatest(spark, dir).count() == 1)

    // a blind restart replays the SAME poisoned batch and fails AGAIN —
    // the poison can never sneak in through the replay path
    val q2 = startQuery()
    try intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    } finally q2.stop()
    assert(Snapshots.latestVersion(spark, dir) == 1)

    // recovery: the operator lands the CORRECTED batch out-of-band under
    // the same batch id...
    assert(Snapshots.commitAppendExactlyOnce(
      Seq((2L, 2L, 5L), (3L, 3L, 30L)).toDF("userId", "ordUs", "cents"), dir, 1L))
    // ...and the restarted query's replay of that id SKIPS cleanly (the
    // skip runs before validation — the still-poisoned replay rows no
    // longer matter) and the stream proceeds; nothing was lost
    val q3 = startQuery()
    try {
      q3.processAllAvailable()
      source.addData(Seq(StreamEvent(4L, 4L, 40L)))
      q3.processAllAvailable()
    } finally q3.stop()
    assert(Snapshots.latestVersion(spark, dir) == 3,
      "post-recovery batches must keep accreting versions")
    assert(Snapshots.readLatest(spark, dir).count() == 4,
      "survivors + corrected batch + post-recovery batch, nothing lost or doubled")
  }

  test("readStream tails the table: batch parity, checkpoint resume, rewrite refusal") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snap_src").toString
    val dir = s"$root/table"
    val ckpt = s"$root/ckpt"
    Snapshots.commitAppend(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), dir)
    Snapshots.commitAppend(Seq((3L, 30L)).toDF("k", "v"), dir)
    // foreachBatch accumulator (the memory sink refuses checkpoint
    // recovery, and the restart half is exactly what this test pins)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
    def tail(ck: String) = spark.readStream
      .format("graft.streaming.SnapshotsStreamSource")
      .option("path", dir)
      .option("startingVersion", "0")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("k", "v").as[(Long, Long)].collect().foreach(seen.add)
        ()
      }
      .option("checkpointLocation", ck)
      .start()
    def rows = { import scala.jdk.CollectionConverters._; seen.asScala.toSet }
    val q = tail(ckpt)
    try {
      q.processAllAvailable()
      // the initial drain ≡ the batch incremental read from table birth
      assert(rows == Snapshots.readLatest(spark, dir).as[(Long, Long)].collect().toSet)
      // a new version lands while the query runs: delivered exactly once
      Snapshots.commitAppend(Seq((4L, 40L)).toDF("k", "v"), dir)
      q.processAllAvailable()
      assert(rows == Set((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
    } finally q.stop()
    // versions land while the query is DOWN; the restarted query resumes
    // from the checkpointed version cursor — it receives ONLY the
    // unconsumed versions (batch parity with readChangesSince)
    Snapshots.commitAppend(Seq((5L, 50L)).toDF("k", "v"), dir)
    seen.clear()
    val q2 = tail(ckpt)
    try {
      q2.processAllAvailable()
      val expected = Snapshots.readChangesSince(spark, dir, 3, 4)
        .as[(Long, Long)].collect().toSet
      assert(rows == expected && expected == Set((5L, 50L)),
        "restart must consume exactly the versions after the checkpoint cursor")
      // a history rewrite mid-tail FAILS the query with the incremental
      // contract's refusal — never a silent wrong diff
      Snapshots.commitOverwrite(Seq((9L, 90L)).toDF("k", "v"), dir)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
        q2.awaitTermination(20000)
        ()
      }
      assert(e.getMessage.contains("append") ||
        Option(e.getCause).exists(_.getMessage.contains("append")),
        s"refusal should name the append-only contract: ${e.getMessage}")
    } finally q2.stop()
    // bounded replay: endingVersion clamps the drain (the table's latest
    // is far past v2 by now)
    seen.clear()
    val q3 = spark.readStream
      .format("graft.streaming.SnapshotsStreamSource")
      .option("path", dir)
      .option("startingVersion", "1")
      .option("endingVersion", "2")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.select("k", "v").as[(Long, Long)].collect().foreach(seen.add)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt3")
      .start()
    try {
      q3.processAllAvailable()
      assert(rows == Set((3L, 30L)),
        "endingVersion must clamp the tail to exactly (start, end]")
    } finally q3.stop()
  }

  test("table-to-table pipeline: tail bronze, transform, exactly-once sink into silver") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val root = java.nio.file.Files.createTempDirectory("snap_pipe").toString
    val bronze = s"$root/bronze"
    val silver = s"$root/silver"
    val ckpt = s"$root/ckpt"
    // the medallion shape every lakehouse pipeline runs: a raw table
    // accretes appends, a continuous query derives the refined table —
    // the versioned-source and versioned-sink halves COMPOSED
    Snapshots.commitAppend(Seq((1L, 11L), (2L, 20L)).toDF("k", "v"), bronze)
    Snapshots.commitAppend(Seq((3L, 33L)).toDF("k", "v"), bronze)
    def pipeline() = spark.readStream
      .format("graft.streaming.SnapshotsStreamSource")
      .option("path", bronze)
      .option("startingVersion", "0")
      .load()
      .filter(col("v") % lit(2L) === lit(1L))
      .withColumn("v2", col("v") * 2L)
      .writeStream
      .foreachBatch(Snapshots.sink(silver))
      .option("checkpointLocation", ckpt)
      .start()
    def silverRows = Snapshots.readLatest(spark, silver)
      .select("k", "v", "v2").as[(Long, Long, Long)].collect().toSet
    def batchForm = Snapshots.readLatest(spark, bronze)
      .filter(col("v") % lit(2L) === lit(1L))
      .withColumn("v2", col("v") * 2L)
      .select("k", "v", "v2").as[(Long, Long, Long)].collect().toSet
    val q = pipeline()
    try {
      q.processAllAvailable()
      assert(silverRows == batchForm && silverRows == Set((1L, 11L, 22L), (3L, 33L, 66L)),
        "the streamed silver table must equal the batch transform of bronze")
    } finally q.stop()
    // a backlog lands while the pipeline is DOWN — including a version
    // the transform filters to EMPTY; the restart drains exactly the
    // unconsumed versions and the empty batch publishes no phantom rows
    Snapshots.commitAppend(Seq((4L, 40L)).toDF("k", "v"), bronze)
    Snapshots.commitAppend(Seq((5L, 55L)).toDF("k", "v"), bronze)
    val q2 = pipeline()
    try {
      q2.processAllAvailable()
      assert(silverRows == batchForm,
        "a restarted pipeline must consume exactly the backlog, once")
      assert(silverRows.contains((5L, 55L, 110L)) && !silverRows.exists(_._1 == 4L))
      // silver accretes its OWN version history: time travel to the
      // first drain still shows exactly the pre-backlog state
      assert(Snapshots.readVersion(spark, silver, 1)
        .select("k", "v", "v2").as[(Long, Long, Long)].collect().toSet
        == Set((1L, 11L, 22L), (3L, 33L, 66L)))
    } finally q2.stop()
  }

  test("streaming MoR-merge sink: per-batch upserts, zero rewrites, replay-safe LWW state") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("snap_mergesink").toString
    val dir = s"$root/table"
    val ckpt = s"$root/ckpt"
    // the reference's streaming put_record cadence landed on the
    // versioned table: every micro-batch is one keyed upsert, and the
    // MoR path makes each commit O(changes) — no file ever rewrites
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    def startQuery() = source
      .toDS()
      .toDF("id", "cents")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(Snapshots.mergeSink(dir, "id"))
      .start()
    val chunks = Seq(
      Seq((1L, 10L), (2L, 20L)), // bootstrap: append into the empty table
      Seq((2L, 21L), (3L, 30L)), // update 2, insert 3 — the first real merge
      Seq((1L, 12L)))            // update 1
    val q = startQuery()
    try {
      chunks.foreach { c => source.addData(c); q.processAllAvailable() }
    } finally q.stop()
    def rows(v: Int) = Snapshots.readVersion(spark, dir, v)
      .as[(Long, Long)].collect().toSet
    assert(Snapshots.latestVersion(spark, dir) == 3)
    assert(rows(3) == Set((1L, 12L), (2L, 21L), (3L, 30L)), "LWW end state")
    // time travel: each version is exactly the store as of its batch
    assert(rows(1) == Set((1L, 10L), (2L, 20L)))
    assert(rows(2) == Set((1L, 10L), (2L, 21L), (3L, 30L)))
    // ZERO rewrites: v3's manifest still lists every v1 and v2 file
    val v3Files = Snapshots.manifest(spark, dir, 3)._2.map(_.path).toSet
    (1 to 2).foreach(v => assert(
      Snapshots.manifest(spark, dir, v)._2.map(_.path).forall(v3Files.contains),
      s"the merge sink must carry every v$v file by reference"))
    // a replayed micro-batch (crash between publish and checkpoint
    // commit) is a no-op on the live table
    assert(!Snapshots.commitMergeMorExactlyOnce(
      spark, dir, chunks(1).toDF("id", "cents"), "id", 1L))
    assert(Snapshots.latestVersion(spark, dir) == 3 && rows(3).size == 3)
    // a restart resumes the batch chain; OPTIMIZE then folds the
    // accumulated vector and the state reads identically
    val q2 = startQuery()
    try {
      source.addData(Seq((3L, 33L)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(rows(4) == Set((1L, 12L), (2L, 21L), (3L, 33L)))
    val folded = Snapshots.commitOptimize(spark, dir, targetFileBytes = 1L << 20)
    assert(Snapshots.dvInfo(spark, dir, folded).isEmpty)
    assert(rows(folded) == Set((1L, 12L), (2L, 21L), (3L, 33L)))
  }

  test("maxVersionsPerBatch drains a backlog one version per micro-batch") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snap_src_rate").toString
    val dir = s"$root/table"
    (1 to 4).foreach(i => Snapshots.commitAppend(Seq((i.toLong, i * 10L)).toDF("k", "v"), dir))
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[Set[(Long, Long)]]()
    val q = spark.readStream
      .format("graft.streaming.SnapshotsStreamSource")
      .option("path", dir)
      .option("startingVersion", "0")
      .option("maxVersionsPerBatch", "1")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.add(batch.select("k", "v").as[(Long, Long)].collect().toSet)
        ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try { q.awaitTermination(60000); () } finally q.stop()
    import scala.jdk.CollectionConverters._
    val got = batches.asScala.toList
    // the 4-version backlog must arrive as FOUR bounded bites, each one
    // version's append-diff in commit order — never one catch-up batch
    assert(got.map(_.size) == List(1, 1, 1, 1),
      s"expected 4 single-version batches, got ${got.map(_.size)}")
    assert(got == (1 to 4).map(i => Set((i.toLong, i * 10L))).toList,
      s"each micro-batch must be exactly its version's diff: $got")
  }
}
