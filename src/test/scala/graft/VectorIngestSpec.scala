package graft

import graft.operators.VectorIndex
import graft.sources.Snapshots
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming vector-ingestion architecture, end to end: embeddings
  * stream into a SNAPSHOT TABLE through the exactly-once sink (durable
  * landing zone; replays collapse there), and the bucketed IVF index
  * follows the table's append diff via
  * [[graft.operators.VectorIndex.syncFromSnapshots]] — never the stream
  * directly. Pins: every streamed vector is assigned exactly once (a
  * re-sync from the advanced cursor is a no-op; a zombie micro-batch
  * replay publishes nothing), the synced index is bit-identical in probe
  * results to a from-scratch assignment of the full corpus against the
  * same quantizer, and the exchange-free probe layout survives the
  * streamed appends.
  */
case class VecRow(vec_id: Long, embedding: Seq[Float])

class VectorIngestSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local("4")

  test("stream -> exactly-once snapshot sink -> index sync: once, bit-equal, exchange-free") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("vec_ingest").toString
    val dir = s"$root/table"
    val ckpt = s"$root/ckpt"

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    def chunkRows(p: Int): Seq[VecRow] = emb
      .filter(pmod(col("vec_id"), lit(10)) === 0 && pmod(col("vec_id"), lit(20)) === lit(p * 10))
      .select(col("vec_id"), col("embedding"))
      .as[VecRow].collect().toSeq

    // v1: the build corpus lands as the table's first snapshot; the
    // index trains on exactly that version
    Snapshots.commitOverwrite(base.select("vec_id", "embedding"), dir)
    VectorIndex.build(
      Snapshots.readVersion(spark, dir, 1), "vec_id", "embedding", "ivf_stream_idx", 16, 65536, 2)
    var cursor = 1

    // two streamed micro-batches of new vectors through the sink
    val source = MemoryStream[VecRow]
    val q = source.toDS().toDF()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => Snapshots.sink(dir)(df, id))
      .start()
    try {
      source.addData(chunkRows(0)); q.processAllAvailable()
      source.addData(chunkRows(1)); q.processAllAvailable()
    } finally q.stop()
    assert(Snapshots.latestVersion(spark, dir) == 3, "two micro-batches = two appends")

    // sync the index from the table's append diff
    cursor = VectorIndex.syncFromSnapshots(spark, dir, "ivf_stream_idx", "vec_id", "embedding", cursor)
    assert(cursor == 3)
    val rowsAfter = spark.table("ivf_stream_idx").count()
    assert(rowsAfter == emb.count(), "every vector exactly once in the assignment table")

    // re-sync from the advanced cursor: a no-op (the exactly-once cursor
    // contract — the caller feeds the returned high-water back)
    assert(VectorIndex.syncFromSnapshots(
      spark, dir, "ivf_stream_idx", "vec_id", "embedding", cursor) == cursor)
    assert(spark.table("ivf_stream_idx").count() == rowsAfter)

    // a zombie replay of an already-committed micro-batch publishes
    // nothing, so a later sync sees no phantom diff either
    Snapshots.sink(dir)(chunkRows(0).toDF(), 0L)
    assert(Snapshots.latestVersion(spark, dir) == 3, "replayed batch must be a no-op")

    // probe parity: the stream-synced index answers bit-identically to
    // the same build plus ONE batch append of the whole delta (k-means
    // training is a deterministic function of the build corpus, so both
    // tables share the quantizer) — streamed arrival order changes nothing
    VectorIndex.build(
      Snapshots.readVersion(spark, dir, 1), "vec_id", "embedding", "ivf_batch_idx", 16, 65536, 2)
    VectorIndex.append(
      spark, "ivf_batch_idx", (chunkRows(0) ++ chunkRows(1)).toDF(), "vec_id", "embedding")
    val cents = spark.table("ivf_stream_idx_centroids")
    assert(cents.collect().toSet == spark.table("ivf_batch_idx_centroids").collect().toSet,
      "deterministic training: both builds must share the quantizer")
    val queries = emb.filter(col("vec_id") < 32)
    def rows(table: String): Set[(Long, Long, Long, Long, Double)] = VectorIndex
      .topK(spark, table, queries, "vec_id", "embedding", 3, excludeSelf = true)
      .select("query_id", "vec_id", "cell", "rnk", "cosine")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(rows("ivf_stream_idx") == rows("ivf_batch_idx"),
      "stream-synced index must probe bit-identically to the batch-appended build")

    // the bucketed layout survives streamed appends: the synced index's
    // probe pays exactly what an unbucketed copy pays MINUS the index-side
    // exchange (the VectorIndexSpec control convention)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Bucketed.writePlain(spark.table("ivf_stream_idx"), "ivf_stream_plain")
      def exchanges(table: String): Int = {
        val plan = VectorIndex
          .probeFrames(
            spark.table(table), cents, queries, "vec_id", "embedding", 3, excludeSelf = true)
          .queryExecution.executedPlan.toString
        "Exchange hashpartitioning".r.findAllIn(plan).length
      }
      val bucketed = exchanges("ivf_stream_idx")
      val plain = exchanges("ivf_stream_plain")
      assert(plain == bucketed + 1,
        s"streamed appends must keep the index side exchange-free ($plain vs $bucketed)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
