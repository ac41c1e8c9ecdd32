package graft.operators

import graft.sources.Bucketed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Persisted IVF vector index — the production ANN lifecycle. The gated
  * v3/v4/d9 queries derive + train + assign per run, which is right for
  * one-shot pipeline stages; a serving corpus builds the index ONCE and
  * amortizes it across every later query batch:
  *
  *   - [[build]] trains the same quantizer as [[Similarity.ivfTopKAuto]]
  *     (sqrt-n cells, md5-hash training sample, md5-rank seeds, capped
  *     cells) and persists BOTH halves: the bounded centroid table as a
  *     plain catalog table and the cell assignment as a table BUCKETED BY
  *     `cell` ([[graft.sources.Bucketed]]) — the 100 TB side of every
  *     future probe join is hash-laid-out on disk at build time and never
  *     shuffles again;
  *   - [[topK]] assigns an arbitrary query batch to its nProbe nearest
  *     stored centroids and joins in-cell. The only exchanges in the plan
  *     sit on the (small) query side; VectorIndexSpec asserts the index
  *     side reads its buckets exchange-free against an unbucketed control
  *     AND that a probe against the reloaded index is bit-identical to
  *     the from-scratch [[Similarity.ivfTopKAuto]] run (stored values are
  *     the exact integers of the oracle discipline, so a parquet
  *     round-trip changes nothing).
  */
object VectorIndex {

  /** Derive, train, assign, persist. `table` gets the bucketed
    * assignment (vec_id, qv, nrm, cell); `<table>_centroids` the
    * centroid frame (cell, c_qv, c_nrm).
    */
  def build(
      emb: DataFrame,
      idCol: String,
      embCol: String,
      table: String,
      floorCells: Int,
      capCells: Int,
      lloydIters: Int,
      maxCell: Long = Similarity.DefaultMaxCell,
      perCell: Long = 64L,
      buckets: Int = 32): Unit = {
    val base = Similarity.prepared(emb, idCol, embCol).persist(StorageLevel.MEMORY_AND_DISK)
    // the centroid frame feeds BOTH writes below (the assignment embeds it
    // as the broadcast side; the centroid table stores it) — unpersisted,
    // the whole Lloyd chain re-ran once per write (measured ~1 s of the
    // ~3 s sf0.1 build; at 100 TB it doubles the training cost). The frame
    // is bounded (capCells rows), so the persist is O(1); both blocks are
    // freed before return — the index tables are on disk, nothing later
    // reads these plans.
    val centroidsP = {
      val n = base.count()
      val nCells = Similarity.autoCells(n, floorCells, capCells)
      val stride = Similarity.trainStride(n, nCells, perCell)
      Similarity
        .kmeansCentroids(Similarity.trainSample(base, stride), nCells, lloydIters)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    try {
      val assigned = Similarity.capBySize(Similarity.assignCells(base, centroidsP), "cell", maxCell)
      Bucketed.write(assigned, table, "cell", buckets)
      Bucketed.writePlain(centroidsP, s"${table}_centroids")
    } finally {
      base.unpersist()
      centroidsP.unpersist()
      ()
    }
  }

  /** Incremental maintenance: assign a new vector batch to the EXISTING
    * stored centroids — no retrain, the production append path (FAISS's
    * `add` after `train`) — and append it into the bucketed assignment
    * table, preserving the exchange-free probe layout. The quantizer
    * drifts only as much as the data distribution does; a v6-style
    * recall monitor is the rebuild signal. Appended rows are NOT
    * re-capped: [[build]]'s `maxCell` applies to the build corpus, and a
    * skew-accreting cell is re-capped at the next rebuild (re-running
    * the cap here would need a full re-read of the stored assignment on
    * every batch — the wrong trade at 100 TB ingest rates).
    */
  def append(
      spark: SparkSession,
      table: String,
      newVecs: DataFrame,
      idCol: String,
      embCol: String,
      buckets: Int = 32): Unit = {
    val centroids = spark.table(s"${table}_centroids")
    val assigned =
      Similarity.assignCells(Similarity.prepared(newVecs, idCol, embCol), centroids)
    Bucketed.append(assigned, table, "cell", buckets)
  }

  /** Sync the bucketed index from a SNAPSHOT TABLE's append history —
    * the production ingestion architecture for a vector index at scale:
    * the stream lands in the versioned table through the exactly-once
    * sink (durable, replay-safe, auditable), and the index follows the
    * table's APPEND DIFF ([[graft.sources.Snapshots.readChangesSince]] —
    * one manifest diff, only the new files read) rather than consuming
    * the stream directly. The version number is the sync cursor: feed
    * the returned high-water back as the next call's `fromVersion` and
    * every appended vector is assigned exactly once, no matter how the
    * micro-batches were replayed upstream (the sink already collapsed
    * those). A delete/overwrite/OPTIMIZE in the range makes the diff
    * ill-posed — readChangesSince refuses — which is the rebuild signal,
    * same as a recall-monitor breach.
    */
  def syncFromSnapshots(
      spark: SparkSession,
      tableDir: String,
      table: String,
      idCol: String,
      embCol: String,
      fromVersion: Int): Int = {
    val to = graft.sources.Snapshots.latestVersion(spark, tableDir)
    if (to > fromVersion) {
      // a real readStream tail of the table (Trigger.AvailableNow drains
      // every version past the cursor, then stops): the hand-rolled diff
      // loop this method used to carry is now the streaming source's
      // getBatch — one machinery for ad-hoc sync and standing pipelines.
      // The caller's version cursor plays the checkpoint's role across
      // calls, so each invocation runs with a fresh transient checkpoint.
      val ckpt = java.nio.file.Files.createTempDirectory("graft_idx_sync").toString
      val q = spark.readStream
        .format("graft.streaming.SnapshotsStreamSource")
        .option("path", tableDir)
        .option("startingVersion", fromVersion.toString)
        .option("endingVersion", to.toString)
        .load()
        .writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) append(spark, table, batch, idCol, embCol)
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    to
  }

  /** Tombstoned DELETE — the FAISS IDSelector / Milvus delta-delete
    * pattern: removing vectors from a 100 TB bucketed index must not
    * rewrite it, so deletes append ids into a side table
    * (`<table>_tombstones`) and [[topKLive]] anti-joins them out at
    * probe time. O(ids) metadata write per delete, index files
    * untouched; [[vacuumDeletes]] folds the tombstones into the layout
    * once the set grows past what a probe-side broadcast should carry.
    */
  def delete(spark: SparkSession, table: String, ids: DataFrame, idCol: String): Unit = {
    val t = ids.select(col(idCol).cast("long").as("vec_id")).distinct()
    val name = s"${table}_tombstones"
    if (spark.catalog.tableExists(name))
      t.write.mode("append").format("parquet").saveAsTable(name)
    else Bucketed.writePlain(t, name)
  }

  /** The current tombstone rows (empty frame when none recorded). May
    * contain duplicates across delete batches — harmless to the
    * anti-join (existence semantics), and deduping here would put a
    * shuffle under every probe's broadcast for nothing.
    */
  def tombstones(spark: SparkSession, table: String): DataFrame = {
    val name = s"${table}_tombstones"
    if (spark.catalog.tableExists(name)) spark.table(name)
    else spark.range(0).select(col("id").as("vec_id"))
  }

  /** [[topK]] over the LIVE index rows: the bucketed assignment minus
    * the tombstone set, anti-joined via broadcast — no exchange lands on
    * the index side (broadcast joins preserve the bucketed layout, so
    * the probe's cell join stays exchange-free; VectorIndexSpec asserts
    * it). The broadcast is the deliberate trade: tombstone sets are a
    * small fraction of a served index by construction — past that, run
    * [[vacuumDeletes]] (the signal is the same operational dial as the
    * recall monitor's rebuild).
    */
  def topKLive(
      spark: SparkSession,
      table: String,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nProbe: Int = 1,
      excludeSelf: Boolean = false): DataFrame = {
    val live = spark
      .table(table)
      .join(broadcast(tombstones(spark, table)), Seq("vec_id"), "left_anti")
    probeFrames(
      live, spark.table(s"${table}_centroids"), queries, idCol, embCol, k, nProbe, excludeSelf)
  }

  /** Fold the tombstones into the layout: rewrite the bucketed
    * assignment WITHOUT the dead rows under the bucket spec READ FROM
    * THE TABLE'S OWN CATALOG METADATA (a caller-supplied count could
    * silently re-bucket an index built with a different one, breaking
    * the exchange-free probe layout), then drop the tombstone table.
    * The rewrite is [[graft.sources.Bucketed.replaceBucketed]]'s
    * write-to-temp + rename swap — the live rows are fully durable in
    * the replacement table before the original moves, so an executor or
    * driver loss mid-vacuum can never destroy the index (the r11 shape
    * — delete-then-rewrite from an unreplicated localCheckpoint — could).
    * The compaction a deployment schedules when the delete fraction
    * makes the per-probe anti-join broadcast non-trivial; between runs,
    * correctness never depends on it.
    */
  def vacuumDeletes(spark: SparkSession, table: String): Unit = {
    val buckets = Bucketed.bucketCount(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"$table carries no bucket spec in the catalog: not a bucketed index"))
    val live = spark
      .table(table)
      .join(broadcast(tombstones(spark, table)), Seq("vec_id"), "left_anti")
    Bucketed.replaceBucketed(live, table, "cell", buckets)
    spark.sql(s"DROP TABLE IF EXISTS ${table}_tombstones")
    ()
  }

  /** Top-k cosine probe of a query batch against persisted index frames.
    * Exposed frame-first so callers (and the spec's unbucketed control)
    * can supply any assignment source; [[topK]] is the catalog form.
    *
    * `excludeSelf` drops index rows whose id equals the query's id — set
    * it ONLY when the query batch shares the index's id space (the
    * self-probe "neighbors of every stored vector" shape, where a vector
    * is trivially its own top-1). For an EXTERNAL query batch leave it
    * false: a foreign query whose id happens to collide with an index
    * vec_id would otherwise silently lose that (possibly top-1) neighbor.
    */
  def probeFrames(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nProbe: Int = 1,
      excludeSelf: Boolean = false): DataFrame = {
    val probes =
      Similarity.assignCells(Similarity.prepared(queries, idCol, embCol), centroids, nProbe)
    val sameCell = col("a.cell") === col("b.cell")
    val joinCond =
      if (excludeSelf) sameCell && col("a.vec_id") =!= col("b.vec_id") else sameCell
    val scored = probes
      .as("a")
      .join(assigned.as("b"), joinCond)
      .select(
        col("a.vec_id").as("query_id"),
        col("b.vec_id").as("vec_id"),
        col("b.cell").as("cell"),
        Similarity
          .cosine(Similarity.dot(col("a.qv"), col("b.qv")), col("a.nrm"), col("b.nrm"))
          .as("cosine"))
    // per-(query, cell) bounded heap + bounded final window instead of a
    // rank window over the raw |queries| x nProbe x cellSize scored frame —
    // see Similarity.topKScored for the exactness argument
    Similarity.topKScored(scored, k)
  }

  /** [[probeFrames]] against the catalog tables [[build]] wrote. */
  def topK(
      spark: SparkSession,
      table: String,
      queries: DataFrame,
      idCol: String,
      embCol: String,
      k: Int,
      nProbe: Int = 1,
      excludeSelf: Boolean = false): DataFrame =
    probeFrames(
      spark.table(table),
      spark.table(s"${table}_centroids"),
      queries,
      idCol,
      embCol,
      k,
      nProbe,
      excludeSelf)
}
