package graft.streaming

import graft.sources.Snapshots
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamingBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured Streaming SOURCE over a [[graft.sources.Snapshots]] table —
  * the Delta-streaming-source shape: `readStream` tails the table's
  * append history, each micro-batch is exactly the data files added by
  * the versions that landed since the last processed offset (one
  * manifest diff per batch — [[Snapshots.addedFilesBetween]], zero
  * re-reads of consumed history), and the OFFSET IS THE VERSION NUMBER,
  * so the checkpoint's offset log makes restarts resume the version
  * chain exactly where they stopped. Composed with the exactly-once
  * sink upstream, a downstream consumer (index sync, incremental view,
  * store sync) sees each appended row exactly once end to end.
  *
  * Non-append versions (delete/overwrite/OPTIMIZE/merge) FAIL THE QUERY
  * with [[Snapshots.readChangesSince]]'s refusal — "rows added since" is
  * ill-posed across a history rewrite; the operator re-seeds the
  * consumer from the latest snapshot and restarts the tail from there
  * (the documented compaction-vs-tailing contract of every lakehouse
  * streaming source).
  *
  * Usage:
  * {{{
  *   spark.readStream
  *     .format("graft.streaming.SnapshotsStreamSource")
  *     .option("path", tableDir)
  *     .option("startingVersion", "0")   // 0 = from table birth (default);
  *                                       // k = only versions AFTER k
  *     .option("maxVersionsPerBatch", "8") // optional: bound each
  *                                       // micro-batch's cursor advance
  *     .load()
  * }}}
  *
  * Scale posture: driver-side work per micro-batch is one manifest
  * read per new version (small text files); the data scan is the plain
  * parquet scan of only the added files — pruning/pushdown intact, no
  * state, no shuffle introduced by the source itself.
  */
class SnapshotsStreamSource extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "snapshots"

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("snapshots source needs .option(\"path\", tableDir)"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      Snapshots.readLatest(sqlContext.sparkSession, dirOf(parameters)).schema))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val dir = dirOf(parameters)
    val start = parameters.get("startingVersion").map(_.toInt).getOrElse(0)
    require(start >= 0, s"startingVersion must be >= 0, got $start")
    // optional hard ceiling: never advance past this version (a bounded
    // replay, or an exact cursor handoff — syncFromSnapshots uses it so a
    // concurrent writer landing mid-drain cannot slip past the returned
    // cursor and be double-consumed on the next call)
    val end = parameters.get("endingVersion").map(_.toInt).getOrElse(Int.MaxValue)
    require(end >= start, s"endingVersion $end must be >= startingVersion $start")
    // optional rate limit (the Delta maxFilesPerTrigger analog at the
    // version granularity — a version is this source's atomic unit):
    // each micro-batch advances the cursor by at most this many
    // versions, so a consumer restarted against a long backlog drains
    // it in bounded bites instead of one giant catch-up batch
    val maxV = parameters.get("maxVersionsPerBatch").map(_.toInt).getOrElse(Int.MaxValue)
    require(maxV >= 1, s"maxVersionsPerBatch must be >= 1, got $maxV")
    val resolved = schema.getOrElse(Snapshots.readLatest(sqlContext.sparkSession, dir).schema)
    new SnapshotsSource(sqlContext.sparkSession, dir, start, end, maxV, resolved)
  }
}

/** The per-query source instance. Offsets are table versions
  * ([[LongOffset]] — restarts hand back the checkpointed json, parsed by
  * value so any Offset representation works).
  */
class SnapshotsSource(
    spark: SparkSession,
    dir: String,
    startingVersion: Int,
    endingVersion: Int,
    maxVersionsPerBatch: Int,
    override val schema: StructType)
    extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def versionOf(o: Offset): Int = o.json.trim.toInt

  /** Trigger.AvailableNow support: the drain target is the version
    * observed HERE, once, at query start — later versions wait for the
    * next run (the Delta-source semantic), instead of the engine's
    * "single batch execution" fallback.
    */
  private var availableNowCap: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(math.min(Snapshots.latestVersion(spark, dir), endingVersion))

  /** Admission-control form of [[getOffset]] (SupportsTriggerAvailableNow
    * extends SupportsAdmissionControl; the FileStreamSource pattern).
    * The engine's ReadLimit doesn't apply — a version is the atomic unit
    * here — but the source's own `maxVersionsPerBatch` does: the cursor
    * advances at most that many versions per micro-batch, so a backlog
    * drains in bounded bites (under Trigger.AvailableNow the engine
    * keeps calling until the armed cap is reached, one rate-limited
    * batch at a time).
    */
  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    val from = Option(start).map(_.json.trim.toInt).getOrElse(startingVersion)
    val latest = availableNowCap.getOrElse(
      math.min(Snapshots.latestVersion(spark, dir), endingVersion))
    val next = math.min(latest.toLong, from.toLong + maxVersionsPerBatch.toLong)
    if (next > from) LongOffset(next) else null
  }

  /** The newest published version (clamped to `endingVersion`, and to
    * the AvailableNow capture when one is armed), as the next offset —
    * None while the table holds nothing past the starting cursor (the
    * query idles).
    */
  override def getOffset: Option[Offset] = {
    val latest = availableNowCap.getOrElse(
      math.min(Snapshots.latestVersion(spark, dir), endingVersion))
    if (latest > startingVersion) Some(LongOffset(latest.toLong)) else None
  }

  /** Rows of the versions in (start, end]: the manifest diff's added
    * files, scanned under the source's fixed schema. Refuses non-append
    * ranges (the query fails — see class doc).
    */
  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(versionOf).getOrElse(startingVersion)
    val to = versionOf(end)
    val added = Snapshots.addedFilesBetween(spark, dir, from, to)
    if (added.isEmpty) StreamingBridge.emptyStreamingFrame(spark, schema)
    else StreamingBridge.asStreamingFrame(spark.read.schema(schema).parquet(added: _*))
  }

  override def stop(): Unit = ()
}
