package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/** Minimal snapshot-isolated table layout — versioned (time-travel) reads
  * over immutable parquet, the public core idea of lakehouse table
  * formats (an immutable MANIFEST per version enumerating the data files
  * that constitute the snapshot; data files are never rewritten; commit
  * = atomic publication of the next manifest):
  *
  *   - a commit stages its parquet into a fresh per-ATTEMPT subdirectory
  *     (`data/commit-v<N>-<uuid>/` — unique per attempt, so a crashed
  *     attempt's orphan directory never blocks the retry of the same
  *     version), then publishes `_manifests/v<N>.list` by writing `.tmp`
  *     and RENAMING into place. Readers either see version N whole (the
  *     manifest exists and every listed file is immutable) or not at
  *     all; a crash mid-commit leaves a `.tmp` and unreferenced data
  *     files — garbage for [[vacuum]], never a torn snapshot. Rename
  *     refusing an existing destination is the concurrency check: two
  *     racing writers of the same version cannot both publish;
  *   - APPEND commits list the previous snapshot's files plus the staged
  *     ones; OVERWRITE commits list only the staged ones. Every prior
  *     version stays readable until an explicit retention pass (not
  *     provided here — vacuuming is a deployment policy);
  *   - a read at version N hands Spark exactly the manifest's files: the
  *     scan is the same parquet scan the unversioned table would get —
  *     column pruning and predicate pushdown per file as usual — plus
  *     one small manifest read, which is what keeps time travel free at
  *     100 TB (snapshotting never copies data, only file lists).
  */
object Snapshots {

  private val VersionRe = "v(\\d+)\\.list".r
  private val StatsHeader = "#stats="
  private val BatchHeader = "#batch="

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = new Path(dir, "_manifests")

  /** Highest published version, 0 when the table has none. */
  def latestVersion(spark: SparkSession, dir: String): Int = {
    val md = manifestDir(dir)
    val f = fs(spark, md)
    if (!f.exists(md)) 0
    else
      f.listStatus(md)
        .map(_.getPath.getName)
        .collect { case VersionRe(v) => v.toInt }
        .foldLeft(0)(math.max)
  }

  /** One manifest entry: a data file, optionally with its zone map (the
    * commit-declared stats column's min/max within that file).
    */
  final case class ManifestEntry(path: String, min: Option[Long], max: Option[Long])

  /** (stats column if the snapshot carries zone maps, entries). */
  private def readManifest(
      spark: SparkSession,
      dir: String,
      version: Int): (Option[String], Seq[ManifestEntry]) = {
    val mf = new Path(manifestDir(dir), s"v$version.list")
    val f = fs(spark, mf)
    require(f.exists(mf), s"snapshot v$version does not exist under $dir")
    val in = f.open(mf)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
      finally in.close()
    val statsCol = lines.find(_.startsWith(StatsHeader)).map(_.drop(StatsHeader.length))
    val entries = lines.filterNot(_.startsWith("#")).map { line =>
      line.split('\t') match {
        case Array(p, mn, mx) => ManifestEntry(p, Some(mn.toLong), Some(mx.toLong))
        case Array(p)         => ManifestEntry(p, None, None)
        case _                => throw new IllegalArgumentException(s"bad manifest line: $line")
      }
    }
    (statsCol, entries)
  }

  /** The most recent `#batch=` header across versions, scanning from the
    * latest downward (a non-sink commit between sink commits leaves its
    * manifest headerless; the sink's idempotence question is "what is
    * the highest batch id ever committed", so the scan skips those).
    */
  private def lastBatchId(spark: SparkSession, dir: String): Option[Long] = {
    val latest = latestVersion(spark, dir)
    (latest to 1 by -1).iterator
      .map { v =>
        val mf = new Path(manifestDir(dir), s"v$v.list")
        val f = fs(spark, mf)
        // versions below a vacuum's keepFrom no longer exist — skip them
        // (their batch ids are necessarily older than the survivors')
        if (!f.exists(mf)) None
        else {
          val in = f.open(mf)
          try
            scala.io.Source
              .fromInputStream(in, "UTF-8")
              .getLines()
              .find(_.startsWith(BatchHeader))
              .map(_.drop(BatchHeader.length).toLong)
          finally in.close()
        }
      }
      .collectFirst { case Some(id) => id }
  }

  /** EXACTLY-ONCE streaming append — the foreachBatch sink contract:
    * Structured Streaming replays a failed micro-batch with the SAME
    * (batchId, data), so committing the batch id inside the manifest
    * makes the retry provably a no-op: a crash before the manifest
    * rename left no version (the retry re-runs cleanly — staged orphan
    * files are vacuum fodder, never visible); a crash after the rename
    * but before the checkpoint commit replays a batch id ≤ the recorded
    * one and is SKIPPED. This is the idempotent-sink pattern that turns
    * at-least-once replay into exactly-once table contents. Returns
    * whether the batch was committed (false = already present).
    */
  def commitAppendExactlyOnce(
      df: DataFrame,
      dir: String,
      batchId: Long,
      statsCol: Option[String] = None): Boolean = {
    val spark = df.sparkSession
    if (lastBatchId(spark, dir).exists(_ >= batchId)) false
    else {
      commit(df, dir, carryForward = true, statsCol, batchId = Some(batchId))
      true
    }
  }

  /** A foreachBatch function writing this table exactly-once:
    * `stream.writeStream.foreachBatch(Snapshots.sink(dir)).start()`.
    */
  def sink(dir: String, statsCol: Option[String] = None): (DataFrame, Long) => Unit =
    (df, batchId) => { commitAppendExactlyOnce(df, dir, batchId, statsCol); () }

  private def commit(
      df: DataFrame,
      dir: String,
      carryForward: Boolean,
      statsCol: Option[String],
      batchId: Option[Long] = None): Int = {
    val spark = df.sparkSession
    val v = latestVersion(spark, dir) + 1
    // stage under a per-attempt unique name: a crashed attempt's orphaned
    // stage directory (left when the manifest rename never ran) must not
    // block the RETRY of the same version — the manifest records absolute
    // file paths, so the stage name never matters to readers, and orphan
    // files are unreferenced vacuum fodder
    val stage = new Path(dir, s"data/commit-v$v-${java.util.UUID.randomUUID()}")
    df.write.mode("error").parquet(stage.toString)
    val f = fs(spark, stage)
    // with a declared stats column, one narrow read of the staged files
    // computes each file's zone map (min/max of the column — at real
    // cluster scale this would come from the parquet footers the write
    // already produced; one extra single-column scan of ONLY the staged
    // batch keeps this implementation honest without a footer parser)
    val staged: Seq[ManifestEntry] = statsCol match {
      case Some(c) =>
        import org.apache.spark.sql.functions.{col, input_file_name, max => fMax, min => fMin}
        spark.read
          .parquet(stage.toString)
          .groupBy(input_file_name().as("f"))
          .agg(fMin(col(c)).cast("long").as("mn"), fMax(col(c)).cast("long").as("mx"))
          .collect()
          .map(r => ManifestEntry(r.getString(0), Some(r.getLong(1)), Some(r.getLong(2))))
          .sortBy(_.path)
          .toSeq
      case None =>
        f.listStatus(stage)
          .map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(p => ManifestEntry(p.toString, None, None))
          .sortBy(_.path)
          .toSeq
    }
    val carried =
      if (carryForward && v > 1) {
        val (prevCol, prev) = readManifest(spark, dir, v - 1)
        require(prevCol == statsCol,
          s"append stats column $statsCol must match the carried snapshot's $prevCol")
        prev
      } else Nil
    publish(spark, dir, v, statsCol, carried ++ staged, batchId)
    v
  }

  /** Write the manifest to `.tmp` and RENAME into place — the atomic
    * commit point: a failed rename (crash, or a concurrent writer already
    * published this version) leaves the snapshot unborn, never torn.
    */
  private def publish(
      spark: SparkSession,
      dir: String,
      v: Int,
      statsCol: Option[String],
      entries: Seq[ManifestEntry],
      batchId: Option[Long] = None): Unit = {
    val md = manifestDir(dir)
    val f = fs(spark, md)
    f.mkdirs(md)
    val tmp = new Path(md, s"v$v.list.tmp")
    val header = statsCol.map(c => s"$StatsHeader$c\n").getOrElse("") +
      batchId.map(b => s"$BatchHeader$b\n").getOrElse("")
    val body = entries.map { e =>
      (e.min, e.max) match {
        case (Some(mn), Some(mx)) => s"${e.path}\t$mn\t$mx"
        case _                    => e.path
      }
    }
    val out = f.create(tmp, true)
    try out.write((header + body.mkString("", "\n", "\n")).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(f.rename(tmp, new Path(md, s"v$v.list")), s"commit of v$v lost the publish race")
  }

  /** Publish a new snapshot = previous snapshot + `df`. Returns its version.
    * `statsCol` (integer-typed) adds a per-file zone map to the manifest;
    * an append's stats column must match the carried snapshot's.
    */
  def commitAppend(df: DataFrame, dir: String, statsCol: Option[String] = None): Int =
    commit(df, dir, carryForward = true, statsCol)

  /** Publish a new snapshot containing ONLY `df` (logical replace — prior
    * versions' files remain on disk and readable).
    */
  def commitOverwrite(df: DataFrame, dir: String, statsCol: Option[String] = None): Int =
    commit(df, dir, carryForward = false, statsCol)

  /** Copy-on-write row-level DELETE of `statsCol BETWEEN lo AND hi` —
    * the GDPR/right-to-erasure primitive at table scale: only files
    * whose zone map MAY contain matching rows are rewritten (read,
    * anti-filtered, re-staged); every other file is carried into the new
    * manifest untouched — at 100 TB a selective delete against a
    * range-clustered table rewrites O(matching files), not the table.
    * Prior versions still read the undeleted rows (physical erasure is
    * the retention/vacuum pass's job — same split as every
    * manifest-based format). Publishes and returns the new version.
    */
  def commitDelete(spark: SparkSession, dir: String, lo: Long, hi: Long): Int = {
    import org.apache.spark.sql.functions.col
    val prev = latestVersion(spark, dir)
    val (statsCol, entries) = readManifest(spark, dir, prev)
    val c = statsCol.getOrElse(
      throw new IllegalArgumentException(s"delete needs zone maps; $dir carries none"))
    val (touched, untouched) =
      entries.partition(e => e.max.exists(_ >= lo) && e.min.exists(_ <= hi))
    val v = prev + 1
    val staged: Seq[ManifestEntry] =
      if (touched.isEmpty) Nil
      else {
        val stage = new Path(dir, s"data/commit-v$v-${java.util.UUID.randomUUID()}")
        spark.read
          .parquet(touched.map(_.path): _*)
          .filter(!col(c).between(lo, hi))
          .write.mode("error").parquet(stage.toString)
        import org.apache.spark.sql.functions.{input_file_name, max => fMax, min => fMin}
        spark.read
          .parquet(stage.toString)
          .groupBy(input_file_name().as("f"))
          .agg(fMin(col(c)).cast("long").as("mn"), fMax(col(c)).cast("long").as("mx"))
          .collect()
          .map(r => ManifestEntry(r.getString(0), Some(r.getLong(1)), Some(r.getLong(2))))
          .sortBy(_.path)
          .toSeq
      }
    publish(spark, dir, v, statsCol, untouched ++ staged)
    v
  }

  /** Scheme-insensitive file identity ("file:///x" == "file:/x" — manifest
    * paths come from input_file_name URIs, listings from Hadoop Paths).
    */
  private def fileKey(p: String): String = new Path(p).toUri.getPath

  /** Retention pass — the physical-erasure half every manifest-based
    * format splits off from its logical operations: delete every data
    * file referenced by NO surviving version (>= `keepFrom`) and drop the
    * expired manifests. A file carried forward by appends survives as
    * long as ANY surviving version lists it — reference counting is by
    * file, not by the commit that wrote it. After vacuum, time travel
    * before `keepFrom` is gone (that is the point: commitDelete's doomed
    * rows stop being readable ANYWHERE once the versions holding them
    * expire), and every surviving version still reads bit-identically
    * (SnapshotsSpec pins both). Returns the number of data files deleted.
    */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Int): Int = {
    val latest = latestVersion(spark, dir)
    require(keepFrom >= 1 && keepFrom <= latest, s"keepFrom $keepFrom out of [1, $latest]")
    val referenced = (keepFrom to latest)
      .flatMap(v => readManifest(spark, dir, v)._2.map(e => fileKey(e.path)))
      .toSet
    val dataDir = new Path(dir, "data")
    val f = fs(spark, dataDir)
    var deleted = 0
    if (f.exists(dataDir)) {
      val it = f.listFiles(dataDir, true)
      val doomed = scala.collection.mutable.ListBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet")
          && !referenced.contains(fileKey(st.getPath.toString)))
          doomed += st.getPath
      }
      doomed.foreach { p => if (f.delete(p, false)) deleted += 1 }
    }
    (1 until keepFrom).foreach(v => f.delete(new Path(manifestDir(dir), s"v$v.list"), false))
    deleted
  }

  /** Read the table exactly as of `version`. */
  def readVersion(spark: SparkSession, dir: String, version: Int): DataFrame =
    spark.read.parquet(readManifest(spark, dir, version)._2.map(_.path): _*)

  /** Range read THROUGH the zone maps: only files whose [min, max]
    * overlaps [lo, hi] are handed to the scan (manifest-level skipping —
    * the planning-time half), and the exact `BETWEEN` survives as the
    * residual filter (pushed to the surviving files' row groups). On a
    * range-clustered table this is the 100 TB lever: a selective range
    * touches O(matching files), not the table. Correctness never depends
    * on the zone maps — a stale/wide map only costs extra reads.
    */
  def readVersionRange(
      spark: SparkSession,
      dir: String,
      version: Int,
      lo: Long,
      hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (statsCol, entries) = readManifest(spark, dir, version)
    val c = statsCol.getOrElse(
      throw new IllegalArgumentException(s"snapshot v$version of $dir carries no zone maps"))
    val keep = entries.filter(e => e.max.exists(_ >= lo) && e.min.exists(_ <= hi)).map(_.path)
    // zone maps exclude every file: any one file's schema + an
    // always-false residual yields the same (empty) result
    val src = if (keep.nonEmpty) keep else entries.map(_.path).take(1)
    spark.read.parquet(src: _*).filter(col(c).between(lo, hi))
  }

  /** Read the latest published snapshot. */
  def readLatest(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, latestVersion(spark, dir))
}
