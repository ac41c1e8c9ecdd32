package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-paid shuffle: co-bucketed tables must join and
  * aggregate with ZERO exchanges, while the identical unbucketed plan
  * shuffles — both directions asserted so the exchange-free claim can't
  * pass vacuously.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = Sessions.local("4")

  private def withNoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("co-bucketed join and per-key aggregation plan zero exchanges; unbucketed shuffles") {
    val ev = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select("event_id", "user_id", "ord_us", "cents")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_events"))

    Bucketed.write(ev, "ev_bucketed", "user_id", 8)
    Bucketed.write(dim, "dim_bucketed", "user_id", 8)
    val evB = Bucketed.read(spark, "ev_bucketed")
    val dimB = Bucketed.read(spark, "dim_bucketed")

    withNoBroadcast {
      val joined = evB.join(dimB, Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"co-bucketed join must not shuffle:\n$plan")
      assert(joined.count() == ev.count(), "join result must cover every event")

      val agg = evB.groupBy("user_id").agg(sum(col("cents")).as("s"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucketed aggregation must not shuffle:\n$aggPlan")

      // the contrast case: same join off raw (unbucketed) frames shuffles
      val rawPlan = ev.join(dim, Seq("user_id")).queryExecution.executedPlan.toString
      assert(rawPlan.contains("Exchange"), s"unbucketed control should shuffle:\n$rawPlan")
    }
  }

  test("partitioned+bucketed fact layout: directory pruning AND exchange-free aggregation in one plan") {
    val ev = Tables
      .events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .select("event_id", "user_id", "event_type", "ord_us", "cents")
    Bucketed.writePartitionedBucketed(ev, "ev_part_bucket", "event_type", "user_id", 8)

    withNoBroadcast {
      val probe = Bucketed
        .read(spark, "ev_part_bucket")
        .filter(col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
      val root = probe.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      // half 1: the event_type predicate prunes to 2 of 5 directories at
      // planning time, with no residual row-level filter
      val scan = root.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scan.isDefined, "probe should read through a file scan")
      // derive expected directory counts from the fixture's event types
      // rather than a literal, so a datagen cardinality change reads as
      // a fixture shift, not a phantom pruning regression
      val allTypes = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
      val keptTypes = allTypes.intersect(Set("purchase", "error"))
      assert(
        keptTypes.nonEmpty && keptTypes.size < allTypes.size,
        s"fixture must make pruning observable (types: $allTypes)")
      assert(
        scan.get.selectedPartitions.partitionCount == keptTypes.size,
        s"expected ${keptTypes.size} pruned directories (of ${allTypes.size}), " +
          s"got ${scan.get.selectedPartitions.partitionCount}")
      assert(scan.get.dataFilters.isEmpty, s"no residual data filter: ${scan.get.dataFilters}")
      // half 2: the user_id aggregation rides the bucket layout — zero
      // exchanges anywhere in the plan (bucket files with the same id
      // across the two surviving directories coalesce into one task)
      assert(!root.toString.contains("Exchange"), s"composed layout must not shuffle:\n$root")
      // and the pruned, exchange-free result is still the right answer
      val expect = ev
        .filter(col("event_type").isin("purchase", "error"))
        .groupBy("user_id")
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
      assert(probe.exceptAll(expect).isEmpty && expect.exceptAll(probe).isEmpty)
    }
  }

  test("compaction: fragmented table rewrites to size-derived file count, rows exact") {
    val ev = Tables
      .events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "value")
    // simulate a micro-batch sink's fragmentation: 64 tiny files — written
    // raw (writePlain now sizes its output files from the plan estimate,
    // which would defragment the fixture before compact had anything to do)
    spark.sql("DROP TABLE IF EXISTS ev_fragmented")
    // a fresh session's catalog no longer knows the table, so the managed
    // location can survive the DROP — remove it explicitly
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "ev_fragmented")
    val lfs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (lfs.exists(loc)) lfs.delete(loc, true)
    ev.repartition(64).write.mode("overwrite").format("parquet").saveAsTable("ev_fragmented")
    val before = spark.table("ev_fragmented")
    val beforeFiles = before.inputFiles.length
    val beforeRows = before.collect().toSet
    assert(beforeFiles >= 32, s"fixture should be fragmented, got $beforeFiles files")
    val conf = spark.sparkContext.hadoopConfiguration
    val totalBytes = before.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    val target = totalBytes / 4 + 1 // expect ~4 output files
    val n = Bucketed.compact(spark, "ev_fragmented", target)
    val after = spark.table("ev_fragmented")
    assert(after.inputFiles.length == n, "reported file count must match the table")
    assert(n < beforeFiles / 4, s"compaction should collapse $beforeFiles files, got $n")
    assert(after.collect().toSet == beforeRows, "compaction must preserve rows exactly")
  }

  test("incremental dedup: bucketed corpus index matches exchange-free and resolves canonicals") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    Bucketed.write(
      docs.select(col("doc_id").as("corpus_id"), md5(col("text").cast("binary")).as("text_hash")),
      "doc_hashes_spec",
      "text_hash",
      8)
    val increment = docs
      .filter(pmod(col("doc_id"), lit(13L)) === 0)
      .select((col("doc_id") + 1000000L).as("new_id"), col("text"))

    // every replayed doc must be recognized, its canonical at or below
    // the original id (duplicate texts resolve to the group minimum)
    import spark.implicits._
    val rows = Dedup
      .incrementalExact(increment, spark.table("doc_hashes_spec"), "new_id", "text")
      .select("new_id", "canonical_id", "is_known").as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 == 1L), "every replayed doc is known to the corpus")
    assert(rows.forall { case (nid, canon, _) => canon != -1L && canon <= nid - 1000000L })
    // a genuinely new text is unknown
    val fresh = Seq((9999999L, "text the corpus has never seen zqx")).toDF("new_id", "text")
    val unknown = Dedup
      .incrementalExact(fresh, spark.table("doc_hashes_spec"), "new_id", "text")
      .select("canonical_id", "is_known").as[(Long, Long)].head()
    assert(unknown == ((-1L, 0L)))

    // plan posture: the corpus index side of the canonical aggregation +
    // match join needs no exchange; an unbucketed copy pays more
    withNoBroadcast {
      Bucketed.writePlain(spark.table("doc_hashes_spec"), "doc_hashes_plain")
      def exchanges(table: String): Int = {
        val plan = Dedup
          .incrementalExact(increment, spark.table(table), "new_id", "text")
          .queryExecution.executedPlan.toString
        "Exchange hashpartitioning".r.findAllIn(plan).length
      }
      val bucketed = exchanges("doc_hashes_spec")
      val plain = exchanges("doc_hashes_plain")
      assert(plain > bucketed,
        s"bucketed corpus side must save at least one exchange ($plain vs $bucketed)")
    }
  }
}
