package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

// Scratch decomposition probe for the x-plane merge path (deleted before
// the round ends; not part of the driver contract).
object MProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    import org.apache.spark.sql.functions._
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties.getProperty("spark.job.description")).getOrElse("")
        val cs = Option(js.properties.getProperty("callSite.short")).getOrElse("")
        jobs.put(js.jobId, (System.nanoTime(), s"$desc | $cs"))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, d) =>
          println(f"MPROBE job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f s  $d")
        }
      }
    })
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"MPROBE $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    import graft.sources.Snapshots
    (1 to 3).foreach { rep =>
      println(s"MPROBE --- rep $rep ---")
      val dir = java.nio.file.Files.createTempDirectory("mprobe").toString
      val base = graft.Tables
        .events(spark, sfDir)
        .select(
          col("event_id"),
          col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
      t("overwrite") {
        Snapshots.commitOverwrite(
          base.filter(pmod(col("event_id"), lit(3L)) =!= 2L).repartitionByRange(8, col("event_id")),
          dir, Seq("event_id"))
      }
      val changes = base
        .filter(pmod(col("event_id"), lit(5L)) === 0L || pmod(col("event_id"), lit(3L)) === 2L)
        .withColumn("cents", col("cents") + lit(1000000000L))
      t("merge")(Snapshots.commitMerge(spark, dir, changes, "event_id"))
      t("read1+2") {
        (1 to 2).foreach { v =>
          Snapshots.readVersion(spark, dir, v).agg(sum(col("cents"))).collect()
        }
      }
    }
    spark.stop()
  }
}
