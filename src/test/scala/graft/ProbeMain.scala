package graft

import graft.datagen.TransactionGen
import graft.operators.TrailingWindows
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (Test/runMain graft.ProbeMain): times the pieces of
  * the slower bench queries and the reference's own workload shape
  * (5.4M-row trailing-window batch vs its 1200 s budget).
  */
object ProbeMain {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sf = "/root/testdata/sf0.1"

    time("w6 full query (count)") {
      queries.RelationalQueries.runningWindows(spark, sf).count()
    }
    time("w6 without final orderBy") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ord_us"))
      Tables.events(spark, sf)
        .withColumn("cents", round(col("value") * 100).cast("long"))
        .select(
          col("event_id"), col("user_id"), col("ord_us"),
          row_number().over(w).cast("long").as("rn"),
          (sum(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            / lit(100.0)).as("running_value"),
          (col("ord_us") - lag(col("ord_us"), 1).over(w)).as("gap_us"))
        .count()
    }
    time("events bare scan (count)") {
      Tables.events(spark, sf).count()
    }
    time("d2 shingle explode only") {
      operators.Dedup.shingleSet(Tables.documents(spark, sf), "doc_id", "text", 3).count()
    }
    time("d2 full jaccard pairs") {
      operators.Dedup.jaccardPairs(
        operators.Dedup.shingleSet(Tables.documents(spark, sf), "doc_id", "text", 3)).count()
    }

    // reference workload shape: 5.4M txns / 10K cards, two trailing windows
    val txns = time("datagen 5.4M txns (materialize)") {
      val t = TransactionGen
        .transactions(spark, TransactionGen.Params(nCards = 10000, nTxns = 5400000L))
        .cache()
      t.count()
      t
    }
    time("5.4M-row trailing 10m+1w window agg") {
      TrailingWindows
        .aggregates(txns, "cc_num", "datetime", "amount", Seq("10m" -> 600L, "1w" -> 604800L))
        .select(sum(col("cnt_10m")), sum(col("cnt_1w")))
        .collect()
    }
    // the reference's ENTIRE batch job (agg + ratios + training export +
    // latest-per-key store upsert) at its own scale, vs its 1200 s budget
    val store = new graft.store.OnlineFeatureStore(Seq("cnt_1w", "avg_1w"))
    time("5.4M-row FULL batch job (export + store)") {
      val dir = java.nio.file.Files.createTempDirectory("job54").toString
      graft.operators.FeatureAggJob.run(
        txns.withColumnRenamed("amount", "amt").withColumnRenamed("amt", "amount"),
        "cc_num", "datetime", "amount", store, Some(s"$dir/train"))
    }
    println(s"[probe] store keys after job: ${store.size}")
    spark.stop()
  }
}
