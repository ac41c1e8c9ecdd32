package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
object Bench {
  /** Consume the FULL result: hash every output column of every row into
    * one aggregate so Catalyst cannot prune the projections. Under the old
    * `count()` consumer the optimizer dropped unreferenced expressions
    * (f1's md5/concat_ws/date_format, t4's fingerprint, ...), so those
    * queries were timed without doing their work. bit_xor, not sum: ANSI
    * mode throws on long overflow, which summing random 64-bit hashes hits
    * almost immediately.
    */
  private def consume(df: DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
      .agg(bit_xor(col("h")))
      .collect()
    ()
  }
  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Middle element of the sorted runs (lower-middle for even counts —
    * a real measurement, not an interpolation).
    */
  def median(runs: Seq[Double]): Double = {
    require(runs.nonEmpty, "median of no runs")
    runs.sorted.apply((runs.size - 1) / 2)
  }

  /** One timed query: every completed repetition's wall seconds (a failed
    * attempt's elapsed is NOT a measurement and is excluded), plus the
    * first error if any repetition threw.
    */
  final case class Timing(name: String, runs: Seq[Double], err: Option[String]) {
    def med: Double = if (runs.nonEmpty) median(runs) else 0.0
  }

  /** Time each query `reps` times under the full-result consumer,
    * capturing failures instead of swallowing them: a throwing query must
    * show up in the bench JSON (round-2 audit: `catch { _ => () }` let a
    * regression be timed as ~0 and "pass"). Repetitions exist because the
    * round-3 audit showed single-shot numbers swinging 2-3x on unchanged
    * code (JVM/OS contention noise) — per-query medians with the full
    * spread in the JSON make cross-round deltas gradeable. A query that
    * throws stops repeating (the error, not the time, is the result).
    */
  def timeQueries(
      spark: SparkSession,
      sfDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      reps: Int = 3): Seq[Timing] =
    queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var err: Option[String] = None
      val runs = Seq.newBuilder[Double]
      var r = 0
      while (r < reps && err.isEmpty) {
        val t0 = System.nanoTime()
        try {
          consume(fn(spark, sfDir))
          runs += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            err = Some(
              e.toString.linesIterator.nextOption().getOrElse(e.getClass.getName).take(300))
        }
        r += 1
      }
      Timing(name, runs.result(), err)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    // JIT/codegen/parquet-reader warmup so the first timed query doesn't
    // absorb ~3-4 s of one-time JVM cost (standard benchmarking practice;
    // warmup runs the flagship slice at the smallest scale factor).
    try consume(SparkEntry.entry(spark))
    catch { case _: Throwable => () }
    val results = timeQueries(spark, sfDir, SparkEntry.queries)
    val qs = results.map(t => s"\"" + t.name + "\":" + t.med)
      .mkString("{", ",", "}")
    val runsJson = results
      .map(t => s"\"" + t.name + "\":" + t.runs.mkString("[", ",", "]"))
      .mkString("{", ",", "}")
    val errs = results.collect { case Timing(k, _, Some(e)) => s"\"$k\":\"${jsonEscape(e)}\"" }
      .mkString("{", ",", "}")
    results.foreach { t =>
      t.err.foreach(msg => System.err.println(s"[bench] QUERY FAILED ${t.name}: $msg"))
    }
    val total = results.map(_.med).sum
    // Reference-workload headline: the reference's own batch job shape
    // (5.4M txns / 10K cards, trailing 10m + 1w window aggregation) had a
    // 1,200 s budget => >= 4,500 rows/s implied (BASELINE.md). Measure the
    // same shape here (median of 3 runs over one cached input) and report
    // rows/s.
    val refRates =
      try {
        val txns = datagen.TransactionGen
          .transactions(spark, datagen.TransactionGen.Params(nCards = 10000, nTxns = 5400000L))
          .cache()
        val n = txns.count()
        val rates = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          consume(
            operators.TrailingWindows
              .aggregates(txns, "cc_num", "datetime", "amount", Seq("10m" -> 600L, "1w" -> 604800L)))
          n / ((System.nanoTime() - t0) / 1e9)
        }
        txns.unpersist()
        rates
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ref workload failed: $e")
          Seq(-1.0)
      }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"query_runs":$runsJson,""" +
        s""""query_errors":$errs,"sf":"$sfDir",""" +
        s""""ref_workload_rows_per_sec":${median(refRates).round},""" +
        s""""ref_rate_runs":${refRates.map(_.round).mkString("[", ",", "]")}}"""
    // Emit on stdout AND to a dedicated file: the sbt log decorates stdout
    // with [info] prefixes, which broke the driver's line parser in r1
    // (BENCH_r01.json "parsed": null).
    println(line)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/bench.json"), line + "\n")
    catch { case _: Throwable => () }
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/bench_latest.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
