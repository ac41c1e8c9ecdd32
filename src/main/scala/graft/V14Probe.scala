package graft

// Scratch decomposition probe for the v14 lifecycle (deleted before the
// round ends; not part of the driver contract).
object V14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    import org.apache.spark.sql.functions._
    import graft.operators.VectorIndex
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"V14PROBE $label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    def consume(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h"))
        .agg(org.apache.spark.sql.functions.bit_xor(col("h")))
        .collect()
      ()
    }
    (1 to 3).foreach { rep =>
      println(s"V14PROBE --- rep $rep ---")
      val emb = Tables.embeddings(spark, sfDir)
      val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
      val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
      t("build") {
        VectorIndex.build(base, "vec_id", "embedding", "graft_ivf_incr_probe",
          16, 65536, 2, 4096L, 64L)
      }
      // decomposition of the build stages, run on a throwaway table
      locally {
        import graft.operators.Similarity
        import org.apache.spark.storage.StorageLevel
        val prep = Similarity.prepared(base, "vec_id", "embedding")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val n = t("b.count")(prep.count())
        val nCells = Similarity.autoCells(n, 16, 65536)
        val stride = Similarity.trainStride(n, nCells, 64L)
        val centroids = t("b.kmeans") {
          val c = Similarity.kmeansCentroids(Similarity.trainSample(prep, stride), nCells, 2)
            .persist(StorageLevel.MEMORY_AND_DISK)
          c.count(); c
        }
        val assigned = t("b.assign") {
          val a = Similarity
            .capBySize(Similarity.assignCells(prep, centroids), "cell", 4096L)
            .persist(StorageLevel.MEMORY_AND_DISK)
          a.count(); a
        }
        t("b.write")(graft.sources.Bucketed.write(assigned, "graft_ivf_decomp", "cell", 32))
        t("b.wplain")(graft.sources.Bucketed.writePlain(centroids, "graft_ivf_decomp_c"))
        prep.unpersist(); centroids.unpersist(); assigned.unpersist()
        spark.sql("DROP TABLE IF EXISTS graft_ivf_decomp")
        spark.sql("DROP TABLE IF EXISTS graft_ivf_decomp_c")
      }
      t("append") {
        VectorIndex.append(spark, "graft_ivf_incr_probe", delta, "vec_id", "embedding")
      }
      t("probe") {
        consume(
          VectorIndex.topK(spark, "graft_ivf_incr_probe", emb, "vec_id", "embedding", 1, 1,
            excludeSelf = true))
      }
      spark.sql("DROP TABLE IF EXISTS graft_ivf_incr_probe")
      spark.sql("DROP TABLE IF EXISTS graft_ivf_incr_probe_centroids")
    }
    spark.stop()
  }
}
