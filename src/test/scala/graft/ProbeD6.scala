package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

object ProbeD6 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }
  private def consume(df: org.apache.spark.sql.DataFrame): Unit = {
    df.select(xxhash64(struct(df.columns.toIndexedSeq.map(col): _*)).as("h")).agg(bit_xor(col("h"))).collect(); ()
  }
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val sf = "/root/testdata/sf0.1"
    // warmup
    consume(queries.VectorQueries.embedNearDup(spark, sf))
    val emb = Tables.embeddings(spark, sf)
    val n = time("count()")(emb.count())
    val bits = Similarity.autoBits(n, 32L, 4)
    val tables = math.min(16, 64 / bits)
    time("bucketed explode (count)") {
      Similarity.signBucketsExploded(emb, "vec_id", "embedding", bits, tables).count()
    }
    time("cooled (count)") {
      Similarity.dropHotBuckets(Similarity.signBucketsExploded(emb, "vec_id", "embedding", bits, tables), 256L).count()
    }
    val bucketed = Similarity.dropHotBuckets(Similarity.signBucketsExploded(emb, "vec_id", "embedding", bits, tables), 256L)
    time("cand self-join pre-distinct (count)") {
      bucketed.as("a").join(bucketed.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id")).count()
    }
    time("cand distinct (count)") {
      bucketed.as("a").join(bucketed.as("b"), col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b")).distinct().count()
    }
    time("d6 full (consume)") {
      consume(queries.VectorQueries.embedNearDupLsh(spark, sf))
    }
    time("d6 full again (consume)") {
      consume(queries.VectorQueries.embedNearDupLsh(spark, sf))
    }
    time("d5 full (consume)") {
      consume(queries.VectorQueries.embedNearDup(spark, sf))
    }
    spark.stop()
  }
}
