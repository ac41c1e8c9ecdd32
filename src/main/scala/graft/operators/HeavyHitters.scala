package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Two-phase EXACT heavy hitters: Misra–Gries candidate generation per
  * partition, then an exact recount of the (tiny) candidate set.
  *
  * Phase 1 (`mapPartitions`, genuine per-partition imperative state): each
  * partition runs a Misra–Gries summary with `capacity` counters. MG
  * guarantees any item with local count > n_p/capacity survives its
  * partition's summary, and by pigeonhole any item with GLOBAL count >
  * N/capacity must exceed that local bound in at least one partition — so
  * the union of per-partition survivors is a superset of every global
  * heavy hitter. The union is ≤ capacity·numPartitions rows regardless of
  * corpus size: driver-safe at any scale.
  *
  * Phase 2: the candidate set broadcasts back over the corpus (the 100 TB
  * side never shuffles — a LEFT SEMI broadcast join), candidates are
  * counted exactly, and the threshold `count·capacity > N` is applied to
  * the EXACT counts. The output is therefore the true set of items with
  * frequency > N/capacity — bit-identical under any partitioning, even
  * though the intermediate candidate set is partitioning-dependent. That
  * is what makes a sketch-based operator oracle-gateable: the sketch only
  * prunes, the contract is exact.
  *
  * This is the classic "parallel MG + rescan" compromise: one pass to
  * bound the candidate space with O(capacity) memory per task, one
  * broadcast-pruned pass to make the answer exact — at 100 TB the
  * alternative (full groupBy of every distinct item) shuffles the whole
  * key universe to find a handful of rows.
  */
object HeavyHitters {

  /** Per-partition Misra–Gries survivors of `items` (single string column). */
  private[operators] def candidates(items: DataFrame, capacity: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items
      .select(col(items.columns.head).cast("string"))
      .as(Encoders.STRING)
      .mapPartitions { it =>
        val counts = new java.util.HashMap[String, Long](capacity * 2)
        it.foreach { k =>
          val c = counts.getOrDefault(k, 0L)
          if (c != 0L) counts.put(k, c + 1L)
          else if (counts.size < capacity) counts.put(k, 1L)
          else {
            // decrement-all step: every counter drops by one, zeros evicted
            val iter = counts.entrySet().iterator()
            while (iter.hasNext) {
              val e = iter.next()
              if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
        import scala.jdk.CollectionConverters._
        counts.keySet().iterator().asScala
      }
      .toDF("item")
      .distinct()
  }

  /** Items of `items`' first column with exact global count > N/capacity,
    * as (item, cnt, n_total). Deterministic — see object doc.
    */
  def exactOverThreshold(items: DataFrame, capacity: Int): DataFrame = {
    val itemCol = items.columns.head
    val cand = candidates(items, capacity)
    val total = items.agg(count(lit(1)).as("n_total"))
    items
      .select(col(itemCol).cast("string").as("item"))
      .join(broadcast(cand), "item") // corpus side stays shuffle-free
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      // integer form of cnt > N/capacity — no float division at the gate
      .filter(col("cnt") * lit(capacity.toLong) > col("n_total"))
  }
}
