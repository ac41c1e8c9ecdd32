package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (d2/d3/d6 output) into dedup GROUPS: every document labeled with
  * the smallest doc id reachable through the similarity graph, so "keep
  * the canonical, drop the rest" is a filter.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with itself; each round, a node takes the min of its own label and its
  * neighbors' labels; stop when a round changes nothing. Each round is one
  * equi-join + one aggregation — all shuffles on node id, no driver-side
  * graph state (the only driver work is the per-round convergence count).
  * Rounds needed = graph diameter; near-dup clusters are shallow
  * (dozens of near-identical docs all pairwise linked), so 3-5 rounds is
  * typical even at corpus scale. For adversarially deep graphs (long
  * chains) the classic fix is large-star/small-star (Kiveris et al. 2014,
  * "Connected Components in MapReduce and Beyond"), which squares path
  * lengths per round; not needed for the similarity-graph shape.
  *
  * Each round references the previous labels TWICE (own label + neighbor
  * propagation), so without cutting lineage the logical plan doubles per
  * round — exponential analyzer cost that OOMs the driver near round 10
  * regardless of data size. Rounds therefore `localCheckpoint` (truncate
  * lineage, keep partitions on executors); on a real cluster prefer
  * reliable `checkpoint()` to durable storage so executor loss cannot
  * void a round.
  */
object Components {

  /** Labels every node in `nodes` (one column, `id`) with the minimum id
    * of its component in the undirected graph given by `edges`
    * (columns `src`, `dst`). Nodes absent from `edges` keep their own id.
    * Output: id, label.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val undirected = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = nodes
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    // Labels only ever DECREASE (least of own + neighbor min), so the
    // label sum strictly decreases exactly when any label changed —
    // convergence detection is one aggregate over the checkpointed round,
    // not a join against the previous one. decimal(38,0) because a sum of
    // n ids is O(n^2), past Long at corpus scale.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")))
        .head
        .getDecimal(0)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = undirected
        .join(labels, undirected("dst") === labels("id"))
        .groupBy(undirected("src").as("nid"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels
        .join(neighborMin, labels("id") === neighborMin("nid"), "left")
        .select(
          labels("id"),
          least(labels("label"), coalesce(col("nbr_min"), labels("label"))).as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    undirected.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — graph diameter " +
          "exceeds the budget; raise maxIter (or use a star-contraction variant for " +
          "adversarially deep graphs). Returning partial labels would silently keep " +
          "duplicates downstream.")
    labels
  }
}
