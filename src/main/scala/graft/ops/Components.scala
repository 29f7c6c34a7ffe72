package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Connected components over a near-duplicate pair graph — the clustering
  * stage a dedup pipeline needs BETWEEN pair generation (Dedup.minhashPairs /
  * Similarity.nearDupPairs) and canonicalization: pairs say "a ≈ b", but
  * what gets dropped is "every document whose component representative is
  * not itself". Extension surface beyond the reference (which has no dedup
  * at all); the algorithm is the standard distributed min-label propagation
  * used by MapReduce/Pregel connected-components systems.
  *
  * Scale design:
  *  - each round is two shuffles (neighbor-min aggregation + label join) on
  *    (vertex, label) pairs — 16 bytes/vertex, never document content;
  *  - rounds needed = graph diameter. Near-dup components are small and
  *    dense (clusters of copies), so diameter is tiny; the documented worst
  *    case is a path graph, diameter N. `maxIter` fails loudly instead of
  *    silently emitting half-merged components — at 100 TB a label that
  *    stopped propagating IS a wrong answer, not a degraded one;
  *  - `localCheckpoint` (eager) truncates lineage every round: iterative
  *    DataFrame plans otherwise grow exponentially in Catalyst and the
  *    convergence `count()` would re-run every prior round from the scan
  *    (same reasoning as the PRQL `loop` lowering, Lowering.scala:121-131);
  *  - convergence is detected with a count of CHANGED labels per round —
  *    one extra action on the already-checkpointed frame, cheap relative to
  *    the round's shuffles, and it lets converged graphs stop early instead
  *    of burning fixed iterations.
  */
object Components {

  /** Minimum-id component label for every vertex of the undirected pair
    * graph. Output: (`v`, `component`) — component = least vertex id
    * reachable from v (the component's canonical representative).
    *
    * @param pairs one row per undirected edge (aCol, bCol); self-loops and
    *              duplicate/reversed edges are tolerated
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
                          maxIter: Int = 25): DataFrame = {
    val a = F.col(aCol).cast("long"); val b = F.col(bCol).cast("long")
    // symmetric edge list, deduped once up front: every propagation round
    // reuses it, so paying one distinct here beats re-shuffling mirrored
    // duplicates maxIter times
    val edges = pairs.select(a.as("x"), b.as("y"))
      .union(pairs.select(b.as("x"), a.as("y")))
      .filter(F.col("x") =!= F.col("y"))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(F.col("x").as("v")).distinct()
      .withColumn("component", F.col("v"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged) {
      if (iter >= maxIter)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds — " +
            "component diameter exceeds maxIter; raise it (labels would be WRONG, not approximate)")
      // min label among each vertex's neighbors …
      val nbrMin = edges
        .join(labels.withColumnRenamed("v", "y"), "y")
        .groupBy(F.col("x").as("v")).agg(F.min("component").as("__nbr"))
      // … kept only if it improves on the vertex's own label
      val next = labels.join(nbrMin, Seq("v"), "left")
        .select(F.col("v"),
          F.least(F.col("component"), F.coalesce(F.col("__nbr"), F.col("component")))
            .as("component"),
          (F.col("__nbr") < F.col("component")).as("__changed"))
        .localCheckpoint()
      converged = next.filter(F.col("__changed")).limit(1).isEmpty
      labels = next.drop("__changed").localCheckpoint()
      iter += 1
    }
    labels
  }

  /** Drop every document that is a non-representative member of a
    * near-duplicate component: the survivor of each cluster is its minimum
    * id (ties impossible — ids are unique), documents with no pairs survive
    * untouched. This is the "pairs → smaller corpus" step of the dedup
    * pipeline; `pairs` comes from any generator with the (a, b) contract. */
  def dedupByPairs(docs: DataFrame, idCol: String, pairs: DataFrame,
                   aCol: String = "a", bCol: String = "b"): DataFrame = {
    val comp = connectedComponents(pairs, aCol, bCol)
    val losers = comp.filter(F.col("v") =!= F.col("component"))
      .select(F.col("v").as(idCol))
    // broadcast-anti against the (small: only clustered docs) loser set —
    // the corpus is scanned once and never shuffled
    docs.join(F.broadcast(losers), Seq(idCol), "left_anti")
  }
}
