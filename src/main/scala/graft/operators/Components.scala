package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup output (`Dedup.minhashNearDups`,
  * `ngramJaccardPairs`, `simhashNearDups`) into disjoint duplicate
  * CLUSTERS, so a corpus keeps exactly one representative per group even
  * when duplicates chain transitively (A~B, B~C, A≁C). The reference's
  * `drop_duplicates` only handles exact groups; every large-scale training
  * corpus dedup needs the transitive closure.
  *
  * Algorithm: iterative min-label propagation — each round every node
  * takes the minimum component id among itself and its neighbors; a
  * fixpoint is reached after O(component diameter) rounds (near-dup
  * clusters are clique-like, so 2–3 in practice). Each round is one
  * join + one aggregation on the edge list: linear shuffles, no
  * all-pairs anything. The per-round `isEmpty` convergence probe is a
  * driver-side scalar — the same fixpoint test any Pregel-style loop
  * needs — not a data collect.
  */
object Components {

  /** (id, component) for every node appearing in `pairs`, where component
    * = the minimum node id reachable from it (undirected). Nodes with no
    * pairs are trivially their own component — union them in downstream
    * if a total labeling is needed. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 20): DataFrame = {
    val half = pairs.select(col(aCol).cast("long").as("s"), col(bCol).cast("long").as("d"))
    val edges = half.union(half.select(col("d").as("s"), col("s").as("d")))
      .distinct().cache()
    // localCheckpoint (eager) after every round: an iterative fixpoint must
    // TRUNCATE lineage, not just cache — otherwise the logical plan grows
    // with each iteration and planning cost compounds. (For fault-tolerant
    // production runs, swap in reliable checkpoint(); localCheckpoint
    // trades re-computability for speed, the standard Pregel-loop choice.)
    var labels = edges.select(col("s").as("id")).distinct()
      .select(col("id"), col("id").as("comp")).localCheckpoint()
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val neighborMin = edges
        .join(labels.select(col("id").as("d"), col("comp").as("dcomp")), Seq("d"))
        .groupBy(col("s").as("id"))
        .agg(min(col("dcomp")).as("nmin"))
      // the convergence flag rides INSIDE the label-update row (computed in
      // the same job that materializes the checkpoint); the probe is then a
      // filter over local checkpoint blocks — no second join per round
      val newComp = least(col("comp"), coalesce(col("nmin"), col("comp")))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), newComp.as("comp"), (newComp < col("comp")).as("__changed"))
        .localCheckpoint()
      converged = next.filter(col("__changed")).isEmpty
      labels = next.drop("__changed")
      i += 1
    }
    edges.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did NOT converge within maxIter=$maxIter rounds " +
          "(component diameter exceeds maxIter); labels are partially propagated " +
          "and the 'comp = min reachable id' contract does not hold — raise maxIter")
    labels
  }

  /** Corpus dedup, completed: keep exactly ONE representative (the
    * min-id member) per duplicate cluster, plus every row with no
    * near-dup pair at all. `left_anti` against the non-representative
    * members — ids only cross the wire, never document bodies. */
  def keepRepresentatives(df: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val nonReps = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(nonReps, Seq(idCol), "left_anti")
  }
}
