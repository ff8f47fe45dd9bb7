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
  * Algorithm: min-label propagation with pointer jumping — each round
  * every node takes the minimum component id among itself, its neighbors'
  * labels, AND its own label's label (path compression). Labels only
  * decrease and never leave the component, so the fixpoint is the min
  * reachable id; the shortcut round makes label distance-to-root halve
  * each round, so convergence is O(log diameter) rounds instead of
  * O(diameter) — on a 100 TB corpus a pathological duplicate chain
  * (scraped mirror-of-mirror sites) costs tens of rounds, not a million.
  * The observed constant is a bit above 1×log2(diameter): a ~60k-node
  * hamming chain (sf0.1 gradient images) needs 21–24 rounds, which is why
  * the default maxIter is 64 (covers diameter ~2^40; the loop exits the
  * round after the fixpoint, so small graphs never pay the headroom).
  * Each round is one join + aggregation on the edge list plus one
  * self-join on the (small) label frame: linear shuffles, no all-pairs
  * anything. The per-round `isEmpty` convergence probe is a driver-side
  * scalar over checkpoint blocks — the same fixpoint test any
  * Pregel-style loop needs — not a data collect.
  */
object Components {

  /** Labels plus the convergence evidence a caller needs before trusting
    * them: `converged = false` means `comp` is only partially propagated
    * and the "comp = min reachable id" contract does NOT hold. */
  final case class ComponentsRun(labels: DataFrame, converged: Boolean, rounds: Int)

  /** (id, component) for every node appearing in `pairs`, where component
    * = the minimum node id reachable from it (undirected). Nodes with no
    * pairs are trivially their own component — union them in downstream
    * if a total labeling is needed. Returns the labels together with
    * (converged, rounds) so non-convergence is observable by the caller,
    * not just a WARN line in the driver log.
    *
    * MEASURED-SMALL FAST PATH (`smallGraphLimit`, same contract as a
    * broadcast join's size gate): dedup pair graphs are usually orders of
    * magnitude smaller than the corpus that produced them — ids only, and
    * only for docs that HAVE a near-dup. When the measured edge count fits
    * the limit (default 2M pairs ≈ 64 MB of id tuples, broadcast-sized),
    * the edge list is collected and union-find runs on the driver in
    * microseconds, with `rounds = 0`. The distributed pointer-jumping loop
    * below pays several shuffle stages + a checkpoint + a convergence
    * probe PER ROUND — the right trade for a billion-edge graph, but on a
    * 1.7k-edge graph with a diameter-1000 chain (sf0.1 gradient images)
    * those fixed costs were 37 s of wall for microseconds of work. Pass
    * `smallGraphLimit = 0` to force the distributed loop (specs do, to
    * exercise the fixpoint). Labels are identical either way: union-find
    * roots are remapped to each set's minimum member id. */
  def run(pairs: DataFrame, aCol: String, bCol: String,
          maxIter: Int = 64, smallGraphLimit: Long = 2000000L): ComponentsRun = {
    val shim = org.apache.spark.sql.GraftShim
    // fused null guard: a null endpoint is a broken pair frame either
    // way, but without this the two regimes diverged on it — the driver
    // fast path threw an opaque Dataset-decode NPE while the distributed
    // loop silently propagated the null. Both now raise the same error.
    def guarded(c: String, as: String) = coalesce(
      when(col(c).isNull, raise_error(
        lit(s"connectedComponents: null $c in the pair frame"))),
      col(c).cast("long")).as(as)
    val half = pairs.select(guarded(aCol, "s"), guarded(bCol, "d"))
      .cache()
    if (smallGraphLimit > 0 && half.count() <= smallGraphLimit) {
      val sparkForCollect = pairs.sparkSession
      import sparkForCollect.implicits._
      // Dataset collect: specialized (Long, Long) tuples, ~48 B each — the
      // 2M-edge gate costs ~100 MB of driver heap transiently, the same
      // order as a broadcast side
      val tuples = half.as[(Long, Long)].collect()
      half.unpersist()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
        var c = x // path compression
        while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      tuples.foreach { case (a, b) =>
        parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
      }
      // root = min member by construction (always union larger under
      // smaller), so comp IS the min reachable id
      val ids = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
      parent.keySet.forEach(id => ids += ((id, find(id))))
      // distribute the labels via a parallelized RDD, NOT a driver-local
      // toDF: a LocalRelation of up to ~2× smallGraphLimit node rows
      // would be re-embedded in EVERY consuming plan (keepRepresentatives
      // joins it against the corpus) and serialized with each job —
      // parallelize ships it to executors once and the consumers read
      // distributed partitions like any other frame. One thing the
      // LocalRelation DID carry is a size statistic: without it the
      // consumers' label joins fall back to sort-merge and shuffle the
      // corpus (measured 2.4 s → 6 s on keepRepresentatives). The driver
      // knows the exact label count here, so restore broadcastability
      // explicitly while the label set is genuinely broadcast-sized.
      val labelsRdd = sparkForCollect.sparkContext.parallelize(
        ids.toSeq, math.max(1, math.min(64, ids.size / 250000 + 1)))
      val labelsDf = labelsRdd.toDF("id", "comp")
      return ComponentsRun(
        if (ids.size <= 2000000) labelsDf.hint("broadcast") else labelsDf,
        converged = true, rounds = 0)
    }
    val edges = half.union(half.select(col("d").as("s"), col("s").as("d")))
      .distinct().cache()
    edges.count()
    half.unpersist()
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
      // pointer jump: my label's label. Every comp value is itself a node
      // id with exactly one label row, so the lookup is multiplicity-1;
      // labels[comp] <= comp (labels only shrink), so the shortcut is
      // monotone and stays inside the component.
      val parent = labels.select(col("id").as("__p"), col("comp").as("jcomp"))
      // the convergence flag rides INSIDE the label-update row (computed in
      // the same job that materializes the checkpoint); the probe is then a
      // filter over local checkpoint blocks — no second pass over the data
      val newComp = least(col("comp"),
        coalesce(col("nmin"), col("comp")), coalesce(col("jcomp"), col("comp")))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .join(parent, col("comp") === col("__p"), "left")
        .select(col("id"), newComp.as("comp"), (newComp < col("comp")).as("__changed"))
        .localCheckpoint()
      converged = next.filter(col("__changed")).isEmpty
      // this round's snapshot supersedes the previous one — release its
      // blocks now instead of letting up to maxIter snapshots pile up in
      // the block store until driver GC notices
      shim.unpersistCheckpoint(labels)
      labels = next.drop("__changed")
      i += 1
    }
    edges.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did NOT converge within maxIter=$maxIter rounds " +
          "(component diameter exceeds maxIter); labels are partially propagated " +
          "and the 'comp = min reachable id' contract does not hold — raise maxIter")
    ComponentsRun(labels, converged, i)
  }

  /** Labels-only view of [[run]] for callers that don't need the round
    * count; non-convergence is still WARN-logged. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 64,
                          smallGraphLimit: Long = 2000000L): DataFrame =
    run(pairs, aCol, bCol, maxIter, smallGraphLimit).labels

  /** Corpus dedup, completed: keep exactly ONE representative (the
    * min-id member) per duplicate cluster, plus every row with no
    * near-dup pair at all. `left_anti` against the non-representative
    * members — ids only cross the wire, never document bodies.
    *
    * Throws if the labeling did not converge: silently deduping against
    * partially-propagated labels would keep multiple docs per cluster,
    * which is exactly the corruption this operator exists to prevent. */
  def keepRepresentatives(df: DataFrame, idCol: String,
                          pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 64,
                          smallGraphLimit: Long = 2000000L): DataFrame = {
    val r = run(pairs, aCol, bCol, maxIter, smallGraphLimit)
    if (!r.converged)
      throw new IllegalStateException(
        s"keepRepresentatives: component labeling did not converge in ${r.rounds} rounds " +
          "(maxIter too small for the component diameter) — deduping against partial " +
          "labels would keep multiple representatives per cluster; raise maxIter")
    keepRepresentativesFromLabels(df, idCol, r.labels)
  }

  /** Same, from precomputed component labels — lets a pipeline that
    * already ran [[run]] (or shares one labeling across several consumers)
    * skip recomputing the fixpoint. */
  def keepRepresentativesFromLabels(df: DataFrame, idCol: String,
                                    labels: DataFrame): DataFrame = {
    val nonReps = labels
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    df.join(nonReps, Seq(idCol), "left_anti")
  }
}
