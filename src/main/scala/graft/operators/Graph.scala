package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over an undirected edge list — the
  * item-affinity questions a catalog/marketplace pipeline asks of the
  * co-purchase graph the reference's relational load implies (orders ×
  * listings, `Airbnb_Listings_ETL.py:76–81`): which items form cliques
  * (triangles), which items share neighborhoods (node Jaccard).
  *
  * Scale design (100 TB):
  *  - Input contract: DISTINCT undirected edges with `u < v` — one row
  *    per edge, never both directions, so every downstream cost is in
  *    terms of m = |E|, not 2m.
  *  - Triangle counting is the DEGREE-ORIENTED (compact-forward)
  *    algorithm: orient every edge from its lower-(degree, id) endpoint
  *    to the higher one, enumerate wedges at the LOW-degree apex, and
  *    close them against the oriented edge set. Out-degrees under this
  *    orientation are bounded by O(√m) on any graph (arboricity bound),
  *    so the wedge exchange is Σ outdeg² = O(m^1.5) worst-case instead
  *    of the Σ deg² of naive wedge enumeration — the difference between
  *    a feasible shuffle and a quadratic blow-up when the co-purchase
  *    graph has hub items (every bestseller is a hub). Every step is a
  *    keyed equi-join; there is no all-pairs stage anywhere.
  *  - Node Jaccard enumerates wedges (pairs of nodes at distance 2)
  *    grouped by the shared neighbor, so its exchange is Σ deg² of the
  *    input graph — callers feed it a support-thresholded edge set
  *    (see the `q_node_jaccard` query) exactly because the raw
  *    co-occurrence graph's hubs would dominate; the threshold is the
  *    documented knob, not a silent cap.
  */
object Graph {

  /** Per-node triangle participation counts: `(n, n_tri)` for every node
    * in at least one triangle. Each triangle {a,b,c} contributes one to
    * all three members. Input: distinct `(u, v)` with `u < v`. */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val tri = triangles(edges)
    tri.select(col("a").as("n"))
      .unionAll(tri.select(col("b").as("n")))
      .unionAll(tri.select(col("c").as("n")))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
  }

  /** Every triangle exactly once as `(a, b, c)`, canonicalized to
    * `a < b < c` by node id (so the output is orientation-independent
    * and an id-ordered SQL replay matches row for row). */
  def triangles(edges: DataFrame): DataFrame = {
    // Degrees in the undirected graph (each edge counts both endpoints).
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))

    // Orient low-(deg, id) -> high-(deg, id). Carry the destination's
    // rank key so wedge pairs can be ordered without re-joining degrees.
    val du = deg.select(col("n").as("u"), col("deg").as("du"))
    val dv = deg.select(col("n").as("v"), col("deg").as("dv"))
    val uKey = struct(col("du").as("d"), col("u").as("i"))
    val vKey = struct(col("dv").as("d"), col("v").as("i"))
    val oriented = edges.join(du, "u").join(dv, "v")
      .select(
        when(uKey < vKey, col("u")).otherwise(col("v")).as("src"),
        when(uKey < vKey, col("v")).otherwise(col("u")).as("dst"),
        when(uKey < vKey, vKey).otherwise(uKey).as("dkey"))

    // Wedges at the apex: unordered out-neighbor pairs, ordered by the
    // orientation rank key so the closing edge is probed ONCE per wedge.
    val e1 = oriented.select(col("src"), col("dst").as("b"), col("dkey").as("bk"))
    val e2 = oriented.select(col("src"), col("dst").as("c"), col("dkey").as("ck"))
    val wedges = e1.join(e2, Seq("src")).filter(col("bk") < col("ck"))
      .select(col("src").as("a"), col("b"), col("c"))

    // Close against the oriented edges (b -> c in orientation order).
    val closing = oriented.select(col("src").as("b"), col("dst").as("c"))
    val srt = sort_array(array(col("a"), col("b"), col("c")))
    wedges.join(closing, Seq("b", "c"))
      .select(element_at(srt, 1).as("a"), element_at(srt, 2).as("b"),
        element_at(srt, 3).as("c"))
  }

  /** Neighborhood Jaccard similarity for every node pair at distance 2:
    * `(a, b, n_common, deg_a, deg_b, jaccard)` with `a < b`, where
    * `jaccard = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|`. Pairs sharing no
    * neighbor are (correctly) absent — their Jaccard is 0 and
    * enumerating them would be the all-pairs blow-up this construction
    * exists to avoid. The division is one double op over exact integer
    * counts, so it is bit-identical in any engine. */
  def nodeJaccard(edges: DataFrame): DataFrame = {
    val adj = edges.select(col("u").as("n"), col("v").as("nb"))
      .unionAll(edges.select(col("v").as("n"), col("u").as("nb")))
    val deg = adj.groupBy("n").agg(count(lit(1)).as("deg"))

    val x = adj.select(col("n").as("a"), col("nb"))
    val y = adj.select(col("n").as("b"), col("nb"))
    val common = x.join(y, Seq("nb")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_common"))

    common
      .join(deg.select(col("n").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("deg_b")), "b")
      .select(col("a"), col("b"), col("n_common"), col("deg_a"), col("deg_b"),
        round(col("n_common").cast("double") /
          (col("deg_a") + col("deg_b") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
  }
}
