package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** The graph-analytics contracts (operators/Graph):
  *  - degree-oriented triangle enumeration ≡ the id-ordered brute
  *    construction (the oracle's) on the REAL sf0.001 co-purchase graph —
  *    orientation changes the join order, never the triangle set;
  *  - canonical output: a < b < c, no duplicates;
  *  - per-node counts are exactly 3 memberships per triangle;
  *  - nodeJaccard ≡ brute-force neighbor-set Jaccard on a hand fixture
  *    (hub + chain shapes) and never emits a zero-common pair.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Distinct co-purchase (u < v) edges of the sf0.001 lineitem. */
  private lazy val edges = {
    val items = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    items.as("a").join(items.as("b"), col("a.ok") === col("b.ok"))
      .filter(col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
      .cache()
  }

  /** Id-ordered enumeration: e1=(a,b), e2=(b,c), closing (a,c) — each
    * triangle exactly once with a < b < c (the DuckDB oracle's shape). */
  private lazy val bruteTriangles = {
    val e = edges
    e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
  }

  test("degree-oriented triangles ≡ id-ordered brute enumeration on real data") {
    val got = Graph.triangles(edges)
    assert(got.count() > 0, "fixture graph must contain triangles")
    assert(got.exceptAll(bruteTriangles).isEmpty &&
      bruteTriangles.exceptAll(got).isEmpty)
  }

  test("triangle rows are canonical (a < b < c) and distinct") {
    val got = Graph.triangles(edges).cache()
    assert(got.filter(!(col("a") < col("b") && col("b") < col("c"))).isEmpty)
    assert(got.count() === got.distinct().count())
  }

  test("edge-iterator and wedge-join regimes find the identical triangle set") {
    val gated = Graph.triangles(edges)
    val shuffled = Graph.triangles(edges, broadcastCloseLimit = 0L)
    assert(gated.exceptAll(shuffled).isEmpty && shuffled.exceptAll(gated).isEmpty)
  }

  test("per-node counts sum to 3× the triangle count") {
    val nTri = Graph.triangles(edges).count()
    val sumCounts = Graph.triangleCounts(edges)
      .agg(sum("n_tri")).as[Long].head()
    assert(sumCounts === 3 * nTri)
  }

  test("nodeJaccard ≡ brute force on a hub+chain fixture") {
    // 1-2-3-4 chain, 5 a hub to 1,2,3 — N(1)={2,5} N(2)={1,3,5}
    // N(3)={2,4,5} N(4)={3} N(5)={1,2,3}
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 5L), (2L, 5L), (3L, 5L))
      .toDF("u", "v")
    val got = Graph.nodeJaccard(e)
      .select("a", "b", "n_common", "deg_a", "deg_b", "jaccard")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    // expected: every pair with >= 1 common neighbor
    val adj = Map(1L -> Set(2L, 5L), 2L -> Set(1L, 3L, 5L), 3L -> Set(2L, 4L, 5L),
      4L -> Set(3L), 5L -> Set(1L, 2L, 3L))
    val exp = (for {
      a <- adj.keys; b <- adj.keys if a < b
      common = (adj(a) intersect adj(b)).size if common > 0
    } yield (a, b, common.toLong, adj(a).size.toLong, adj(b).size.toLong,
      BigDecimal(common.toDouble / (adj(a).size + adj(b).size - common))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(got === exp)
  }

  test("pageRank equals an exact integer driver replay on real data") {
    val got = Graph.pageRank(edges).as[(Long, Long)].collect().toMap
    // driver replay with the same floor semantics
    val es = edges.as[(Long, Long)].collect().toSeq
    val adj = (es ++ es.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    var pr = adj.keys.map(_ -> 1000000000L).toMap
    (1 to 3).foreach { _ =>
      val contrib = pr.map { case (n, p) => n -> p / deg(n) }
      pr = adj.keys.map { v =>
        val s = adj(v).iterator.map(u => contrib(u)).sum
        v -> (150000000L + 85L * s / 100L)
      }.toMap
    }
    assert(got === pr)
  }

  test("pageRank ranks the hub of a star above its leaves") {
    val star = (1L to 50L).map(i => (i, 99L)).toDF("u", "v")
    val pr = Graph.pageRank(star).as[(Long, Long)].collect().toMap
    assert(pr(99L) > pr(1L) * 10, s"hub pr ${pr(99L)} vs leaf ${pr(1L)}")
    assert((1L to 50L).map(pr).distinct.size === 1, "symmetric leaves tie exactly")
  }

  test("nodeJaccard on real edges: jaccard in (0,1], common ≤ min degree") {
    val out = Graph.nodeJaccard(edges).cache()
    assert(out.count() > 0)
    assert(out.filter(col("jaccard") <= 0.0 || col("jaccard") > 1.0).isEmpty)
    assert(out.filter(col("n_common") > least(col("deg_a"), col("deg_b"))).isEmpty)
  }
}
