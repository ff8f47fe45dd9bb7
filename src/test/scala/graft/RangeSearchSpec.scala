package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The exact radius-search contract: pruning is LOSSLESS (result ≡
  * brute force at every threshold), the triangle-inequality route
  * actually prunes clusters, and an unreachable threshold degrades to
  * an empty result, never an error. */
class RangeSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val cents = emb.filter(col("vec_id") < 8).withColumnRenamed("vec_id", "cid")
  private lazy val assigned =
    Similarity.ivfAssign(emb, "embedding", "vec_id", cents, "cid", keepVec = true)
  private lazy val qvec = emb.filter(col("vec_id") === 1)
    .select(transform(col("embedding"), _.cast("double")))
    .head().getSeq[Double](0)

  private def brute(minCos: Double): Set[(Long, Double)] =
    emb.select(col("vec_id"),
        round(Similarity.cosine(transform(col("embedding"), _.cast("double")),
          typedlit(qvec)), 6).as("cosine"))
      .filter(col("cosine") >= lit(minCos))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet

  test("range search ≡ brute force at every threshold — pruning is lossless") {
    for (tau <- Seq(-1.0, 0.0, 0.25, 0.5, 0.9)) {
      val got = Similarity.rangeSearch(assigned, "vec_id", cents, "cid", "embedding",
        qvec, minCosine = tau)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got === brute(tau), s"range search must match brute force at tau=$tau")
    }
  }

  test("the triangle-inequality route prunes clusters without losing members") {
    // a corpus with REAL cluster structure (the fixture's random vectors
    // give every cluster a ~π/2 radius, which correctly prunes nothing):
    // 4 well-separated directions, members jittered ±0.05 around each
    val dirs = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0, 1.0))
    val members = for {
      (dir, c) <- dirs.zipWithIndex
      j <- 0 until 25
    } yield (c.toLong * 100 + j,
      dir.zipWithIndex.map { case (x, i) => x + (((c * 31 + j * 7 + i) % 11) - 5) * 0.01 })
    val corpus = members.toDF("vec_id", "embedding")
    val planted = dirs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("cid", "embedding")
    val a = Similarity.ivfAssign(corpus, "embedding", "vec_id", planted, "cid",
      keepVec = true)
    val radii = Similarity.clusterRadii(a, planted, "cid", "embedding")
    assert(radii.count() === 4L, "one radius row per centroid")
    assert(radii.agg(max(col("radius"))).head().getDouble(0) < 0.2,
      "planted clusters must be tight")
    val q = Seq(1.0, 0.02, -0.02, 0.01)
    val all = Similarity.rangeRoute(planted, "cid", "embedding", radii, q, -1.0)
    assert(all.size === 4, "tau=-1 keeps every cluster")
    val tight = Similarity.rangeRoute(planted, "cid", "embedding", radii, q, 0.9)
    assert(tight.size < 4, "a tight threshold must prune clusters")
    // completeness: the pruned search still equals brute force
    val got = Similarity.rangeSearch(a, "vec_id", planted, "cid", "embedding",
      q, minCosine = 0.9).collect().map(_.getLong(0)).toSet
    val truth = corpus.select(col("vec_id"),
        round(Similarity.cosine(transform(col("embedding"), _.cast("double")),
          typedlit(q)), 6).as("c"))
      .filter(col("c") >= 0.9).collect().map(_.getLong(0)).toSet
    assert(got === truth && truth.nonEmpty,
      "no qualifying member may live in a pruned cluster")
  }

  test("empty centroid frame raises — a silently-empty range result would hide a broken store") {
    val none = cents.filter(col("cid") < -1)
    val radii = Similarity.clusterRadii(assigned, cents, "cid", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.rangeRoute(none, "cid", "embedding", radii, qvec, 0.0)
    }
    assert(e.getMessage.contains("no clusters to route"))
  }

  test("unreachable threshold: empty result, no error") {
    val out = Similarity.rangeSearch(assigned, "vec_id", cents, "cid", "embedding",
      qvec, minCosine = 0.999999)
    assert(out.columns.toSeq === Seq("vec_id", "cosine"))
    assert(out.count() === brute(0.999999).size.toLong)
  }
}
