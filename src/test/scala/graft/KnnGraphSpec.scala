package graft

import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The kNN-graph contract (operators/Similarity.knnGraph):
  *  - probing ALL K clusters is exhaustive — the graph equals brute-force
  *    kNN row for row (blocking is then complete by construction);
  *  - `ivfProbes` is exactly the crossJoin+window probe selection
  *    (same rounded scores, same (sim DESC, cid ASC) order) without the
  *    n·K exchange;
  *  - structural invariants at partial probes: ≤ k rows per point, no
  *    self-pairs, no duplicate (point, neighbor) edges, dense ranks;
  *  - the measured recall of the 2-probe graph on the fixture — the
  *    number that justifies the nProbe dial before a 100 TB run.
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val cents =
    emb.filter(col("vec_id") < 8).withColumnRenamed("vec_id", "cid")
  private val K = 5

  /** Brute-force kNN graph: every ordered pair scored, top-k per point. */
  private lazy val brute = {
    val a = emb.select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("av"))
    val b = emb.select(col("vec_id").as("nbr_id"),
      transform(col("embedding"), _.cast("double")).as("bv"))
    a.crossJoin(b).filter(col("vec_id") =!= col("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        round(Similarity.cosine(col("av"), col("bv")), 6).as("cosine"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cosine").desc, col("nbr_id"))))
      .filter(col("rank") <= K)
  }

  test("knnGraph probing all K clusters ≡ brute-force kNN") {
    val got = Similarity.knnGraph(emb, "embedding", "vec_id", cents, "cid",
      k = K, nProbe = 8)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("ivfProbes ≡ the crossJoin+window probe selection, per rank") {
    val nProbe = 3
    val got = Similarity.ivfProbes(emb, "embedding", "vec_id", cents, "cid", nProbe)
      .select("vec_id", "probe_rank", "centroid_id")
    val c = cents.select(col("cid"),
      transform(col("embedding"), _.cast("double")).as("cv"))
    val naive = emb
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .crossJoin(c)
      .select(col("vec_id"), col("cid"),
        round(Similarity.cosine(col("v"), col("cv")), 6).as("sim"))
      .withColumn("probe_rank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))))
      .filter(col("probe_rank") <= nProbe)
      .select(col("vec_id"), col("probe_rank").cast("int"), col("cid").as("centroid_id"))
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("partial-probe graph invariants: bounded, self-free, edge-unique, dense ranks") {
    val g = Similarity.knnGraph(emb, "embedding", "vec_id", cents, "cid",
      k = K, nProbe = 2).localCheckpoint()
    assert(g.filter(col("vec_id") === col("nbr_id")).isEmpty, "self-pair leaked")
    val perPoint = g.groupBy("vec_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("nbr_id")).as("nd"),
        max(col("rank")).as("mx"))
    assert(perPoint.filter(col("n") > K).isEmpty, s"more than k=$K neighbors")
    assert(perPoint.filter(col("n") =!= col("nd")).isEmpty, "duplicate edge")
    assert(perPoint.filter(col("n") =!= col("mx")).isEmpty, "ranks not dense 1..n")
  }

  test("probe recall: 1.0 on a clustered corpus at nProbe=1; beats chance on the random fixture") {
    // REAL cluster structure (the random fixture has none — its
    // "clusters" are arbitrary Voronoi cells of 8 random centroids, so
    // partial probes approach the nProbe/K chance floor): 4 orthogonal
    // directions, members jittered ±0.05 — every true neighbor shares
    // its point's home cluster, so ONE probe is already exhaustive
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
    val oneProbe = Similarity.knnGraph(corpus, "embedding", "vec_id",
        planted, "cid", k = K, nProbe = 1)
      .select(col("vec_id"), col("nbr_id"))
    val exact = Similarity.knnGraph(corpus, "embedding", "vec_id",
        planted, "cid", k = K, nProbe = 4)
      .select(col("vec_id"), col("nbr_id"))
    assert(oneProbe.exceptAll(exact).isEmpty && exact.exceptAll(oneProbe).isEmpty,
      "on separated clusters, the home probe alone must be exhaustive")
    // the random fixture: 2/8 probes must still beat the 0.25 chance
    // floor (measured ~0.43 — the probe order correlates with neighbor
    // direction even without structure)
    val g = Similarity.knnGraph(emb, "embedding", "vec_id", cents, "cid",
        k = K, nProbe = 2)
      .select(col("vec_id"), col("nbr_id"))
    val hit = brute.select(col("vec_id"), col("nbr_id"))
      .join(g, Seq("vec_id", "nbr_id"), "left_semi").count()
    val recall = hit.toDouble / brute.count()
    assert(recall >= 0.3, f"2-probe recall $recall%.3f under the chance-beating floor")
  }

  test("knnGraph rejects k < 1 and ivfProbes rejects nProbe < 1") {
    assertThrows[IllegalArgumentException] {
      Similarity.knnGraph(emb, "embedding", "vec_id", cents, "cid", k = 0, nProbe = 1)
    }
    assertThrows[IllegalArgumentException] {
      Similarity.ivfProbes(emb, "embedding", "vec_id", cents, "cid", nProbe = 0)
    }
  }
}
