package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The MMR rerank contract (Similarity.mmrRerank):
  *  - greedy selection on a hand-built fixture: the near-duplicate of
  *    the best hit is demoted below the diverse candidate;
  *  - rank 1 is always the relevance argmax (tie → lower id);
  *  - selected ids are distinct, ranks dense, scores non-increasing in
  *    a λ=1 run (pure relevance ⇒ MMR ≡ top-k);
  *  - on real embeddings the result is a subset of the exact top-N.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("near-dup of the best hit is demoted below the diverse candidate") {
    // query [1,0]; a ≈ query, b = near-dup of a, c = diverse.
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)),        // a: rel 1.0
      (2L, Seq(0.999f, 0.015f)),    // b: rel ~0.9999, sim(a,b) ~0.9999
      (3L, Seq(0.7f, 0.7f))         // c: rel ~0.707, sim(a,c) ~0.707
    ).toDF("vec_id", "embedding")
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(df, "embedding", "vec_id", q,
      topN = 3, k = 3, lambda = 0.7, mu = 0.3)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    // step 2: b scores 0.7·0.9999 − 0.3·0.9999 ≈ 0.4, c scores
    // 0.7·0.707 − 0.3·0.707 ≈ 0.283 — b still wins at these weights;
    // with a heavier diversity weight c must overtake b.
    val heavy = Similarity.mmrRerank(df, "embedding", "vec_id", q,
      topN = 3, k = 2, lambda = 0.3, mu = 0.7)
      .select("rank", "vec_id").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.head === ((1L, 1L)))
    assert(heavy === Seq((1L, 1L), (2L, 3L)),
      "diversity weight must demote the near-duplicate")
  }

  test("λ=1 (no diversity term) reproduces the exact top-k order") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val mmr = Similarity.mmrRerank(e.filter(col("vec_id") =!= 0), "embedding",
      "vec_id", e.filter(col("vec_id") === 0), topN = 20, k = 5,
      lambda = 1.0, mu = 0.0)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    val topk = Similarity.topK(e.filter(col("vec_id") =!= 0), "embedding",
      "vec_id", e.filter(col("vec_id") === 0), k = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(mmr === topk)
  }

  test("selection invariants on real data: subset of top-N, dense ranks, distinct ids") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = q("sim_mmr_rerank").cache()
    val rows = out.select("rank", "vec_id").as[(Long, Long)].collect().toSeq
    assert(rows.map(_._1).sorted === (1L to 5L))
    assert(rows.map(_._2).distinct.size === 5)
    val top20 = Similarity.topK(e.filter(col("vec_id") =!= 0), "embedding",
      "vec_id", e.filter(col("vec_id") === 0), k = 20)
      .select("vec_id").as[Long].collect().toSet
    assert(rows.map(_._2).forall(top20))
    // rank 1 is the relevance argmax of the candidate page
    val best = q("sim_mmr_rerank").orderBy("rank").select("vec_id").as[Long].head()
    assert(best === Similarity.topK(e.filter(col("vec_id") =!= 0), "embedding",
      "vec_id", e.filter(col("vec_id") === 0), k = 1)
      .select("vec_id").as[Long].head())
  }
}
