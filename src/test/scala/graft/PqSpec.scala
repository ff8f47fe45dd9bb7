package graft

import org.apache.spark.sql.functions._
import graft.operators.ProductQuant

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 4
  // two tight clusters around [0,0,0,0] and [9,9,9,9]; ids 0/1 seed the
  // codebooks (first-k init), the rest must join their nearest cluster
  private def corpus = Seq(
    (0L, Seq(0.0, 0.0, 0.0, 0.0)),
    (1L, Seq(9.0, 9.0, 9.0, 9.0)),
    (2L, Seq(0.2, 0.0, 0.1, 0.0)),
    (3L, Seq(8.8, 9.0, 9.1, 9.0)),
    (4L, Seq(0.0, 0.1, 0.0, 0.2)),
    (5L, Seq(9.0, 8.9, 9.0, 8.8))
  ).toDF("vec_id", "vec")

  test("train returns exactly m*k codebook rows of subvector length") {
    val cb = ProductQuant.train(corpus, "vec", "vec_id", m = 2, k = 2, dims = dims)
    assert(cb.count() === 4, "m=2 subspaces x k=2 codes")
    assert(cb.filter(size($"c_v") =!= dims / 2).isEmpty)
    assert(cb.select("subspace").distinct().as[Int].collect().toSet === Set(0, 1))
  }

  test("encode assigns both clusters to their own codes; codes are partition-invariant") {
    val cb = ProductQuant.train(corpus, "vec", "vec_id", m = 2, k = 2, dims = dims)
    def codesOf(df: org.apache.spark.sql.DataFrame) =
      ProductQuant.encode(df, "vec", "vec_id", cb, m = 2, dims = dims)
        .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val c = codesOf(corpus)
    assert(c.values.forall(_.length === 2))
    assert(c(0L) === c(2L) && c(0L) === c(4L), "cluster-0 members share codes")
    assert(c(1L) === c(3L) && c(1L) === c(5L), "cluster-1 members share codes")
    assert(c(0L) !== c(1L), "the clusters must not collapse")
    assert(c === codesOf(corpus.repartition(7)), "codes must not depend on partitioning")
  }

  test("ADC distance equals the exact distance to the RECONSTRUCTED vector") {
    // the PQ identity: adist(q, codes(x)) = sum_j round(|q_j - c_{codes_j}|^2)
    // = the distance to x's codebook reconstruction — verified by decoding
    // the codes on the driver and recomputing
    val cb = ProductQuant.train(corpus, "vec", "vec_id", m = 2, k = 2, dims = dims)
    val codes = ProductQuant.encode(corpus, "vec", "vec_id", cb, m = 2, dims = dims)
    val q = Seq(0.1, 0.1, 0.1, 0.1)
    val got = ProductQuant.search(codes, "vec_id", cb, q, m = 2, dims = dims, k = 6)
      .as[(Long, Double)].collect().toMap
    val book = cb.select($"subspace", $"cid", $"c_v")
      .as[(Int, Int, Seq[Double])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    val codeMap = codes.select($"vec_id", $"codes").as[(Long, Seq[Int])].collect().toMap
    val want = codeMap.map { case (id, cs) =>
      id -> cs.zipWithIndex.map { case (c, j) =>
        val sub = book((j, c))
        val d = q.slice(j * 2, j * 2 + 2).zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet === want.keySet)
    got.foreach { case (id, a) =>
      assert(math.abs(a - want(id)) < 1e-9, s"id=$id adc=$a recon=${want(id)}")
    }
    // and the near-query cluster ranks strictly ahead of the far one
    val top3 = ProductQuant.search(codes, "vec_id", cb, q, m = 2, dims = dims, k = 3)
      .as[(Long, Double)].collect().map(_._1).toSet
    assert(top3 === Set(0L, 2L, 4L), "cluster at the query must fill the top-3")
  }

  test("IVF+PQ pruning with full probes equals the unpruned ADC ranking") {
    // probing every coarse cluster makes the pruned path exhaustive —
    // the IVF stage must then be a pure plan choice over the PQ ranking
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = e.filter($"vec_id" < 8).withColumnRenamed("vec_id", "cid")
    val cb = ProductQuant.train(e, "embedding", "vec_id", m = 4, k = 8, dims = 64)
    val codes = ProductQuant.encode(e, "embedding", "vec_id", cb, m = 4, dims = 64)
    val qv = e.filter($"vec_id" === 0)
      .select(transform($"embedding", _.cast("double"))).head().getSeq[Double](0)
    val assigned = Similarity.ivfAssign(e, "embedding", "vec_id", cents, "cid")
    val probeAll = Similarity.topK(cents, "embedding", "cid", qv, k = 8)
      .select($"cid").as[Long].collect().toIndexedSeq
    val surv = assigned.filter($"centroid_id".isin(probeAll: _*)).select("vec_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toString).toSeq
    val pruned = rows(ProductQuant.search(
      codes.join(surv, Seq("vec_id"), "left_semi"), "vec_id", cb, qv,
      m = 4, dims = 64, k = 10))
    val full = rows(ProductQuant.search(codes, "vec_id", cb, qv,
      m = 4, dims = 64, k = 10))
    assert(pruned === full, "full-probe IVF+PQ must equal the unpruned ranking")
  }

  test("two-stage rerank returns EXACT distances and recovers what quantization blurred") {
    val cb = ProductQuant.train(corpus, "vec", "vec_id", m = 2, k = 2, dims = dims)
    val codes = ProductQuant.encode(corpus, "vec", "vec_id", cb, m = 2, dims = dims)
    val q = Seq(0.2, 0.0, 0.1, 0.0) // exactly vec 2
    // ADC is blind inside a cluster: every cluster-0 member shares codes,
    // so plain search ties them all and the id tie-break promotes 0
    val adcTop = ProductQuant.search(codes, "vec_id", cb, q, m = 2, dims = dims, k = 1)
      .select($"vec_id").as[Long].head()
    assert(adcTop === 0L, "fixture: quantization must actually blur the answer")
    val rr = ProductQuant.searchRerank(codes, corpus, "vec_id", "vec", cb, q,
        m = 2, dims = dims, k = 3, nCand = 6)
      .as[(Long, Double)].collect()
    assert(rr.head._1 === 2L, "the exact re-rank finds the true nearest neighbor")
    // returned distances are exact L2 to the ORIGINAL vectors, not ADC terms
    val byId = corpus.as[(Long, Seq[Double])].collect().toMap
    rr.foreach { case (id, d2) =>
      val exact = byId(id).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      val r6 = BigDecimal(exact).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(d2 - r6) < 1e-9, s"id $id: $d2 vs exact $r6")
    }
    // a corpus-wide shortlist degenerates to exact search's full ranking
    val full = rr.map(_._1).toSeq
    assert(full === Seq(2L, 0L, 4L), "0.2-query: 2 (itself), then 0, then 4")
    intercept[IllegalArgumentException] {
      ProductQuant.searchRerank(codes, corpus, "vec_id", "vec", cb, q,
        m = 2, dims = dims, k = 5, nCand = 3)
    }
  }

  test("truncated rerank: corpus-wide shortlist and full-prefix stage both equal exact top-k") {
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = e.filter($"vec_id" === 0)
      .select(transform($"embedding", _.cast("double"))).as[Seq[Double]].head()
    val exact = Similarity.topK(e, "embedding", "vec_id", q, k = 10)
      .as[(Long, Double)].collect().toSeq
    // shortlist covering the whole corpus: truncation can't lose anything
    val n = e.count().toInt
    val all = Similarity.truncatedRerank(e, "embedding", "vec_id", q,
      dPrefix = 16, k = 10, nCand = n).as[(Long, Double)].collect().toSeq
    assert(all === exact, "corpus-wide shortlist must equal exact search")
    // dPrefix = full dims: stage 1 IS exact ranking, any nCand >= k works
    val full = Similarity.truncatedRerank(e, "embedding", "vec_id", q,
      dPrefix = 64, k = 10, nCand = 10).as[(Long, Double)].collect().toSeq
    assert(full === exact, "full-prefix stage 1 must equal exact search")
    // the returned scores are FULL-dim cosines even when stage 1 truncated
    val trunc = Similarity.truncatedRerank(e, "embedding", "vec_id", q,
      dPrefix = 16, k = 10, nCand = 50).as[(Long, Double)].collect().toSeq
    val exactById = exact.toMap
    trunc.filter(r => exactById.contains(r._1)).foreach { case (id, c) =>
      assert(c === exactById(id), s"id $id must carry its exact full-dim cosine")
    }
    intercept[IllegalArgumentException] {
      Similarity.truncatedRerank(e, "embedding", "vec_id", q, dPrefix = 16, k = 10, nCand = 5)
    }
    intercept[IllegalArgumentException] {
      Similarity.truncatedRerank(e, "embedding", "vec_id", q, dPrefix = 0, k = 10, nCand = 50)
    }
  }

  test("train/encode reject dims not divisible by m; search rejects a short query") {
    intercept[IllegalArgumentException] {
      ProductQuant.train(corpus, "vec", "vec_id", m = 3, k = 2, dims = dims)
    }
    // an init id past int range would wrap and collide two centroids on
    // one cid — the fused guard raises instead
    val bigIds = corpus.withColumn("vec_id", $"vec_id" + (Int.MaxValue.toLong + 5))
    val e = intercept[Exception] {
      ProductQuant.train(bigIds, "vec", "vec_id", m = 2, k = 2, dims = dims)
        .collect()
    }
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("init id outside int range"))
    val cb = ProductQuant.train(corpus, "vec", "vec_id", m = 2, k = 2, dims = dims)
    val codes = ProductQuant.encode(corpus, "vec", "vec_id", cb, m = 2, dims = dims)
    intercept[IllegalArgumentException] {
      ProductQuant.search(codes, "vec_id", cb, Seq(1.0), m = 2, dims = dims, k = 3)
    }
    // encode/search repeat train's divisibility require — a floored dsub
    // would silently truncate the vector (round-10 advice)
    intercept[IllegalArgumentException] {
      ProductQuant.encode(corpus, "vec", "vec_id", cb, m = 3, dims = dims)
    }
    intercept[IllegalArgumentException] {
      ProductQuant.search(codes, "vec_id", cb, Seq(1.0, 1.0, 1.0, 1.0),
        m = 3, dims = 4, k = 3)
    }
  }

  test("codes from the wrong codebook raise instead of null-ranking first") {
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(msg).getOrElse("")
    val cb = ProductQuant.train(corpus, "vec", "vec_id", m = 2, k = 2, dims = dims)
    // codes carrying a cid the table can't resolve: NULL adist would sort
    // FIRST ascending and silently win the top-k — must raise instead
    val badCodes = Seq((7L, Seq(99, 99))).toDF("vec_id", "codes")
    val e = intercept[Exception] {
      ProductQuant.search(badCodes, "vec_id", cb,
        Seq(0.0, 0.0, 0.0, 0.0), m = 2, dims = dims, k = 3).collect()
    }
    assert(msg(e).contains("no distance-table entry"))
    // a codebook missing a whole subspace (m mismatch vs training) hits
    // the argmin -1 sentinel guard at encode time
    val e2 = intercept[Exception] {
      ProductQuant.encode(corpus, "vec", "vec_id",
        cb.filter($"subspace" === 0), m = 2, dims = dims).collect()
    }
    assert(msg(e2).contains("no entries for subspace"))
  }
}
