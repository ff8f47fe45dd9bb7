package graft

import org.apache.spark.sql.functions._
import graft.operators.Kmv
import graft.expressions.MinKAgg

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("MinKDistinct returns the k smallest distinct values, ascending, partition-invariant") {
    val vals = Seq(5L, 3L, 9L, 3L, 1L, 7L, 5L, 2L, 8L, 1L)
    val expected = vals.distinct.sorted.take(4)
    def got(parts: Int) = vals.toDF("v").repartition(parts)
      .agg(MinKAgg.minKDistinct($"v", 4).as("m"))
      .as[Seq[Long]].head()
    assert(got(1) === expected)
    assert(got(7) === expected, "bounded merge must be partition-invariant")
  }

  test("MinKDistinct below k returns the full distinct set; empty input returns empty array") {
    val m = Seq(4L, 4L, 2L).toDF("v")
      .agg(MinKAgg.minKDistinct($"v", 10).as("m")).as[Seq[Long]].head()
    assert(m === Seq(2L, 4L))
    val e = Seq.empty[Long].toDF("v")
      .agg(MinKAgg.minKDistinct($"v", 10).as("m")).as[Seq[Long]].head()
    assert(e === Seq.empty[Long])
  }

  test("min-k aggregation runs as a partial ObjectHashAggregate, not a single-reducer sort") {
    val plan = spark.range(10000).select(($"id" % 32).as("g"), $"id".as("v"))
      .groupBy("g").agg(MinKAgg.minKDistinct($"v", 16))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object-hash partial aggregation:\n$plan")
    assert(!plan.contains("Window"), "no rank-window fallback allowed")
  }

  test("sketch(A union B) equals mergeMins(sketch A, sketch B)") {
    val a = spark.range(2000).select(($"id" * 3).as("k"))
    val b = spark.range(2000).select(($"id" * 5 + 1).as("k"))
    val whole = Kmv.sketch(a.unionAll(b), Seq(), "k").as[Seq[Long]].head()
    val merged = Kmv.sketch(a, Seq(), "k").select($"mins".as("ma"))
      .crossJoin(Kmv.sketch(b, Seq(), "k").select($"mins".as("mb")))
      .select(Kmv.mergeMins($"ma", $"mb")).as[Seq[Long]].head()
    assert(merged === whole, "KMV union must equal the sketch of the unioned sources")
  }

  test("q_kmv_merge: three-batch merge answers exactly like the one-shot sketch") {
    val out = graft.SparkEntry.queries("q_kmv_merge")(spark, sf)
      .select($"est_merged", $"est_oneshot", $"merge_equals_oneshot",
        $"n_batch_mins", $"n_merged")
      .as[(Double, Double, Boolean, Long, Long)].head()
    assert(out._3, "merged min-k array must BE the one-shot sketch array")
    assert(out._1 === out._2, "so the estimates are identical by construction")
    assert(out._4 >= out._5,
      "summed per-batch sketch sizes can never undercount the merged sketch")
  }

  test("estimate is exact below K and within 4x RSE at 50k distinct keys") {
    val small = spark.range(100).select($"id".as("k"))
    val exactEst = Kmv.sketch(small, Seq(), "k")
      .select(Kmv.estimate($"mins")).as[Double].head()
    assert(exactEst === 100.0, "below K the sketch IS the distinct set")
    val big = spark.range(150000).select(($"id" % 50000).as("k"))
    val est = Kmv.sketch(big, Seq(), "k")
      .select(Kmv.estimate($"mins")).as[Double].head()
    // RSE ~= 1/sqrt(k-2) ~= 6.3%; 4 sigma = 25%
    assert(math.abs(est - 50000.0) / 50000.0 < 0.25, s"estimate $est outside 4x RSE")
  }

  test("jaccard tracks the true overlap of two half-overlapping sets") {
    // A = [0, 40k), B = [20k, 60k): true J = 20k/60k = 1/3
    val a = spark.range(40000).select($"id".as("k"))
    val b = spark.range(20000, 60000).select($"id".as("k"))
    val j = Kmv.sketch(a, Seq(), "k").select($"mins".as("ma"))
      .crossJoin(Kmv.sketch(b, Seq(), "k").select($"mins".as("mb")))
      .select(Kmv.jaccard($"ma", $"mb")).as[Double].head()
    // binomial σ = sqrt(J(1-J)/k) ≈ 0.029; allow 4σ
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard $j far from 1/3")
  }

  test("null key raises a named error") {
    val ex = intercept[Exception] {
      Kmv.sketch(Seq[java.lang.Long](1L, null).toDF("k"), Seq(), "k").collect()
    }
    assert(ex.getMessage.contains("null key"))
  }
}
