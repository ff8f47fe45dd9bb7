package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._



  test("estimates are one-sided: est >= exact for every probed key, est = 0 for absent keys") {
    // 40k occurrences over 5k distinct keys in 2048 columns forces real
    // collisions — the overestimate property must hold through them
    val df = spark.range(40000).select(($"id" % 5000).as("k"))
    val sk = CountMin.cells(df, Seq(), "k")
    val watch = spark.range(200).select(($"id" * 25).as("k")) // present keys
    val est = CountMin.estimateFor(sk, Seq(), watch, "k")
      .as[(Long, Long)].collect().toMap
    val exact = df.filter($"k" % 25 === 0).groupBy("k").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (k, x) =>
      assert(est(k) >= x, s"key $k: est ${est(k)} below exact $x — CMS must never undercount")
    }
    val absent = CountMin.estimateFor(sk, Seq(),
      spark.range(5).select(($"id" + 1000000L).as("k")), "k")
      .select($"est").as[Long].collect()
    // absent keys may draw collision mass but usually floor at small
    // values; what must hold is est >= 0 and no join-miss null
    assert(absent.forall(_ >= 0L))
  }

  test("collision mass stays within the epsilon*N bound at the design load") {
    val n = 40000
    val df = spark.range(n.toLong).select(($"id" % 5000).as("k"))
    val sk = CountMin.cells(df, Seq(), "k")
    val watch = spark.range(200).select(($"id" * 25).as("k"))
    val est = CountMin.estimateFor(sk, Seq(), watch, "k")
      .as[(Long, Long)].collect().toMap
    val exact = df.filter($"k" % 25 === 0).groupBy("k").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    // Markov bound per row is eps = e/w ~ 0.0013 -> eps*N ~ 53; the min
    // over 4 independent rows is far tighter — allow the full eps*N
    val bound = math.ceil(math.E / CountMin.Width * n).toLong
    exact.foreach { case (k, x) =>
      assert(est(k) - x <= bound,
        s"key $k overcounted by ${est(k) - x}, above eps*N = $bound")
    }
  }

  test("cell grid is bounded, partition-invariant, and mergeable by cell addition") {
    val a = spark.range(3000).select(($"id" % 700).as("k"))
    val b = spark.range(2000).select((($"id" % 500) + 300).as("k"))
    val whole = CountMin.cells(a.unionAll(b), Seq(), "k")
      .as[(Int, Long, Long)].collect().toMap2
    assert(whole.size <= CountMin.Depth * CountMin.Width, "state must stay <= d*w cells")
    val repart = CountMin.cells(a.unionAll(b).repartition(11), Seq(), "k")
      .as[(Int, Long, Long)].collect().toMap2
    assert(whole === repart, "sum cells must not depend on partitioning")
    val merged = CountMin.cells(a, Seq(), "k").unionAll(CountMin.cells(b, Seq(), "k"))
      .groupBy("row", "pos").agg(sum($"cnt").as("cnt"))
      .as[(Int, Long, Long)].collect().toMap2
    assert(merged === whole, "sketch(A union B) must equal cell-sum of the two sketches")
  }

  test("q_cms_merge: merged three-batch estimates equal the one-shot grid exactly") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val out = graft.SparkEntry.queries("q_cms_merge")(spark, sf)
      .select($"user_id", $"est").as[(Long, Long)].collect().toMap
    val watch = ev.filter($"user_id" % 29 === 0).select("user_id").distinct()
    val oneShot = CountMin.estimateFor(
        CountMin.cells(ev, Seq(), "user_id"), Seq(), watch, "user_id")
      .as[(Long, Long)].collect().toMap
    assert(out === oneShot,
      "merge(cells(A), cells(B), cells(C)) must answer exactly like cells(A ∪ B ∪ C)")
    // per-batch cell mass strictly exceeds the merged nonzero-cell count
    // wherever batches share a cell — evidence the batches sketched apart
    val ev2 = graft.SparkEntry.queries("q_cms_merge")(spark, sf)
      .select($"n_batch_cells", $"n_cells").as[(Long, Long)].head()
    assert(ev2._1 > ev2._2, s"fixture must overlap batch cells: $ev2")
  }

  test("join-size estimate is one-sided and exact for collision-free key sets") {
    // 100 distinct keys in 2048 columns: collisions are possible but
    // the inner product must never undercount; with multiplicities
    // a=3, b=2 per key the true join size is 100*3*2 = 600
    val a = spark.range(300).select(($"id" % 100).as("k"))
    val b = spark.range(200).select(($"id" % 100).as("k"))
    val est = CountMin.joinSizeEstimate(
        CountMin.cells(a, Seq(), "k"), CountMin.cells(b, Seq(), "k"))
      .as[Long].head()
    assert(est >= 600L, s"join-size est $est undercounts the true 600")
    assert(est <= 700L, s"join-size est $est far above the true 600 at this load")
  }

  test("join-size estimate stays near truth under a heavy shared-key load") {
    val a = spark.range(30000).select(($"id" % 3000).as("k"))
    val b = spark.range(20000).select((($"id" % 2000) + 1000).as("k"))
    val est = CountMin.joinSizeEstimate(
        CountMin.cells(a, Seq(), "k"), CountMin.cells(b, Seq(), "k"))
      .as[Long].head()
    val exact = a.join(b, "k").count()
    assert(est >= exact, "inner product must never undercount")
    // the CM join-size guarantee is ADDITIVE: est <= exact + eps*|a|*|b|
    // with eps = e/w (expected collision mass |a|*|b|/w ~ 293k here, the
    // same order as the true size — this load is the estimator's edge)
    val additive = (math.E / CountMin.Width * 30000.0 * 20000.0).toLong
    assert(est <= exact + additive,
      s"est $est above exact $exact + additive bound $additive")
  }

  test("null key raises a named error") {
    val ex = intercept[Exception] {
      CountMin.cells(Seq[java.lang.Long](1L, null).toDF("k"), Seq(), "k").collect()
    }
    assert(ex.getMessage.contains("null key"))
  }

  test("streaming windowed cells equal the batch sketch (complete-mode parity)") {
    import graft.streaming.Events
    val stream = graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(spark.read.parquet(s"$sf/events.parquet").schema)
        .parquet(s"$sf/events.parque[t]"))
    def daily(df: org.apache.spark.sql.DataFrame) = df.select(
      date_format(date_trunc("day", Events.tsCol($"ts")), "yyyy-MM-dd").as("day"),
      $"user_id")
    val qy = CountMin.cells(daily(stream), Seq("day"), "user_id")
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_cells").start()
    qy.processAllAvailable(); qy.stop()
    val viaStream = spark.table("cms_cells")
      .as[(String, Int, Long, Long)].collect().toSet
    val viaBatch = CountMin.cells(
        daily(graft.sources.Tables.table(spark, sf, "events")), Seq("day"), "user_id")
      .as[(String, Int, Long, Long)].collect().toSet
    assert(viaStream === viaBatch, "stream and batch cell grids must be identical")
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }
}
