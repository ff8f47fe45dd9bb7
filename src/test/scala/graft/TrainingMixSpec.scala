package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.etl.{Sampling, Selection}

/** Training-mix construction operators: stratified quota sampling (hash
  * prefilter must be row-identical to the naive per-stratum window) and
  * global token-budget selection (histogram thresholding must be
  * row-identical to the naive global cumsum). */
class TrainingMixSpec extends SparkSpec {
  import spark.implicits._

  private def naiveQuota(df: DataFrame, strata: String, key: String,
                         quotas: DataFrame, quotaCol: String): DataFrame = {
    val w = Window.partitionBy(col(strata))
      .orderBy(Sampling.hashOrder(col(key)), col(key))
    df.join(quotas, Seq(strata))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col(quotaCol))
      .select(df.columns.map(col): _*)
  }

  private def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq

  test("stratifiedQuota matches the naive window across quota regimes") {
    val docs = (0 until 400).map(i => (i.toLong, s"s${i % 5}")).toDF("id", "st")
    // quotas spanning: prefilter active (4q < n), full-keep (q >= n),
    // over-ask (q > n), and a stratum with no quota row (dropped)
    val quotas = Seq(("s0", 10), ("s1", 80), ("s2", 200), ("s3", 1))
      .toDF("st", "q")
    val fast = Sampling.stratifiedQuota(docs, Seq("st"), "id", quotas, "q")
    assert(rows(fast) === rows(naiveQuota(docs, "st", "id", quotas, "q")))
    assert(fast.filter($"st" === "s4").isEmpty, "unlisted stratum is dropped")
    assert(fast.filter($"st" === "s3").count() === 1)
    assert(fast.filter($"st" === "s2").count() === 80, "over-ask keeps the whole stratum")
  }

  test("stratifiedQuota survivor fallback: a hash-skewed stratum stays exact") {
    // adversarial stratum: keep only the hash-LAST 20 of 2000 candidate
    // keys, so the 4x-quota cutoff finds (almost) no survivors and the
    // observed-count fallback must re-rank the whole stratum
    val cand = (0 until 2000).map(_.toLong).toDF("id")
      .withColumn("h", Sampling.hashOrder($"id"))
    val topIds = cand.orderBy($"h".desc).limit(20).select("id").as[Long].collect().toSeq
    val docs = topIds.map((_, "hot")).toDF("id", "st")
    val quotas = Seq(("hot", 3)).toDF("st", "q")
    val fast = Sampling.stratifiedQuota(docs, Seq("st"), "id", quotas, "q")
    assert(rows(fast) === rows(naiveQuota(docs, "st", "id", quotas, "q")))
    assert(fast.count() === 3)
  }

  test("duplicate quota rows for one stratum raise instead of duplicating docs") {
    val docs = (0 until 50).map(i => (i.toLong, "s0")).toDF("id", "st")
    val dupQuotas = Seq(("s0", 5), ("s0", 9)).toDF("st", "q")
    val ex = intercept[Exception] {
      Sampling.stratifiedQuota(docs, Seq("st"), "id", dupQuotas, "q").collect()
    }
    assert(ex.getMessage.contains(">1 quota row") ||
      Option(ex.getCause).exists(_.getMessage.contains(">1 quota row")))
  }

  test("capPerStratum is stratifiedQuota with a constant quota, partition-invariant") {
    val docs = (0 until 300).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "st")
    val capped = Sampling.capPerStratum(docs, Seq("st"), "id", n = 7)
    assert(capped.groupBy("st").count().as[(String, Long)].collect().toMap
      === Map("s0" -> 7L, "s1" -> 7L, "s2" -> 7L))
    assert(rows(capped) === rows(Sampling.capPerStratum(docs.repartition(13), Seq("st"), "id", n = 7)))
  }

  private def naiveBudget(df: DataFrame, budget: Long): DataFrame = {
    val w = Window.orderBy($"score".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__bef", sum($"tk").over(w) - $"tk")
      .filter($"__bef" < budget).drop("__bef")
  }

  test("tokenBudgetSelect matches the naive global cumsum") {
    val docs = (0 until 500).map { i =>
      (i.toLong, 10L + i % 37, math.rint((i * 37 % 101) / 101.0 * 1e6) / 1e6)
    }.toDF("id", "tk", "score")
    for (budget <- Seq(1L, 500L, 4000L, 1000000L)) {
      val fast = Selection.tokenBudgetSelect(docs, "tk", "score", "id", budget)
      assert(rows(fast) === rows(naiveBudget(docs, budget)), s"budget=$budget")
    }
  }

  test("tokenBudgetSelect stays exact when every score collides into one bucket") {
    // degenerate corpus: identical scores force everything through the
    // straddle-bucket window; id tiebreak decides the boundary
    val docs = (0 until 100).map(i => (i.toLong, 10L, 0.5)).toDF("id", "tk", "score")
    val got = Selection.tokenBudgetSelect(docs, "tk", "score", "id", budget = 255)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === (0L until 26L), "26 docs start inside the 255-token budget")
  }

  test("tokenBudgetSelect one-bucket degenerate case is partition-invariant") {
    // every score identical -> everything routes through the two-level
    // straddle path; the kept set must not depend on input layout (range
    // boundaries move, the computed offsets follow)
    val docs = (0 until 1000).map(i => (i.toLong, 7L, 0.5)).toDF("id", "tk", "score")
    def sel(d: DataFrame) =
      Selection.tokenBudgetSelect(d, "tk", "score", "id", budget = 700)
        .select("id").as[Long].collect().sorted.toSeq
    val got = sel(docs)
    assert(got === (0L until 100L), "100 docs of 7 tokens start inside 700")
    assert(got === sel(docs.repartition(13)))
  }

  test("tokenBudgetSelect straddle cumsum runs partitioned, never single-reducer") {
    // one-bucket degenerate corpus: ALL rows route through the straddle
    // path, so its window is the one that must not be a global sort
    val docs = (0 until 1000).map(i => (i.toLong, 7L, 0.5)).toDF("id", "tk", "score")
    val out = Selection.tokenBudgetSelect(docs, "tk", "score", "id", budget = 700)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the range-partitioned straddle frame is materialized ONCE
    // (localCheckpoint — its RangePartitioning exchange runs in that job),
    // so the final plan reads it back as an RDD scan; both the offset
    // aggregate and the window below must consume that single scan, never
    // re-derive the exchange (independent boundary samples = wrong offsets)
    assert(plan.contains("ExistingRDD"),
      "straddle rows must be read from the one materialized partitioning")
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      "no second range exchange may survive into the consuming plan")
    // every Window that sorts (score, id) must partition by __pid — the
    // per-doc cumsum is per-range-partition, not one reducer
    val winLines = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition(") && l.contains("score")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("__pid")),
      s"score-ordered window without __pid partitioning:\n${winLines.mkString("\n")}")
  }

  test("weightedBernoulli keep rate tracks per-row ppm; set is partition-invariant") {
    val docs = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) 50000L else 950000L))
      .toDF("id", "ppm")
    def kept(d: DataFrame) =
      Sampling.weightedBernoulli(d, "id", col("ppm")).select("id").as[Long].collect().toSet
    val k = kept(docs)
    val lowRate = k.count(_ % 2 == 0) / 2000.0
    val highRate = k.count(_ % 2 == 1) / 2000.0
    assert(lowRate > 0.02 && lowRate < 0.09, s"ppm=50000 rows kept at $lowRate, want ~0.05")
    assert(highRate > 0.91 && highRate < 0.98, s"ppm=950000 rows kept at $highRate, want ~0.95")
    assert(k === kept(docs.repartition(13)), "kept set must not depend on partitioning")
    // ppm=0 keeps nothing, ppm=1e6 keeps everything
    assert(kept(docs.withColumn("ppm", lit(0L))).isEmpty)
    assert(kept(docs.withColumn("ppm", lit(1000000L))).size === 4000)
  }

  test("weightedBernoulli raises on null or out-of-range ppm") {
    val bad = Seq((1L, Some(500000L)), (2L, Option.empty[Long])).toDF("id", "ppm")
    val e = intercept[Exception] {
      Sampling.weightedBernoulli(bad, "id", col("ppm")).collect()
    }
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(msg).getOrElse("")
    assert(msg(e).contains("weightedBernoulli"))
    val over = Seq((1L, 1000001L)).toDF("id", "ppm")
    val e2 = intercept[Exception] {
      Sampling.weightedBernoulli(over, "id", col("ppm")).collect()
    }
    assert(msg(e2).contains("weightedBernoulli"))
    // a fractional rate (the natural misuse of a "probability" param)
    // must raise, not floor to ppm 0 and keep nothing
    val frac = Seq((1L, 0.95)).toDF("id", "ppm")
    val e3 = intercept[Exception] {
      Sampling.weightedBernoulli(frac, "id", col("ppm")).collect()
    }
    assert(msg(e3).contains("weightedBernoulli"))
  }

  test("tokenBudgetSelect raises on a null or out-of-range score") {
    val nullScore = Seq((1L, 10L, Some(0.5)), (2L, 10L, Option.empty[Double]))
      .toDF("id", "tk", "score")
    val e1 = intercept[Exception] {
      Selection.tokenBudgetSelect(nullScore, "tk", "score", "id", budget = 100).collect()
    }
    assert(e1.getMessage.contains("outside [0,1]") ||
      Option(e1.getCause).exists(_.getMessage.contains("outside [0,1]")))
    val big = Seq((1L, 10L, 1.5)).toDF("id", "tk", "score")
    val e2 = intercept[Exception] {
      Selection.tokenBudgetSelect(big, "tk", "score", "id", budget = 100).collect()
    }
    assert(e2.getMessage.contains("outside [0,1]") ||
      Option(e2.getCause).exists(_.getMessage.contains("outside [0,1]")))
  }

  test("tokenBudgetSelect raises on a null or nonpositive token count") {
    val zeroTok = Seq((1L, 0L, 0.5)).toDF("id", "tk", "score")
    val e = intercept[Exception] {
      Selection.tokenBudgetSelect(zeroTok, "tk", "score", "id", budget = 100).collect()
    }
    assert(e.getMessage.contains("nonpositive") ||
      Option(e.getCause).exists(_.getMessage.contains("nonpositive")))
  }

  test("budget selection keeps the single best doc even under a tiny budget") {
    val docs = Seq((1L, 100L, 0.9), (2L, 100L, 0.8)).toDF("id", "tk", "score")
    val got = Selection.tokenBudgetSelect(docs, "tk", "score", "id", budget = 5)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L), "the first doc always starts at offset 0")
  }

  // --- single-pass bounded-state reservoir ------------------------------

  private def naiveReservoir(df: DataFrame, grp: String, id: String,
                             k: Int): DataFrame = {
    val w = Window.partitionBy(col(grp)).orderBy(Sampling.reservoirKey(col(id)))
    df.select(col(grp), col(id)).distinct()
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .select(col(grp), col("sample_rank"), col(id))
  }

  test("reservoirByGroup matches the naive hash-rank window, dups collapsed") {
    // events repeat user_ids within a type — the sample must be over
    // DISTINCT ids, exactly the naive window over the distinct pairs
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"user_id")
    val got = Sampling.reservoirByGroup(ev, Seq("event_type"), "user_id", 16)
    assert(rows(got) === rows(naiveReservoir(ev, "event_type", "user_id", 16)))
  }

  test("reservoir sample is partition-invariant") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"user_id")
    def sample(d: DataFrame) =
      rows(Sampling.reservoirByGroup(d, Seq("event_type"), "user_id", 8))
    assert(sample(ev.repartition(1)) === sample(ev.repartition(7)))
  }

  test("reservoir raises on null or out-of-range ids") {
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    for (bad <- Seq(Some(-1L), Some(1L << 32), None)) {
      val df = Seq(("a", Some(1L)), ("a", bad)).toDF("g", "id")
      val e = intercept[Exception] {
        Sampling.reservoirByGroup(df, Seq("g"), "id", 4).collect()
      }
      assert(msg(e).contains("reservoirByGroup"), s"for id=$bad got: ${msg(e)}")
    }
  }

  test("epochShuffle equals the naive per-shard rank window and is partition-invariant") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    def run(parts: Int) =
      Sampling.epochShuffle(docs.repartition(parts), "doc_id", "epoch-1", 8)
        .select(col("doc_id"), col("shard").cast("long"), col("pos").cast("long"))
        .as[(Long, Long, Long)].collect().toSet
    val got = run(1)
    assert(got === run(7), "the permutation must not depend on partitioning")
    // reference: the naive window over the same keys
    import org.apache.spark.sql.expressions.Window
    val h = Sampling.hashOrder(concat(lit("epoch-1"), lit("|"), col("doc_id").cast("string")))
    val naive = docs.select(col("doc_id"), (h % 8).as("shard"), h.as("hv"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("hv"), col("doc_id"))))
      .select(col("doc_id"), col("shard").cast("long"), col("pos").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === naive, "two-level rank must be row-identical to the naive window")
  }

  test("epochShuffle: a new seed is an independent permutation; positions are dense") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    def perm(seed: String) =
      Sampling.epochShuffle(docs, "doc_id", seed, 4)
        .select(col("doc_id"), col("shard").cast("long"), col("pos").cast("long"))
        .as[(Long, Long, Long)].collect()
    val e1 = perm("epoch-1"); val e1b = perm("epoch-1"); val e2 = perm("epoch-2")
    assert(e1.toSet === e1b.toSet, "same seed, same permutation")
    assert(e1.toSet !== e2.toSet, "a new seed must reshuffle")
    // every shard's positions are exactly 1..n_shard (dense, no holes)
    e1.groupBy(_._2).foreach { case (s0, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"shard $s0 positions must be dense 1..n")
    }
    // the permutation covers every doc exactly once
    assert(e1.map(_._1).distinct.length === e1.length)
  }

  test("reservoir raises on non-integral ids instead of silently truncating") {
    // a DOUBLE id like 5.7 would truncate to 5 in the packed key while
    // hashing md5("5.7") no oracle replay of the long id could match —
    // the round-trip check (cast-to-long ≠ original) raises instead
    def msg(t: Throwable): String =
      Option(t.getMessage).getOrElse("") +
        Option(t.getCause).map(msg).getOrElse("")
    val df = Seq(("a", 1.0), ("a", 5.7)).toDF("g", "id")
    val e = intercept[Exception] {
      Sampling.reservoirByGroup(df, Seq("g"), "id", 4).collect()
    }
    assert(msg(e).contains("reservoirByGroup"), s"got: ${msg(e)}")
    // integral doubles pass: 1.0 and 2.0 hash exactly like longs 1 and 2
    val okD = Sampling.reservoirByGroup(
      Seq(("a", 1.0), ("a", 2.0)).toDF("g", "id"), Seq("g"), "id", 4)
      .select(col("id").cast("long")).as[Long].collect().toSet
    val okL = Sampling.reservoirByGroup(
      Seq(("a", 1L), ("a", 2L)).toDF("g", "id"), Seq("g"), "id", 4)
      .select(col("id")).as[Long].collect().toSet
    assert(okD === okL, "integral double ids must sample exactly like longs")
  }

  test("reservoir min-k state runs unchanged as streaming state (complete-mode parity)") {
    // the O(k) sorted buffer is a plain mergeable aggregate — the same
    // expression is incremental streaming state (the sampling analog of
    // the HLL register max-agg); final state must equal the batch build
    import graft.expressions.MinKAgg
    val batch = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"user_id")
    def minK(df: DataFrame) = df.groupBy($"event_type")
      .agg(MinKAgg.minKDistinct(Sampling.reservoirKey($"user_id"), 16).as("ks"))
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$sf/events.parquet").schema)
      .parquet(s"$sf/events.parque[t]")
      .select($"event_type", $"user_id")
    val qy = minK(stream)
      .writeStream.outputMode("complete").format("memory")
      .queryName("reservoir_state").start()
    qy.processAllAvailable(); qy.stop()
    val viaStream = spark.table("reservoir_state")
      .as[(String, Seq[Long])].collect().toMap
    val viaBatch = minK(batch).as[(String, Seq[Long])].collect().toMap
    assert(viaStream === viaBatch, "stream and batch reservoirs must be identical")
  }

  test("domainMixRates: uniform target, cap at 1, hand-checked ppm arithmetic") {
    // three sources with token mass 600/300/100 → total 1000, target 333.3
    val docs = (
      (0 until 6).map(i => (i.toLong, "big", 100)) ++
      (0 until 3).map(i => (100L + i, "mid", 100)) ++
      Seq((200L, "small", 100))).toDF("doc_id", "source", "tk")
    val out = Sampling.domainMixRates(docs, "source", "tk")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    // big: floor(1e6*1000/(3*600)) = floor(555555.55) = 555555
    assert(out("big") === ((6L, 600L, 0.6, 555555L, 0.555555)))
    // mid: floor(1e6*1000/(3*300)) = 1111111 → capped at 1e6 (never upsample)
    assert(out("mid") === ((3L, 300L, 0.3, 1000000L, 1.0)))
    assert(out("small") === ((1L, 100L, 0.1, 1000000L, 1.0)))
    // rates feed weightedBernoulli directly: kept mass moves TOWARD the
    // target — the overrepresented source sheds tokens, capped keep all
    val withPpm = docs.join(
      Sampling.domainMixRates(docs, "source", "tk").select("source", "ppm"), Seq("source"))
    val kept = Sampling.weightedBernoulli(withPpm, "doc_id", col("ppm"))
    assert(kept.filter(col("source") =!= "big").count() === 4L,
      "ppm=1e6 sources keep every doc")
    assert(kept.filter(col("source") === "big").count() <= 6L)
  }

  test("sqrtMixRates: τ=1/2 tempering — smallest group at 1.0, heads flattened not erased") {
    // token mass 1600/400/100: sqrt tempering keeps √(100/1600)=1/4 of
    // the head and √(100/400)=1/2 of the middle — flatter than natural,
    // gentler than domainMixRates' uniform push
    val docs = (
      (0 until 16).map(i => (i.toLong, "big", 100)) ++
      (0 until 4).map(i => (100L + i, "mid", 100)) ++
      Seq((200L, "small", 100))).toDF("doc_id", "source", "tk")
    val out = Sampling.sqrtMixRates(docs, "source", "tk")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out("big") === ((16L, 1600L, 0.761905, 250000L, 0.25)))
    assert(out("mid") === ((4L, 400L, 0.190476, 500000L, 0.5)))
    assert(out("small") === ((1L, 100L, 0.047619, 1000000L, 1.0)))
    // the tempered target REALIZES EXACTLY (no cap distortion, unlike
    // domainMixRates' uniform push where capped groups bend the realized
    // mix): expected kept mass rate·tokens = 400:200:100 ∝ √tokens
    val keptMass = out.map { case (s, (_, tk, _, _, rate)) => s -> rate * tk }
    assert(keptMass === Map("big" -> 400.0, "mid" -> 200.0, "small" -> 100.0))
  }

  test("temperedSqrtCounts: dyadic decomposition, one source of truth") {
    // τ=1/4 → e=3/4 = 1/2 + 1/4 → √x · √√x; τ=1/2 → e=1/2 → √x;
    // τ=3/4 → e=1/4 → √√x
    assert(Sampling.temperedSqrtCounts(1, 4) === Seq(1, 2))
    assert(Sampling.temperedSqrtCounts(2, 4) === Seq(1))
    assert(Sampling.temperedSqrtCounts(1, 2) === Seq(1))
    assert(Sampling.temperedSqrtCounts(3, 4) === Seq(2))
    assert(Sampling.temperedSqrtCounts(3, 8) === Seq(1, 3)) // e=5/8=1/2+1/8
    intercept[IllegalArgumentException](Sampling.temperedSqrtCounts(1, 3))
    intercept[IllegalArgumentException](Sampling.temperedSqrtCounts(0, 4))
    intercept[IllegalArgumentException](Sampling.temperedSqrtCounts(4, 4))
  }

  test("temperedMixRates: τ=1/4 and τ=3/4 hand-checked on powers of 16") {
    // token mass 1600/100: x = 1/16, so x^(3/4) = 1/8 and x^(1/4) = 1/2
    // exactly (every intermediate an exact power of two)
    val docs = (
      (0 until 16).map(i => (i.toLong, "big", 100)) ++
      Seq((200L, "small", 100))).toDF("doc_id", "source", "tk")
    def ppm(n: Int, d: Int) = Sampling.temperedMixRates(docs, "source", "tk", n, d)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(ppm(1, 4) === Map("big" -> 125000L, "small" -> 1000000L)) // e=3/4
    assert(ppm(2, 4) === Map("big" -> 250000L, "small" -> 1000000L)) // e=1/2
    assert(ppm(3, 4) === Map("big" -> 500000L, "small" -> 1000000L)) // e=1/4
  }

  test("ta_mix_temperature_grid: ppm monotone in τ, kept sets nested, τ=1/2 row = ta_mix_temperature") {
    val grid = SparkEntry.queries("ta_mix_temperature_grid")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(2)) ->
        (r.getLong(7), r.getLong(8), r.getLong(9))).toMap // (ppm, n_kept, kept_tokens)
    val sources = grid.keys.map(_._2).toSet
    sources.foreach { src =>
      val Seq(p14, p12, p34) = Seq(1, 2, 3).map(n => grid((n, src))._1)
      assert(p14 <= p12 && p12 <= p34,
        s"$src: higher τ must downsample LESS (closer to natural): $p14, $p12, $p34")
      // the shared md5 threshold makes kept sets nested, so counts are
      // monotone too — not just rates
      val Seq(k14, k12, k34) = Seq(1, 2, 3).map(n => grid((n, src))._2)
      assert(k14 <= k12 && k12 <= k34, s"$src: kept counts must nest with τ")
    }
    // the grid's middle temperature IS the τ=1/2 key, row for row
    val half = SparkEntry.queries("ta_mix_temperature")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    sources.foreach { src =>
      assert(grid((2, src)) === half(src),
        s"$src: grid τ=2/4 must equal the pinned τ=1/2 key")
    }
  }

  test("temperedMixGrid (fused) equals the per-τ rates+bernoulli legs row-for-row") {
    // round-15: the grid key now runs the one-scan fusion; this pins it
    // to the naive composition it replaced — same ppm arithmetic, same
    // md5 keep decisions, same output rows, across ALL temperatures
    val doc = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", size(split($"text", " ")).as("tk"))
    val taus = Seq((1, 4), (2, 4), (3, 4))
    val fused = Sampling.temperedMixGrid(doc, "source", "tk", "doc_id", taus)
    val naive = taus.map { case (n, dn) =>
      val mix = Sampling.temperedMixRates(doc, "source", "tk", n, dn)
      val kept = Sampling.weightedBernoulli(
          doc.join(broadcast(mix.select($"source", $"ppm")), Seq("source")),
          "doc_id", $"ppm")
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), sum($"tk").cast("bigint").as("kept_tokens"))
      mix.join(kept, Seq("source"), "left")
        .select(lit(n).as("tau_num"), lit(dn).as("tau_den"), $"source",
          $"n_docs", $"tokens", $"share", $"rate", $"ppm",
          coalesce($"n_kept", lit(0L)).as("n_kept"),
          coalesce($"kept_tokens", lit(0L)).as("kept_tokens"))
    }.reduce(_ unionAll _)
    assert(rows(fused) === rows(naive))
    // and the fusion is structurally real AT EXECUTION: count the
    // distinct shuffle stages the adaptive plan actually ran (rendered
    // tree paths duplicate shared subtrees; stage IDs don't lie). The
    // fused grid's doc-side kept aggregation happens once — strictly
    // fewer distinct shuffles than the three-leg composition, whose
    // per-τ kept aggregates cannot reuse each other's exchanges.
    def shuffles(df: DataFrame): Int =
      "ShuffleQueryStage (\\d+)".r
        .findAllMatchIn(df.queryExecution.executedPlan.toString)
        .map(_.group(1)).toSeq.distinct.size
    assert(shuffles(naive) > 0, "probe: adaptive plan must expose shuffle stages\n" +
      naive.queryExecution.executedPlan.toString.take(400))
    assert(shuffles(fused) < shuffles(naive),
      s"fused grid must run fewer shuffles: ${shuffles(fused)} vs ${shuffles(naive)}")
    assert(Sampling.temperedMixGrid(doc, "source", "tk", "doc_id", Seq((2, 4)))
      .count() > 0)
    intercept[IllegalArgumentException] {
      Sampling.temperedMixGrid(doc, "source", "tk", "doc_id", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperedMixGrid(doc, "source", "tk", "doc_id", Seq((1, 4), (1, 4)))
    }
  }

  test("sqrtMixRates: null group raises, like domainMixRates") {
    val docs = Seq((1L, "a", 10), (2L, null.asInstanceOf[String], 10))
      .toDF("doc_id", "source", "tk")
    val e = intercept[Exception] {
      Sampling.sqrtMixRates(docs, "source", "tk").collect()
    }
    assert(e.getMessage.contains("null source"))
  }

  test("domainMixRates: null group raises — a null-keyed mix row would never reconcile") {
    val docs = Seq((1L, "a", 10), (2L, null.asInstanceOf[String], 10))
      .toDF("doc_id", "source", "tk")
    val e = intercept[Exception] {
      Sampling.domainMixRates(docs, "source", "tk").collect()
    }
    assert(e.getMessage.contains("null source"))
  }
}
