package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * prep. All bucketing goes through md5 of the key — reproducible across
  * engines, partition counts, and reruns (a `rand()` sample is none of
  * those), and implicitly stratified: every subpopulation is sampled at
  * the same rate because bucket assignment depends only on the key.
  * Pure projections — no shuffle, scan-speed at any corpus size.
  */
object Sampling {

  /** Stable bucket in [0, mod): first 8 md5 hex chars of the key, mod n.
    * Portable: DuckDB `CAST(concat('0x', substr(md5(...), 1, 8)) AS
    * BIGINT) % mod`. */
  def hashBucket(key: Column, mod: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint") % mod

  /** Keep ~pct% of rows, chosen by key hash — rerun-stable and join-stable
    * (the same keys are kept everywhere the same sample is taken). */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct=$pct out of range")
    df.filter(hashBucket(col(keyCol), 100) < pct)
  }

  /** train/validation/test label from the key hash (train + validation
    * ≤ 100; the remainder is test). Deterministic: a document never
    * migrates between splits across runs or engines. */
  def splitLabel(key: Column, trainPct: Int = 80, validationPct: Int = 10): Column = {
    require(trainPct + validationPct <= 100, "split percentages exceed 100")
    val b = hashBucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + validationPct, "validation")
      .otherwise("test")
  }

  /** Full 32-bit hash order key (first 8 md5 hex chars as a bigint) — the
    * ranking [[stratifiedQuota]] samples by. Uniform, rerun-stable, and
    * portable (DuckDB: `CAST(concat('0x', substr(md5(k), 1, 8)) AS
    * BIGINT)`). */
  def hashOrder(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")

  /** WEIGHTED Bernoulli sampling: keep each row with its OWN probability
    * `ppm` / 1e6 — the quality-weighted downsampling rule (CCNet-style
    * "keep high-quality docs at a higher rate") that [[sampleByHash]]'s
    * single global rate can't express. Decided per row from the key hash
    * and the row's weight: a pure map-side filter with ZERO shuffle and no
    * cross-row state, so the kept set is independent of partitioning,
    * rerun-stable, and identical on any engine that replays the md5
    * arithmetic — every probability is exact integer arithmetic in ppm,
    * never a float RNG. Null, out-of-range, or NON-INTEGRAL ppm raises
    * (fused into the predicate, so pruning can't elide the guard): a
    * silently-clamped weight would distort the training mix it exists to
    * control, and a fractional rate like 0.95 — the natural misuse of a
    * "probability" parameter — would otherwise floor to ppm 0 and keep
    * nothing. */
  def weightedBernoulli(df: DataFrame, keyCol: String, ppm: Column): DataFrame = {
    val bad = ppm.isNull || ppm < 0 || ppm > 1000000 || ppm =!= floor(ppm)
    df.filter(hashBucket(col(keyCol), 1000000) < coalesce(
      when(bad, raise_error(concat(
        lit(s"weightedBernoulli: ppm not an integer in [0,1000000] for $keyCol="),
        col(keyCol).cast("string")))),
      ppm.cast("long")))
  }

  /** Stratified quota sampling: keep the `quota` hash-first rows of each
    * stratum — how a training mix is rebalanced to a target composition
    * (lang/source/domain caps) without `rand()`'s rerun instability.
    * `quotas` carries (strataCols..., quotaCol); a stratum absent from it
    * is DROPPED (explicit mixes only — a silent pass-through would leak
    * an unlisted domain into the mix uncapped).
    *
    * Result is EXACTLY "row_number over (stratum order by hash, key) ≤
    * quota", but the plan never window-sorts a full stratum. A hot
    * stratum (one language is half the corpus) makes the naive window
    * shuffle corpus-sized; here a per-stratum HASH CUTOFF prefilters
    * candidates map-side — the hash is uniform, so cutoff 4·quota/count
    * keeps ≈4·quota rows — and only those shuffle into the ranking
    * window. The safety factor is verified, not hoped for: a second tiny
    * aggregation counts actual survivors, and any stratum whose
    * candidate pool came up short of its quota (possible only at
    * astronomical odds, but possible) falls back to ranking ALL its rows
    * — so the output is exact by construction, the prefilter only an
    * optimization. Cost: 3 map-side scans (key+strata columns only) +
    * two stratum-cardinality shuffles + a window over ≈4·Σquota rows; at
    * 100 TB that replaces the corpus-sized window exchange with pruned
    * scans. */
  def stratifiedQuota(df: DataFrame, strataCols: Seq[String], keyCol: String,
                      quotas: DataFrame, quotaCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(strataCols.nonEmpty, "stratifiedQuota needs at least one stratum column")
    val strata = strataCols.map(col)
    // duplicate quota rows would duplicate every joined corpus row — the
    // contract is one row per stratum, enforced at execution through the
    // quota column (same fused raise_error pattern as mergeDocs)
    val safeQuotas = quotas.groupBy(strata: _*)
      .agg(max(col(quotaCol)).as(quotaCol), count(lit(1)).as("__nq"))
      .withColumn(quotaCol, coalesce(
        when(col("__nq") > 1, raise_error(concat(
          lit("stratifiedQuota: >1 quota row for stratum ("),
          concat_ws(",", strata.map(_.cast("string")): _*), lit(")")))),
        col(quotaCol)))
      .drop("__nq")
    val counts = df.groupBy(strata: _*).agg(count(lit(1)).as("__cnt"))
    val full = lit(1L << 32)
    val plan = counts.join(broadcast(safeQuotas), strataCols)
      .withColumn("__cut",
        when(col(quotaCol).cast("long") * 4 >= col("__cnt"), full)
          .otherwise(ceil(full * col(quotaCol).cast("double") * 4 / col("__cnt")).cast("long")))
    val h = hashOrder(col(keyCol)).as("__h")
    val cand = df.withColumn("__h", h)
      .join(broadcast(plan), strataCols)
      .filter(col("__h") < col("__cut"))
    // exactness check on the OBSERVED candidate pool: a stratum with
    // fewer survivors than its quota re-ranks all of its rows instead
    val decided = broadcast(plan
      .join(broadcast(cand.groupBy(strata: _*).agg(count(lit(1)).as("__scnt"))), strataCols, "left")
      .withColumn("__safe", coalesce(col("__scnt"), lit(0L)) >= col(quotaCol))
      .select((strata :+ col(quotaCol) :+ col("__cut") :+ col("__safe")): _*))
    val pool = df.withColumn("__h", h)
      .join(decided, strataCols)
      .filter(!col("__safe") || col("__h") < col("__cut"))
    val w = Window.partitionBy(strata: _*).orderBy(col("__h"), col(keyCol))
    pool.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col(quotaCol))
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Cap every stratum at `n` rows (hash-first) — the per-domain
    * contribution cap a crawl pipeline applies before mixing. Same exact
    * semantics and prefiltered plan as [[stratifiedQuota]] with a
    * constant quota for every observed stratum. */
  def capPerStratum(df: DataFrame, strataCols: Seq[String], keyCol: String,
                    n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val quotas = df.select(strataCols.map(col): _*).distinct()
      .withColumn("__quota", lit(n))
    stratifiedQuota(df, strataCols, keyCol, quotas, "__quota")
  }

  /** Ids packable into a reservoir key: [0, 2^32). */
  val ReservoirMaxId: Long = (1L << 32) - 1

  /** Hash-ordered packed key for [[reservoirByGroup]]: 28 hash bits above
    * 32 id bits, always positive, so min-k over the packed BIGINT IS the
    * hash-first-k sample AND decodes back to the id without a join
    * (collision-proof by construction — the id is carried, not re-looked
    * up; same packing discipline as `Dedup.packChunkKey`). Null,
    * out-of-range, or NON-INTEGRAL ids raise through the fused guard — a
    * silently dropped id would bias the sample the operator exists to
    * keep uniform, and a fractional id (DOUBLE 5.7) would silently
    * truncate to 5 in the packed key while hashing md5("5.7") that no
    * oracle replay of the long id could match. The hash is taken over
    * the CANONICAL long cast, never the raw column, so int/long/decimal
    * encodings of the same id always hash identically. */
  def reservoirKey(idCol: Column): Column = {
    val id = idCol.cast("long")
    // id =!= idCol is the round-trip integrality check: true exactly when
    // the long cast lost information (5.7 → 5); null ids hit isNull first
    val bad = id.isNull || id < 0 || id > ReservoirMaxId || id =!= idCol
    coalesce(
      when(bad, raise_error(concat(
        lit(s"reservoirByGroup: id not an integer in [0,$ReservoirMaxId]: "),
        coalesce(idCol.cast("string"), lit("null"))))),
      shiftleft(shiftright(hashOrder(id), 4), 32).bitwiseOR(id))
  }

  /** Deterministic EPOCH SHUFFLE — the reproducible global permutation a
    * training run reads its corpus in: every document gets a (shard,
    * pos) address where `shard` partitions the corpus into `nShards`
    * equal-expectation output files and `pos` is the document's exact
    * position within its shard. The permutation is the md5 order of
    * (seed ‖ id): rerun-, partition-, and engine-stable, and a NEW seed
    * is a fresh independent permutation — epochs reshuffle by changing
    * one string, never by `rand()` (which is none of those things).
    * Every subpopulation lands uniformly across shards (hash bucketing
    * is implicitly stratified — no shard accidentally concentrates one
    * source, the training-order bias a sequential write bakes in).
    *
    * Scale shape: shard assignment is a pure map-side projection; the
    * within-shard position comes from [[graft.operators.Rank]]'s
    * two-level rank — a range exchange plus a broadcast offset table —
    * NEVER a per-shard single-reducer sort (the naive window over
    * `nShards` low-cardinality partitions funnels corpus/nShards rows
    * through one task each; at 100 TB that is the same scale-killer the
    * percentile keys replaced in round 11). Writing the result
    * partitioned by `shard`, ordered by `pos`, is the shard-writer
    * shape every data loader consumes.
    *
    * @return (idCol, shard, pos) — pos is 1-based and dense per shard */
  def epochShuffle(df: DataFrame, idCol: String, seed: String,
                   nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    require(seed.nonEmpty, "epochShuffle: empty seed")
    val h = hashOrder(concat(lit(seed), lit("|"), col(idCol).cast("string")))
    val keyed = df.select(col(idCol), (h % nShards).as("shard"), h.as("__h"))
    graft.operators.Rank.withGroupRank(keyed, Seq("shard"), "__h",
        tiebreakCols = Seq(idCol))
      .select(col(idCol), col("shard"), col("rank").as("pos"))
  }

  /** SINGLE-PASS uniform k-sample of distinct ids per group — the
    * bounded-state form of [[capPerStratum]]'s hash-first-k semantics.
    * Where the cap plans 3 pruned scans + a candidate window (exact for
    * any quota), this runs ONE scan through a min-k
    * TypedImperativeAggregate ([[graft.expressions.MinKDistinct]]): O(k)
    * sorted buffer per partial, normal map-side partial aggregation, the
    * shuffle carries ≤ k packed longs per (partition, group) however many
    * rows flow through. That mergeable max-heap state is literally a
    * reservoir — and because it is a plain aggregate it runs UNCHANGED as
    * incremental streaming state (parity spec'd in TrainingMixSpec), the
    * sampling analog of `q_hll_distinct`'s register max-agg.
    *
    * Output: (groupCols…, sample_rank (1-based hash order), idCol).
    * Deterministic, rerun/partition/engine-stable; duplicate ids within a
    * group collapse (the sample is over DISTINCT ids). */
  def reservoirByGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                       k: Int): DataFrame = {
    require(groupCols.nonEmpty, "reservoirByGroup needs at least one group column")
    require(k > 0, s"reservoir size must be positive, got $k")
    val grp = groupCols.map(col)
    df.groupBy(grp: _*)
      .agg(graft.expressions.MinKAgg.minKDistinct(reservoirKey(col(idCol)), k).as("__ks"))
      .select(grp :+ posexplode(col("__ks")).as(Seq("__pos", "__pk")): _*)
      .select(grp :+ (col("__pos") + 1).as("sample_rank")
        :+ col("__pk").bitwiseAND(lit(ReservoirMaxId)).as(idCol): _*)
  }

  /** MIXTURE-REWEIGHTING rates — the domain-mixing stage of a training
    * pipeline (Pile/Dolma-style: the corpus's natural composition is not
    * the mix you want to train on): per group, the downsampling rate
    * that moves the token mass toward a UNIFORM target share, capped at
    * 1 (downsample the overrepresented, never upsample — repetition is a
    * training decision, not a sampling one). Returns (groupCol, n_docs,
    * tokens, share = natural token share, ppm, rate = ppm/1e6).
    *
    * The rate is carried as integer PPM — `floor(1e6·total / (n_groups·
    * tokens))` — so it feeds [[weightedBernoulli]] directly and the
    * whole mix stays exact integer-threshold arithmetic end to end
    * (never a float RNG, identical on any engine that replays the md5).
    * Two bounded aggregations (one per-group, one G-row total); at
    * 100 TB this is a scan + a G-row broadcast, and applying the mix is
    * weightedBernoulli's zero-shuffle map-side filter. */
  def domainMixRates(df: DataFrame, groupCol: String, costCol: String): DataFrame = {
    // a NULL group would form its own mix row, then silently drop out of
    // the equi-join that applies the rates — the kept mass would never
    // reconcile with the report; raise instead (fused into the key, so
    // pruning can't elide the guard)
    val per = df
      .select(when(col(groupCol).isNull,
          raise_error(lit(s"domainMixRates: null $groupCol — every row needs a group")))
          .otherwise(col(groupCol)).as(groupCol),
        col(costCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(costCol)).cast("bigint").as("tokens"))
    val tot = per.agg(sum(col("tokens")).cast("bigint").as("total"),
      count(lit(1)).as("n_groups"))
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        // cast BEFORE multiplying: 1e6·total in long arithmetic overflows
        // (silently, to a negative ppm that zeroes the kept mass) once
        // total passes ~9.2e12 tokens — well inside the 100 TB scale this
        // mix targets. Both factors go through double first; the oracle
        // SQL mirrors the same expression tree so the IEEE result (and
        // the floored ppm) stays bit-identical cross-engine.
        least(lit(1000000L),
          floor(lit(1000000d) * col("total").cast("double") /
            (col("n_groups").cast("double") * col("tokens").cast("double")))
            .cast("long"))
          .as("ppm"))
      .withColumn("rate", col("ppm").cast("double") / lit(1000000))
  }

  /** TEMPERATURE-scaled mixture rates at τ = 1/2 — square-root sampling,
    * the multilingual-training standard between natural (τ=1) and
    * [[domainMixRates]]' uniform (τ→0) extremes: target share
    * qᵢ ∝ pᵢ^τ, realized downsample-only like domainMixRates, so the
    * keep rate normalizes to 1 on the SMALLEST group:
    * rᵢ = (p_min/pᵢ)^(1−τ) = √(min_tokens/tokensᵢ). Heads flatten toward
    * the tempered target, tails are never upsampled (repetition is a
    * training decision, not a sampling one).
    *
    * τ is pinned to 1/2 deliberately: √ is IEEE-correctly-rounded, so
    * the integer ppm — `floor(1e6·√(min_tokens/tokensᵢ))` — is
    * bit-identical on every engine and feeds [[weightedBernoulli]]'s
    * exact md5-threshold filter. A general-τ variant needs `pow`, whose
    * last-ulp behavior is libm-specific — a rate that drifts by one ppm
    * between engines flips individual keep decisions, which is exactly
    * what this family's exact-replay contract exists to prevent.
    * Same output shape and scale shape as [[domainMixRates]]: two
    * bounded aggregations, a G-row broadcast, then a zero-shuffle
    * map-side filter. */
  def sqrtMixRates(df: DataFrame, groupCol: String, costCol: String): DataFrame =
    temperedMixRates(df, groupCol, costCol, 1, 2)

  /** GENERAL-τ temperature mixing, τ = tauNum/tauDen with tauDen a power
    * of two (round-14 verdict item): the [[sqrtMixRates]] contract at any
    * dyadic temperature. The exponent e = 1−τ = eNum/2^m decomposes into
    * binary digits, and x^e becomes a PRODUCT of repeated-√ terms — one
    * per set bit, x^(1/2^j) = √ applied j times — multiplied in fixed
    * ascending-j (descending-exponent) order. Every factor is a chain of
    * IEEE-correctly-rounded `sqrt`s and every combining step one
    * correctly-rounded multiply, so the floored integer ppm is
    * bit-identical on any engine replaying the same expression tree —
    * the cross-engine exact-replay guarantee WITHOUT libm `pow` (whose
    * last-ulp behavior is implementation-specific; a one-ppm drift flips
    * individual keep decisions). τ=1/2 (e=1/2) reduces to one √ —
    * exactly the old sqrtMixRates. Same output shape and scale shape as
    * [[domainMixRates]]: two bounded aggregations, a G-row broadcast,
    * then weightedBernoulli's zero-shuffle map-side filter. */
  def temperedMixRates(df: DataFrame, groupCol: String, costCol: String,
                       tauNum: Int, tauDen: Int): DataFrame = {
    val per = df
      .select(when(col(groupCol).isNull,
          raise_error(lit(s"temperedMixRates: null $groupCol — every row needs a group")))
          .otherwise(col(groupCol)).as(groupCol),
        col(costCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(costCol)).cast("bigint").as("tokens"))
    val tot = per.agg(sum(col("tokens")).cast("bigint").as("total"),
      min(col("tokens")).as("min_tokens"))
    val x = col("min_tokens").cast("double") / col("tokens").cast("double")
    val powX = temperedSqrtCounts(tauNum, tauDen)
      .map(j => (1 to j).foldLeft(x)((c, _) => sqrt(c)))
      .reduce(_ * _)
    per.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        least(lit(1000000L), floor(lit(1000000L) * powX)).as("ppm"))
      .withColumn("rate", col("ppm").cast("double") / lit(1000000))
  }

  /** A WHOLE τ-GRID from ONE corpus scan (round-15 verdict item — the
    * fusion of N [[temperedMixRates]]+[[weightedBernoulli]] legs): the
    * per-group (n_docs, tokens) aggregate and the (total, min) frame are
    * computed once, every τ's ppm derives as one more column of the same
    * G-row frame, and the realized kept mass for ALL temperatures comes
    * from a single doc-side pass — the row hash is computed once and
    * compared against each τ's ppm as conditional sums in one
    * aggregation. Per-row keep decisions are bit-identical to running
    * weightedBernoulli under each τ separately (same md5 threshold, same
    * floored ppm), so the kept sets stay nested as τ rises; the plan
    * drops from ~10 exchanges per temperature to ~4 TOTAL (per-group
    * agg, totals agg, kept agg, plus G-row broadcasts) — the pattern any
    * τ sweep over a 100 TB corpus needs, where corpus scans are the cost
    * and G-row frames are free. Output: one row per (τ, group) with the
    * exact [[temperedMixRates]] columns plus tau_num/tau_den. */
  def temperedMixGrid(df: DataFrame, groupCol: String, costCol: String,
                      keyCol: String, taus: Seq[(Int, Int)]): DataFrame = {
    require(taus.nonEmpty && taus.distinct == taus,
      s"temperedMixGrid: taus must be non-empty and distinct, got $taus")
    val per = df
      .select(when(col(groupCol).isNull,
          raise_error(lit(s"temperedMixGrid: null $groupCol — every row needs a group")))
          .otherwise(col(groupCol)).as(groupCol),
        col(costCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(costCol)).cast("bigint").as("tokens"))
    val tot = per.agg(sum(col("tokens")).cast("bigint").as("total"),
      min(col("tokens")).as("min_tokens"))
    val x = col("min_tokens").cast("double") / col("tokens").cast("double")
    def ppmCol(tauNum: Int, tauDen: Int) = {
      val powX = temperedSqrtCounts(tauNum, tauDen)
        .map(j => (1 to j).foldLeft(x)((c, _) => sqrt(c)))
        .reduce(_ * _)
      least(lit(1000000L), floor(lit(1000000L) * powX))
    }
    def p(tauNum: Int, tauDen: Int) = s"ppm_${tauNum}_$tauDen"
    val wide = per.crossJoin(broadcast(tot))
      .select(Seq(col(groupCol), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("total").cast("double"), 6)
          .as("share")) ++
        taus.map { case (n, dn) => ppmCol(n, dn).as(p(n, dn)) }: _*)
    // one doc-side pass: hash once, compare against every τ's ppm
    val h = hashBucket(col(keyCol), 1000000)
    val keptAggs = taus.flatMap { case (n, dn) =>
      Seq(sum(when(h < col(p(n, dn)), 1L).otherwise(0L)).as(s"n_kept_${n}_$dn"),
        sum(when(h < col(p(n, dn)), col(costCol)).otherwise(0L))
          .cast("bigint").as(s"kept_tokens_${n}_$dn"))
    }
    val kept = df
      .join(broadcast(wide.select(col(groupCol) +: taus.map(t => col(p(t._1, t._2))): _*)),
        Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(keptAggs.head, keptAggs.tail: _*)
    val joined = wide.join(kept, Seq(groupCol), "left")
    // ONE plan tree, per-τ rows via explode — a union of per-τ
    // projections would let column pruning specialize each leg's copy of
    // the shared subtree (different agg columns per leg → no exchange
    // reuse) and the whole fusion would silently evaporate at execution;
    // exploding G·|taus| structs keeps every aggregate in the plan once
    joined
      .select(col(groupCol), col("n_docs"), col("tokens"), col("share"),
        explode(array(taus.map { case (n, dn) =>
          struct(lit(n).as("tau_num"), lit(dn).as("tau_den"),
            col(p(n, dn)).as("ppm"),
            coalesce(col(s"n_kept_${n}_$dn"), lit(0L)).as("n_kept"),
            coalesce(col(s"kept_tokens_${n}_$dn"), lit(0L)).as("kept_tokens"))
        }: _*)).as("t"))
      .select(col("t.tau_num"), col("t.tau_den"), col(groupCol),
        col("n_docs"), col("tokens"), col("share"),
        (col("t.ppm").cast("double") / lit(1000000)).as("rate"),
        col("t.ppm").as("ppm"), col("t.n_kept").as("n_kept"),
        col("t.kept_tokens").as("kept_tokens"))
  }

  /** The √-chain lengths realizing x^(1−τ) for τ = tauNum/tauDen: one
    * entry per set bit of the exponent's numerator, ascending (each `j`
    * means √ applied j times; factors multiply left-to-right in this
    * order). ONE source of truth for the Spark expression and the DuckDB
    * oracle generator — the two can't drift. */
  def temperedSqrtCounts(tauNum: Int, tauDen: Int): Seq[Int] = {
    require(tauDen >= 2 && (tauDen & (tauDen - 1)) == 0,
      s"tauDen must be a power of two, got $tauDen")
    require(tauNum > 0 && tauNum < tauDen,
      s"τ must lie strictly inside (0, 1), got $tauNum/$tauDen")
    val eNum = tauDen - tauNum
    val m = Integer.numberOfTrailingZeros(tauDen)
    (0 until m).filter(b => (eNum & (1 << b)) != 0).map(b => m - b).sorted
  }
}
