package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog — the distributed distinct-count sketch,
  * built so the WHOLE sketch replays exactly in SQL. Spark's own
  * `approx_count_distinct` is a black-box HLL++ whose registers no other
  * engine can reproduce (which is why `q_approx_distinct` is the
  * inventory's one rows-only query); this one derives every register
  * from md5 integer arithmetic and keeps the harmonic sum in INTEGER
  * space, so registers, fingerprint, and estimate are all hash-exact
  * cross-engine — an oracle-checkable sketch.
  *
  * Construction (Flajolet et al. HLL, m = 2^10 registers):
  *  - 60-bit hash = first 15 md5 hex chars; top 10 bits pick the
  *    register, low 50 bits carry the rank field;
  *  - rank = leading-zeros-of-rank-field + 1 via `length(bin(x))` (both
  *    engines print minimal binary), all-zero field capped at 51;
  *  - registers: ONE map-side-combined `max` aggregation — the shuffle
  *    carries ≤ m rows per group whatever the corpus size, and register
  *    state is mergeable across partitions/batches by the same `max`;
  *  - the harmonic denominator Σ 2^(-reg) is summed as Σ 2^(51-reg) in
  *    BIGINT (exact, ORDER-FREE — a double sum here would depend on
  *    partition order), divided back out in one final double op;
  *  - estimate = α_m·m²·2^51 / S, rounded 6 dp. No small/large-range
  *    corrections (they need `ln`, whose last-ulp behavior is not
  *    portable): the RAW estimator's bias at small cardinalities is the
  *    documented trade for exact replayability; the spec bounds error vs
  *    the exact count in the estimator's valid range.
  */
object Hll {
  val BucketBits = 10
  val M: Int = 1 << BucketBits // 1024 registers: ~3.2% standard error
  val RankBits = 50
  val MaxRank: Int = RankBits + 1
  /** α_1024 · m² · 2^51 — kept as ONE literal so both engines evaluate
    * the identical double constant (assoc order matters at the ulp). */
  val Numerator: Double =
    0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0 * 2251799813685248.0

  /** Fused null guard: a null key would create a phantom null-bucket
    * register — counted into `n_buckets` but absent from the harmonic
    * sum, silently inflating the estimate. Distinct-of-null is an
    * upstream modeling decision; this operator refuses to guess. */
  private def hash60(key: Column): Column =
    coalesce(
      when(key.isNull,
        raise_error(lit("Hll: null key — filter or impute nulls before sketching"))),
      conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("bigint"))

  /** Per-(group, register) max-rank state: the mergeable sketch. */
  def registers(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val h = hash60(col(keyCol))
    val rest = h.bitwiseAND(lit((1L << RankBits) - 1))
    val rank = when(rest === 0, lit(MaxRank))
      .otherwise(lit(RankBits) - length(bin(rest)) + 1)
    df.select(groupCols.map(col) :+ shiftright(h, RankBits).as("bucket") :+
        rank.as("rank"): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rank")).as("reg"))
  }

  /** MERGE register sketches — the algebraic property that makes HLL the
    * 100 TB dashboard primitive: per-batch (or per-partition, or
    * per-day) register states combine by the same `max` that built them,
    * so a rolling distinct count NEVER rescans history — each batch
    * ships ≤ m rows per group and the merge is one bounded aggregation.
    * Exactly union + max: merge(registers(A), registers(B)) ≡
    * registers(A ∪ B), which is what `q_hll_merge`'s oracle checks. */
  def mergeRegisters(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "mergeRegisters: no sketches to merge")
    sketches.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("reg")).as("reg"))
  }

  /** Estimate + register fingerprint per group: (groupCols..., n_buckets,
    * reg_fp, est). `reg_fp` is a fold over the (bucket, reg) pairs in
    * bucket order — equal sketches, equal fingerprints, any engine. */
  def distinctEstimate(df: DataFrame, groupCols: Seq[String],
                       keyCol: String): DataFrame =
    estimateFromRegisters(registers(df, groupCols, keyCol), groupCols)

  /** The estimate/fingerprint finalizer over an existing register frame
    * ([[registers]] output or a [[mergeRegisters]] result). */
  def estimateFromRegisters(regs: DataFrame,
                            groupCols: Seq[String]): DataFrame = {
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_buckets"),
        aggregate(
          array_sort(collect_list(struct(col("bucket"), col("reg")))),
          lit(0L),
          (a, e) => (a * 131 + e.getField("bucket") * 64 + e.getField("reg"))
            % 2147483647L).as("reg_fp"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $MaxRank - reg)")).as("__s_obs"))
      .withColumn("__s", col("__s_obs") +
        (lit(M.toLong) - col("n_buckets")) * lit(1L << MaxRank))
      .withColumn("est", round(lit(Numerator) / col("__s").cast("double"), 6))
      .drop("__s_obs", "__s")
  }
}
