package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic MERGEABLE quantile sketch — the quantile analog of
  * [[Hll]]: a dashboard over 100 TB wants percentiles it can maintain
  * incrementally (per batch/partition/day) and merge, not an exact
  * per-group rank selection re-run over the full feed ([[Rank]] is the
  * exact path when a full pass is acceptable). Spark's own
  * `percentile_approx` (KLL-ish) and t-digest both compact
  * ORDER-DEPENDENTLY — two engines (or two partitionings) produce
  * different sketches, so neither is oracle-checkable. This sketch is
  * order-free by construction, so sketch, fingerprint, and estimates
  * all replay exactly in SQL on any engine with integer shifts and
  * minimal-binary `bin` — and merging is plain count addition.
  *
  * Construction — HdrHistogram/DDSketch-style log-scaled INTEGER
  * buckets over non-negative long values (sub-bucket resolution
  * `SubBits` = b):
  *  - shift s = max(0, bitlen(v) − 1 − b)   (bitlen via `length(bin(v))`
  *    — both engines print minimal binary, the [[Hll]] rank trick);
  *  - bucket = s·2^(b+1) + (v >> s) — order-preserving: within one s
  *    the shift preserves order, and across s groups the ranges are
  *    disjoint and increasing. Values below 2^(b+1) get s = 0: EXACT
  *    buckets (one value per bucket);
  *  - sketch = per-(group, bucket) counts: one map-side-combined
  *    aggregation; ≤ (64−b)·2^(b+1) ≈ 7.4k buckets per group however
  *    large the corpus — constant state, like HLL's 1024 registers;
  *  - estimate at quantile q = the midpoint of the bucket holding the
  *    value at rank ceil(q·n). Bucket width is 2^s ≤ v·2^−b, so the
  *    RELATIVE error is ≤ 2^−(b+1) (b = 6 → ≤ 0.79%) — spec-bounded
  *    against the exact rank selection;
  *  - midpoint arithmetic stays in exactly-representable doubles
  *    (integers < 2^53 and a half), so estimates carry ZERO float
  *    drift cross-engine.
  *
  * Mergeability (the point): [[sketch]] output is (group…, bucket,
  * cnt); [[merge]] is unionByName + sum — associative, commutative,
  * order-free. sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)) EXACTLY
  * (spec'd), so per-day sketches roll up to any window with no rescan
  * and no approximation beyond the bucketing already paid.
  */
object QuantileSketch {
  /** Sub-bucket resolution bits b: relative error ≤ 2^−(b+1). */
  val SubBits = 6
  /** Buckets per shift group = 2^(b+1); also the idx stride. */
  val Stride: Int = 1 << (SubBits + 1)

  /** Fused guard (the [[Hll.hash60]] convention): a null value would
    * silently vanish from the counts; a negative one would bucket by
    * its two's-complement bit length — both are upstream modeling
    * decisions this operator refuses to guess. */
  private def guarded(v: Column): Column = coalesce(
    when(v.isNull || v < 0, raise_error(
      lit("QuantileSketch: null or negative value — filter or offset before sketching"))),
    v.cast("bigint"))

  /** The mergeable sketch: (groupCols…, bucket, cnt). */
  def sketch(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.select(groupCols.map(col) :+ guarded(col(valueCol)).as("__v"): _*)
      .withColumn("__s",
        greatest(length(bin(col("__v"))) - 1 - SubBits, lit(0)).cast("bigint"))
      .withColumn("bucket", col("__s") * Stride +
        expr(s"__v div shiftleft(CAST(1 AS BIGINT), CAST(__s AS INT))"))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** WEIGHTED sketch: (groupCols…, bucket, cnt) with cnt = Σ weight —
    * quantiles of the value distribution as seen through the weights
    * (the corpus-engineering form: "the median TOKEN's document
    * length", not the median document's). Weights are non-negative
    * BIGINTs; the bucket sum stays integer and order-free, so
    * mergeability and exact SQL replay carry over unchanged —
    * [[quantiles]] consumes either sketch form. */
  def sketchWeighted(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     weightCol: String): DataFrame = {
    val w = coalesce(
      when(col(weightCol).isNull || col(weightCol) < 0, raise_error(
        lit("QuantileSketch: null or negative weight — filter or impute before sketching"))),
      col(weightCol).cast("bigint"))
    df.select(groupCols.map(col) :+ guarded(col(valueCol)).as("__v") :+ w.as("__w"): _*)
      .withColumn("__s",
        greatest(length(bin(col("__v"))) - 1 - SubBits, lit(0)).cast("bigint"))
      .withColumn("bucket", col("__s") * Stride +
        expr(s"__v div shiftleft(CAST(1 AS BIGINT), CAST(__s AS INT))"))
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Merge sketches over the same group columns: count addition —
    * exact, order-free, the whole reason the sketch exists. */
  def merge(a: DataFrame, b: DataFrame): DataFrame = {
    val groupCols = a.columns.toSeq.filterNot(Set("bucket", "cnt"))
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Bucket midpoint: (2·sub·2^s + (2^s − 1)) / 2 — all terms exact in
    * doubles, so the same formula in any engine yields the same bits.
    * Kept as ONE expression mirrored verbatim by the SQL oracle. */
  private def midpoint: Column = {
    val s = expr(s"CAST(bucket div $Stride AS DOUBLE)")
    (lit(2.0) * (col("bucket") % Stride).cast("double") * pow(lit(2.0), s) +
      (pow(lit(2.0), s) - lit(1.0))) / lit(2.0)
  }

  /** Quantile estimates from a SKETCH frame: one row per group with
    * `n` and one estimate column per (name → q) entry — the estimate is
    * the midpoint of the bucket holding the value at rank ceil(q·n).
    * The cumulative walk windows over the ≤ 7.4k-bucket sketch, never
    * over corpus rows (the same tiny-frame window rule as
    * [[graft.etl.Selection]]'s histogram). */
  def quantiles(sk: DataFrame, groupCols: Seq[String],
                qs: Seq[(String, Double)]): DataFrame = {
    require(qs.nonEmpty, "quantiles: no quantiles requested")
    val wCum = Window.partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val cum = sk
      .withColumn("__cum", sum(col("cnt")).over(wCum))
      .withColumn("__n", sum(col("cnt")).over(wAll))
      .withColumn("__rep", midpoint)
    // buckets are order-preserving, so min over qualifying buckets = the
    // first bucket whose cumulative count reaches the target rank
    val ests = qs.map { case (name, q) =>
      min(when(col("__cum") >= ceil(col("__n") * q), col("__rep"))).as(name)
    }
    cum.groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n"), ests: _*)
  }

  /** sketch → quantiles in one call (the common batch shape). */
  def quantileEstimate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       qs: Seq[(String, Double)]): DataFrame =
    quantiles(sketch(df, groupCols, valueCol), groupCols, qs)
}
