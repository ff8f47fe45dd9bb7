package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic KMV ("k minimum values" / theta) sketch — bounded-state
  * distinct counting that, unlike [[Hll]], also answers SET ALGEBRA:
  * union, intersection, and Jaccard between sketches of different
  * sources, without ever joining the sources themselves. The standard
  * use at corpus scale: "how much does today's crawl overlap
  * yesterday's", "how many of these users appear in both event streams"
  * — questions whose exact form is a distinct-join over the full key
  * sets.
  *
  * Construction (k = 256):
  *  - 60-bit key hash = first 15 md5 hex chars (shared [[Hll]] trick);
  *  - sketch = the k SMALLEST DISTINCT hashes per group, kept ascending
  *    — computed by [[graft.expressions.MinKDistinct]], a bounded-state
  *    typed aggregate whose map-side partials and merges carry ≤ k
  *    longs each (no collect_set blow-up, no per-group single-reducer
  *    rank window);
  *  - estimate: with fewer than k distinct hashes the sketch IS the
  *    distinct set (exact count); at k, est = (k−1)·2^60 / h_(k) — the
  *    classic KMV estimator (RSE ≈ 1/√(k−2) ≈ 6.3%);
  *  - merge/union: k smallest of the concatenated sketches — the same
  *    min-k rule, so sketch(A ∪ B) ≡ merge(sketch A, sketch B) (spec'd);
  *  - intersection: J = |K(A∪B) ∩ S_A ∩ S_B| / |K(A∪B)| (the KMV
  *    Jaccard estimator), |A∩B| ≈ J · est(A∪B).
  *
  * Every number is integer arithmetic until one final double division
  * (and the IEEE long→double casts both engines round identically), so
  * sketches AND estimates replay exactly in SQL — like [[Hll]] and
  * [[CountMin]], an oracle-checkable sketch.
  */
object Kmv {
  val K = 256
  /** (K−1)·2^60 as the product of two exactly-representable doubles —
    * kept as ONE expression so both engines evaluate the identical
    * IEEE product. */
  val Numerator: Double = 255.0 * 1152921504606846976.0

  private def hash60(key: Column): Column =
    coalesce(
      when(key.isNull,
        raise_error(lit("Kmv: null key — filter or impute nulls before sketching"))),
      conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("bigint"))

  /** Per-group sketch: (groupCols..., mins) with `mins` the ascending
    * array of ≤ K smallest distinct 60-bit hashes. */
  def sketch(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame =
    df.select(groupCols.map(col) :+ hash60(col(keyCol)).as("__h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(graft.expressions.MinKAgg.minKDistinct(col("__h"), K).as("mins"))

  /** Union of two sketch arrays: the k smallest of their merged
    * distinct hashes — exactly the sketch of the unioned sources. */
  def mergeMins(a: Column, b: Column): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, K)

  /** Distinct-count estimate from a sketch array: exact below K,
    * (k−1)·2^60 / h_(k) at K, rounded 6 dp. */
  def estimate(mins: Column): Column =
    when(size(mins) < K, size(mins).cast("double"))
      .otherwise(round(lit(Numerator) / element_at(mins, K).cast("double"), 6))

  /** Jaccard estimate between two sketches: the fraction of the UNION
    * sketch's hashes present in both sides. */
  def jaccard(a: Column, b: Column): Column = {
    val u = mergeMins(a, b)
    round(size(array_intersect(array_intersect(u, a), b)).cast("double") /
      size(u).cast("double"), 6)
  }
}
