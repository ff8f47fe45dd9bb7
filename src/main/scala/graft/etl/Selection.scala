package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global greedy selection under a token budget: keep the best-scored
  * documents until the corpus-wide budget is spent — how a training set
  * is cut to a target size ("top docs by quality up to 50B tokens").
  *
  * The selection rule is the greedy prefix of the global
  * (score DESC, id ASC) order: a document is kept iff the token sum of
  * every strictly-better document is still under the budget (its "start
  * offset" lands inside the budget — the same convention as
  * [[Packing]]). A naive implementation is ONE global window cumsum —
  * a single-reducer sort of the whole corpus, the textbook scale-killer.
  *
  * Here the global prefix is found by HISTOGRAM THRESHOLDING, the same
  * trick a distributed top-k uses:
  *  1. quantize scores into ≤ `buckets`+1 value ranges (scores must lie
  *     in [0,1] — quality scores are); aggregate per-bucket token sums —
  *     map-side partial agg, shuffle of ≤ buckets+1 rows;
  *  2. a window cumsum over that TINY histogram (single partition of ≤
  *     buckets+1 rows — trivial by construction) finds each bucket's
  *     token offset; buckets wholly inside the budget keep every doc,
  *     buckets past it drop every doc — decided map-side by a broadcast
  *     join, no per-doc shuffle;
  *  3. exactly ONE bucket can straddle the boundary; only ITS rows
  *     (≈ corpus/buckets, and only they) shuffle into an exact
  *     (score, id) cumsum window for the per-doc rule.
  * Quantized ranges partition the score space, so every doc in a higher
  * bucket scores strictly above every doc in a lower one — the bucket
  * decisions agree exactly with the global order, and the result is
  * row-identical to the naive global window (the DuckDB oracle runs the
  * naive form). Degenerate case: a corpus whose scores all collide into
  * one bucket sends everything through the straddle window — the caller
  * picks a `buckets` resolution matching their score's granularity.
  */
object Selection {

  /** @param df       scored corpus
    * @param tokenCol  per-doc token count (positive)
    * @param scoreCol  selection score in [0,1], higher = kept first
    * @param idCol    unique tiebreak: determinism of the boundary doc
    * @param budget   global token budget
    * @param buckets  histogram resolution (score quantization = floor(score·buckets))
    */
  def tokenBudgetSelect(df: DataFrame, tokenCol: String, scoreCol: String,
                        idCol: String, budget: Long,
                        buckets: Int = 1000): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0, "buckets must be positive")
    val scored = df.withColumn("__bkt", floor(col(scoreCol) * buckets).cast("long"))
    val hist = scored.groupBy("__bkt")
      .agg(sum(col(tokenCol).cast("long")).as("__bsum"))
    // tiny frame: single-partition window is the POINT (≤ buckets+1 rows)
    val wh = Window.orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = broadcast(hist
      .withColumn("__before", coalesce(sum(col("__bsum")).over(wh), lit(0L))))
    val joined = scored.join(offsets, "__bkt")
    val keepWhole = joined.filter(col("__before") + col("__bsum") <= budget)
    // the one straddling bucket: exact per-doc rule over only its rows
    val ws = Window.orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val refined = joined
      .filter(col("__before") < budget && col("__before") + col("__bsum") > budget)
      .withColumn("__wbefore", coalesce(sum(col(tokenCol).cast("long")).over(ws), lit(0L)))
      .filter(col("__before") + col("__wbefore") < budget)
      .drop("__wbefore")
    keepWhole.unionByName(refined).select(df.columns.map(col): _*)
  }
}
