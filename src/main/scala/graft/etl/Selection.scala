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
  *     in [0,1] — quality scores are; enforced with a fused `raise_error`,
  *     as is token-count positivity: a null score would silently drop its
  *     row at the histogram join, breaking the row-identical contract);
  *     aggregate per-bucket token sums — map-side partial agg, shuffle of
  *     ≤ buckets+1 rows;
  *  2. a window cumsum over that TINY histogram (single partition of ≤
  *     buckets+1 rows — trivial by construction) finds each bucket's
  *     token offset; buckets wholly inside the budget keep every doc,
  *     buckets past it drop every doc — decided map-side by a broadcast
  *     join, no per-doc shuffle;
  *  3. exactly ONE bucket can straddle the boundary; only ITS rows
  *     (≈ corpus/buckets, and only they) get the exact (score, id)
  *     cumsum — computed TWO-LEVEL, not through one reducer:
  *     range-repartition the bucket on (score DESC, id), per-partition
  *     token sums make a tiny broadcast prefix-offset table (ordered by
  *     partition id, which range partitioning aligns with the sort
  *     order), and each partition's within-cumsum window runs under
  *     `partitionBy(pid)` — every sort in the plan is per-partition, so
  *     even a degenerate corpus whose scores all collide into one bucket
  *     spreads its exact cumsum across the cluster.
  * Quantized ranges partition the score space, so every doc in a higher
  * bucket scores strictly above every doc in a lower one — the bucket
  * decisions agree exactly with the global order, and the result is
  * row-identical to the naive global window (the DuckDB oracle runs the
  * naive form). Determinism note: the range boundaries are whatever the
  * partitioner samples, but the kept set never depends on WHERE the cuts
  * land — offsets are computed from actual partition contents.
  */
object Selection {

  /** @param df       scored corpus
    * @param tokenCol  per-doc token count (positive — enforced)
    * @param scoreCol  selection score in [0,1] (enforced), higher = kept first
    * @param idCol    unique tiebreak: determinism of the boundary doc
    * @param budget   global token budget
    * @param buckets  histogram resolution (score quantization = floor(score·buckets))
    */
  def tokenBudgetSelect(df: DataFrame, tokenCol: String, scoreCol: String,
                        idCol: String, budget: Long,
                        buckets: Int = 1000): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0, "buckets must be positive")
    // fused guards (same raise_error pattern as Scd2/Sampling): the guard
    // rides the columns every downstream agg/window consumes, so column
    // pruning can never elide it
    val badScore = col(scoreCol).isNull || col(scoreCol) < 0.0 || col(scoreCol) > 1.0
    val badTok = col(tokenCol).isNull || col(tokenCol) <= 0
    val scored = df
      .withColumn("__tok", coalesce(
        when(badTok, raise_error(concat(
          lit(s"tokenBudgetSelect: null or nonpositive $tokenCol for $idCol="),
          col(idCol).cast("string")))),
        col(tokenCol).cast("long")))
      .withColumn("__bkt", floor(coalesce(
        when(badScore, raise_error(concat(
          lit(s"tokenBudgetSelect: $scoreCol null or outside [0,1] for $idCol="),
          col(idCol).cast("string")))),
        col(scoreCol)) * buckets).cast("long"))
    val hist = scored.groupBy("__bkt")
      .agg(sum(col("__tok")).as("__bsum"))
    // tiny frame: single-partition window is the POINT (≤ buckets+1 rows)
    val wh = Window.orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = broadcast(hist
      .withColumn("__before", coalesce(sum(col("__bsum")).over(wh), lit(0L))))
    val joined = scored.join(offsets, "__bkt")
    val keepWhole = joined.filter(col("__before") + col("__bsum") <= budget)
    // the one straddling bucket: exact per-doc rule over only its rows,
    // two-level so no single reducer ever sorts the bucket whole
    val straddle = joined
      .filter(col("__before") < budget && col("__before") + col("__bsum") > budget)
    // range partitions align partition-id order with the global sort order
    // (pid 0 holds the best scores), so a pid-ordered prefix of the
    // per-partition sums IS the cross-partition token offset.
    // localCheckpoint (eager) pins ONE physical partitioning that both
    // consumers below read: the offset aggregate and the per-partition
    // window prune different columns, and RangePartitioning samples its
    // boundaries per-exchange — without the materialization they can plan
    // as two independently-sampled exchanges (exchangeReuse off, AQE
    // replan), making __poff describe partitions the refined rows are not
    // in. The straddle bucket is ≈ corpus/buckets rows, so the extra
    // action is bounded and tiny next to the corpus scan above it.
    val ranged = straddle
      .repartitionByRange(col(scoreCol).desc, col(idCol).asc)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val wp = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pidOffsets = broadcast(ranged.groupBy("__pid")
      .agg(sum(col("__tok")).as("__psum"))
      .withColumn("__poff", coalesce(sum(col("__psum")).over(wp), lit(0L)))
      .select(col("__pid"), col("__poff")))
    val ww = Window.partitionBy(col("__pid"))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val refined = ranged
      .withColumn("__wbefore", coalesce(sum(col("__tok")).over(ww), lit(0L)))
      .join(pidOffsets, "__pid")
      .filter(col("__before") + col("__poff") + col("__wbefore") < budget)
    keepWhole.unionByName(refined.select(keepWhole.columns.toIndexedSeq.map(col): _*))
      .select(df.columns.toIndexedSeq.map(col): _*)
  }
}
