package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget packing for training-data prep: assign documents to
  * fixed-budget packs (the distributed approximation of greedy sequence
  * packing). Each partition's docs are ordered deterministically, the
  * running token total is a window cumsum, and a doc lands in the pack its
  * START offset falls in (`floor(cum_before / budget)`), densely
  * renumbered — one shuffle on the partition columns, no sequential
  * driver loop. Exact bin-packing is NP-hard and inherently sequential,
  * so pipelines use exactly this cumsum approximation.
  *
  * Contract (spec-enforced, including oversized docs):
  *  - pack ids are contiguous 0..P−1 within each group and monotone
  *    non-decreasing in `orderCol` — a doc longer than the budget can no
  *    longer burn a range of skipped ids (the round-2 gap: its cumsum jump
  *    used to leave holes in the id sequence);
  *  - a pack's payload can overshoot `budget` by at most its last doc's
  *    size (every doc STARTS inside the pack's budget window); only packs
  *    containing a doc with tk ≥ budget can overshoot by more than the
  *    largest normal doc. Downstream truncation/splitting of oversized
  *    docs is a tokenizer decision, not a packing one.
  */
object Packing {

  /** Adds `pack_id` per (partitionCols) group, filling packs of `budget`
    * tokens in `orderCol` order. Integer arithmetic throughout (`div`) —
    * exact at any cumulative-sum magnitude. Two window passes over ONE
    * shuffle (same partitioning; `__rawpack` is monotone in `orderCol`, so
    * the second sort is a no-op ordering-wise). */
  def withPackId(df: DataFrame, tokenCol: String, budget: Long,
                 partitionCols: Seq[String], orderCol: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    // explicit ROWS frame: the default RANGE frame gives every row TIED on
    // orderCol the cumulative sum of all its peers, merging them into one
    // overfull pack. With ROWS, ties split correctly; their relative order
    // (hence pack boundary placement among equals) is only deterministic
    // when orderCol is unique per group — callers wanting rerun-stable
    // packs must order by a unique column (the queries use doc_id).
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // dense renumbering: raw pack indices skip values whenever one doc's
    // cumsum jump crosses more than one budget boundary (tk > budget);
    // dense_rank over the raw index closes the holes
    val wDense = Window.partitionBy(partitionCols.map(col): _*).orderBy(col("__rawpack"))
    df.withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("__rawpack",
        call_function("div", col("__cum") - col(tokenCol).cast("long"), lit(budget)))
      .withColumn("pack_id", (dense_rank().over(wDense) - 1).cast("bigint"))
      .drop("__cum", "__rawpack")
  }
}
