package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget packing for training-data prep: assign documents to
  * fixed-budget packs (the distributed approximation of greedy sequence
  * packing). Each partition's docs are ordered deterministically, the
  * running token total is a window cumsum, and a doc lands in pack
  * `floor(cum_before / budget)` — one shuffle on the partition columns,
  * no sequential driver loop. Docs longer than the budget get a pack to
  * themselves plus spill; exact bin-packing is NP-hard and inherently
  * sequential, so pipelines use exactly this cumsum approximation.
  */
object Packing {

  /** Adds `pack_id` per (partitionCols) group, filling packs of `budget`
    * tokens in `orderCol` order. Integer arithmetic throughout (`div`) —
    * exact at any cumulative-sum magnitude. */
  def withPackId(df: DataFrame, tokenCol: String, budget: Long,
                 partitionCols: Seq[String], orderCol: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__cum", sum(col(tokenCol).cast("long")).over(w))
      .withColumn("pack_id",
        call_function("div", col("__cum") - col(tokenCol).cast("long"), lit(budget)))
      .drop("__cum")
  }
}
