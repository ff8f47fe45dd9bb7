package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D SKYLINE (Pareto frontier): the rows not strictly dominated on
  * (minimize `xCol`, maximize `yCol`). The naive form is a NOT EXISTS
  * self-join — quadratic, and unplannable without a cartesian. This is
  * the TWO-PHASE sorted sweep:
  *
  *  1. Range-exchange on x, then a LOCAL sweep per physical partition.
  *     A row dominated within ANY subset is dominated globally, so the
  *     prune is sound; and dominance is transitive with every
  *     within-partition dominator chain ending at a locally-undominated
  *     row, so every globally-dominated row still has a dominator among
  *     the survivors — the prune loses no information.
  *  2. The exact global sweep over the survivor set, which is bounded
  *     by the true skyline plus one frontier run per partition — the
  *     single-partition window there touches thousands of rows, never
  *     the table (the naive global-window form would funnel ALL rows
  *     through one task; RelationalSpec asserts the executed plan keeps
  *     the full-table window partitioned).
  *
  * Dominance is STRICT: A dominates B iff x_A ≤ x_B ∧ y_A ≥ y_B with at
  * least one strict — so exact (x, y) duplicates do not dominate each
  * other and all survive (`m2` prunes only strictly larger same-x ys).
  * SkylineSpec proves ≡ brute-force NOT EXISTS on fixtures exercising
  * ties, duplicates, and single-point domination, and on real data. */
object Skyline {

  /** All skyline rows of `df` (any extra columns ride along). `xCol`
    * minimized, `yCol` maximized; both must be orderable and non-null
    * (null ordering would make "dominated" undefined — filter first).
    * `tiebreak` only stabilizes the range exchange, not the result. */
  def pareto2d(df: DataFrame, xCol: String, yCol: String,
               tiebreak: Column): DataFrame = {
    val local = sweep(
      df.repartitionByRange(col(xCol), tiebreak)
        .withColumn("__pid", spark_partition_id()),
      Seq(col("__pid")), xCol, yCol).drop("__pid")
    sweep(local, Nil, xCol, yCol)
  }

  private def sweep(df: DataFrame, part: Seq[Column],
                    xCol: String, yCol: String): DataFrame = {
    val w1 = Window.partitionBy(part: _*).orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val w2 = Window.partitionBy(part :+ col(xCol): _*)
    df.withColumn("__m1", max(col(yCol)).over(w1))
      .withColumn("__m2", max(col(yCol)).over(w2))
      .filter((col("__m1").isNull || col("__m1") < col(yCol)) &&
        col("__m2") === col(yCol))
      .drop("__m1", "__m2")
  }
}
