package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D SKYLINE (Pareto frontier): the rows not strictly dominated on
  * (minimize `xCol`, maximize `yCol`). The naive form is a NOT EXISTS
  * self-join — quadratic, and unplannable without a cartesian. This is
  * the distributed sorted sweep, with NO single-partition pass over
  * data rows anywhere (round-17 verdict: the previous phase-2 "global
  * sweep over the survivors" planned a `Window.partitionBy()` — sound,
  * but on ANTI-CORRELATED axes the true skyline IS the table, phase 1
  * prunes nothing, and the whole input funneled through one task):
  *
  *  1. Range-exchange on x ALONE (no tiebreak column — equal-x rows
  *     must land in ONE partition, so cross-partition dominators always
  *     have STRICTLY smaller x; that is what makes step 3's prefix test
  *     a plain `>=`). Then a LOCAL sweep per physical partition: a row
  *     dominated within any subset is dominated globally, so the prune
  *     is sound, and every pruned row's dominator chain ends at a local
  *     survivor, so no global information is lost.
  *  2. Per-partition frontier tops: one row per partition — the max
  *     survivor y (a local frontier has y increasing in x, so this is
  *     its last point). P rows total, P = shuffle parallelism.
  *  3. Exclusive prefix-max of the tops over partition id — the only
  *     cross-partition fact a row needs: the best y at any strictly
  *     smaller x. The P-row table broadcasts back and one map-side
  *     filter keeps row B iff prefix(pid_B) < y_B. The only
  *     single-partition window in the plan orders those P rows, never
  *     data.
  *
  * Per-task bound: O(n/P) rows through every exchange and window —
  * including the anti-correlated worst case where all n rows are on the
  * frontier (SkylineSpec proves it with task metrics, not plan reading).
  * The one residual skew hazard is x-VALUE duplication (range
  * partitioning cannot split one x value across partitions without
  * breaking the strict-prefix invariant), bounded by the duplication of
  * the single most frequent x — a data constant under any real pricing
  * column, and the local m2 prune collapses each x to its max-y rows
  * before anything else touches them.
  *
  * Dominance is STRICT: A dominates B iff x_A ≤ x_B ∧ y_A ≥ y_B with at
  * least one strict — so exact (x, y) duplicates do not dominate each
  * other and all survive (`m2` prunes only strictly larger same-x ys,
  * the prefix test `>=` kills equal-y at strictly smaller x, which IS
  * domination). SkylineSpec proves ≡ brute-force NOT EXISTS on fixtures
  * exercising ties, duplicates, single-point domination, the
  * anti-correlated all-frontier shape, and on real data. */
object Skyline {

  /** All skyline rows of `df` (any extra columns ride along). `xCol`
    * minimized, `yCol` maximized; both must be orderable and non-null
    * (null ordering would make "dominated" undefined — filter first). */
  def pareto2d(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    // same reserved-name rule as Rank.withGroupRank: an input already
    // carrying one of the internal working columns would silently
    // produce wrong skyline rows instead of failing fast
    val reserved = Seq("__pid", "__pref", "__ytop", "__m1", "__m2")
    require(!reserved.exists(df.columns.contains),
      s"pareto2d: input must not carry ${reserved.mkString("/")} columns")
    // range exchange on x only: equal keys hash to one partition under
    // RangePartitioner, so partition order is STRICT on x across
    // partitions — the prefix-max test needs no equal-x carve-out.
    // The physical partitioning is PINNED with an eager localCheckpoint
    // (Rank.scala's round-9 rule, re-learned here the hard way: the
    // tops aggregate and the join's left side would otherwise re-plan
    // repartitionByRange as two INDEPENDENTLY-SAMPLED exchanges, and
    // the prefix maxes would describe partition boundaries the data
    // rows are not actually in — rows just past a boundary shift get
    // silently dropped)
    val ranged = df.repartitionByRange(col(xCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val local = sweep(ranged, xCol, yCol)
    // P-row per-partition frontier tops → exclusive prefix max. The
    // single-partition window here orders P rows (the parallelism, not
    // the data); both consumers read the pinned checkpoint, so the base
    // is range-partitioned once and the pids agree.
    val pref = local.groupBy(col("__pid"))
      .agg(max(col(yCol)).as("__ytop"))
      .withColumn("__pref", max(col("__ytop")).over(
        Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__pref"))
    // broadcast the P-row prefix table back: survive iff nothing at a
    // strictly smaller x (any earlier partition) has y >= mine
    local.join(broadcast(pref), Seq("__pid"), "left")
      .filter(col("__pref").isNull || col("__pref") < col(yCol))
      .drop("__pid", "__pref")
  }

  /** Local sweep within each physical partition: keep a row iff no
    * same-partition row at strictly smaller x has y >= it (m1) and it
    * holds the max y among its exact-x peers (m2). */
  private def sweep(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val w1 = Window.partitionBy(col("__pid")).orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val w2 = Window.partitionBy(col("__pid"), col(xCol))
    df.withColumn("__m1", max(col(yCol)).over(w1))
      .withColumn("__m2", max(col(yCol)).over(w2))
      .filter((col("__m1").isNull || col("__m1") < col(yCol)) &&
        col("__m2") === col(yCol))
      .drop("__m1", "__m2")
  }
}
