package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — pair left rows with right rows of the same key
  * whose time falls in `(t_left + lo, t_left + hi]`. A naive inequality
  * join plans as a nested loop (O(n·m) per key); binning makes it an
  * equi-join: right rows land in time bin `t div W` (W = hi - lo), each
  * left row probes only the ≤2 bins its window can overlap, and the exact
  * range predicate filters the candidates. One shuffle on (key, bin),
  * candidates bounded by bin occupancy — the distributed plan for
  * "events within X minutes of each other" at any scale.
  */
object RangeJoin {

  /** Exact floor division in long arithmetic: `floor(col / w)` evaluates
    * as double division, which is lossy above 2^53 — epoch-nanos
    * (~1.7e18) would land in wrong bins and silently miss boundary
    * matches. `a - pmod(a, w)` is an exact multiple of w, so integral
    * `div` gives the true floor at any magnitude (pmod ≥ 0 handles
    * negatives). */
  private def floorDiv(a: Column, w: Long): Column =
    call_function("div", a - pmod(a, lit(w)), lit(w))

  /** Count right matches per left row (zero-preserving).
    * Both inputs need columns `key`, `t` (long), and `left` an `idCol`. */
  def countInRange(left: DataFrame, right: DataFrame, key: String, t: String,
                   idCol: String, lo: Long, hi: Long): DataFrame = {
    require(hi > lo, "empty range")
    val w = hi - lo
    val r = right.select(col(key), col(t).as("__rt"))
      .withColumn("__bin", floorDiv(col("__rt"), w))
    val probes = left.select(col(idCol), col(key), col(t))
      .withColumn("__bin", explode(array(
        floorDiv(col(t) + lo, w), floorDiv(col(t) + hi, w))))
      .dropDuplicates(idCol, "__bin")
    val counts = probes.join(r, Seq(key, "__bin"))
      .filter(col("__rt") > col(t) + lo && col("__rt") <= col(t) + hi)
      .groupBy(idCol).agg(count(lit(1)).as("__n"))
    left.select(col(idCol), col(key), col(t))
      .join(counts, Seq(idCol), "left")
      .withColumn("n_matches", coalesce(col("__n"), lit(0L)))
      .drop("__n")
  }
}
