package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the latest right row of the same
  * key with `t_right <= t_left`. Spark has no native ASOF operator; rather
  * than a custom SparkPlan, this composes as the classic union-sort-fill:
  * tag both sides, co-shuffle ONCE on the key, sort each partition by
  * (t, side), and carry the last-seen right payload forward with
  * `last(_, ignoreNulls)` over the running window. Linear in rows, one
  * shuffle, no point lookups — the plan a 1000-executor cluster wants
  * (a broadcast-range or bucketed variant drops the shuffle when one side
  * is small/pre-bucketed).
  *
  * Contract: `right` must be unique per (key, t) — pre-dedupe otherwise
  * (ties would be partition-order nondeterministic).
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame, key: String, t: String,
           rightPayload: Seq[String]): DataFrame = {
    // a payload column that also exists on the left would be silently
    // corrupted: unionByName merges the columns and the running
    // last(ignoreNulls) fill would carry LEFT rows' own values forward as
    // if they were right-side observations
    val overlap = rightPayload.filter(left.columns.contains)
    require(overlap.isEmpty,
      s"asof: left already has payload column(s) ${overlap.mkString(", ")} — rename one side")
    val l = left.withColumn("__side", lit(1))
    val r = right.select((key +: t +: rightPayload).map(col): _*).withColumn("__side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal t: "<=" semantics
    val w = Window.partitionBy(key).orderBy(col(t), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightPayload.foldLeft(u) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** The broadcast variant [[asof]]'s scaladoc promises: when `right` is
    * dimension-sized (a quotes/rates/config table), pack it into one
    * sorted array per key, broadcast-join, and pick the latest entry with
    * `t <= t_left` by a per-row array scan — the BIG side never enters an
    * Exchange (the union-sort form co-shuffles both sides). Per-row cost
    * is O(right rows per key); use the shuffle form when the right side
    * is also fact-sized. Same contract as [[asof]]: right unique per
    * (key, t), payload names must not collide with left columns. */
  def asofBroadcast(left: DataFrame, right: DataFrame, key: String, t: String,
                    rightPayload: Seq[String]): DataFrame = {
    val overlap = rightPayload.filter(left.columns.contains)
    require(overlap.isEmpty,
      s"asofBroadcast: left already has payload column(s) ${overlap.mkString(", ")} — rename one side")
    val packed = right
      .groupBy(col(key))
      .agg(sort_array(collect_list(
        struct(col(t).as("__t") +: rightPayload.map(col): _*))).as("__arr"))
    // latest entry at or before the left timestamp; try_element_at(_, -1)
    // of the filtered prefix — null when no entry qualifies (same as
    // asof; plain element_at throws on the empty array under ANSI)
    val hit = try_element_at(
      filter(col("__arr"), e => e.getField("__t") <= col(t)), lit(-1))
    left.join(broadcast(packed), Seq(key), "left")
      .select(left.columns.toIndexedSeq.map(col) ++
        rightPayload.map(p => hit.getField(p).as(p)): _*)
  }
}
