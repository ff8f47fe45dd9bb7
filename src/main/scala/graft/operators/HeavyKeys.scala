package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT heavy hitters WITHOUT a watch list — "which keys are hot" when
  * you don't know the suspects (the question that feeds [[Skew]]'s
  * salting decision and vocabulary/hot-shard reports). The CountMin
  * family ([[CountMin.estimateFor]]) answers "how hot are THESE keys";
  * this answers discovery, with exact counts, over an unbounded key
  * space, in two bounded passes:
  *
  *  1. CANDIDATES: a Misra–Gries k-counter aggregate
  *     ([[graft.expressions.MisraGriesCandidates]]) — O(k) state per
  *     partial, ≤ k (key, count) pairs on every shuffle, and the classic
  *     guarantee that every key with frequency > n/(k+1) survives ANY
  *     update/merge order. The surviving set beyond the guaranteed keys
  *     IS order-dependent — harmless, because:
  *  2. EXACT RECOUNT: the ≤ k candidates broadcast back as a join
  *     filter (the exact total computed in stage 1's same aggregate
  *     rides along), and the true threshold `cnt · (k+1) > n` filters
  *     the false candidates out. The output — every key with frequency strictly
  *     above n/(k+1), with its exact count — is therefore DETERMINISTIC
  *     regardless of partitioning (spec'd), though stage 1's
  *     intermediate counters are not.
  *
  * At 100 TB: two scans, both map-side-combined; nothing keyed by the
  * (unbounded) key space ever shuffles except the ≤ k survivors' counts.
  * Null keys are ignored by the summary and excluded from n (callers
  * wanting a null-guard should raise upstream, the packChunkKey pattern).
  */
object HeavyKeys {

  /** (keyCol, cnt, n) for every key with frequency > n/(k+1), exact.
    * Exactly two scans: the summary pass computes candidates AND the
    * non-null total in one aggregate; the recount pass joins the ≤ k
    * broadcast candidates (n riding along) and counts them exactly. */
  def heavyKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"heavyKeys: k must be positive, got $k")
    val keyed = df.select(col(keyCol))
    val summary = keyed.agg(
      graft.expressions.MisraGriesAgg.candidates(col(keyCol), k).as("__ks"),
      count(col(keyCol)).as("n"))
    val cand = summary.select(explode(col("__ks")).as(keyCol), col("n"))
    keyed.filter(col(keyCol).isNotNull)
      .join(broadcast(cand), Seq(keyCol))
      .groupBy(col(keyCol), col("n")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > col("n"))
      .select(col(keyCol), col("cnt"), col("n"))
  }
}
