package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build: turn a keyed change feed
  * (one row per observation of an entity) into versioned history rows with
  * `valid_from` / `valid_to` / `is_current` — the lake-native form of the
  * reference's upsert-on-id load (Airbnb_Listings_ETL.py:143–151), which
  * keeps only the latest state; SCD2 keeps every state TRANSITION.
  *
  * Two windows over ONE shuffle on the entity key:
  *  1. change detection: a row opens a new version iff any tracked
  *     attribute differs from the previous observation (`lag`) — runs of
  *     identical observations collapse into one version;
  *  2. validity: `valid_to` = the next version's `valid_from` (`lead`),
  *     open (null) for the current version.
  *
  * Scale: both windows partition by the entity key, so Catalyst plans a
  * single hash-partition Exchange reused by both sorts; no joins, no
  * driver-side state. Determinism: `tiebreak` orders same-timestamp
  * observations, so the version history is unique for any input order.
  *
  * Same-timestamp caveat: two versions opened at the SAME `ts` produce a
  * zero-width interval (valid_from = valid_to) for the earlier one — the
  * transition is recorded, but the canonical as-of lookup
  * (`valid_from <= t AND (t < valid_to OR valid_to IS NULL)`) can never
  * return it; only the tiebreak-last same-ts version is visible. That is
  * the honest reading of a feed whose timestamp granularity can't order
  * the two observations — coarsen-or-keep is the caller's call, via a
  * higher-resolution `ts` or pre-collapsing same-ts runs.
  */
object Scd2 {

  /** @param df       change feed, one row per observation
    * @param key      entity key column name
    * @param ts       observation-time column name (version boundaries)
    * @param tiebreak unique order-disambiguator within (key, ts)
    * @param attrs    tracked attribute column names: a change in ANY opens
    *                 a new version
    *
    * Besides the three validity columns, the open version carries the
    * key's true LAST-OBSERVED `(last_obs_ts, last_obs_tb)` — the max
    * (ts, tiebreak) over every observation, including the ones that
    * collapsed into it. A collapsed run (A@t1, A@t5 → one version at t1)
    * is otherwise unrecoverable from the version rows, and [[mergeHistory]]
    * needs exactly that mark to reject a late B@t3 that a version-row
    * high-water check (max valid_from = t1) would silently admit.
    */
  def history(df: DataFrame, key: String, ts: String, tiebreak: String,
              attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    // every input column survives into the version rows, so a key or
    // tracked attr named like a history column would be silently
    // overwritten by the withColumn chain below — and mergeHistory would
    // then misread it as history bookkeeping. Reject them all.
    require(!(key +: ts +: tiebreak +: attrs).exists(histCols.contains),
      s"scd2: input columns (key/ts/tiebreak/attrs) may not be named ${histCols.mkString("/")}")
    val obs = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    // per-key last observation BEFORE collapsing runs: same hash partition
    // as the ordered windows (one Exchange serves all three)
    val perKey = Window.partitionBy(key)
    // null-safe "any attribute changed vs previous observation"; the first
    // observation (all lags null, changed=null via <=>) always opens
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(obs)))
      .reduce(_ || _) || row_number().over(obs) === 1
    val versions = df
      .withColumn("__last", max(struct(col(ts), col(tiebreak))).over(perKey))
      .withColumn("__open", changed)
      .filter(col("__open"))
      .drop("__open")
    val ver = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    versions
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(ver))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumn("last_obs_ts", when(col("is_current"), col("__last").getField(ts)))
      .withColumn("last_obs_tb", when(col("is_current"), col("__last").getField(tiebreak)))
      .drop("__last")
  }

  private val histCols =
    Seq("valid_from", "valid_to", "is_current", "last_obs_ts", "last_obs_tb")

  /** Incremental SCD2: merge a new batch of observations into an existing
    * [[history]] table WITHOUT rebuilding from the full feed — the
    * lake-native form of the reference's recurring per-DAG-run upsert
    * (Airbnb_Listings_ETL.py:143–151 re-loads every execution; at 100 TB
    * the feed is unbounded and a full-history rebuild per batch is the
    * scale-killer this method removes).
    *
    * Result is EXACTLY `history(fullFeed)` (hash-parity spec'd in
    * Scd2Spec) because a history table is self-merging: its version rows
    * are the run-starts of the original feed, so re-running the
    * change-detect windows over (existing versions ∪ batch) collapses a
    * batch row that matches a key's open version and opens the rest —
    * closing the previously-open version via the same `lead` chain.
    *
    * Touch-only-affected plan: keys absent from the batch stream through
    * an anti-join untouched — never sorted, never re-windowed. With a
    * typical incremental batch the distinct-key set is small, so AQE
    * broadcasts it and the existing history is NEVER shuffled; the only
    * exchange carries the affected keys' version rows + the batch (both
    * tiny next to the table).
    *
    * LATE-DATA GUARD: a collapsed history cannot reproduce versions a
    * late observation would have split (an A@t1,A@t5 run collapsed to
    * A@t1 loses the t5 re-open a B@t3 insert needs), so any batch row at
    * or before its key's high-water mark — the TRUE last observation
    * `(last_obs_ts, last_obs_tb)` the open version carries, NOT the
    * version rows' max `valid_from` (which a collapsed run sits above) —
    * raises at execution rather than silently corrupting history. Late
    * feeds must rebuild with [[history]]. Histories written before the
    * mark existed lack the columns and must rebuild once (enforced).
    */
  def mergeHistory(existing: DataFrame, batch: DataFrame, key: String,
                   ts: String, tiebreak: String, attrs: Seq[String]): DataFrame = {
    require(Seq("last_obs_ts", "last_obs_tb").forall(existing.columns.contains),
      "mergeHistory: history lacks the last_obs_ts/last_obs_tb high-water " +
        "columns — rebuild it once with history() before merging into it")
    val obsCols = existing.columns.filterNot(histCols.contains).toSeq
    require(batch.columns.sorted.sameElements(obsCols.sorted),
      s"mergeHistory: batch columns ${batch.columns.sorted.mkString(",")} " +
        s"must match the history's observation columns ${obsCols.sorted.mkString(",")}")
    val affected = batch.select(col(key)).distinct()
    val untouched = existing.join(affected, Seq(key), "left_anti")
    val hist = existing.join(affected, Seq(key), "left_semi")
    // high-water mark per affected key = the open version's last-observed
    // mark (exactly one current row per key; max() tolerates a malformed
    // table rather than fanning the batch join out). The guard rides the
    // ts column the downstream windows sort on, so column pruning can
    // never drop it (same fused raise_error pattern as DocStoreSink's
    // dup-key guard).
    val hwm = hist.filter(col("is_current")).groupBy(col(key))
      .agg(max(struct(col("last_obs_ts").as(ts), col("last_obs_tb").as(tiebreak)))
        .as("__hwm"))
    val guardedBatch = batch.join(hwm, Seq(key), "left")
      .withColumn(ts, coalesce(
        when(col("__hwm").isNotNull && struct(col(ts), col(tiebreak)) <= col("__hwm"),
          raise_error(concat(
            lit(s"mergeHistory: late observation for $key="), col(key).cast("string"),
            lit(" at or before the open version — incremental merge only EXTENDS history; rebuild with history()")))),
        col(ts)))
      .select(obsCols.map(col): _*)
    val merged = history(
      hist.select(obsCols.map(col): _*).unionByName(guardedBatch),
      key, ts, tiebreak, attrs)
    untouched.unionByName(merged)
  }
}
