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
    */
  def history(df: DataFrame, key: String, ts: String, tiebreak: String,
              attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    val obs = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    // null-safe "any attribute changed vs previous observation"; the first
    // observation (all lags null, changed=null via <=>) always opens
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(obs)))
      .reduce(_ || _) || row_number().over(obs) === 1
    val versions = df
      .withColumn("__open", changed)
      .filter(col("__open"))
      .drop("__open")
    val ver = Window.partitionBy(key).orderBy(col(ts), col(tiebreak))
    versions
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(ver))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
