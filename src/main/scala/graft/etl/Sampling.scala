package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * prep. All bucketing goes through md5 of the key — reproducible across
  * engines, partition counts, and reruns (a `rand()` sample is none of
  * those), and implicitly stratified: every subpopulation is sampled at
  * the same rate because bucket assignment depends only on the key.
  * Pure projections — no shuffle, scan-speed at any corpus size.
  */
object Sampling {

  /** Stable bucket in [0, mod): first 8 md5 hex chars of the key, mod n.
    * Portable: DuckDB `CAST(concat('0x', substr(md5(...), 1, 8)) AS
    * BIGINT) % mod`. */
  def hashBucket(key: Column, mod: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("bigint") % mod

  /** Keep ~pct% of rows, chosen by key hash — rerun-stable and join-stable
    * (the same keys are kept everywhere the same sample is taken). */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct=$pct out of range")
    df.filter(hashBucket(col(keyCol), 100) < pct)
  }

  /** train/validation/test label from the key hash (train + validation
    * ≤ 100; the remainder is test). Deterministic: a document never
    * migrates between splits across runs or engines. */
  def splitLabel(key: Column, trainPct: Int = 80, validationPct: Int = 10): Column = {
    require(trainPct + validationPct <= 100, "split percentages exceed 100")
    val b = hashBucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + validationPct, "validation")
      .otherwise("test")
  }
}
