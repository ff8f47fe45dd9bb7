package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture primitives: snapshot diffing and log application —
  * the lake-native forms of the reference's recurring re-load
  * (Airbnb_Listings_ETL.py:143–151 replaces state wholesale every run; a lake
  * keeps the previous snapshot, so the cheaper questions are "what
  * changed since?" and "apply only the changes").
  */
object Cdc {

  /** Diff two snapshots of a keyed table: one row per key that was
    * `added`, `removed`, or `changed` (any tracked attribute differs,
    * null-safe); unchanged keys produce no output. Old and new attribute
    * values ride along as `old_<attr>` / `new_<attr>`.
    *
    * Plan: ONE full-outer join co-partitioned on the key — both snapshots
    * shuffle once, classification is a map-side projection. At 100 TB,
    * writing snapshots through `sinks/BucketedSink` on the key makes this
    * a zero-Exchange zip of co-located buckets; the diff's output is
    * bounded by the churn, not the table. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keys: Seq[String], attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "snapshotDiff needs keys and attrs")
    val o = attrs.foldLeft(oldDf.select((keys ++ attrs).map(col): _*)
      .withColumn("__in_old", lit(1)))((d, a) => d.withColumnRenamed(a, s"old_$a"))
    val n = attrs.foldLeft(newDf.select((keys ++ attrs).map(col): _*)
      .withColumn("__in_new", lit(1)))((d, a) => d.withColumnRenamed(a, s"new_$a"))
    val changed = attrs.map(a => !(col(s"old_$a") <=> col(s"new_$a"))).reduce(_ || _)
    o.join(n, keys, "full_outer")
      .withColumn("change",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(changed, "changed"))
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ (col("change") +:
        attrs.flatMap(a => Seq(col(s"old_$a"), col(s"new_$a")))): _*)
  }

  /** Apply a keyed CDC log to a base table: for each key only its LATEST
    * log entry (by `seqCol`, which must be unique per key) matters —
    * `D` deletes the key, `I`/`U` upsert the tracked attributes; keys
    * absent from the log pass through unchanged, and an insert for an
    * unknown key materializes it. Returns (keys ++ attrs).
    *
    * Plan: the latest-entry reduction is a `max_by(struct, seq)` hash
    * aggregate — partial map-side combine collapses each key's entries
    * BEFORE the shuffle (a window row_number would sort the whole log
    * per key instead), then ONE full-outer join against the base. The
    * log side shrinks to distinct touched keys; at 100 TB the base is
    * the big side and never moves twice. */
  def applyLog(base: DataFrame, log: DataFrame, keys: Seq[String],
               seqCol: String, opCol: String, attrs: Seq[String]): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "applyLog needs keys and attrs")
    val latest = log.groupBy(keys.map(col): _*)
      .agg(max_by(struct(col(opCol).as("__op") +:
        attrs.map(a => col(a).as(s"__l_$a")): _*), col(seqCol)).as("__l"))
    val applied = base.select((keys ++ attrs).map(col): _*)
      .join(latest, keys, "full_outer")
      .filter(!(col("__l.__op") <=> lit("D")))
    applied.select(keys.map(col) ++ attrs.map(a =>
      when(col("__l").isNotNull, col(s"__l.__l_$a")).otherwise(col(a)).as(a)): _*)
  }
}
