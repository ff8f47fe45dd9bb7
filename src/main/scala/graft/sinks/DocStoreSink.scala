package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document-store sink: keyed upsert where one column is a nested
  * array-of-structs that MERGES like a set instead of being replaced —
  * the reference's Mongo load semantics
  * (`Airbnb_Listings_ETL.py:154-188` upserts listing docs by id;
  * `Airbnb_Review_ETL.py:58-106` `$addToSet`s review structs into the
  * doc's nested array, one round-trip per review). Here the whole merge
  * is ONE distributed plan: union + hash aggregation on the key — linear
  * shuffles of (key, scalars, array) rows, no per-doc round-trips, and
  * the array is canonicalized (distinct + sorted) so a distributed
  * "$addToSet" has a stable order any engine reproduces.
  *
  * Scale notes: the aggregation shuffles each doc's array once; at 100 TB
  * the arrays ride the same key shuffle an upsert already pays — no extra
  * exchange vs [[ParquetSink.upsertInto]]. Degenerate docs (one key
  * accumulating millions of nested records) surface as a skewed group —
  * the same AQE skew handling as any hot aggregation key applies.
  */
object DocStoreSink {

  /** Merge `updates` into `base` by `key` with document semantics:
    *  - scalar columns: the update row wins where the key exists in both;
    *  - `arrayCol`: set-union of both sides' arrays (distinct + sorted —
    *    the `$addToSet` analog), null arrays contributing nothing;
    *  - keys present in only one side pass through (arrays canonicalized).
    *
    * Contract: each side holds at most one row per key (dedup upstream
    * with `Clean.dedupByKey` otherwise — same contract as
    * `Normalize.upsert`) — ENFORCED: per-side row counts ride the same
    * aggregation (zero extra shuffle) and a violated key raises at
    * execution instead of letting an arbitrary scalar row win silently.
    * Pure transform — unit-tested directly and exposed through the
    * `etl_doc_merge` oracle query.
    *
    * SCHEMA EVOLUTION (`allowEvolution = true`): a column present on only
    * one side is widened with nulls instead of raising — the production
    * behavior when the reference's pandas load starts carrying a new
    * column (Airbnb_Listings_ETL.py's frames go straight into the upsert;
    * old docs read the new column back as null). Output column order is
    * base-first, new update columns appended — stable for the table as it
    * grows. The update row still wins ATOMICALLY where a key collides, so
    * an update batch that DROPPED a column nulls it for the keys it
    * touches (no cross-row column mixing — same atomicity rule as the
    * dup-key path). Default stays strict: silent widening on a typo'd
    * column name is a data bug, so evolution is opt-in per load. */
  def mergeDocs(base: DataFrame, updates: DataFrame, key: String,
                arrayCol: String, allowEvolution: Boolean = false): DataFrame = {
    require(allowEvolution || base.columns.sorted.sameElements(updates.columns.sorted),
      s"mergeDocs: schemas differ: ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")} (pass allowEvolution=true to widen with nulls)")
    require(Seq(base, updates).forall(_.columns.contains(key)),
      s"mergeDocs: both sides must carry the key column $key")
    require(base.columns.contains(arrayCol) || updates.columns.contains(arrayCol),
      s"mergeDocs: neither side carries the document array column $arrayCol")
    val outCols = (base.columns ++ updates.columns.filterNot(base.columns.contains)).toSeq
    val scalars = outCols.filterNot(c => c == key || c == arrayCol)
    val tagged = updates.withColumn("__src", lit(0))
      .unionByName(base.withColumn("__src", lit(1)),
        allowMissingColumns = allowEvolution)
    // collect_list drops null arrays; flatten + distinct + sort canonicalize
    // regardless of aggregation order, so the result is partition-count- and
    // rerun-stable
    val mergedArray =
      sort_array(array_distinct(flatten(collect_list(col(arrayCol))))).as(arrayCol)
    // dup-key guard: counted inside the one aggregation pass, raised through
    // the key column (coalesce keeps it in the plan — NullType when-branch
    // never matches on healthy input)
    val sideCounts = Seq(
      sum(when(col("__src") === 0, 1).otherwise(0)).as("__n_upd"),
      sum(when(col("__src") === 1, 1).otherwise(0)).as("__n_base"))
    val guardedKey = coalesce(
      when(col("__n_upd") > 1 || col("__n_base") > 1,
        raise_error(concat(lit(s"mergeDocs: >1 row for key in one side ($key="),
          col(key).cast("string"), lit(") — dedup upstream")))),
      col(key)).as(key)
    val grouped =
      if (scalars.isEmpty)
        tagged.groupBy(col(key)).agg(mergedArray, sideCounts: _*)
          .select(guardedKey, col(arrayCol))
      else
        tagged.groupBy(col(key))
          // min_by over the whole struct keeps the winning row's scalars
          // ATOMIC (no cross-row column mixing on malformed dup-key input)
          .agg(min_by(struct(scalars.map(col): _*), col("__src")).as("__doc"),
            mergedArray +: sideCounts: _*)
          .select(guardedKey +:
            scalars.map(c => col("__doc").getField(c).as(c)) :+ col(arrayCol): _*)
    grouped.select(outCols.map(col): _*)
  }

  /** One row per key with the array column canonicalized — what an initial
    * load writes so that later merges compare equal element-wise. Routed
    * through [[mergeDocs]] against an empty base so the dup-key guard
    * covers the first load too (a narrow canonicalize would let duplicate
    * keys straight into the doc table). */
  private def canonical(df: DataFrame, key: String, arrayCol: String): DataFrame =
    mergeDocs(df.limit(0), df, key, arrayCol)

  /** Upsert documents into a parquet-backed doc table with
    * [[mergeDocs]] semantics, using the same crash-safe atomic swap as
    * [[ParquetSink.upsertInto]] (every crash window recovers — spec'd in
    * RecoverySpec). Loading the same batch twice is a no-op beyond the
    * first load: scalars overwrite with equal values and the array union
    * adds nothing (round-trip spec'd in DocStoreSpec). */
  def upsertDocsInto(spark: SparkSession, path: String, updates: DataFrame,
                     key: String, arrayCol: String,
                     partitionCols: Seq[String],
                     allowEvolution: Boolean = false): Unit =
    ParquetSink.swapWrite(spark, path, partitionCols) {
      case Some(base) => mergeDocs(base, updates, key, arrayCol, allowEvolution)
      case None       => canonical(updates, key, arrayCol)
    }

  /** Streaming form of the reference's continuous review load: pass to
    * `stream.writeStream.foreachBatch(...)`. Each micro-batch's records
    * are nested per key (`Normalize.nestCollect`) and merged into the doc
    * table with [[mergeDocs]] semantics. Because the array merge is a SET
    * union, a replayed micro-batch (foreachBatch's at-least-once
    * delivery) is idempotent — the `$addToSet` analog is exactly what
    * makes streaming doc accumulation safe without a transaction log. */
  def appendRecordsInto(path: String, key: String, nested: Seq[String],
                        arrayCol: String, partitionCols: Seq[String])
                       (batch: DataFrame, batchId: Long): Unit = {
    // partition columns must SURVIVE the nesting: grouping by key alone
    // (plain nestCollect) would drop them and the partitioned write below
    // would fail on its first micro-batch. They become per-doc scalars
    // (update wins on conflict), so they must be functionally dependent on
    // the key within a batch — a batch violating that yields >1 doc row
    // per key here, which mergeDocs' fused dup-key guard raises on (the
    // constraint is enforced, not just documented).
    val docs = batch.groupBy((key +: partitionCols).map(col): _*)
      .agg(sort_array(collect_list(struct(nested.map(col): _*))).as(arrayCol))
    upsertDocsInto(batch.sparkSession, path, docs, key, arrayCol, partitionCols)
  }
}
