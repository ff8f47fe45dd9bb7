package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.{Clean, Normalize}

/** The reference's two DAGs end-to-end as one declarative program —
  * what `Airbnb_Listings_ETL.py` + `Airbnb_Review_ETL.py` do with
  * pandas + row-by-row Postgres/Mongo upserts, as three Spark jobs:
  *
  *   extract(csv) → clean → { five keyed tables (upsert-loaded parquet),
  *                            one nested document projection }
  *
  * `run` takes any wide listings-like DataFrame (column subsets are
  * configurable), so the real Airbnb CSV drops in unchanged via
  * `graft.sources.Tables.csv`.
  */
object ReferencePipeline {

  final case class Config(
      key: String,
      moneyCols: Seq[String],
      truncateCols: Map[String, Int],
      valueMaps: Map[String, Map[String, String]],
      requiredCols: Seq[String],
      fillMinusOne: Seq[String],
      tableSchema: Map[String, Seq[String]],
      docFlat: Seq[String],
      docNested: (String, Seq[String]))

  /** Clean + normalize one extracted batch (Listings_ETL.py:29-87). */
  def clean(raw: DataFrame, cfg: Config): DataFrame = {
    val monied = cfg.moneyCols.foldLeft(raw)((df, c) =>
      df.withColumn(c, Clean.parseMoney(col(c))))
    val truncated = cfg.truncateCols.foldLeft(monied) { case (df, (c, n)) =>
      df.withColumn(c, Clean.truncateCode(col(c), n))
    }
    val mapped = cfg.valueMaps.foldLeft(truncated) { case (df, (c, m)) =>
      df.withColumn(c, Clean.normalizeValues(col(c), m))
    }
    val filled = Clean.fillNa(mapped, -1L, cfg.fillMinusOne)
    val base = Clean.dropNullRows(filled, cfg.requiredCols)
    // tiebreak on ALL non-key columns: duplicate keys with different
    // payloads still elect one deterministic representative (ordering by
    // the key itself would be vacuous inside its own partition)
    Clean.dedupByKey(base, Seq(cfg.key),
      base.columns.filterNot(_ == cfg.key).map(col).toSeq)
  }

  /** Full run: returns the five keyed tables + the document projection,
    * and upsert-loads each table into `outDir` (partition-free keyed
    * parquet — the Postgres-upsert analog). */
  def run(spark: SparkSession, raw: DataFrame, cfg: Config, outDir: String): Map[String, DataFrame] = {
    // each sink write is its own Spark action; uncached, the whole
    // scan+clean+window-dedup chain would re-execute once per table
    val cleaned = clean(raw, cfg).cache()
    try {
      // materialize the cache with ONE pass before fanning out: the six
      // concurrent sink jobs below would otherwise race to compute the
      // same cached partitions (block-level caching doesn't coordinate
      // first computation) and duplicate the clean chain's work
      cleaned.count()
      val tables = Normalize.splitTables(cleaned, cfg.key, cfg.tableSchema)
      val docs = Normalize.docProject(cleaned, cfg.docFlat, cfg.docNested._1, cfg.docNested._2)
      // the six keyed stores are INDEPENDENT sinks fed by the same cached
      // frame (distinct paths, no fence, no ordering contract) — overlap
      // their write jobs (guide §2.6; Concurrent.scaladoc) instead of
      // paying six sequential commit tails. Each store's bytes are
      // byte-identical to the sequential form.
      val sinks: Seq[(String, org.apache.spark.sql.DataFrame)] =
        tables.toSeq :+ ("documents_store" -> docs)
      Concurrent.awaitAll(3)(sinks.map { case (name, df) => () =>
        // the reference UPSERTS docs into its Mongo collection
        // (Listings_ETL.py:154-188) — an overwrite would drop docs
        // absent from this batch; the table stores are the Postgres
        // replace_index='id' analog, same merge either way
        graft.sinks.ParquetSink.upsertInto(spark, s"$outDir/$name", df, cfg.key, Nil)
      })
      tables + ("documents_store" -> docs)
    } finally { cleaned.unpersist(): Unit }
  }

  /** Reviews-side accumulation (Review_ETL.py): dedup exact, coerce ids,
    * nest per listing. */
  def accumulateReviews(reviews: DataFrame, listingKey: String, reviewCols: Seq[String]): DataFrame = {
    val deduped = Clean.dedupExact(reviews, listingKey +: reviewCols)
      .withColumn(listingKey, Clean.coerceNumeric(col(listingKey), "bigint"))
      .na.drop(Seq(listingKey))
    Normalize.nestCollect(deduped, listingKey, reviewCols, "reviews")
  }

  /** PERSISTENT review load — the full Review DAG including its store
    * side (`Airbnb_Review_ETL.py:58-106` `$addToSet`s each review into
    * the per-listing doc): each batch merges set-wise into the review
    * document table, so re-running a day's batch (Airflow retry,
    * backfill) adds nothing twice. */
  def loadReviews(spark: SparkSession, reviews: DataFrame, path: String,
                  listingKey: String, reviewCols: Seq[String]): Unit =
    graft.sinks.DocStoreSink.upsertDocsInto(spark, path,
      accumulateReviews(reviews, listingKey, reviewCols), listingKey, "reviews", Nil)
}
