package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structural operators: wide-table normalization, document projection,
  * keyed upsert, and per-key nesting — the reference's load phase
  * re-expressed as pure transforms over columnar data.
  */
object Normalize {

  /** Split a wide table into keyed sub-tables, the reference's
    * `tableSchema` dict (`Airbnb_Listings_ETL.py:76-81`): each output is a
    * pruned projection sharing the key. Catalyst collapses each projection
    * into its scan, so writing the five outputs reads only the needed
    * columns (at 100 TB: five column-pruned scans, zero shuffles).
    */
  def splitTables(df: DataFrame, key: String, schema: Map[String, Seq[String]]): Map[String, DataFrame] =
    schema.map { case (name, cols) =>
      name -> df.select((key +: cols.filterNot(_ == key)).map(col): _*)
    }

  /** Document-store projection with a nested struct, the reference's Mongo
    * doc build (`Airbnb_Listings_ETL.py:84-86` selects text columns;
    * `:162` packs `host_desc = {host_id, host_about}`).
    */
  def docProject(df: DataFrame, flat: Seq[String], nestedName: String, nested: Seq[String]): DataFrame =
    df.select(flat.map(col) :+ struct(nested.map(col): _*).as(nestedName): _*)

  /** Keyed upsert (MERGE): `updates` rows replace `base` rows with the same
    * key; unmatched rows of both survive. The reference upserts row-by-row
    * through `PostgresHook.insert_rows(replace=True, replace_index='id')`
    * (`Airbnb_Listings_ETL.py:143-151`) — O(rows) round-trips. Here it is a
    * single co-partitioned union + first-wins window: one shuffle on the key,
    * linear at any scale, deterministic at any partition count.
    */
  def upsert(base: DataFrame, updates: DataFrame, key: String,
             allowEvolution: Boolean = false): DataFrame = {
    // allowEvolution widens a column present on only one side with nulls
    // (base-first column order, new update columns appended) — the same
    // opt-in evolution contract as DocStoreSink.mergeDocs; the winning
    // row stays atomic, so evolved rows carry null for columns their
    // side never had
    val tagged = updates.withColumn("__src", lit(0))
      .unionByName(base.withColumn("__src", lit(1)),
        allowMissingColumns = allowEvolution)
    val w = Window.partitionBy(col(key)).orderBy(col("__src"))
    val outCols = (base.columns ++ updates.columns.filterNot(base.columns.contains)).toSeq
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(outCols.map(col): _*)
  }

  /** Per-key accumulation of nested records — the reference's Mongo
    * `$addToSet: {reviews: ...}` (`Airbnb_Review_ETL.py:82,102`), which adds
    * one review struct per round-trip. Here: one hash aggregation; the array
    * is sorted to make the set order-canonical (a distributed `$addToSet`
    * has no stable order otherwise).
    */
  def nestCollect(df: DataFrame, key: String, nested: Seq[String], as: String): DataFrame =
    df.groupBy(col(key))
      .agg(sort_array(collect_list(struct(nested.map(col): _*))).as(as))
}
