package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level cleaning operators from the reference's listings/reviews DAGs,
  * re-expressed as declarative Spark transforms (all codegen'd, no UDFs,
  * no driver-side loops — the reference iterates rows in pandas, e.g. the
  * zipcode loop at `Airbnb_Listings_ETL.py:58-60`; at 100 TB every one of
  * these must stay inside WholeStageCodegen on the scan).
  */
object Clean {

  /** `$`-and-comma-stripping money parse.
    * Reference: `Airbnb_Listings_ETL.py:53-55` (strip '$') and
    * `Airbnb_Analysis.py:89` (`replace(substring(price from 2),',','')::real`).
    * Returns DECIMAL(18,2) so downstream SUM/AVG are exact (bit-reproducible
    * across engines and partition orders — double sums are neither).
    * `try_cast`: a malformed residue ("N/A") nulls like pandas NaN instead
    * of killing the whole load under Spark 4's default ANSI cast — same
    * errors->null philosophy as [[coerceNumeric]]. */
  def parseMoney(c: Column): Column =
    regexp_replace(c, "[$,]", "").try_cast("decimal(18,2)")

  /** Truncate an over-long code column: zipcode `20009-374 -> 20009`.
    * Reference: `Airbnb_Listings_ETL.py:57-60`. */
  def truncateCode(c: Column, len: Int = 5): Column = substring(c, 1, len)

  /** Value normalization ('Washington DC' -> 'DC').
    * Reference: `Airbnb_Listings_ETL.py:62-70`. */
  def normalizeValues(c: Column, mapping: Map[String, String]): Column =
    mapping.foldLeft(c) { case (acc, (from, to)) => when(c === from, to).otherwise(acc) }

  /** Numeric coercion with errors -> null, like `pd.to_numeric(errors='coerce')`
    * (`Airbnb_Review_ETL.py:77`). */
  def coerceNumeric(c: Column, to: String = "bigint"): Column = c.try_cast(to)

  /** Drop rows with nulls in the given columns (`Airbnb_Listings_ETL.py:73`). */
  def dropNullRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** fillna(-1) analog (`Airbnb_Listings_ETL.py:94-95`). */
  def fillNa(df: DataFrame, value: Long, cols: Seq[String]): DataFrame =
    df.na.fill(value, cols)

  /** Dedup by key, keeping a *deterministic* representative (the reference's
    * `drop_duplicates(subset='id')` at `Airbnb_Listings_ETL.py:47-49` keeps
    * pandas file order, which has no distributed meaning). A window
    * `row_number` on the key partition gives one shuffle on the key and a
    * reproducible winner at any partition count.
    */
  def dedupByKey(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    // ordering by the partition key alone is vacuous — every row in the
    // partition compares equal and the "winner" is partition-order
    // nondeterministic, breaking the deterministic-representative contract
    require(tiebreak.nonEmpty, "dedupByKey needs a tiebreak ordering")
    require(tiebreak.map(_.toString) != keys.map(k => col(k).toString),
      s"tiebreak ${tiebreak.mkString(",")} must order within the key partition, not just repeat the key")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact whole-row dedup (`Airbnb_Review_ETL.py:41-43`): hash-aggregate
    * distinct; shuffles only the projected columns. */
  def dedupExact(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()
}
