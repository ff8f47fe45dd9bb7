package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the oracle-checked query inventory (SURVEY.md §2).
  *
  * Cross-engine exactness rules (Spark result must hash-match DuckDB):
  *  - Money/doubles are converted to integer cents (`cents`) before any
  *    aggregation: double sums are partition-order-dependent, integer sums
  *    are exact and identical in every engine. Final outputs divide back to
  *    double (`money`), which is a deterministic IEEE op on both sides.
  *  - Timestamps are emitted as formatted strings, never raw.
  *  - Orderings always carry a unique tiebreak column.
  */
object Common {
  type QFn = (SparkSession, String) => DataFrame

  /** Exact integer cents from a 2-decimal double column. */
  def cents(c: Column): Column = round(c * lit(100)).cast("bigint")

  /** Integer cents back to a double for output (exact, deterministic). */
  def money(c: Column): Column = c.cast("double") / lit(100.0)

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.table(spark, dir, name)
}
