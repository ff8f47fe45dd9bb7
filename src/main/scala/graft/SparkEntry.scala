package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EtlQueries.defs ++ AnalysisQueries.defs ++ RelationalQueries.defs ++
      TextQueries.defs ++ SimQueries.defs ++ StreamQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    EtlQueries.oracle ++ AnalysisQueries.oracle ++ RelationalQueries.oracle ++
      TextQueries.oracle ++ SimQueries.oracle ++ StreamQueries.oracle

  /** Queries that read an application-lifetime memoized stage (the shared
    * pair-graph labeling): their bench medians measure re-reading the
    * memoized result, not rebuilding it — the build cost lands in the
    * FIRST pass of the first such query (visible in pass_times). Bench
    * flags them in its JSON so cross-round timing diffs aren't misread. */
  def memoizedQueries: Set[String] = TextQueries.memoized ++ SimQueries.memoized
}
