package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data profiling — the "what is actually in this table"
  * report every migration and data-quality gate starts from: per column,
  * row count, null count, distinct-count estimate, and min/max.
  *
  * Plan shape at 100 TB (the part naive profilers get wrong):
  *  - ONE scan computes every column's count/null/min/max as a single
  *    multi-expression aggregate (Spark evaluates them in one pass with
  *    map-side partials — no per-column rescan);
  *  - distinct counts come from the [[graft.operators.Kmv]] sketch over
  *    a MELTED (column-name, string-value) view — one more scan, one
  *    bounded shuffle (≤ k longs per partial per column), and the KMV
  *    estimator is EXACT below k = 256 distinct values, which covers
  *    the enum/code columns a profiler most needs to be right about;
  *    high-cardinality columns get the ~6% RSE estimate;
  *  - the output is ≤ #columns rows — the two scans are the entire cost.
  *
  * String forms are chosen by the caller per column ([[ColumnSpec]]):
  * doubles must be converted to integer cents and dates formatted
  * (raw double→string rendering differs across engines — the repo-wide
  * cross-engine rule), so the whole report replays exactly in SQL.
  */
object Profile {

  /** One profiled column: `sval` is the null-preserving STRING form
    * (drives null/distinct stats); `minS`/`maxS` are AGGREGATE
    * expressions producing the reported min/max as strings (typed
    * min/max stringified — lexicographic min over "99"/"100" would
    * report the wrong number). */
  final case class ColumnSpec(name: String, sval: Column, minS: Column, maxS: Column)

  def profile(df: DataFrame, cols: Seq[ColumnSpec]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns specified")
    // pass 1: every column's basic stats in ONE multi-aggregate scan
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(sum(when(c.sval.isNull, 1L).otherwise(0L)).as(s"__nulls_${c.name}"),
        c.minS.as(s"__min_${c.name}"), c.maxS.as(s"__max_${c.name}"))
    }
    val basic = df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c.name).as("col_name"), col("__n").as("n_rows"),
          col(s"__nulls_${c.name}").as("n_null"),
          col(s"__min_${c.name}").as("min_s"),
          col(s"__max_${c.name}").as("max_s"))
      }: _*)).as("s"))
      .select(col("s.*"))
    // pass 2: distinct estimates via the KMV sketch over the melted view
    val melt = df
      .select(explode(array(cols.map(c =>
        struct(lit(c.name).as("col_name"), c.sval.cast("string").as("sval"))): _*)).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.sval").as("sval"))
      .filter(col("sval").isNotNull)
    val distincts = graft.operators.Kmv.sketch(melt, Seq("col_name"), "sval")
      .select(col("col_name"),
        graft.operators.Kmv.estimate(col("mins")).as("n_distinct_est"))
    basic.join(distincts, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        coalesce(col("n_distinct_est"), lit(0.0)).as("n_distinct_est"),
        col("min_s"), col("max_s"))
  }
}
