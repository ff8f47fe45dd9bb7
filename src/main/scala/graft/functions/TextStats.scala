package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution statistics over text — the compressibility/diversity
  * signals of the quality-filter family (`ta_entropy`).
  *
  * Scale design: char counting is explode + two hash aggregates. The
  * explode fans each doc out to its characters, but map-side partial
  * aggregation collapses them to (doc, char) counts INSIDE the scan
  * task — the shuffle carries at most |alphabet| rows per doc, never raw
  * characters. The per-doc fold then runs over a char-sorted count list,
  * so every floating-point add happens in a canonical order: the
  * unrounded sum is reproducible run-to-run and engine-to-engine (the
  * ta_lm_perplexity determinism discipline).
  */
object TextStats {

  /** Per-row character entropy in bits: `(idCol, n_chars, n_distinct,
    * entropy_bits)`. H = log2(n) − (Σ c·ln c)/(n·ln 2) over per-char
    * counts c. Rows whose text is empty or null vanish (entropy of the
    * empty string is undefined; callers wanting them keep a left join).
    * `entropy_bits` is rounded to 6dp — the unrounded double is already
    * order-canonical, the rounding only absorbs last-ulp `ln`
    * differences across engines. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnt = df
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(idCol, "ch").agg(count(lit(1)).as("c"))
    cnt.groupBy(idCol)
      .agg(sum(col("c")).cast("bigint").as("n_chars"),
        count(lit(1)).as("n_distinct"),
        aggregate(sort_array(collect_list(struct(col("ch"), col("c")))), lit(0.0d),
          (acc, t) => acc + t.getField("c").cast("double") *
            log(t.getField("c").cast("double"))).as("slc"))
      .select(col(idCol), col("n_chars"), col("n_distinct"),
        round((log(col("n_chars").cast("double")) -
          col("slc") / col("n_chars").cast("double")) / log(lit(2.0d)), 6)
          .as("entropy_bits"))
  }
}
