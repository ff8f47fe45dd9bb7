package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{hash31, wordNgrams}

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with a held-out benchmark/eval set — the standard guard against
  * test-set leakage in a training corpus (the n-gram-overlap rule used for
  * published LM training sets; e.g. GPT-3 appendix C / Gopher §A3 use
  * 8–13-gram collision checks).
  *
  * Plan shape at scale (100 TB corpus, benchmark ≪ corpus):
  *  - each side reduces to DISTINCT (doc, gram-hash) pairs map-side —
  *    8-byte hashes travel, never gram text;
  *  - the benchmark gram set (≤ a few million longs for any real eval
  *    suite) BROADCASTs, so corpus grams are filtered map-side with no
  *    shuffle of the corpus at all;
  *  - the only Exchange is the final per-doc count aggregation, which
  *    ships one (doc_id, gram_hash) row per HIT, not per gram.
  *
  * The 31-bit gram hash is part of the operator definition (like LSH's
  * band hash): a hash collision can flag a clean doc, never miss a
  * contaminated one — the safe direction for decontamination.
  */
object Decontaminate {

  /** Per-document count of distinct n-gram hashes shared with `benchmark`.
    * Documents with zero overlap are omitted (at corpus scale the clean
    * set is the overwhelming majority; callers left-anti-join flagged ids
    * to drop contaminated docs).
    *
    * @return (idCol, n_hit_grams) — one row per contaminated document
    */
  def overlap(docs: DataFrame, benchmark: DataFrame,
              textCol: String, idCol: String, n: Int): DataFrame = {
    // per-doc distinct is applied to the HASH array in-row (array_distinct
    // before explode): no shuffle spent de-duplicating, and the per-doc
    // hit count is exactly "distinct colliding hashes"
    def grams(df: DataFrame) = df
      .select(col(idCol),
        explode(array_distinct(transform(wordNgrams(col(textCol), n), hash31(_)))).as("gh"))
    val benchGrams = broadcast(grams(benchmark).select("gh").distinct())
    grams(docs)
      .join(benchGrams, "gh")
      .groupBy(idCol)
      .agg(count(lit(1)).cast("bigint").as("n_hit_grams"))
  }
}
