package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** SEMANTIC decontamination: flag corpus documents whose embedding sits
    * within cosine ≥ `threshold` of ANY benchmark embedding — the
    * embedding-space form of [[overlap]]'s n-gram guard. Paraphrased or
    * translated eval leakage shares no 8-gram with its source but still
    * lands next to it in embedding space; published dedup/decontamination
    * pipelines run both guards side by side for exactly that reason.
    *
    * Plan shape at scale (100 TB corpus, benchmark ≪ corpus): the
    * benchmark set packs into ONE broadcast row of cid-sorted (id, vec,
    * norm) structs and each corpus row folds over it for its best match —
    * the same zero-shuffle broadcast-fold argmax as
    * [[Similarity.ivfAssign]]; the corpus never enters an Exchange, and
    * only rows at or above the threshold survive the map-side filter.
    * Ties keep the lowest benchmark id (strict `>` improvement over a
    * cid-ascending fold — identical to ordering by (cos DESC, bench_id)).
    *
    * @return (idCol, bench_id, cosine) — one row per flagged document,
    *         its nearest benchmark item, and the rounded cosine
    */
  def semanticOverlap(corpus: DataFrame, benchmark: DataFrame,
                      vecCol: String, idCol: String,
                      threshold: Double): DataFrame = {
    import graft.expressions.VectorExpressions.{dot, l2norm}
    def asDouble(c: Column): Column = transform(c, _.cast("double"))
    val packed = broadcast(
      benchmark
        .select(struct(col(idCol).as("bid"), asDouble(col(vecCol)).as("bv"),
          l2norm(asDouble(col(vecCol))).as("bn")).as("b"))
        .agg(array_sort(collect_list(col("b"))).as("bs")))
    // empty-benchmark guard fused into the fold init: a misconfigured
    // (empty) benchmark frame would otherwise return a silently-empty
    // "all clean" result — the one wrong direction for decontamination
    val best = aggregate(
      col("bs"),
      struct(coalesce(
        when(size(col("bs")) === 0,
          raise_error(lit("semanticOverlap: benchmark set is empty — an empty guard passes everything"))),
        lit(Double.NegativeInfinity)).as("sim"),
        element_at(col("bs"), 1).getField("bid").as("bid")),
      (acc, b) => {
        val s = round(dot(col("v"), b.getField("bv")) / (col("nrm") * b.getField("bn")), 6)
        when(s > acc.getField("sim"), struct(s.as("sim"), b.getField("bid").as("bid")))
          .otherwise(acc)
      })
    corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .crossJoin(packed)
      .withColumn("b", best)
      .filter(col("b.sim") >= threshold)
      .select(col(idCol), col("b.bid").as("bench_id"), col("b.sim").as("cosine"))
  }
}
