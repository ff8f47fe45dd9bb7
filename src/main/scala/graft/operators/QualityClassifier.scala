package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hashed-feature LINEAR quality classifier — the fastText-shaped stage
  * of a crawl-corpus pipeline (train a cheap linear model on
  * trusted-vs-crawl labels, score everything, keep the high side). The
  * reference has no notion of this; it belongs to the beyond-reference
  * training-data surface beside `ta_lm_perplexity` (the LM filter) and
  * `ta_quality` (the heuristic floor).
  *
  * The model is naive-Bayes log-odds over HASHED token buckets: every
  * token maps to one of `buckets` slots via the portable 31-bit md5
  * hash ([[graft.expressions.Md5Prefix31]]), and slot b's weight is
  *   w(b) = ln((c_pos(b)+1)/(N_pos+B)) − ln((c_neg(b)+1)/(N_neg+B)),
  * with the shared default w0 (both counts zero) for never-seen slots.
  * Hashing is what makes the operator scale: the broadcast model is
  * bounded by `buckets` — never corpus-vocabulary-sized — exactly the
  * fastText hashing-trick contract, and training is ONE bounded
  * aggregation over the (labeled, sampled) training slice. Scoring is
  * one zero-shuffle scan: each doc folds its own token array against
  * the single broadcast weight map, map-side.
  *
  * Per doc the score is
  *   bias + (1/n) Σ_t w(hash(t) mod B),
  * bias = ln((docs_pos+1)/(docs_neg+1)), accumulated by a SEQUENTIAL
  * `aggregate` fold in document order — deterministic float order,
  * bit-identical to DuckDB's `list_reduce` replay (the repo float rule:
  * the keep threshold compares unrounded doubles; round only at
  * output). Empty-token docs have no defined mean and are excluded
  * (the `chunkWindows`/`LmScore` degenerate-input discipline).
  */
object QualityClassifier {

  /** The packed broadcast model: ONE row —
    * (w: bucket→log-odds map over OBSERVED buckets, w0: the shared
    * never-seen-bucket weight, bias: class-prior log-odds). Counts are
    * token OCCURRENCES (not distinct tokens), the multinomial NB
    * convention. */
  def logOddsModel(train: DataFrame, textCol: String, posCol: String,
                   buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val b = lit(buckets.toLong)
    val toks = train.filter(col(textCol).isNotNull)
      .select(col(posCol).cast("boolean").as("pos"),
        split(col(textCol), " ").as("w"))
    val occ = toks.select(col("pos"), explode(col("w")).as("tok"))
      .select(col("pos"),
        pmod(graft.expressions.HashExpressions.md5prefix31(col("tok")), b).as("bkt"))
    val perBucket = occ.groupBy("bkt").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("cn"))
    val totals = occ.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("nn"))
    // EAGER degenerate-slice guard (round-13 advice): the old raise was
    // fused into the bias column, but an EMPTY training slice (no rows,
    // or all-null text) collapses perBucket to zero rows, so the groupBy
    // below emits ZERO rows and a fused guard never evaluates — score()
    // would then silently return zero rows. The prior is a 1-row agg
    // over the (labeled, sampled) slice, so collecting it driver-side is
    // bounded; the values feed the bias as literals, so the lazy plan
    // loses the prior crossJoin branch rather than gaining a scan.
    val priorRow = toks.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("dp"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("dn")).head()
    val (dp, dn) =
      (if (priorRow.isNullAt(0)) 0L else priorRow.getLong(0),
        if (priorRow.isNullAt(1)) 0L else priorRow.getLong(1))
    require(dp > 0L && dn > 0L,
      s"logOddsModel: training slice needs both classes — positive and " +
        s"negative examples (got $dp positive, $dn negative non-null-text docs)")
    def odds(cp: Column, cn: Column): Column =
      log((cp + lit(1L)).cast("double") / (col("np") + b).cast("double")) -
        log((cn + lit(1L)).cast("double") / (col("nn") + b).cast("double"))
    perBucket.crossJoin(totals)
      .select(struct(col("bkt"), odds(col("cp"), col("cn")).as("lw")).as("e"),
        col("np"), col("nn"))
      .groupBy("np", "nn")
      .agg(map_from_entries(collect_list(col("e"))).as("wm"))
      .select(col("wm"), odds(lit(0L), lit(0L)).as("w0"),
        log((lit(dp) + lit(1L)).cast("double") /
          (lit(dn) + lit(1L)).cast("double")).as("bias"),
        b.as("n_buckets"))
  }

  /** Score `docs` under a [[logOddsModel]]: one broadcast cross-join,
    * then every column is a map-side fold over the doc's own token
    * array. Returns (idCol, n_tokens, score = round(bias + mean
    * log-odds, 6), kept = unrounded score >= minScore). Docs with zero
    * tokens are excluded (no mean, no score). */
  def score(docs: DataFrame, textCol: String, idCol: String,
            model: DataFrame, minScore: Double): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("toks"))
      .filter(size(col("toks")) >= 1)
      .crossJoin(broadcast(model))
      // the per-token log-odds terms, in document order
      .withColumn("lws", transform(col("toks"), t =>
        coalesce(
          element_at(col("wm"),
            pmod(graft.expressions.HashExpressions.md5prefix31(t), col("n_buckets"))),
          col("w0"))))
      // SEQUENTIAL fold: deterministic float order ≡ DuckDB list_reduce
      .withColumn("score_raw",
        col("bias") + aggregate(col("lws"), lit(0.0d), (acc, x) => acc + x) /
          size(col("lws")).cast("double"))
      .select(col(idCol), size(col("lws")).as("n_tokens"),
        round(col("score_raw"), 6).as("score"),
        (col("score_raw") >= lit(minScore)).as("kept"))
}
