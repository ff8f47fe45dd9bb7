package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the classic LM-filter
  * stage of a crawl-corpus pipeline (CCNet-style: score every document
  * under a small LM trained on trusted text; keep the low-perplexity
  * tail). The reference has no notion of this; it belongs to the
  * beyond-reference training-data surface like the quality/rarity keys.
  *
  * The model is a word-level BIGRAM LM with add-one smoothing over a
  * CAPPED vocabulary: the top `vocab` training tokens by count (count
  * desc, token asc — a total order, so the vocabulary is deterministic);
  * everything else maps to `<unk>`. Capping is what makes the operator
  * scale: the broadcast model is bounded by construction (≤ vocab
  * unigrams + observed in-vocab bigrams), never corpus-vocabulary-sized,
  * so scoring is ONE zero-shuffle scan of the corpus — each doc folds
  * its own token array against the broadcast maps map-side. Model
  * BUILDING is two bounded aggregations over the (sampled, trusted)
  * training slice — at 100 TB the training slice is a sample by design,
  * exactly like the k-means/PQ trainers.
  *
  * Per doc the score is the average negative log-likelihood of its
  * bigram transitions,
  *   nll = -(1/B) Σ ln (c(prev,cur)+1) / (c1(prev) + vocab + 1),
  * accumulated by a SEQUENTIAL `aggregate` fold over the doc's own
  * bigram array — deterministic float order, bit-identical to DuckDB's
  * `list_reduce` replay (the repo float rule: thresholds compare
  * unrounded doubles; round only at output). Perplexity = exp(nll) is
  * monotone in nll, so filtering on nll IS perplexity filtering without
  * the extra exp.
  *
  * Docs with fewer than two tokens have no bigram transition and no
  * defined score — they are excluded from the output (the
  * `chunkWindows` null/degenerate discipline, documented rather than
  * NULL-scored).
  */
object LmScore {

  val Unk = "<unk>"

  /** The packed broadcast model: ONE row —
    * (m1: token→count map incl `<unk>`, m2: "prev cur"→count map,
    * vocab_n: smoothing denominator addend = |vocab|+1).
    * Train-slice tokens outside the top-`vocab` fold into `<unk>`'s
    * unigram count, and bigrams are counted over the MAPPED stream, so
    * scoring needs no second vocabulary lookup table. */
  def bigramModel(train: DataFrame, textCol: String, vocab: Int): DataFrame = {
    require(vocab >= 1, s"vocab must be >= 1, got $vocab")
    val toks = train.filter(col(textCol).isNotNull)
      .select(split(col(textCol), " ").as("w"))
    val uni = toks.select(explode(col("w")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    // deterministic top-V: (count desc, token asc) is a total order
    val top = uni.orderBy(col("c").desc, col("tok").asc).limit(vocab)
      .withColumnRenamed("c", "keep_c")
    val unkCount = uni.join(top.select("tok"), Seq("tok"), "left_anti")
      .agg(coalesce(sum(col("c")), lit(0L)).as("c"))
      .select(lit(Unk).as("tok"), col("c"))
    val m1 = top.select(col("tok"), col("keep_c").as("c")).union(unkCount)
      .agg(map_from_entries(collect_list(struct(col("tok"), col("c")))).as("m1"))
    // bigrams over the MAPPED token stream of each training doc
    val vset = top.select(collect_set(col("tok")).as("vs"))
    val mapped = toks.crossJoin(broadcast(vset))
      .select(transform(col("w"),
        t => when(array_contains(col("vs"), t), t).otherwise(lit(Unk))).as("mw"))
    val m2 = mapped
      .filter(size(col("mw")) >= 2)
      .select(explode(zip_with(
        slice(col("mw"), lit(1), size(col("mw")) - 1),
        slice(col("mw"), lit(2), size(col("mw")) - 1),
        (p, c) => concat(p, lit(" "), c))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c"))
      .agg(map_from_entries(collect_list(struct(col("bg"), col("c")))).as("m2"))
    m1.crossJoin(m2).withColumn("vocab_n", lit(vocab.toLong + 1L))
  }

  /** Score `docs` under a [[bigramModel]]: one broadcast cross-join, then
    * every column is a map-side fold over the doc's own arrays. Returns
    * (idCol, n_bigrams, nll = round(avg negative log-likelihood, 6),
    * kept = unrounded nll <= maxNll). Docs with < 2 tokens are excluded
    * (no transition, no score). */
  def perplexityScore(docs: DataFrame, textCol: String, idCol: String,
                      model: DataFrame, maxNll: Double): DataFrame = {
    def mapTok(t: Column): Column =
      when(element_at(col("m1"), t).isNotNull, t).otherwise(lit(Unk))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .crossJoin(broadcast(model))
      // the per-transition ln terms, in document order
      .withColumn("lls", zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (p, c) => log(
          (coalesce(element_at(col("m2"), concat(mapTok(p), lit(" "), mapTok(c))),
            lit(0L)) + lit(1L)).cast("double") /
          (coalesce(element_at(col("m1"), mapTok(p)), lit(0L)) + col("vocab_n"))
            .cast("double"))))
      // SEQUENTIAL fold: deterministic float order ≡ DuckDB list_reduce
      .withColumn("nll_raw",
        -aggregate(col("lls"), lit(0.0d), (acc, x) => acc + x) /
          size(col("lls")).cast("double"))
      .select(col(idCol), size(col("lls")).as("n_bigrams"),
        round(col("nll_raw"), 6).as("nll"),
        (col("nll_raw") <= lit(maxNll)).as("kept"))
  }
}
