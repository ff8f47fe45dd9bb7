package graft

import graft.operators.LmScore

/** The bigram-LM filter's contract, hand-checked on a fixture small
  * enough to compute on paper: deterministic capped vocabulary, `<unk>`
  * folding on both the train and score sides, add-one smoothing, the
  * sequential nll fold, and the degenerate-doc exclusion rule. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("model + scores hand-checked: top-V tie-break, unk folding, smoothing, kept flag") {
    val train = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val model = LmScore.bigramModel(train, "text", vocab = 2)
    val r = model.head()
    // counts a:2 b:2 c:1 — top-2 by (count desc, tok asc) = {a, b}; c folds to <unk>
    assert(r.getMap[String, Long](r.fieldIndex("m1")).toMap ===
      Map("a" -> 2L, "b" -> 2L, "<unk>" -> 1L))
    // mapped train stream [a b a b <unk>] → bigrams
    assert(r.getMap[String, Long](r.fieldIndex("m2")).toMap ===
      Map("a b" -> 2L, "b a" -> 1L, "b <unk>" -> 1L))
    assert(r.getLong(r.fieldIndex("vocab_n")) === 3L)

    val docs = Seq((10L, "a b c"), (11L, "x y"), (12L, "a")).toDF("doc_id", "text")
    val out = LmScore.perplexityScore(docs, "text", "doc_id", model, maxNll = 1.0)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 11L),
      "a single-token doc has no transition and no score")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 10 maps to [a b <unk>]: ln((2+1)/(2+3)), ln((1+1)/(2+3))
    val nll10 = -(math.log(3.0 / 5) + math.log(2.0 / 5)) / 2
    assert(out(0).getInt(1) === 2)
    assert(math.abs(out(0).getDouble(2) - r6(nll10)) < 1e-9)
    assert(out(0).getBoolean(3), s"nll $nll10 <= 1.0 must keep")
    // doc 11 is all-OOV: [<unk> <unk>], unseen bigram → ln((0+1)/(1+3))
    val nll11 = -math.log(1.0 / 4)
    assert(math.abs(out(1).getDouble(2) - r6(nll11)) < 1e-9)
    assert(!out(1).getBoolean(3), s"nll $nll11 > 1.0 must drop — the filter's whole point")
  }

  test("fluent text scores lower than shuffled text under a corpus-trained model") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val model = LmScore.bigramModel(docs, "text", vocab = 256)
    // deterministic derangement: reverse each doc's token order — same
    // unigrams, broken transitions
    val shuffled = docs.selectExpr("doc_id",
      "array_join(reverse(split(text, ' ')), ' ') AS text")
    val f = LmScore.perplexityScore(docs, "text", "doc_id", model, 6.0)
      .agg(org.apache.spark.sql.functions.avg("nll")).head().getDouble(0)
    val s = LmScore.perplexityScore(shuffled, "text", "doc_id", model, 6.0)
      .agg(org.apache.spark.sql.functions.avg("nll")).head().getDouble(0)
    assert(f < s, s"in-order text must be more likely: fluent $f vs reversed $s")
  }
}
