package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

/** The hashed linear quality filter's contract — the model replayed
  * independently in plain Scala (MessageDigest, not the Catalyst
  * expression), separability on a planted trusted-vs-crawl corpus, the
  * degenerate-doc exclusion rule — plus the soft-dedup weighting law
  * (`dedup_soft`: weight ≡ 1/|cluster|, singletons 1.0, consistent with
  * the shared component labeling). */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Independent replay of the portable 31-bit md5 bucket. */
  private def bucket(tok: String, b: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % 2147483647L % b
  }

  test("model + scores replayed independently: bucket counts, add-one log-odds, bias, fold") {
    val B = 1024
    val train = Seq(
      (1L, true, "good good fine"),
      (2L, false, "bad awful")).toDF("doc_id", "pos", "text")
    val model = QualityClassifier.logOddsModel(train, "text", "pos", buckets = B)
    val m = model.head()
    val wm = m.getMap[Long, Double](m.fieldIndex("wm")).toMap
    // replay: 3 positive occurrences, 2 negative; one doc each side
    val toks = Map("good" -> (2L, 0L), "fine" -> (1L, 0L),
      "bad" -> (0L, 1L), "awful" -> (0L, 1L))
    def w(cp: Long, cn: Long): Double =
      math.log((cp + 1).toDouble / (3 + B)) - math.log((cn + 1).toDouble / (2 + B))
    toks.foreach { case (tok, (cp, cn)) =>
      assert(math.abs(wm(bucket(tok, B)) - w(cp, cn)) < 1e-12, s"weight of '$tok'")
    }
    assert(wm.size <= toks.size, "model bounded by observed buckets, never vocabulary")
    assert(math.abs(m.getDouble(m.fieldIndex("w0")) - w(0, 0)) < 1e-12)
    assert(math.abs(m.getDouble(m.fieldIndex("bias")) - math.log(2.0 / 2.0)) < 1e-12)

    val docs = Seq((10L, "good fine"), (11L, "awful zzz_unseen"), (12L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(docs, "text", "doc_id", model, minScore = 0.0)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 11L), "null text excluded by contract")
    val s10 = (wm(bucket("good", B)) + wm(bucket("fine", B))) / 2
    assert(math.abs(out(0).getDouble(2) -
      BigDecimal(s10).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(0).getBoolean(3), "trusted-looking doc must be kept")
    // unseen token takes the shared default w0
    val s11 = (wm(bucket("awful", B)) + w(0, 0)) / 2
    assert(math.abs(out(1).getDouble(2) -
      BigDecimal(s11).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(!out(1).getBoolean(3), "crawl-looking doc must be dropped")
  }

  test("planted trusted-vs-crawl corpus separates cleanly") {
    val pos = (0 until 40).map(i => (i.toLong, true, s"alpha beta gamma alpha w$i"))
    val neg = (0 until 40).map(i => (100L + i, false, s"zeta eta theta zeta w$i"))
    val train = (pos ++ neg).toDF("doc_id", "pos", "text")
    val model = QualityClassifier.logOddsModel(train, "text", "pos", buckets = 4096)
    val held = Seq((900L, "alpha gamma beta"), (901L, "theta zeta eta"))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(held, "text", "doc_id", model, minScore = 0.0)
      .orderBy("doc_id").collect()
    assert(out(0).getBoolean(3) && out(0).getDouble(2) > 0, "trusted vocabulary kept")
    assert(!out(1).getBoolean(3) && out(1).getDouble(2) < 0, "crawl vocabulary dropped")
  }

  test("single-class training slice raises — a one-sided model is silently useless") {
    val oneSided = Seq((1L, true, "good"), (2L, true, "fine")).toDF("doc_id", "pos", "text")
    // the guard is EAGER (round-13 advice): it fires at model-build time,
    // not when some downstream action happens to evaluate the bias
    val e = intercept[Exception] {
      QualityClassifier.logOddsModel(oneSided, "text", "pos", buckets = 64)
    }
    assert(e.getMessage.contains("both classes"))
  }

  test("empty / all-null-text training slice raises instead of an empty model") {
    // round-13 advice: an all-null-text slice used to collapse perBucket
    // to zero rows, so the fused single-class guard never evaluated and
    // score() silently returned zero rows
    val allNull = Seq((1L, true, null: String), (2L, false, null: String))
      .toDF("doc_id", "pos", "text")
    val e1 = intercept[Exception] {
      QualityClassifier.logOddsModel(allNull, "text", "pos", buckets = 64)
    }
    assert(e1.getMessage.contains("both classes"))
    val empty = Seq.empty[(Long, Boolean, String)].toDF("doc_id", "pos", "text")
    val e2 = intercept[Exception] {
      QualityClassifier.logOddsModel(empty, "text", "pos", buckets = 64)
    }
    assert(e2.getMessage.contains("both classes"))
  }

  test("dedup_soft: weight law 1/|cluster|, singletons 1.0, consistent with the shared labeling") {
    val out = SparkEntry.queries("dedup_soft")(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(out.count() === docs.count(), "every doc gets a weight row")
    val bad = out.filter(
      abs(col("weight") - round(lit(1.0d) / col("cluster_size").cast("double"), 6)) > lit(1e-12)
        || col("cluster_size") < 1).count()
    assert(bad === 0L, "weight must equal round(1/cluster_size, 6) everywhere")
    // cross-check against the labeling the components key exposes
    val labels = SparkEntry.queries("dedup_components")(spark, sf)
    val sizes = labels.groupBy("comp").agg(count(lit(1)).as("n"))
    val mismatch = labels.join(sizes, "comp")
      .join(out.withColumnRenamed("doc_id", "id"), Seq("id"))
      .filter(col("cluster_size") =!= col("n")).count()
    assert(mismatch === 0L, "cluster_size must agree with the component labeling")
    // and clustered docs must be downweighted, never upweighted
    assert(out.filter(col("cluster_size") > 1 && col("weight") >= 1.0).count() === 0L)
  }
}
