package graft

import graft.operators.Decontaminate

/** Decontamination contract: a doc sharing any word n-gram with the
  * benchmark is flagged with its distinct-collision count; clean docs are
  * absent; benchmark members self-flag (they ARE their own leak). */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")

  test("shared n-grams are counted distinct-per-doc; clean docs absent") {
    val docs = Seq(
      // contains 'alpha beta gamma' and 'beta gamma delta' -> 2 hits
      (1L, "zz alpha beta gamma delta yy"),
      // the same leaked 3-gram TWICE still counts once (distinct per doc)
      (2L, "alpha beta gamma xx alpha beta gamma"),
      (3L, "totally clean document text here"),
      // shorter than n -> no grams, absent
      (4L, "two words")).toDF("doc_id", "text")
    val out = Decontaminate.overlap(docs, bench, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 1L))
  }

  test("benchmark members scanned as docs self-flag with their full gram set") {
    val out = Decontaminate.overlap(bench, bench, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(100L -> 2L)) // 'alpha beta gamma', 'beta gamma delta'
  }

  test("null and empty texts produce no flags") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text")
    assert(Decontaminate.overlap(docs, bench, "text", "doc_id", n = 3).count() === 0)
  }

  test("semanticOverlap flags threshold matches, nearest-benchmark ties keep lowest id") {
    val benchV = Seq(
      (10L, Seq(1.0, 0.0)),
      (20L, Seq(1.0, 0.0)), // duplicate of 10 -> ties must resolve to 10
      (30L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(0.9, 0.1)),  // near 10/20 -> flagged, bench_id 10
      (2L, Seq(0.1, 0.9)),  // near 30 -> flagged, bench_id 30
      (3L, Seq(-1.0, 0.0))) // near nothing -> clean
      .toDF("vec_id", "embedding")
    val out = Decontaminate.semanticOverlap(corpus, benchV, "embedding", "vec_id", 0.5)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(r => (r._1, r._2)) === Seq((1L, 10L), (2L, 30L)))
    assert(out.forall(_._3 >= 0.5))
  }

  test("semanticOverlap is zero-shuffle: the corpus never enters an Exchange") {
    val benchV = Seq((10L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val corpus = (0 until 100).map(i => (i.toLong, Seq(i / 100.0, 1.0 - i / 100.0)))
      .toDF("vec_id", "embedding")
    val out = Decontaminate.semanticOverlap(corpus, benchV, "embedding", "vec_id", 0.9)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || !plan.split("BroadcastExchange")
      .exists(_.contains("ShuffleExchange")),
      s"corpus-side shuffle found:\n$plan")
    assert(!plan.contains("ShuffleExchange"), "no shuffle exchange at all")
  }

  test("semanticOverlap raises on an empty benchmark set instead of passing everything") {
    val corpus = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val empty = corpus.filter($"vec_id" < 0)
    val e = intercept[Exception] {
      Decontaminate.semanticOverlap(corpus, empty, "embedding", "vec_id", 0.5).collect()
    }
    assert(e.getMessage.contains("benchmark set is empty") ||
      Option(e.getCause).exists(_.getMessage.contains("benchmark set is empty")))
  }
}
