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
}
