package graft

import org.apache.spark.sql.functions._
import graft.etl.Profile
import graft.etl.Profile.ColumnSpec
import graft.operators.Dedup

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "a", Some(10L)), (2L, "b", Some(20L)), (3L, "a", None),
    (4L, "c", Some(20L)), (5L, "a", Some(30L))
  ).toDF("id", "code", "v")

  test("profile reports exact n/nulls/min/max and exact distincts below K") {
    val rows = Profile.profile(fixture, Seq(
        ColumnSpec("code", $"code", min($"code").cast("string"), max($"code").cast("string")),
        ColumnSpec("v", $"v".cast("string"),
          min($"v").cast("string"), max($"v").cast("string"))))
      .as[(String, Long, Long, Double, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val code = rows("code")
    assert(code._2 === 5L && code._3 === 0L && code._4 === 3.0)
    assert(code._5 === "a" && code._6 === "c")
    val v = rows("v")
    assert(v._2 === 5L && v._3 === 1L, "null v must be counted")
    assert(v._4 === 3.0, "KMV is exact below K: 10/20/30")
    assert(v._5 === "10" && v._6 === "30", "typed min/max, not lexicographic")
  }

  test("profile basics run as ONE multi-aggregate scan (single aggregate over the input)") {
    // the basic-stats branch must not rescan per column: exactly one
    // HashAggregate pair (partial+final) over the source in that subtree
    val plan = Profile.profile(fixture, Seq(
        ColumnSpec("code", $"code", min($"code").cast("string"), max($"code").cast("string")),
        ColumnSpec("v", $"v".cast("string"),
          min($"v").cast("string"), max($"v").cast("string"))))
      .queryExecution.optimizedPlan.toString
    val aggs = "Aggregate ".r.findAllIn(plan).length
    // one basic-stats aggregate + the KMV sketch aggregate = 2 total
    assert(aggs <= 2, s"expected one basic + one sketch aggregate, got $aggs:\n$plan")
  }

  test("profile rejects an empty column list") {
    val ex = intercept[IllegalArgumentException] {
      Profile.profile(fixture, Seq())
    }
    assert(ex.getMessage.contains("no columns"))
  }

  test("incrementalExact keeps only genuinely-new batch docs, one per digest") {
    val history = Seq((1L, "seen"), (2L, "old news")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "seen"),        // already in history -> dropped
      (11L, "fresh"), (12L, "fresh"), // batch-internal dup -> keep min id
      (13L, "brand new")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalExact(history, batch, "text", "doc_id")
      .select($"doc_id").as[Long].collect().sorted
    assert(kept === Seq(11L, 13L))
  }

  test("incrementalExact ships digests only: no text column crosses the join") {
    val history = Seq((1L, "seen")).toDF("doc_id", "text")
    val batch = Seq((10L, "x")).toDF("doc_id", "text")
    val plan = Dedup.incrementalExact(history, batch, "text", "doc_id")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("text#") ||
        "Join".r.findAllIn(plan).isEmpty ||
        !plan.linesIterator.exists(l => l.contains("Join") && l.contains("text#")),
      s"join must be keyed on digests, not text:\n$plan")
  }
}
